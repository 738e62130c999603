"""Conf-independence lint (round-9 verdict item 2).

The engine's correctness must not depend on session confs that only
its own factory (`session.py`) sets: the driver's correctness harness
— and any real cluster — builds a DEFAULT-conf SparkSession (UTC
timezone is the driver's documented baseline) and calls `queries()`
entries directly. Round 9 proved the failure class is real:
`GeotabReader.pushFilters` (added r8) made every self-built read die
with DATA_SOURCE_PUSHDOWN_DISABLED under the driver's session, while
the builder's factory session (`session.py:55`) masked it in every
pytest/bench run for a full round.

This test runs the whole connector family in a SUBPROCESS with a
genuinely bare session (no `session.py` import on the session path),
preceded by a failing-by-construction probe: a pushFilters-capable
reader registered WITHOUT the `register_geotab_source` chokepoint
must still raise under the default conf — proving the subprocess
session really is bare and the lint would catch a regression of this
class (e.g. someone moving the conf-set back out of registration).

SCALE.md §21 carries the companion audit: every non-default conf in
`session.py` classified perf-only vs correctness-load-bearing, with
the rule that load-bearing ones must be set by the operator that
needs them.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BARE_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# NO session.py factory: master + UTC tz (the driver's documented
# baseline) + UI hygiene only — every SQL conf at its Spark default.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("bare-session-lint")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
# Bare-ness canary, not a hard failure (round-10 advice): if a future
# Spark release ships this default as "true", the regression class the
# connector lint guards (readers dying under the DEFAULT conf)
# disappears with it — skip loudly instead of reporting a broken lint.
if spark.conf.get("spark.sql.python.filterPushdown.enabled") != "false":
    print("BARE_SKIP_PUSHDOWN_DEFAULT_ALREADY_TRUE")
    spark.stop()
    raise SystemExit(0)

# --- failing-by-construction: a pushFilters reader registered WITHOUT
# the register_geotab_source chokepoint must die at reader init under
# the default conf. This both pins Spark's gating behavior and proves
# this session would expose a conf-dependency regression.
from etl_geotab_spark.sources.geotab import _SCHEMAS, GeotabDataSource

spark.dataSource.register(GeotabDataSource)
try:
    (
        spark.read.format("geotab")
        .schema(_SCHEMAS["Device"])
        .option("typename", "Device")
        .option("transport", "fake")
        .option("sessionid", "bare-probe")
        .option("groups", "g1")
        .load()
        .collect()
    )
    raise SystemExit("EXPECTED_PUSHDOWN_ERROR_DID_NOT_RAISE")
except Exception as exc:  # noqa: BLE001 - classify below
    if "PUSHDOWN" not in str(exc).upper():
        raise

# --- the engine's own entry points must EACH self-satisfy their
# confs. Two of the three legs exercise the pushdown gate through
# register_geotab_source (geotab_connector_pipeline batch reads, and
# geotab_stream_pipeline — the query that ERRORed in CORRECTNESS_r09);
# geotab_flagship never touches the Python data source — it is here as
# the fixture-read leg (load_table's NTZ/nanos conf self-sufficiency
# and UTC timestamp semantics on a bare session). The gate conf is
# RESET before every member — a session-sticky conf set by an earlier
# query must not green-wash a later one (that cross-query masking is
# precisely how the batch twin hid the streaming twin's regression
# through all of round 8).
from etl_geotab_spark import queries as q

registry = q.queries()
for name in (
    "geotab_flagship",
    "geotab_connector_pipeline",
    "geotab_stream_pipeline",
):
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
    ), "unset did not restore the Spark default"
    rows = registry[name](spark, {sf!r}).collect()
    assert rows, (name, "returned no rows")
    print("BARE_OK", name, len(rows))
spark.stop()
"""


# Round-11 (r10 verdict item 3): the self-scaffolded streaming family.
# `streaming_stream_join` / `streaming_dedup_keys` / `stateful_user_stats`
# build their own readStream plumbing OUTSIDE the connector registration
# path the lint above covers; the r10 full-registry sweep ran them bare
# once as a one-off — this makes that coverage a repeatable gate. Their
# load-bearing confs are the fixture-read pair (`inferTimestampNTZ`,
# `nanosAsLong`), self-set by `load_table` at the read chokepoint; both
# are RESET before every member so a session-sticky set by an earlier
# query cannot green-wash a later one (the r8 masking mechanism). The
# bare-ness canary here is schema-shaped: a DIRECT parquet read of the
# events fixture on a truly default-conf session must surface
# `timestamp_ntz` (the factory/load_table path surfaces `timestamp`).
_BARE_STREAMING_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("bare-session-streaming-lint")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
# --- failing-by-construction canary: the default-conf read must show
# the BARE schema. If a future Spark default reads these as session-tz
# TIMESTAMP natively, the conf-dependency class this lint guards is
# gone — skip loudly (round-10 advice pattern).
bare_ts = (
    spark.read.parquet({sf!r} + "/events.parquet").schema["ts"].dataType
).simpleString()
if bare_ts != "timestamp_ntz":
    print("BARE_SKIP_NTZ_DEFAULT_CHANGED", bare_ts)
    spark.stop()
    raise SystemExit(0)

from etl_geotab_spark import queries as q

registry = q.queries()
for name in (
    "streaming_stream_join",
    "streaming_dedup_keys",
    "stateful_user_stats",
):
    for conf in (
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.python.filterPushdown.enabled",
    ):
        spark.conf.unset(conf)
    assert (
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
        == "true"
    ), "unset did not restore the Spark default"
    rows = registry[name](spark, {sf!r}).collect()
    assert rows, (name, "returned no rows")
    print("BARE_OK", name, len(rows))
spark.stop()
"""


def _run_bare(script: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )


def _env_conf_pollution(key: str) -> str | None:
    """A skip marker can mean two very different things: Spark's OWN
    default changed (the guarded regression class is genuinely gone →
    skip), or THIS BOX sets the conf via spark-defaults.conf /
    SPARK_CONF_DIR / PYSPARK_SUBMIT_ARGS (the lint's bare-session
    premise is broken and the gate would silently stop running → that
    must FAIL, not skip — review follow-up on the round-10 advice
    change). Probe the defaults files AND the submit-args env var for
    the key to tell them apart (r11 advice: a box injecting the conf
    via ``PYSPARK_SUBMIT_ARGS="... --conf key=true ..."`` pollutes
    every in-process session just like spark-defaults.conf does)."""
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    if key in submit_args:
        return f"PYSPARK_SUBMIT_ARGS: {submit_args.strip()}"
    for d in (
        os.environ.get("SPARK_CONF_DIR"),
        os.path.join(os.environ.get("SPARK_HOME", ""), "conf"),
    ):
        if not d:
            continue
        p = os.path.join(d, "spark-defaults.conf")
        try:
            with open(p) as f:
                for ln in f:
                    if ln.strip().startswith(key):
                        return f"{p}: {ln.strip()}"
        except OSError:
            pass
    return None


def _assert_bare_ok(r, names, skip_marker, guarded_conf):
    import pytest

    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    if skip_marker in r.stdout:
        pollution = _env_conf_pollution(guarded_conf)
        assert pollution is None, (
            f"{skip_marker}, but {guarded_conf} is set by this box's "
            f"spark-defaults ({pollution}) — the session is polluted, "
            "not bare, and the conf-independence gate would silently "
            "stop running here. Clean the environment conf instead of "
            "skipping."
        )
        pytest.skip(
            f"{skip_marker}: no environment conf sets {guarded_conf}, "
            "so Spark's own default now satisfies the conf this lint "
            "guards — the regression class is gone upstream"
        )
    for name in names:
        assert f"BARE_OK {name}" in r.stdout, (name, r.stdout[-2000:])


def test_connector_family_on_bare_default_conf_session():
    """The r9 regression, machine-checked: flagship + batch connector
    + streaming connector all run on a default-conf session, with the
    bare-ness of the session itself asserted by a probe that MUST
    fail (a pushdown reader registered without the chokepoint)."""
    script = _BARE_SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001")
    _assert_bare_ok(
        _run_bare(script),
        (
            "geotab_flagship",
            "geotab_connector_pipeline",
            "geotab_stream_pipeline",
        ),
        "BARE_SKIP_PUSHDOWN_DEFAULT_ALREADY_TRUE",
        "spark.sql.python.filterPushdown.enabled",
    )


def test_streaming_family_on_bare_default_conf_session():
    """r10 verdict item 3: the streams that scaffold their own
    readStream path (outside the connector chokepoint) run on a
    default-conf session, fixture-read confs reset before each."""
    script = _BARE_STREAMING_SCRIPT.format(
        repo=REPO, sf="/root/testdata/sf0.001"
    )
    _assert_bare_ok(
        _run_bare(script),
        (
            "streaming_stream_join",
            "streaming_dedup_keys",
            "stateful_user_stats",
        ),
        "BARE_SKIP_NTZ_DEFAULT_CHANGED",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    )

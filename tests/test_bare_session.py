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
assert (
    spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
), "session is not bare: the pushdown gate conf is already on"

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


def test_connector_family_on_bare_default_conf_session():
    """The r9 regression, machine-checked: flagship + batch connector
    + streaming connector all run on a default-conf session, with the
    bare-ness of the session itself asserted by a probe that MUST
    fail (a pushdown reader registered without the chokepoint)."""
    script = _BARE_SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001")
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    for name in (
        "geotab_flagship",
        "geotab_connector_pipeline",
        "geotab_stream_pipeline",
    ):
        assert f"BARE_OK {name}" in r.stdout, (name, r.stdout[-2000:])

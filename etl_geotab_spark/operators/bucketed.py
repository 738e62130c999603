"""Bucketed (pre-shuffled) table layout for co-located joins.

The 100 TB story: a fact⋈fact equi-join normally shuffles BOTH sides
on the key every time it runs. Writing each side bucketed by the join
key (``bucketBy`` + ``sortBy`` + ``saveAsTable``) pre-partitions the
data ON DISK once; every later join on that key reads matching buckets
pairwise and skips the exchange entirely — the plan shows two scans
feeding the join with NO Exchange above either side. This is the
batch analogue of the reference's persistent keyed Map index
(task.ts:221-229), amortized across queries instead of rebuilt per
invocation.

Local note: bucket files are written under a caller-supplied directory
(tests/bench use a tmp dir); table entries go into the session's
in-memory catalog, so no Hive metastore is needed.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from etl_geotab_spark.io import write_bucketed_external


def _safe_name(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s)


def _sweep_stale_tmp(ns_dir: str) -> None:
    """Remove `*.tmp.p<pid>` staging directories whose writer process
    is dead — a session killed between write and rename would otherwise
    leak a full bucketed copy per crash, unbounded (the atexit cleanup
    went away with the PID-namespaced layout). Live writers' tmp dirs
    are left alone; completed (`_SUCCESS`-marked) directories are never
    touched."""
    try:
        entries = os.listdir(ns_dir)
    except OSError:
        return
    for e in entries:
        m = re.fullmatch(r".+\.tmp\.p(\d+)", e)
        if not m:
            continue
        pid = int(m.group(1))
        try:
            os.kill(pid, 0)  # signal 0 = liveness probe only
            continue  # writer still running — not ours to clean
        except ProcessLookupError:
            shutil.rmtree(os.path.join(ns_dir, e), ignore_errors=True)
        except OSError:
            continue  # e.g. EPERM: pid exists under another user


def colocated_tables(
    spark: SparkSession,
    sf_dir: str,
    base_dir: str,
    sides: dict[str, tuple[DataFrame, str]],
    n_buckets: int = 8,
) -> dict[str, DataFrame]:
    """Write each (df, key) side bucketed by its join key and return
    catalog-backed DataFrames whose bucketing metadata Catalyst can use
    to elide the join exchange.

    Isolation + amortization (round-7 rework — the cache is now
    CONTENT-ADDRESSED and shared across processes):
    - the directory key is (sf_dir, side, join key, bucket count, a
      canonical fingerprint of the input PLAN) — same inputs, same
      bytes, so a completed directory is immutably reusable by ANY
      session; a same-named side with different bucketing or filtered
      input gets its own directory (round-3 advice);
    - writers never touch a completed directory: each writes to a
      pid-unique temp dir, then atomically renames it into place. If
      the rename loses a race (another process completed first), the
      loser discards its own copy and reads the winner's — fixtures
      are immutable, so both copies are byte-equivalent layouts;
    - a directory only counts as complete when the committer's
      _SUCCESS marker is present (a crashed writer leaves only temp
      dirs, never a half-complete final path);
    - completed directories are NOT removed at exit: deleting them
      would yank bucket files out from under another live session's
      lazy scan, and persistence IS the contract — pay the shuffle
      once, amortize it over every later session's joins (the batch
      analogue of the reference's persistent keyed Map). Growth is
      bounded by the handful of distinct content keys.
    The per-session catalog still gets one external-table registration
    per side (in-memory catalog; the DDL declares the bucketing so
    Catalyst elides the join Exchange — plan-asserted in tests)."""
    ns = _safe_name(sf_dir.strip("/"))
    out: dict[str, DataFrame] = {}
    for name, (df, key) in sides.items():
        # Content fingerprint — must be BOTH process-stable (so a
        # second session reuses the first's files instead of
        # rewriting) and input-sensitive (round-3 advice: different/
        # filtered input under the same side name must not reuse the
        # first call's layout). Neither single source suffices:
        # semanticHash() is input-sensitive but NOT stable across
        # processes (two sessions hashed the identical plan
        # differently), and the canonicalized plan STRING alone is
        # lossy — it normalizes attributes to `none#N` (column names
        # gone), omits the source path, and truncates past
        # spark.sql.debug.maxToStringFields, so two different
        # same-typed projections collide (verified live). Composite
        # key instead:
        #  - schema DDL: full column names + types, untruncated;
        #  - canonicalized plan string: operator-tree shape, filters,
        #    literals (exprIds normalized → process-stable);
        #  - sorted input file list WITH size+mtime per file: the
        #    actual bytes scanned — a different table/path with an
        #    identical schema and tree cannot collide, and a fixture
        #    regenerated IN PLACE under the same file names mints a
        #    new key instead of silently reusing stale bucket data
        #    (the cache is cross-process persistent, so name-only
        #    identity is not enough).
        canon = (
            df._jdf.queryExecution().analyzed().canonicalized().toString()
        )
        schema_pairs = [
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        ]
        schema_key = ",".join(f"{n}:{t}" for n, t in schema_pairs)

        def _file_id(uri: str) -> str:
            p = uri[len("file:"):] if uri.startswith("file:") else uri
            try:
                st = os.stat(p)
                return f"{uri}|{st.st_size}|{st.st_mtime_ns}"
            except OSError:
                return uri  # non-local URI: name-only identity
        files_key = "\n".join(sorted(_file_id(u) for u in df.inputFiles()))
        if any(m in canon for m in ("LocalRelation", "LogicalRDD", "ExistingRDD")):
            # in-memory relations have no input files and print WITHOUT
            # their rows, so two literal datasets would still collide;
            # mix in semanticHash (data-sensitive). In-memory inputs
            # are session-local — losing cross-process reuse for them
            # is the correct trade; file-backed scans (the real
            # workload) keep the process-stable composite key.
            canon += f"#sem{df.semanticHash()}"
        plan_fp = hashlib.sha256(
            f"{schema_key}\n{canon}\n{files_key}".encode()
        ).hexdigest()[:8]
        suffix = f"{name}_{_safe_name(key)}_{n_buckets}_{plan_fp}"
        table = f"bkt_{ns}_{suffix}"
        final = os.path.join(base_dir, ns, suffix)
        if spark.catalog.tableExists(table):
            out[name] = spark.table(table)
            continue
        if not os.path.exists(os.path.join(final, "_SUCCESS")):
            _sweep_stale_tmp(os.path.dirname(final))
            tmp = f"{final}.tmp.p{os.getpid()}"
            shutil.rmtree(tmp, ignore_errors=True)
            tmp_table = f"{table}_w{os.getpid()}"
            write_bucketed_external(
                df, tmp_table, tmp, key, n_buckets, sort_col=key
            )
            spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
            os.makedirs(os.path.dirname(final), exist_ok=True)
            try:
                os.rename(tmp, final)
            except OSError:
                # EITHER another process completed the same content key
                # first (its directory is byte-equivalent — use it) OR
                # a genuine failure (permissions, cross-device, ...).
                # Only the former may be swallowed: registering a table
                # over a missing/incomplete `final` would silently
                # return 0 rows forever after. Either way the tmp copy
                # is useless — remove it before propagating.
                if not os.path.exists(os.path.join(final, "_SUCCESS")):
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
        # same (name, type) pairs as schema_key above — one source of
        # truth so the fingerprint can't desynchronize from the DDL
        schema_ddl = ", ".join(f"`{n}` {t}" for n, t in schema_pairs)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
            f"INTO {n_buckets} BUCKETS LOCATION '{final}'"
        )
        out[name] = spark.table(table)
    return out

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
        # Content fingerprint = the CANONICALIZED analyzed plan string
        # (exprIds normalized), hashed. semanticHash() was tried first
        # and is NOT stable across processes (two sessions minted
        # different hashes for the identical plan), which silently
        # turned cross-process reuse into rewrite-per-process; the
        # canonicalized string is process-stable and still filter-/
        # shape-sensitive (round-3 advice: filtered input under the
        # same side name must not reuse the full-table layout). The
        # source PATH is not part of the string — sf_dir is already in
        # the directory namespace above.
        canon = (
            df._jdf.queryExecution().analyzed().canonicalized().toString()
        )
        if any(m in canon for m in ("LocalRelation", "LogicalRDD", "ExistingRDD")):
            # in-memory relations print WITHOUT their rows (PySpark
            # createDataFrame yields a LogicalRDD whose canonical
            # string is just the schema), so two different literal
            # datasets would collide; mix in semanticHash
            # (data-sensitive). In-memory inputs are session-local —
            # losing cross-process reuse for them is the correct
            # trade, while file-backed scans (the real workload) keep
            # the process-stable pure-canon key.
            canon += f"#sem{df.semanticHash()}"
        plan_fp = hashlib.sha256(canon.encode()).hexdigest()[:8]
        suffix = f"{name}_{_safe_name(key)}_{n_buckets}_{plan_fp}"
        table = f"bkt_{ns}_{suffix}"
        final = os.path.join(base_dir, ns, suffix)
        if spark.catalog.tableExists(table):
            out[name] = spark.table(table)
            continue
        if not os.path.exists(os.path.join(final, "_SUCCESS")):
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
                # another process completed the same content key first;
                # its directory is byte-equivalent — use it
                shutil.rmtree(tmp, ignore_errors=True)
        schema_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
            f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
            f"INTO {n_buckets} BUCKETS LOCATION '{final}'"
        )
        out[name] = spark.table(table)
    return out

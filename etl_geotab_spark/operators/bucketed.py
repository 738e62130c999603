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

import atexit
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

    Isolation + amortization:
    - names and paths are namespaced by sf_dir AND process id — the
      correctness driver, pytest, and bench may run concurrently, and a
      shared path would let one session's overwrite delete bucket files
      out from under another session's lazy scan;
    - within a session the write happens ONCE per (sf, side): if the
      table is already registered, it is reused as-is (fixtures are
      immutable), which is precisely the pay-the-shuffle-once contract
      the layout exists for — re-invocations measure the JOIN, not the
      write."""
    ns = f"{_safe_name(sf_dir.strip('/'))}_p{os.getpid()}"
    # this process's bucket dirs are temp state: best-effort removal at
    # exit so repeated runs don't grow the temp dir without bound
    _cleanup_at_exit(os.path.join(base_dir, ns))
    out: dict[str, DataFrame] = {}
    for name, (df, key) in sides.items():
        # cache key includes WHAT is cached (join key + bucket count +
        # a fingerprint of the input PLAN): a same-named side with
        # different bucketing — or different/filtered input data under
        # the same side name — gets its own table instead of silently
        # reusing the first call's layout (round-3 advice).
        plan_fp = df.semanticHash() & 0xFFFFFFFF
        # fingerprint goes into the PATH as well as the table name —
        # a same-named side with different data must get its own files,
        # not overwrite the first call's directory out from under its
        # already-returned (lazy) scan
        suffix = f"{name}_{_safe_name(key)}_{n_buckets}_{plan_fp:08x}"
        table = f"bkt_{ns}_{suffix}"
        if not spark.catalog.tableExists(table):
            write_bucketed_external(
                df,
                table,
                os.path.join(base_dir, ns, suffix),
                key,
                n_buckets,
                sort_col=key,
            )
        out[name] = spark.table(table)
    return out


_CLEANUP_REGISTERED: set[str] = set()


def _cleanup_at_exit(path: str) -> None:
    if path in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)

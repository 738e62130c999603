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

import os
import re

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
    to elide the join exchange. Table names are namespaced by sf_dir so
    sf0.01 correctness runs and sf0.1 bench runs never collide."""
    ns = _safe_name(sf_dir.strip("/"))
    out: dict[str, DataFrame] = {}
    for name, (df, key) in sides.items():
        table = f"bkt_{ns}_{name}"
        write_bucketed_external(
            df,
            table,
            os.path.join(base_dir, ns, name),
            key,
            n_buckets,
            sort_col=key,
        )
        out[name] = spark.table(table)
    return out

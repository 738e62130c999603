"""Range / interval joins via bucketed binning (SURVEY.md §2.3 J7).

A naive range join is a theta join → BroadcastNestedLoop or cartesian —
O(n·m) and a non-starter at 100 TB. The binned formulation turns it
into an EQUI-join Spark can shuffle-partition: quantize the range key
into buckets of the tolerance width, explode ONE side into its
neighboring buckets, equi-join on (partition key, bucket), then verify
the exact predicate on the (small) candidate set. A within-tolerance
pair differs by at most one bucket, so each true pair matches exactly
one exploded copy — no dedup pass needed.

The as-of join (operators/asof.py) is the 1-nearest variant of the
same trick; this module is the all-pairs-within-tolerance variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_self_join_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    tolerance_us: int,
) -> DataFrame:
    """All pairs (id_a < id_b) sharing ``key_col`` whose ``ts_col``
    differ by at most ``tolerance_us`` microseconds.

    Plan: map-side bucket quantization → explode one side ×3 → shuffle
    on (key, bucket) → filter exact |Δt| ≤ tol. Shuffle volume is 3×
    one side, never n², and the bucket key distributes by time so
    hot keys only arise from true temporal skew (then: salt, see
    operators/skew.py).
    """
    us = F.unix_micros(F.col(ts_col))
    bucket = F.floor(us / F.lit(tolerance_us))

    a = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("id_a"),
        us.alias("_us_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("_bucket"),
    )
    b = df.select(
        F.col(key_col).alias("_k2"),
        F.col(id_col).alias("id_b"),
        us.alias("_us_b"),
        bucket.alias("_bucket2"),
    )
    return (
        a.join(
            b,
            on=[
                a._k == b._k2,
                a._bucket == b._bucket2,
                a.id_a < b.id_b,
            ],
        )
        .withColumn("diff_us", F.col("_us_b") - F.col("_us_a"))
        .where(F.abs(F.col("diff_us")) <= tolerance_us)
        .select(F.col("_k").alias(key_col), "id_a", "id_b", "diff_us")
    )

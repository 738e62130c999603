"""Top-k operators (SURVEY §2 A5, §2.6).

- Global top-k: ``orderBy().limit(k)`` — Spark plans
  ``TakeOrderedAndProject``: each partition keeps a k-heap, driver
  merges k·partitions rows. No full sort, no full shuffle; optimal at
  any scale.
- Per-group top-k: window ``row_number`` — one shuffle on the group
  key, per-partition sort. At extreme skew, pre-aggregate or salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_fn: str = "row_number",
) -> DataFrame:
    """k best rows per group. ``rank_fn`` ∈ {row_number, rank, dense_rank}."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranker = getattr(F, rank_fn)()
    return (
        df.withColumn("_rk", ranker.over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )

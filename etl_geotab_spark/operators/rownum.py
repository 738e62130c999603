"""Scalable global row numbering / contiguous ids.

``row_number() OVER (ORDER BY key)`` with no PARTITION BY collapses
the whole table into ONE window partition — the canonical accidental
single-task bottleneck at scale. This operator produces the identical
numbering with no global single-partition stage:

1. range-repartition by the order key (sampled range boundaries →
   partition p holds keys strictly below partition p+1);
2. number rows WITHIN each partition (partition-local window — sorts
   only its own slice);
3. count rows per partition (tiny aggregate), prefix-sum the counts on
   the driver (one row per partition), broadcast-join the offsets back
   and add.

Total cost: one range shuffle + one per-partition sort + a
partition-count aggregate. The only driver-side data is one long per
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a contiguous 1-based global row number ordered by
    `order_cols` (must be a deterministic total order — include a
    unique tiebreak column). Equivalent to
    ``row_number() OVER (ORDER BY order_cols)`` without the
    single-partition window."""
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Materialize the range shuffle ONCE and pin it: the count job and
    # the final job must see the SAME partition assignment (a re-run
    # of repartitionByRange gets a new shuffle id → new sample seed →
    # possibly different range boundaries → wrong offsets). A plain
    # .persist() would pin it too, but its CacheManager entry lives
    # until an explicit unpersist and leaked in long-lived sessions;
    # localCheckpoint blocks are reclaimed by the ContextCleaner once
    # the result frame is garbage-collected. Availability trade, made
    # knowingly: localCheckpoint truncates lineage, so losing an
    # executor that holds blocks between the two jobs fails the query
    # (Spark's documented caveat) and the CALLER retries — acceptable
    # for a two-job helper whose window between jobs is seconds; on
    # clusters with aggressive decommissioning, prefer a reliable
    # checkpoint dir (spark.sparkContext.setCheckpointDir + .checkpoint)
    # at the cost of a DFS round-trip.
    ranged = df.repartitionByRange(n, *cols).localCheckpoint(eager=True)
    local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local_rn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*cols)
        ),
    )
    # one row per partition reaches the driver; offsets are exact
    # because range partitioning makes partition ids order-aligned
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .collect()
    )
    by_pid = {r["_pid"]: r["_cnt"] for r in counts}
    offsets, acc = [], 0
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid]
    if not offsets:  # empty input: keep the output schema stable
        offsets = [(0, 0)]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_pid", "_offset"])
    return (
        local.join(broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local_rn")))
        .drop("_pid", "_local_rn", "_offset")
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running SUM(val_col) ordered by `order_cols` (a
    deterministic total order) — ``sum(v) OVER (ORDER BY k)`` without
    the single-partition global window. Same three-step shape as
    global_row_number: range shuffle → partition-local cumsum window →
    broadcast per-partition offsets (one sum per partition reaches the
    driver). Powers rank statistics (cumulative counts over distinct
    values = min-rank) and CDF/quantile layers at any scale."""
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Same pinning rationale (and the same knowingly-made executor-
    # loss availability trade) as global_row_number above: fixes the
    # partition assignment across the totals job and the final job
    # without a CacheManager entry that outlives the call.
    ranged = df.repartitionByRange(n, *cols).localCheckpoint(eager=True)
    local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local_cum",
        F.sum(F.col(val_col)).over(
            Window.partitionBy("_pid")
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.sum(val_col).alias("_tot"))
        .collect()
    )  # bounded: one row per partition
    by_pid = {r["_pid"]: r["_tot"] for r in totals}
    offsets, acc = [], 0
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid] or 0
    if not offsets:  # empty input: keep the output schema stable
        offsets = [(0, 0)]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_pid", "_offset"])
    return (
        local.join(broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_local_cum"))
        .drop("_pid", "_local_cum", "_offset")
    )

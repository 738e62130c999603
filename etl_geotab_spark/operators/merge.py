"""Upsert (MERGE) and SCD Type-2 history operators.

ETL-engine breadth beyond the reference's scan→join→project→sink
dataflow (the reference re-submits a FULL snapshot every invocation —
task.ts:294 — i.e. its "merge" strategy is overwrite-by-replay).
These operators give the engine the incremental alternatives a
warehouse pipeline needs:

- ``upsert``: MERGE-INTO semantics (update matched keys, insert new
  ones) as a pure DataFrame composition — no table format required.
- ``scd2_from_events``: collapse a change stream into validity
  intervals (SCD Type 2), the standard dimension-history shape.

Scale notes: both are a single shuffle on the merge/business key.
``upsert`` deliberately uses union + one hash aggregate (max_by per
key) instead of a full-outer join: same result, half the shuffled
tables, and partial aggregation collapses duplicates map-side. For a
partitioned lake target you'd additionally prune the target scan to
the partitions present in the update batch (dynamic overwrite);
that pruning is the storage layer's job (io.write_partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """MERGE INTO target USING updates: rows whose key appears in
    `updates` take the update's values (full-row replace), unmatched
    update keys are inserted, unmatched target rows pass through.

    Within one call, a later batch always beats the target; duplicate
    keys INSIDE `updates` are the caller's contract to resolve first
    (dedup_latest) — we enforce it cheaply by preferring the higher
    _src, then failing closed to max_by determinism.

    One union + one hash aggregate: shuffles each input once on the
    key, no join. Column sets must match (unionByName).
    """
    cols = target.columns
    tagged = target.withColumn("_src", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_src", F.lit(1))
    )
    merged = tagged.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in cols]), F.col("_src")
        ).alias("_row")
    )
    return merged.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def scd2_from_events(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2: turn a change stream (one row
    per observed attribute state) into versioned validity intervals.

    Output = input keys/attrs plus:
      - ``valid_from``  = the change timestamp
      - ``valid_to``    = next change's timestamp (NULL = current)
      - ``is_current``  = valid_to IS NULL
      - ``version``     = 1-based change ordinal per key

    Consecutive rows with identical attrs are collapsed first (a
    change stream may re-observe an unchanged state), using lag() —
    so intervals only break on real changes.

    Cost: one shuffle on the key + per-key sort (window). At 100 TB
    dimension keys are many and small — the window partitions by the
    business key, so no skew beyond the hottest key's change count.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    collapsed = (
        changes.withColumn("_prev", F.lag(attrs).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != attrs))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        collapsed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w2))
        .select(
            *key_cols, *attr_cols,
            "valid_from", "valid_to", "is_current", "version",
        )
    )

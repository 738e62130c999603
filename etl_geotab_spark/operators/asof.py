"""As-of and range joins (SURVEY §2 J7/J8).

The reference's freshness rule — "status row counts only if within the
last hour of now" (task.ts:231, 265-267) — is a degenerate as-of join
against current_timestamp. These generalize it.

Scale design: a naive as-of is a theta-join (O(n·m)). We instead
equi-join on the key, which Spark executes as a shuffle/broadcast HASH
join, then reduce with ``max_by`` — one shuffle on the key, no
nested-loop. ``range_join`` bins timestamps so the theta predicate
becomes an equi-join on (key, bin); overlap is handled by joining each
probe row to the bins its window can touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' =
    smallest right_ts >= left_ts) within the same key, optionally
    bounded by ``tolerance`` (SQL interval string, e.g. '1 hour').
    ``tiebreak_cols`` (right-side columns) make the pick deterministic
    when several right rows share the as-of timestamp.

    Implementation: equi-join on the key (hash join), filter the time
    predicate, then one ``max_by``/``min_by`` aggregate keyed by a
    unique left-row id. Left rows with no match are kept (left outer
    semantics, matching pandas.merge_asof).
    """
    lid = "_asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    order_key = F.struct(
        F.col(right_ts), *[F.col(c) for c in (tiebreak_cols or [])]
    )
    r = right.select(
        F.col(right_on).alias("_asof_key"),
        F.col(right_ts).alias("_asof_ts"),
        order_key.alias("_asof_ord"),
        F.struct(*[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]).alias(
            "_asof_payload"
        ),
    )
    if direction == "backward":
        time_pred = F.col("_asof_ts") <= F.col(left_ts)
        if tolerance:
            time_pred = time_pred & (
                F.col("_asof_ts") >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
            )
        pick = F.max_by(F.col("_asof_payload"), F.col("_asof_ord"))
    elif direction == "forward":
        time_pred = F.col("_asof_ts") >= F.col(left_ts)
        if tolerance:
            time_pred = time_pred & (
                F.col("_asof_ts") <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
            )
        pick = F.min_by(F.col("_asof_payload"), F.col("_asof_ord"))
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    matched = (
        l.join(r, on=[l[left_on] == r["_asof_key"], time_pred], how="inner")
        .groupBy(lid)
        .agg(pick.alias("_asof_best"))
    )
    out = l.join(matched, on=lid, how="left")
    payload_cols = [
        F.col(f"_asof_best.{right_prefix}{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
    ]
    return out.select(*[F.col(c) for c in left.columns], *payload_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    extra_key: tuple[str, str] | None = None,
    bin_width_seconds: int = 3600,
) -> DataFrame:
    """Join left rows (a point column) to right rows (interval
    [start, end)) — binned so the containment predicate rides on an
    equi-join.

    Each right interval explodes into the bins it overlaps; each left
    point maps to exactly one bin; join on bin (+ optional key), then
    post-filter exact containment. With interval lengths ≲ bin width
    the blowup factor is ≤2 — the plan is a hash join, not a
    nested-loop cross product.
    """
    binl = (F.unix_timestamp(F.col(left_point)) / bin_width_seconds).cast("long")
    l = left.withColumn("_bin", binl)

    start_bin = (F.unix_timestamp(F.col(right_start)) / bin_width_seconds).cast("long")
    end_bin = (F.unix_timestamp(F.col(right_end)) / bin_width_seconds).cast("long")
    r = right.withColumn("_bin", F.explode(F.sequence(start_bin, end_bin)))

    on = [l["_bin"] == r["_bin"]]
    if extra_key:
        on.append(l[extra_key[0]] == r[extra_key[1]])
    joined = l.join(r, on=on, how="inner").where(
        (F.col(left_point) >= F.col(right_start)) & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("_bin")

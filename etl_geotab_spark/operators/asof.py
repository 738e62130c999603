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

from pyspark.sql import DataFrame, Window
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

    Implementation — the union-merge form of merge_asof: tag both
    sides, union them, and run ONE window per key ordered by
    (ts, side, tiebreaks); ``last(payload, ignorenulls)`` over the
    preceding frame (backward) or ``first`` over the following frame
    (forward) attaches the as-of right row to every left row. Left
    rows with no match are kept (left outer semantics, matching
    pandas.merge_asof).

    Why this shape: a single shuffle+sort on the key — no join, no
    re-aggregation. The earlier design (id-tag left → equi-join →
    max_by per id → re-join on id) evaluated the id-tagged plan twice;
    ``monotonically_increasing_id`` is order-dependent, so under a
    shuffled upstream the two evaluations could number rows
    differently and mis-join (round-1 ADVICE). The window form has no
    row identity at all — determinism is structural. It also beats the
    join form at 100 TB: 1 shuffle vs 3, and no candidate-set blowup
    when many right rows precede each left row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )

    # Sort order within (key, ts): for backward, right rows sort before
    # left so an equal-ts right row is visible (<= is inclusive); for
    # forward, after. Among equal-ts right rows the LAST (backward) /
    # FIRST (forward) in tiebreak order wins — matching
    # max_by/min_by((ts, *tiebreaks)) semantics. 'nearest' uses the
    # backward layout: an equal-ts right row is reached through the
    # backward candidate with gap 0, which always wins the compare.
    tb = list(tiebreak_cols or [])
    is_left = F.lit(1) if direction in ("backward", "nearest") else F.lit(0)
    is_right = F.lit(0) if direction in ("backward", "nearest") else F.lit(1)

    # A right row with NULL right_ts must never be a match in ANY
    # direction (pandas.merge_asof drops NaT right rows): null its
    # payload so last/first(ignorenulls) skips it. Without this, a
    # null-ts right row (non-null struct) could win as the only
    # backward candidate in the no-tolerance path (round-4 ADVICE).
    payload = F.when(
        F.col(right_ts).isNotNull(),
        F.struct(
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        ),
    )
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
    ]
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(
            ["_ts:" + right.schema[right_ts].dataType.simpleString()]
            + [
                f"{right_prefix}{c}:{right.schema[c].dataType.simpleString()}"
                for c in right.columns
            ]
        ) + ">"
    )

    lt = left.select(
        F.col(left_on).alias("_asof_key"),
        F.col(left_ts).alias("_asof_ts"),
        is_left.alias("_asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}") for c in tb],
        null_payload.alias("_asof_payload"),
        *[F.col(c) for c in left.columns],
        F.lit(True).alias("_asof_is_left"),
    )
    rt = right.select(
        F.col(right_on).alias("_asof_key"),
        F.col(right_ts).alias("_asof_ts"),
        is_right.alias("_asof_side"),
        *[F.col(c).alias(f"_tb_{c}") for c in tb],
        payload.alias("_asof_payload"),
        *null_left,
        F.lit(False).alias("_asof_is_left"),
    )
    both = lt.unionByName(rt)

    order = [F.col("_asof_ts"), F.col("_asof_side")] + [
        F.col(f"_tb_{c}") for c in tb
    ]
    # NULL key or NULL left ts never matches (join semantics; also keeps
    # the forward/following frame from leaking a match into null-ts
    # rows, which sort first).
    guard = F.col("_asof_key").isNotNull() & F.col("_asof_ts").isNotNull()

    if direction == "nearest":
        return _nearest(
            both, left, right, order, guard, tolerance, right_prefix
        )

    if direction == "backward":
        w = (
            Window.partitionBy("_asof_key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("_asof_payload", ignorenulls=True).over(w)
        in_tol = (
            F.col("_best._ts")
            >= F.col("_asof_ts") - F.expr(f"INTERVAL {tolerance}")
            if tolerance
            else F.lit(True)
        )
    else:
        w = (
            Window.partitionBy("_asof_key")
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first("_asof_payload", ignorenulls=True).over(w)
        in_tol = (
            F.col("_best._ts")
            <= F.col("_asof_ts") + F.expr(f"INTERVAL {tolerance}")
            if tolerance
            else F.lit(True)
        )

    out = (
        both.withColumn("_best", F.when(guard, picked))
        .where(F.col("_asof_is_left"))
        .withColumn("_best", F.when(in_tol, F.col("_best")))
    )
    payload_cols = [
        F.col(f"_best.{right_prefix}{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
    ]
    return out.select(*[F.col(c) for c in left.columns], *payload_cols)


def _nearest(
    both: DataFrame,
    left: DataFrame,
    right: DataFrame,
    order: list,
    guard,
    tolerance: str | None,
    right_prefix: str,
) -> DataFrame:
    """direction='nearest': compute BOTH the backward and the forward
    candidate in the same single shuffle+sort (two frames over one
    window ordering), then pick the temporally closer one — backward
    wins ties, matching pandas.merge_asof(direction='nearest').
    ``tolerance`` filters each candidate BEFORE the pick, so a
    too-far-but-nearer candidate cannot shadow an in-tolerance one on
    the other side. Still exactly one shuffle — the nearest variant
    costs no more than backward alone."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    w_back = (
        Window.partitionBy("_asof_key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_asof_key")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = (
        both.withColumn(
            "_back",
            F.when(guard, F.last("_asof_payload", ignorenulls=True).over(w_back)),
        )
        .withColumn(
            "_fwd",
            F.when(guard, F.first("_asof_payload", ignorenulls=True).over(w_fwd)),
        )
        .where(F.col("_asof_is_left"))
    )
    if tolerance:
        out = out.withColumn(
            "_back",
            F.when(
                F.col("_back._ts")
                >= F.col("_asof_ts") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_back"),
            ),
        ).withColumn(
            "_fwd",
            F.when(
                F.col("_fwd._ts")
                <= F.col("_asof_ts") + F.expr(f"INTERVAL {tolerance}"),
                F.col("_fwd"),
            ),
        )

    ts_type = both.schema["_asof_ts"].dataType
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        def num(c):
            return F.unix_micros(c)
    else:
        def num(c):
            return c.cast("double")

    gap_back = num(F.col("_asof_ts")) - num(F.col("_back._ts"))
    gap_fwd = num(F.col("_fwd._ts")) - num(F.col("_asof_ts"))
    choose_back = F.col("_back").isNotNull() & (
        F.col("_fwd").isNull() | (gap_back <= gap_fwd)
    )
    out = out.withColumn(
        "_best", F.when(choose_back, F.col("_back")).otherwise(F.col("_fwd"))
    )
    payload_cols = [
        F.col(f"_best.{right_prefix}{c}").alias(f"{right_prefix}{c}")
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

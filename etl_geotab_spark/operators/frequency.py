"""Distributed heavy hitters (frequent items) — sketch family (§2 A6 ext).

Two-pass candidates+recount, the mergeable-summaries shape:

1. candidates: one Misra-Gries summary (k = ⌈1/s⌉ counters) per
   partition, built inside a single mapInPandas pass. MG's guarantee —
   any item with local share ≥ s survives the summary — plus the
   averaging argument (an item with GLOBAL share ≥ s has share ≥ s in
   at least one partition) make the union of per-partition candidate
   sets a SUPERSET of every global s-heavy item. State is k counters
   per partition, never the full item-frequency table.
2. recount: exact counts for the (bounded: ≤ partitions × k) candidate
   set via a broadcast semi-join + one hash aggregate, then the exact
   share filter.

The output is therefore EXACT — same rows as a full GROUP BY HAVING —
which keeps the operator oracle-checkable, while the plan at 100 TB is
one map-side-summarized scan + one broadcast-pruned aggregate instead
of a full-vocabulary shuffle. This is how you find stopwords/boiler-
plate tokens in a pretraining corpus whose long-tail vocabulary is
itself too large to aggregate cheaply.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def misra_gries_candidates(items: DataFrame, item_col: str, s: float) -> DataFrame:
    """Distinct candidate items from per-partition Misra-Gries
    summaries with k = ⌈1/s⌉ counters.

    k must satisfy k+1 > 1/s STRICTLY: MG's survival bound is
    "frequency > n/(k+1)", so an item at share EXACTLY s (common when
    1/s is an integer — e.g. [a,a,b,b] at s=0.5) needs s > 1/(k+1) or
    it can be fully evicted and the exact recount below never sees it
    (a false negative against the >= filter). ⌈1/s⌉ gives
    k+1 ≥ 1/s + 1 > 1/s for every s.

    Batch-merge form (mergeable summaries): fold each Arrow batch's
    value_counts into the counter map, then if more than k counters
    remain subtract the (k+1)-th largest count from all and drop the
    non-positive — equivalent to item-at-a-time MG, vectorized."""
    return (
        _mg_summaries(items, item_col, s)
        .where(F.col(item_col).isNotNull())
        .select(item_col)
        .dropDuplicates([item_col])
    )


def _mg_summaries(items: DataFrame, item_col: str, s: float) -> DataFrame:
    """Per-partition MG summaries AND totals in ONE pass: k candidate
    rows (item set, ``_n`` NULL) plus one sentinel row per partition
    (item NULL, ``_n`` = non-null rows seen). r18 (guide §1.2): the
    caller's total-count used to be its own full pass over the item
    stream — the same scan that already feeds the summaries — so the
    count now rides out of this pass for free and heavy_hitters runs
    two corpus passes instead of three."""
    if not (0 < s < 1):
        raise ValueError(f"share threshold must be in (0,1), got {s}")
    k = max(1, math.ceil(1.0 / s))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        seen = 0
        for pdf in batches:
            vc = pdf[item_col].value_counts()  # drops nulls, like the join
            seen += int(vc.sum())
            for item, cnt in vc.items():
                counters[item] += int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = Counter(
                    {i: c - cut for i, c in counters.items() if c > cut}
                )
        if counters or seen:
            cands = list(counters.keys())
            yield pd.DataFrame(
                {
                    item_col: cands + [None],
                    "_n": [None] * len(cands) + [seen],
                }
            )

    return items.select(
        F.col(item_col).cast("string").alias(item_col)
    ).mapInPandas(summarize, f"{item_col} string, _n bigint")


def heavy_hitters(items: DataFrame, item_col: str, s: float) -> DataFrame:
    """Exact items with share ≥ s: MG candidate superset → broadcast
    semi-join prune → exact recount → share filter.

    Returns (item_col, cnt, share) with share rounded to 6 dp. The
    total-count scalar rides along as a 1-row broadcast cross-join so
    the plan stays lazy end to end.

    The share comparison runs in DECIMAL: float `cnt >= s*total` gets
    the ≥ boundary wrong whenever fl(s)·total rounds above the true
    product (s=0.07, total=100 → 7.000000000000001 silently drops an
    exactly-7-count item), which would defeat the k=⌈1/s⌉ candidate
    guarantee. ``s`` is quantized to 12 decimal places — thresholds
    are human-written decimals, so this is exact for any realistic s.

    NULL items are excluded up front (from the candidates, the counts,
    AND the share denominator): pandas value_counts and equi-joins both
    drop NULLs, so a NULL "group" could never be returned anyway —
    excluding it from the denominator keeps the reported shares
    consistent (shares of the non-null population). Callers who care
    about NULL mass should measure it separately."""
    typed = items.select(F.col(item_col).cast("string").alias(item_col)).where(
        F.col(item_col).isNotNull()
    )
    # ONE pass yields candidates + per-partition totals (_mg_summaries);
    # the summary is tiny (≤ partitions x (k+1) rows), so an eager
    # checkpoint serves both consumers without re-running the item
    # stream. Previously the total was its own full pass: 3 passes -> 2.
    summary = _mg_summaries(typed, item_col, s).localCheckpoint(eager=True)
    cand = (
        summary.where(F.col(item_col).isNotNull())
        .select(item_col)
        .dropDuplicates([item_col])
    )
    total = summary.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("_total")
    )
    s_dec = F.lit(round(s, 12)).cast("decimal(14,12)")
    counts = (
        typed.join(broadcast(cand), on=item_col, how="left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(broadcast(total))
        .where(F.col("cnt").cast("decimal(20,0)") >= s_dec * F.col("_total"))
        .select(
            item_col,
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_total"), 6).alias("share"),
        )
    )

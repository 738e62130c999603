"""Distributed 2-D skyline (Pareto frontier) — §2.6 family extension.

A point p is on the skyline of (maximize ``max_col``, minimize
``min_col``) iff no other point q has q.max ≥ p.max AND q.min ≤ p.min
with at least one strict inequality. Classic distributed shape
(Börzsönyi et al.'s block-nested-loop made parallel):

1. local: each partition computes its own skyline with a vectorized
   sort + group-cummax pass (O(n log n) per partition, no Python
   per-row loop). Dominance is transitive, so every GLOBAL skyline
   point survives its partition's local pass — the union of local
   skylines is a superset of the answer.
2. global: the (small — O(distinct frontier) for correlated data)
   candidate union self-anti-joins on the dominance predicate. The
   candidate side is broadcast; the anti-join is a deliberate
   broadcast nested loop over candidates only, never the input.

Exact duplicates of a frontier point are skyline members too (no
STRICT dominator exists), and both passes preserve them — the same
semantics as the NOT EXISTS oracle form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _local_skyline(
    max_col: str, min_col: str
):
    """mapInPandas kernel: partition-local skyline via sort +
    per-group cummax. A row is locally dominated iff
    A ≥ row.max (A = max over rows with strictly smaller min) or
    B > row.max (B = max over rows with min ≤ row.min)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        grp = (
            pdf.groupby(min_col)[max_col].max().sort_index()
        )  # per-min group max, ascending min
        cummax = grp.cummax()
        b = pdf[min_col].map(cummax)  # max over min' <= min
        a = pdf[min_col].map(cummax.shift(1))  # max over min' < min
        keep = ~((a.notna() & (a >= pdf[max_col])) | (b > pdf[max_col]))
        yield pdf[keep]

    return gen


def skyline_2d(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """Exact 2-D skyline of ``df`` (maximize max_col, minimize
    min_col), preserving all input columns. NULLs in either measure
    are excluded up front (dominance is undefined for them)."""
    clean = df.where(F.col(max_col).isNotNull() & F.col(min_col).isNotNull())
    schema = clean.schema
    # localCheckpoint: the candidate union feeds BOTH join sides, and a
    # broadcast subtree is not unified with a non-broadcast one by
    # ReuseExchange — without materialization the full scan + local-
    # skyline kernel would run twice. The frontier is small by
    # contract, and checkpoint blocks release on GC (no unpersist
    # bookkeeping for a lazily-returned result).
    cand = clean.mapInPandas(
        _local_skyline(max_col, min_col), schema
    ).localCheckpoint()
    dom = cand.select(
        F.col(max_col).alias("_dmax"), F.col(min_col).alias("_dmin")
    )
    dominated = (
        (F.col("_dmax") >= F.col(max_col))
        & (F.col("_dmin") <= F.col(min_col))
        & ((F.col("_dmax") > F.col(max_col)) | (F.col("_dmin") < F.col(min_col)))
    )
    return cand.join(broadcast(dom), on=dominated, how="left_anti")

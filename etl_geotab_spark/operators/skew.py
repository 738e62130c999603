"""Skew-resilient join via key salting (SURVEY.md §4 / north-star
100 TB operators).

AQE's skew-join splitting (on by default in our session) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is
the PLAN-level complement for pathological keys (one key = 30% of a
100 TB fact table): the fact side scatters each key across
``num_salts`` sub-keys via a deterministic hash of row-identifying
columns; the other side replicates each row ``num_salts`` times. For
``how`` in {'inner', 'left', 'left_semi'} the join result is IDENTICAL
to the plain join (oracle-checkable) — only the shuffle layout
changes: max partition size drops by ~num_salts at the cost of
replicating the (smaller) build side. Right/full outer joins are NOT
supported: an unmatched dim row would surface once per salt replica
(num_salts duplicates); use AQE skew handling or salt the dim side
instead for those shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str | Column,
    dim_key: str | Column,
    salt_cols: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted across ``num_salts``
    sub-partitions per key. ``salt_cols`` must identify fact rows well
    enough to spread them (any high-cardinality columns); the salt is a
    deterministic hash, so runs are reproducible.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "semi"):
        raise ValueError(
            "salted_join supports how in {'inner','left','left_semi'}: "
            f"outer sides of the replicated dim would duplicate ({how!r})"
        )
    fk = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    dk = F.col(dim_key) if isinstance(dim_key, str) else dim_key

    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts))
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>")),
    )
    joined = salted_fact.join(
        salted_dim,
        on=[fk == dk, salted_fact._salt == salted_dim._salt],
        how=how,
    )
    return joined.drop("_salt")

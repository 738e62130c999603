"""Distributed PCA over an embedding column via Gramian aggregation.

North-star extension (SURVEY.md §2.9 X2 family): dimensionality
reduction is the standard pre-step for ANN serving (project 64→8 dims
before LSH/IVF), embedding visualization, and redundancy analysis of a
training corpus.

Scale design (100 TB): the classic two-pass Gramian method —

    pass 1: ONE Arrow-batched mapInPandas scan emits per-batch partial
            sums of n, Σx (dim rows) and ΣxxT (dim² rows) keyed by
            flat index; a tiny groupBy merges them. Shuffle volume is
            dim²×batches and the driver collects exactly dim²+dim+1
            rows — bounded by DIMENSION, never by N.
    driver: eigendecomposition of the dim×dim covariance (64×64 here —
            microseconds; even 4096-dim is a <1 s driver op).
    pass 2: projection is a vectorized pandas UDF matmul per batch
            with the (dim×k) component matrix closed over (broadcast
            by Spark's task serialization — KBs).

Determinism: eigenvector SIGN is fixed by forcing the largest-|coeff|
entry of each component positive (np.linalg.eigh is deterministic for
a given matrix, but the matrix itself depends on float summation order
across partitions → results are stable to ~1e-12, not bit-exact; the
queries()/tests layer treats PCA as rows-only + quality-gated).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partials(vec_col: str):
    """mapInPandas kernel: per batch emit flat-indexed partial sums —
    idx 0 = count, idx 1..dim = Σx, idx dim+1.. = row-major ΣxxT.
    (Everything is derived from the batch shape; NULL vectors are
    filtered upstream in fit_pca.)"""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            gram = x.T @ x  # (dim × dim) BLAS
            vals = np.concatenate(
                ([float(x.shape[0])], x.sum(axis=0), gram.ravel())
            )
            yield pd.DataFrame(
                {"idx": np.arange(vals.size, dtype=np.int64), "s": vals}
            )

    return gen


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on the corpus; returns (mean[dim], components[k,dim],
    explained_variance_ratio[k]). One distributed pass + one driver
    eigh of a dim×dim matrix."""
    vecs = df.select(vec_col).where(F.col(vec_col).isNotNull())
    dim = len(vecs.first()[0])
    rows = (
        vecs
        .mapInPandas(_gram_partials(vec_col), schema="idx long, s double")
        .groupBy("idx")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    flat = np.zeros(1 + dim + dim * dim)
    for r in rows:
        flat[r["idx"]] = r["s"]
    n = flat[0]
    mean = flat[1 : 1 + dim] / n
    gram = flat[1 + dim :].reshape(dim, dim)
    # covariance from the Gramian: E[xxT] - mean meanT
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k × dim)
    # sign convention: largest-|coeff| entry positive
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov))
    ratio = np.maximum(evals[order], 0.0) / total_var
    return mean, comps, ratio


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Append the k-dim projection column: one vectorized matmul per
    Arrow batch; the (k×dim) matrix ships in the task closure."""
    from pyspark.sql.functions import pandas_udf

    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)  # (k × dim)

    @pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        # NULL vectors project to NULL (np.asarray would die on None)
        mask = vecs.notna()
        out = pd.Series([None] * len(vecs), dtype=object, index=vecs.index)
        if mask.any():
            x = np.asarray(list(vecs[mask]), dtype=np.float64)
            proj = (x - mu) @ w.T
            out.loc[mask] = pd.Series(
                list(proj), index=vecs.index[mask], dtype=object
            )
        return out

    return df.withColumn(out_col, _proj(F.col(vec_col)))

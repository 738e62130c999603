"""Vector expressions over ``array<float>`` embedding columns (SURVEY §2 X2).

All built from higher-order functions (``zip_with`` / ``aggregate``) so
the similarity math runs JVM-side — no Python round-trip per row. At
100 TB this matters: a Pandas-UDF cosine is Arrow-batched but still
serializes every embedding; these expressions never leave Tungsten.
Cast to double before multiplying to avoid float32 accumulation drift
vs the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double precision)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double precision."""
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = a·b / (‖a‖‖b‖); NULL-safe on zero vectors (NaN-free:
    returns NULL when either norm is 0)."""
    num = dot_product(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, num / denom)


def unit_vector(a: Column | str) -> Column:
    """a/‖a‖ in double precision; NULL for zero vectors.

    The cosine of two unit vectors is their plain dot product, so
    normalizing each row ONCE turns per-PAIR scoring from three
    interpreted-HOF aggregates (dot + both norms — higher-order
    functions are CodegenFallback, so each is an interpreted loop)
    into one. Any operator that scores many pairs per row (ANN bucket
    joins, IVF probes) should pre-project this and score with
    ``dot_product``. NULL (not a div-by-zero Inf/NaN vector, which
    Spark would sort FIRST under desc because NaN > any double) keeps
    zero-vector rows ranked last, matching ``cosine_similarity``'s
    NULL-on-zero-norm contract."""
    v = F.transform(_c(a), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(nrm != 0, F.transform(v, lambda x: x / nrm))

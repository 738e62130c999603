"""Expression builders — all JVM-side built-ins, no Python UDFs.

Every function here returns a ``Column`` composed of
``pyspark.sql.functions`` primitives, so it stays inside whole-stage
codegen on the hot path.
"""

from etl_geotab_spark.functions.scalar import (
    js_coalesce,
    callsign,
    kmh_to_ms,
    surrogate_key,
    geojson_point,
    haversine_km,
)
from etl_geotab_spark.functions.vector import (
    dot_product,
    l2_norm,
    cosine_similarity,
)
from etl_geotab_spark.functions.text import (
    tokenize,
    token_count,
    char_ngrams,
    word_shingles,
    quality_punct_ratio,
    quality_stopword_ratio,
    doc_fingerprint,
)

__all__ = [
    "js_coalesce",
    "callsign",
    "kmh_to_ms",
    "surrogate_key",
    "geojson_point",
    "haversine_km",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "tokenize",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "quality_punct_ratio",
    "quality_stopword_ratio",
    "doc_fingerprint",
]

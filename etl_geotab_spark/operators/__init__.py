"""Relational + LLM-pipeline operators.

Each operator is a DataFrame→DataFrame function composed of built-in
Spark ops; Catalyst sees through all of them (pushdown/pruning work
across operator boundaries).
"""

from etl_geotab_spark.operators.dedup import (
    dedup_latest,
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from etl_geotab_spark.operators.topk import top_k_per_group, top_k_global
from etl_geotab_spark.operators.asof import asof_join, range_join
from etl_geotab_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_ann,
    embedding_near_dup_pairs,
)
from etl_geotab_spark.operators.pca import fit_pca, project
from etl_geotab_spark.operators.pagerank import pagerank

__all__ = [
    "dedup_latest",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "top_k_per_group",
    "top_k_global",
    "asof_join",
    "range_join",
    "cosine_topk_bruteforce",
    "lsh_bucketed_ann",
    "embedding_near_dup_pairs",
    "fit_pca",
    "project",
    "pagerank",
]

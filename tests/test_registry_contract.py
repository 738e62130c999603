"""Harness-contract lint over the query registry (round-9 verdict #2).

The correctness driver canonicalizes every result with pandas
``sort_values`` over all columns. Oracle-paired queries prove their
output is canonicalizable every time they hash green, but rows-only
queries (no ``oracle_sql`` entry) only ever hit the rows-only path —
and that path still canonicalizes. A top-level ``array``/``map``/
``struct`` column is unhashable in pandas sorting and turns the row
into an ``err`` (the round-8 ``pca_project`` red, the repo's first).

This lint makes the second instance impossible: every rows-only
query's output schema must be scalar at the top level. It builds each
plan at sf0.001, so it also doubles as a plan-constructibility smoke
for the rows-only tier. Mostly that is analysis-only (no jobs), but
not action-free: some queries run bounded driver work during plan
CONSTRUCTION (e.g. ``pca_project``'s dim²-bounded Gramian collect +
driver eigh happen inside ``fit_pca`` before the returned plan
exists), so expect a few Spark jobs while this test runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_geotab_spark.queries import oracle_sql, queries

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _complex_columns(schema: T.StructType) -> list[str]:
    """Names of top-level columns the driver canonicalizer cannot
    sort (pandas ``sort_values`` raises ``unhashable type`` on
    list/dict-valued cells)."""
    return [f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)]


def _rows_only_names() -> list[str]:
    paired = set(oracle_sql())
    return [n for n in queries() if n not in paired]


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_schema_is_canonicalizable(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    bad = _complex_columns(df.schema)
    assert not bad, (
        f"rows-only query {name!r} returns top-level complex column(s) "
        f"{bad}: the driver's rows-only canonicalizer pandas-sorts all "
        f"columns and dies on array/map/struct cells (the r8 pca_project "
        f"err). Posexplode / to_json the column to scalars."
    )


def test_complex_column_checker_flags_by_construction(spark):
    """Failing-by-construction case: the checker must flag exactly the
    shapes that killed the r8 driver row (array), plus map and struct,
    and pass scalars through."""
    df = spark.sql(
        "SELECT 1 AS ok_int, 'x' AS ok_str,"
        " array(1.0d, 2.0d) AS bad_arr,"
        " map('k', 1) AS bad_map,"
        " named_struct('a', 1) AS bad_struct"
    )
    assert _complex_columns(df.schema) == ["bad_arr", "bad_map", "bad_struct"]


def test_rows_only_tier_is_the_expected_set():
    """The rows-only tier is a deliberate, frozen list (each entry has
    a pytest/ground-truth gate instead of a DuckDB oracle — see the
    SURVEY.md §2 rows-only legend). A new name landing here unreviewed
    usually means someone forgot the oracle; dropping one silently
    would weaken the ledger. Update this list only alongside the gate
    that replaces the oracle."""
    expected = {
        "ann_recall_eval",
        "approx_distinct",
        "approx_percentiles",
        "bpe_learn_merges",
        "forecast_backtest",
        "hll_sketch_rollup",
        "holt_forecast",
        "ivf_ann_topk",
        "kmeans_embeddings",
        "logreg_train",
        "lsh_ann_topk",
        "minhash_near_dup",
        "minhash_recall_eval",
        "ndcg_eval",
        "pagerank_parts",
        "pca_project",
        "simhash_near_dup",
    }
    assert set(_rows_only_names()) == expected

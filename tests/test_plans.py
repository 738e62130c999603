"""Physical-plan regression gate (SURVEY.md §4): every registered
query's explain() is audited for accidental cartesian/nested-loop
joins, lost parquet predicate pushdown, unpruned scans, missing
map-side partial aggregation, and expected join strategies.

Plans only — nothing executes — so the whole registry audits in one
test at sf0.001. A failure here means a plan regressed (e.g. a filter
stopped reaching the scan), which bench numbers would only show later
and at much higher cost.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.explain_audit import audit_plans  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_all_query_plans_clean(spark):
    failures = audit_plans(spark, SF_DIR, verbose=False)
    assert not failures, f"plan violations: {failures}"


def test_dead_exemption_sweep_is_sf_pinned():
    """The dead-exemption sweep's liveness verdict must come from ONE
    canonical sf_dir regardless of where the full audit ran (r16
    advice: the pytest gate at sf0.001 and the CLI at sf0.01
    disagreed whenever an exempted pattern was SF-dependent). Pin
    the constant and keep it aligned with the CLI default so the
    common roundcheck path reuses its own plans."""
    from tools import explain_audit

    assert explain_audit.SWEEP_SF_DIR == "/root/testdata/sf0.01"
    import inspect

    src = inspect.getsource(explain_audit.main)
    assert '"/root/testdata/sf0.01"' in src  # CLI default == canonical


def test_private_api_seams_pinned(spark):
    """r17 verdict item 9: _spread_adaptive/_fits_broadcast and the
    block-release helpers (blocks.py) reach into private PySpark seams
    (_jdf.queryExecution, _jsparkSession.sessionState, _jsc
    .getPersistentRDDs) and silently fall back on exception — correct
    degradation, but a PySpark upgrade that breaks a seam would then
    silently disable every gated hint / leak every block. This test
    makes the seams fail LOUDLY: each accessor must return a sane
    value on the pinned PySpark."""
    from pyspark.sql import functions as F

    from etl_geotab_spark.queries import _fits_broadcast, _spread_adaptive

    df = spark.range(1000).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    # stats seam: the optimizer's own size estimate, directly
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert est > 0
    # conf seam: the session threshold accessor (64MB session default)
    thr = int(
        spark._jsparkSession.sessionState()
        .conf()
        .autoBroadcastJoinThreshold()
    )
    assert thr > 0
    # end-to-end: a 1000-row frame fits 64MB, so the gate must fire...
    assert _fits_broadcast(df) is True
    # ...and the adaptive spread must clamp a KB-scale frame to 1
    # partition (stats seam alive), never the full-parallelism fallback
    assert _spread_adaptive(df).rdd.getNumPartitions() == 1


def test_block_release_helpers(spark):
    """blocks.py (r17 verdict item 3): release_checkpoint frees a
    localCheckpoint's blocks, no-ops on a plain projection, and
    release_all_cached leaves ZERO persisted RDDs in the session —
    the per-query-exit invariant the bench hook relies on."""
    from pyspark.sql import functions as F

    from etl_geotab_spark.blocks import (
        persistent_rdd_count,
        release_all_cached,
        release_checkpoint,
    )

    release_all_cached(spark)  # start clean
    base = persistent_rdd_count(spark)
    assert base == 0

    ck = spark.range(100).select(F.col("id") * 2).localCheckpoint(eager=True)
    assert persistent_rdd_count(spark) == base + 1
    # a projection over the checkpoint is NOT releasable via the seam
    assert release_checkpoint(ck.select("*").withColumn("x", F.lit(1))) is False
    assert persistent_rdd_count(spark) == base + 1
    # the checkpoint itself is
    assert release_checkpoint(ck) is True
    assert persistent_rdd_count(spark) == base

    # release_all_cached: catalog cache + surviving checkpoint blocks
    spark.range(50).persist().count()
    spark.range(60).localCheckpoint(eager=True)
    assert persistent_rdd_count(spark) >= 2
    release_all_cached(spark)
    assert persistent_rdd_count(spark) == 0


def test_iterative_operators_bound_pinned_blocks(spark):
    """The iterative operators (pagerank, connected components, BPE)
    release each superseded round's checkpoint (guide §5): after the
    result materializes, the session must hold O(1) pinned RDDs —
    loop-invariants plus the final state — never O(rounds) copies."""
    from pyspark.sql import functions as F

    from etl_geotab_spark.blocks import persistent_rdd_count, release_all_cached
    from etl_geotab_spark.operators.clusters import connected_components
    from etl_geotab_spark.operators.pagerank import pagerank

    release_all_cached(spark)
    # chain graph 0-1-2-...-9 plus an isolated dangling edge: >=3 CC
    # rounds, 8 pagerank rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    comps = connected_components(pairs)
    comps.write.format("noop").mode("overwrite").save()
    # edges + final labels only (each round released its predecessor)
    assert persistent_rdd_count(spark) <= 3
    release_all_cached(spark)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    ranks = pagerank(edges, iters=8)
    ranks.write.format("noop").mode("overwrite").save()
    # loop-invariants (nodes, e_deg, dangling) + final ranks; the raw
    # edge checkpoint and all 7 superseded rank rounds are released
    assert persistent_rdd_count(spark) <= 4
    n = release_all_cached(spark)
    assert n >= 1
    assert persistent_rdd_count(spark) == 0

"""Empirical 10x scale validation (round-5 VERDICT #4): generate a
sf1-equivalent dataset (10x sf0.1) and run the most expensive
operator families at both scales, recording per-query wall time —
cold (first run at an SF, includes per-SF index/scratch builds) and
warm (best-of-2, steady state; the gated tier) — and the sf1/sf0.1
ratio per tier to ``BENCH_SF1.json``. See ``cold_warm`` for why two
tiers.

Usage:
    python tools/scale_stress.py gen       # build scratch_sf1/ (once)
    python tools/scale_stress.py run       # time queries, write BENCH_SF1.json
    python tools/scale_stress.py exponent  # 3-point exponent fit (top scalers)

Why synthesized replicas: the driver ships sf{0.001,0.01,0.1} only;
validating the "banded joins scale ~linearly" design claims needs a
10x input. The generator unions 10 KEY-SHIFTED, CONTENT-DISJOINT
copies of sf0.1 so that per-key/per-entity structure is preserved
(each replica looks exactly like sf0.1) while cross-replica
similarity is engineered AWAY — otherwise 10 verbatim copies would
make every document a 10-way near-duplicate and every customer a
10-way fuzzy match, and pair volume would grow quadratically by
construction rather than measuring the operators:

- join keys get per-replica offsets, applied CONSISTENTLY across
  tables (o_custkey and c_custkey shift together, etc.);
- document text prefixes every token with a replica tag, so replica
  vocabularies are disjoint: shingle/MinHash/n-gram candidate
  generation finds the same pairs WITHIN each replica and none
  across — the linear-scaling regime these operators claim;
- customer names get a TWO-char replica tag inside the blocking
  substring, so entity blocks never span replicas and cross-replica
  Levenshtein distance is >= 2 (no phantom entities);
- embeddings get a per-replica, per-dimension deterministic offset
  (direction change, not scaling) so ANN/k-means see 10x distinct
  vectors, not 10 copies at cosine 1.0.

Pass criterion (recorded, judged against BASELINE.md): every
linear-design query finishes within ~10x its sf0.1 time on the same
box. ``grid_spatial_join`` is exempt and annotated: 10x points in a
FIXED geographic area is 10x density, so within-radius pair count
(its OUTPUT) grows ~100x — that is the physics of the question, not
a plan defect; its banded plan is still the right one at constant
density.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_geotab_spark.io import load_table  # noqa: E402
from etl_geotab_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scratch_sf1"
)
REPLICAS = 10

# per-key-kind offsets, far above any sf0.1 key range
KO = 10**9   # orderkey
KC = 10**7   # custkey
KP = 10**7   # partkey
KS = 10**6   # suppkey
KE = 10**9   # event id
KU = 10**8   # user id
KD = 10**7   # doc id
KV = 10**7   # vec id

STRESS = [
    # dedup family (banded/bucketed candidate generation)
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "cross_corpus_dedup",
    "doc_winnow_fingerprints",
    "boilerplate_ngram_ratio",
    "dedup_keep_best",
    # similarity family (index builds + bucketed probes)
    "kmeans_embeddings",
    "lsh_ann_topk",
    "ivf_ann_topk",
    # graph / recursion / ER (iterative shuffles, lineage truncation)
    "pagerank_parts",
    "recursive_order_chains",
    "entity_resolution",
    # spatial (density-bound: see module docstring)
    "grid_spatial_join",
    # round-7 extension (round-6 VERDICT #4): every remaining query
    # >2 s at sf0.1 gets a measured ratio — eval baselines (fixed
    # probe sets, cost linear in corpus), the bucketed/salted join
    # pair, streaming drains, stats/eval sweeps, scan-heavy TPC-H Q1
    "ndcg_eval",
    "minhash_recall_eval",
    "bucketed_colocated_join",
    "geotab_stream_pipeline",
    "streaming_stream_join",
    "spearman_correlation",
    "linear_fit_stats",
    "zonemap_pruning_eval",
    "contrastive_pairs",
    "salted_skew_join",
    "cohens_kappa",
    "pricing_summary",
    "semdedup_buckets",
    "multimodal_decode_stats",
    "triangle_count",
    # round-8 extension: the two probe sides the §16 lint caught
    # (fixed %100 stride → probes ∝ n ⇒ n²/100 broadcast-scored work;
    # now max(100, n//20) ⇒ ≤20 probes absolute) — measured so the
    # boundedness claim is empirical, not static-analysis-only
    "knn_accuracy",
    "quantized_rescore_topk",
    # round-15 extension: the stress list froze at round 8, but the
    # registry grew ~100 queries through r13 — eight of them now run
    # >2 s at sf0.1 (BENCH_FULL at the r15 close) and had never been
    # measured at 10x. Every current >2 s query is stress-covered
    # again after this block.
    "bpe_learn_merges",
    "hotspot_regions",
    "stateful_user_stats",
    "logreg_train",
    "decile_lift",
    "quality_filter_pipeline",
    "market_share",
    "linear_interpolate",
    # ... and the 1.5-2 s band added since round 8, so the next
    # queries to cross 2 s are already measured rather than waiting
    # for the threshold.
    "bloom_semi_join",
    "streaming_sliding_window",
    "tfidf_top_terms",
    "repeated_spans",
    "pca_project",
    "streaming_session_window",
    "simhash_near_dup",
    "nested_assembly",
    "join_large_fact",
    "percentiles",
    "contamination_overlap",
    "mad_outliers",
]
DENSITY_BOUND = {"grid_spatial_join"}

# Three-point exponent tier (r15 verdict item 2): the top sf1
# warm-ratio scalers from the r15 BENCH_SF1 refresh (grid 8.58,
# recursive 6.52, semdedup 6.12, salted 4.86, decile 4.53). Two
# scale points cannot distinguish n.log n from n^2; timing these at
# sf0.01 / sf0.1 / sf1 in ONE session and fitting log t vs log INPUT
# ROWS gives a measured scaling exponent for the 100x extrapolation.
#
# The x-axis is the ROW COUNT of each query's dominant input table,
# counted live per directory — NOT the nominal sf. The fixtures are
# SF-stepped for some tables (embeddings: 500 at sf0.01 -> 2000 at
# sf0.1 -> 20000 at sf1, i.e. 4x then 10x), so an sf x-axis would
# log a 0.6-decade data step as a full decade and deflate the
# fitted exponent by ~40% on that segment (r16 review finding).
# Counting live also volume-gates ALL THREE directories — a
# truncated sf0.01 fixture fails the pinned-count assertion instead
# of silently timing pure overhead.
EXPONENT_TIER = [
    # r16: the five worst warm 10x scalers
    "grid_spatial_join",
    "recursive_order_chains",
    "semdedup_buckets",
    "salted_skew_join",
    "decile_lift",
    # r17 extension (r16 verdict item 3): every remaining stress
    # member with warm ratio >= 2 and > 1 s sf1 time — a single 10x
    # ratio cannot distinguish n.log n from n^1.3, three points can
    "cross_corpus_dedup",
    "stateful_user_stats",
    "contrastive_pairs",
    "ngram_jaccard_pairs",
    "streaming_session_window",
    "triangle_count",
    "bucketed_colocated_join",
    "contamination_overlap",
    "market_share",
    "minhash_near_dup",
    "boilerplate_ngram_ratio",
    "tfidf_top_terms",
    "pagerank_parts",
]
# dominant input per tier query (the table whose cardinality drives
# the work; verified against each q_* implementation)
EXPONENT_PRIMARY = {
    "grid_spatial_join": "orders",
    "recursive_order_chains": "orders",
    "semdedup_buckets": "embeddings",
    "salted_skew_join": "lineitem",
    "decile_lift": "orders",
    "cross_corpus_dedup": "documents",
    "stateful_user_stats": "events",
    "contrastive_pairs": "embeddings",
    "ngram_jaccard_pairs": "documents",
    "streaming_session_window": "events",
    "triangle_count": "lineitem",
    "bucketed_colocated_join": "lineitem",
    "contamination_overlap": "documents",
    "market_share": "lineitem",
    "minhash_near_dup": "documents",
    "boilerplate_ngram_ratio": "documents",
    "tfidf_top_terms": "documents",
    "pagerank_parts": "lineitem",
}
SRC_SMALL = "/root/testdata/sf0.01"
# pinned primary-input cardinalities for the two driver fixtures,
# from the shared single source (tools/fixture_volumes.py); the
# scratch_sf1 side is pinned transitively by assert_replica_volume
# (exactly REPLICAS x the sf0.1 count).
from fixture_volumes import EXPECTED_ROWS as _FIXTURE_ROWS  # noqa: E402

EXPECTED_PRIMARY_ROWS = {
    SRC_SMALL: _FIXTURE_ROWS["sf0.01"],
    SRC: _FIXTURE_ROWS["sf0.1"],
}
# Gate line: a measured exponent above this on a NON-density-bound
# query means the 10x ratio was hiding super-(n.log n) growth —
# ratio 10 at 10x data is exponent 1.0; 1.3 allows n.log n plus
# band noise but flags anything quadratic-shaped (exponent 2.0).
EXPONENT_GATE = 1.3

# exact expected replica multiplicity per table (gen() contract)
TABLES = (
    "nation", "region",
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)
DIM_TABLES = {"nation", "region"}


def fit_exponent(points: list[tuple[float, float]]) -> dict:
    """Least-squares scaling exponent from (scale, seconds) pairs.

    Returns ``{"exponent", "exponent_head", "exponent_tail"}`` —
    the log-log least-squares slope over ALL points plus the two
    segment slopes (head = smallest pair, tail = largest pair).
    The tail slope is the one that matters for extrapolation: fixed
    per-query overhead (session, planning, worker pool) dominates
    the smallest scale point and FLATTENS the head segment, which
    deflates the whole-curve fit — so the stress gate reads
    ``max(exponent, exponent_tail)``, never the fit alone.

    Any non-positive timing means a failed probe: returns all-None
    (stamped, not ridden as a numeric — the bench.py
    ``sustain_failed`` pattern). Duplicate x values are the same
    contract: if any two points share a scale (an SF-stepped table
    flat across adjacent dirs, e.g. documents = 500 at both sf0.001
    and sf0.01) the slope is undefined there, so the probe fails
    all-None instead of raising (r16 advice).
    """
    import math

    pts = sorted(points)
    if len(pts) < 2 or any(t <= 0 or s <= 0 for s, t in pts):
        return {"exponent": None, "exponent_head": None,
                "exponent_tail": None}
    if any(a[0] == b[0] for a, b in zip(pts, pts[1:])):
        return {"exponent": None, "exponent_head": None,
                "exponent_tail": None}
    xs = [math.log10(s) for s, _ in pts]
    ys = [math.log10(t) for _, t in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    var = sum((x - mx) ** 2 for x in xs)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / var
    seg = lambda a, b: (  # noqa: E731
        (math.log10(pts[b][1]) - math.log10(pts[a][1]))
        / (math.log10(pts[b][0]) - math.log10(pts[a][0]))
    )
    return {
        "exponent": round(slope, 3),
        "exponent_head": round(seg(0, 1), 3),
        "exponent_tail": round(seg(len(pts) - 2, len(pts) - 1), 3),
    }


def exponent_flags(rows: dict[str, dict]) -> list[str]:
    """Names whose measured exponent breaches the gate. The gate
    basis is max(fit, tail) — see fit_exponent — and density-bound
    queries are exempt from the BREACH check (their OUTPUT grows
    superlinearly by the physics of the question, documented in the
    module docstring). A failed probe (None exponent) flags
    UNCONDITIONALLY, density-bound included: an unmeasured tier
    member must never read as a pass (r16 review: the exemption
    covers a measured-but-steep curve, not a missing measurement)."""
    out = []
    for name, row in sorted(rows.items()):
        e, t = row.get("exponent"), row.get("exponent_tail")
        if e is None or t is None:
            out.append(name)
            continue
        if row.get("density_bound"):
            continue
        if max(e, t) > EXPONENT_GATE:
            out.append(name)
    return out


def merge_exponent_carryforward(doc: dict, prev: dict) -> int:
    """Carry exponent-pass fields from the prior BENCH_SF1.json into
    a freshly-built ``doc`` (mutated in place); returns the number of
    rows carried.

    Exponent fields are a self-contained measurement (all three
    points timed in one session, recorded in exponent_points) so a
    run() refresh does not invalidate them, and dropping them
    silently would un-close the two-point-scaling blind spot the
    tier exists for. If prev carried an exponent verdict but NO tier
    name survives into the new run, the rewrite drops
    exponent_gate/exponent_failures entirely — shout, don't swallow
    (r16 advice)."""
    prev_had_exponent = any(
        "exponent" in row for row in prev.get("queries", {}).values()
    )
    kept = 0
    for name, row in prev.get("queries", {}).items():
        if "exponent" in row and name in doc["queries"]:
            doc["queries"][name].update(
                {k: v for k, v in row.items()
                 if k.startswith("exponent")}
            )
            kept += 1
    if prev_had_exponent and not kept:
        print(
            "WARNING: prior BENCH_SF1.json had exponent rows but "
            "none match this run's STRESS tier — the exponent "
            "verdict is being DROPPED; re-run "
            "`scale_stress.py exponent` before trusting the file",
            file=sys.stderr,
        )
    if kept:
        # recompute the gate verdict from the CARRIED rows and
        # the CURRENT code constant — copying prev's verdict
        # verbatim could report a gate value no longer in force
        # or flag a name whose row was dropped (r16 review)
        doc["exponent_gate"] = EXPONENT_GATE
        doc["exponent_failures"] = exponent_flags({
            n: r for n, r in doc["queries"].items()
            if "exponent" in r
        })
        print(f"kept exponent fields for {kept} queries from the "
              "prior exponent pass (re-run `exponent` to refresh)")
    return kept


def assert_replica_volume(spark) -> None:
    """Row-count EQUALITY gate on the stress inputs (the r15 §26b
    pattern): every fact table in scratch_sf1 must hold exactly
    REPLICAS x its sf0.1 count, dims exactly 1x. Non-emptiness is
    not enough — the r15 streaming-fixture bug drained an EMPTY
    stream for nine rounds while passing every non-empty check, so
    any harness that ASSUMES an input volume now asserts it."""
    for table in TABLES:
        base = load_table(spark, SRC, table).count()
        big = load_table(spark, OUT, table).count()
        want = base * (1 if table in DIM_TABLES else REPLICAS)
        if big != want:
            raise AssertionError(
                f"scratch_sf1/{table}: {big} rows, want {want} "
                f"(= {base} sf0.1 rows x "
                f"{1 if table in DIM_TABLES else REPLICAS}) — "
                "stress inputs are not the volume the ratios claim; "
                "re-run `python tools/scale_stress.py gen`"
            )


def gen() -> None:
    spark = get_spark("etl-geotab-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    def shifted(table: str, r: int) -> DataFrame:
        t = load_table(spark, SRC, table)
        rr = F.lit(r).cast("long")
        tag = chr(ord("A") + r) * 2  # 'AA', 'BB', ... (>=2 edits apart)
        if table == "customer":
            name = (
                t["c_name"]
                if r == 0
                else F.concat(
                    F.lit("Customer#" + tag),
                    F.substring("c_name", 12, 64),
                )
            )
            return t.select(
                (t.c_custkey + rr * KC).alias("c_custkey"),
                name.alias("c_name"),
                "c_nationkey", "c_acctbal", "c_mktsegment",
            )
        if table == "supplier":
            return t.withColumn("s_suppkey", t.s_suppkey + rr * KS)
        if table == "part":
            return t.withColumn("p_partkey", t.p_partkey + rr * KP)
        if table == "orders":
            return t.withColumn(
                "o_orderkey", t.o_orderkey + rr * KO
            ).withColumn("o_custkey", t.o_custkey + rr * KC)
        if table == "lineitem":
            return (
                t.withColumn("l_orderkey", t.l_orderkey + rr * KO)
                .withColumn("l_partkey", t.l_partkey + rr * KP)
                .withColumn("l_suppkey", t.l_suppkey + rr * KS)
            )
        if table == "events":
            return t.withColumn(
                "event_id", t.event_id + rr * KE
            ).withColumn("user_id", t.user_id + rr * KU)
        if table == "documents":
            text = (
                t["text"]
                if r == 0
                else F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(F.lit(f"q{r}"), w),
                    ),
                    " ",
                )
            )
            return t.select(
                (t.doc_id + rr * KD).alias("doc_id"),
                text.alias("text"),
                "lang", "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        if table == "embeddings":
            emb = (
                t["embedding"]
                if r == 0
                else F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.lit(0.05 * r)
                        * F.cos(i.cast("double") * 2.7 + F.lit(float(r)))
                    ).cast("float"),
                )
            )
            return t.select(
                (t.vec_id + rr * KV).alias("vec_id"),
                emb.alias("embedding"),
                "label",
            )
        return t  # nation / region: dims, copied once

    for table in (
        "nation", "region",
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ):
        dst = os.path.join(OUT, f"{table}.parquet")
        n_rep = 1 if table in ("nation", "region") else REPLICAS
        parts = [shifted(table, r) for r in range(n_rep)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(dst)
        print(f"wrote {dst} ({n_rep}x)")


def cold_warm(run_once, n: int = 2) -> tuple[float, float]:
    """(first, min) of ``n`` calls to ``run_once()`` (each returns
    elapsed seconds). Two tiers because they answer two different
    scaling questions and conflating them corrupts ratios both ways:

    - COLD (first call at an SF) includes the per-(process, SF)
      one-time work — _materialize_once index/scratch builds, the
      streaming drains' checkpoint/state-store init — whose scaling
      with data IS part of the 100 TB story (an index build that
      went quadratic would surface only here). It also includes
      process-level noise (worker-pool spin-up, codegen) that lands
      on whichever query runs first: at the r15 refresh the cold
      first run of minhash_near_dup measured 74.8 s vs 10.4 s warm.
    - WARM (best of n) is the steady-state query path with builds
      amortized — how BENCH_FULL measures (best over runs), and the
      tier the within_10x gate uses; cold ratios are recorded for
      adjudication but gated loosely (a cold base inflated by
      first-in-process costs DEFLATES the ratio, so a strict cold
      gate would pass for the wrong reason, and builds legitimately
      amortize across queries at scale)."""
    times = [run_once() for _ in range(n)]
    return times[0], min(times)


def _timed(spark, qs, name: str, sf_dir: str) -> tuple[float, float]:
    def run_once() -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        return dt

    return cold_warm(run_once)  # see cold_warm: two-tier ratios


def run() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("etl-geotab-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def timed(name: str, sf_dir: str) -> tuple[float, float]:
        return _timed(spark, qs, name, sf_dir)

    # input-volume gate BEFORE any timing: a partial or stale
    # scratch_sf1 would silently deflate every ratio (see
    # assert_replica_volume). Also warms both directories' file
    # listings + the Python worker pool, which the old warm-up did.
    assert_replica_volume(spark)
    out: dict[str, dict] = {}
    for name in STRESS:
        base_cold, base = timed(name, SRC)
        big_cold, big = timed(name, OUT)
        ratio = round(big / base, 2) if base > 0 else -1.0
        ratio_cold = round(big_cold / base_cold, 2) if base_cold > 0 else -1.0
        out[name] = {
            "sf0.1_sec": base,
            "sf1_sec": big,
            "ratio": ratio,
            "sf0.1_cold_sec": base_cold,
            "sf1_cold_sec": big_cold,
            "ratio_cold": ratio_cold,
            "density_bound": name in DENSITY_BOUND,
            # gate on the warm (steady-state) tier; see cold_warm
            "within_10x": ratio <= 10.0 or name in DENSITY_BOUND,
        }
        print(json.dumps({name: out[name]}))

    fails = [n for n, v in out.items() if not v["within_10x"]]
    path = os.path.join(
        os.path.dirname(OUT), "BENCH_SF1.json"
    )
    doc = {
        "sf_base": 0.1,
        "sf_big": 1.0,
        "replicas": REPLICAS,
        "queries": out,
        "superlinear_failures": fails,
    }
    if os.path.exists(path):
        merge_exponent_carryforward(doc, json.load(open(path)))
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {path}; superlinear failures: {fails or 'none'}")


def exponent() -> None:
    """Time the EXPONENT_TIER queries at sf0.01 / sf0.1 / sf1 —
    warm tier, one session, interleaved per query so all three
    points share a box phase — fit the scaling exponent over the
    PRIMARY-INPUT ROW COUNT (see EXPONENT_TIER: the sf label is not
    proportional to data for SF-stepped tables), and merge the
    fields into the BENCH_SF1.json rows. Gate:
    ``exponent_failures`` lists any non-density-bound tier member
    with max(fit, tail) > EXPONENT_GATE, plus ANY failed probe."""
    import __spark_entry__ as entrymod

    spark = get_spark("etl-geotab-scale-exponent")
    spark.sparkContext.setLogLevel("ERROR")
    assert_replica_volume(spark)  # pins OUT = REPLICAS x SRC
    qs = entrymod.queries()

    path = os.path.join(os.path.dirname(OUT), "BENCH_SF1.json")
    doc = json.load(open(path)) if os.path.exists(path) else {
        "sf_base": 0.1, "sf_big": 1.0, "replicas": REPLICAS,
        "queries": {}, "superlinear_failures": [],
    }
    # live x-axis: primary-input rows per directory, volume-gated
    # against the pinned fixture constants (§26b: equality, not
    # non-emptiness — SRC_SMALL gets the same gate as SRC/OUT here)
    vols: dict[tuple[str, str], int] = {}
    for d in (SRC_SMALL, SRC, OUT):
        for table in sorted(set(EXPONENT_PRIMARY.values())):
            n = load_table(spark, d, table).count()
            want = (
                EXPECTED_PRIMARY_ROWS[d][table]
                if d in EXPECTED_PRIMARY_ROWS
                else EXPECTED_PRIMARY_ROWS[SRC][table] * REPLICAS
            )
            if n != want:
                raise AssertionError(
                    f"{d}/{table}: {n} rows, pinned {want} — exponent "
                    "x-axis would be wrong; fix the input first"
                )
            vols[(d, table)] = n
    tier_rows: dict[str, dict] = {}
    for name in EXPONENT_TIER:
        table = EXPONENT_PRIMARY[name]
        pts: list[tuple[float, float]] = []
        for d in (SRC_SMALL, SRC, OUT):
            _cold, warm = _timed(spark, qs, name, d)
            pts.append((float(vols[(d, table)]), warm))
        fields = fit_exponent(pts)
        fields["exponent_input"] = table
        fields["exponent_points"] = [[int(v), t] for v, t in pts]
        row = doc["queries"].setdefault(name, {})
        row["density_bound"] = name in DENSITY_BOUND
        row.update(fields)
        tier_rows[name] = row
        print(json.dumps({name: fields}))

    doc["exponent_gate"] = EXPONENT_GATE
    doc["exponent_failures"] = exponent_flags(tier_rows)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {path}; exponent failures: "
          f"{doc['exponent_failures'] or 'none'}")


if __name__ == "__main__":
    {"gen": gen, "run": run, "exponent": exponent}[sys.argv[1]]()

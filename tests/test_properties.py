"""Property-based tests (hypothesis): operator INVARIANTS that must
hold for arbitrary inputs, not just the curated fixtures.

Spark jobs are expensive per example, so each property generates a
BATCH of random cases and verifies the invariant over the whole batch
in one or two jobs, with a small max_examples budget.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@SLOW
@given(
    data=st.lists(
        st.tuples(
            st.text(alphabet="abcdef ", min_size=0, max_size=30),  # prefix
            st.text(alphabet="abcdef ", min_size=0, max_size=30),  # suffix a
            st.text(alphabet="abcdef ", min_size=0, max_size=30),  # suffix b
            st.text(alphabet="ghijkl", min_size=8, max_size=20),  # shared run
        ),
        min_size=1,
        max_size=8,
    )
)
def test_winnow_local_guarantee(spark, data):
    """SIGMOD'03 winnowing guarantee: two documents sharing a substring
    of length >= k + window - 1 (here 5+4-1=8) share at least one
    fingerprint. The shared run uses a disjoint alphabet so the only
    guaranteed common substring is the injected one."""
    from etl_geotab_spark.functions.text import winnow_fingerprints_arrow

    rows = []
    for i, (pre, sa, sb, shared) in enumerate(data):
        rows.append((2 * i, pre + shared + sa))
        rows.append((2 * i + 1, sb + shared + pre))
    df = spark.createDataFrame(rows, "id long, text string").select(
        "id", winnow_fingerprints_arrow("text", k=5, window=4).alias("fp")
    )
    got = {r.id: set(r.fp) for r in df.collect()}
    for i in range(len(data)):
        a, b = got[2 * i], got[2 * i + 1]
        assert a & b, f"case {i}: no shared fingerprint {data[i]!r}"


@SLOW
@given(
    fact=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),  # skewed keys
        min_size=0,
        max_size=40,
    ),
    dim=st.lists(
        st.tuples(st.integers(0, 5), st.text("xyz", min_size=1, max_size=3)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, fact, dim, how):
    """salted_join is a pure shuffle-layout change: for inner/left the
    result multiset must equal the plain join on arbitrary (skewed)
    inputs, including unmatched fact rows on the left path."""
    from etl_geotab_spark.operators.skew import salted_join

    f = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(fact)], "k long, v long, uid long"
    )
    d = spark.createDataFrame(dim, "dk long, label string")
    got = salted_join(
        f, d, "k", "dk", salt_cols=["uid"], num_salts=4, how=how
    ).select("k", "v", "uid", "label")
    want = f.join(d, f.k == d.dk, how).select("k", "v", "uid", "label")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """Distributed min-label CC == a driver-side union-find reference on
    arbitrary graphs (self-loops, parallel edges, chains, islands)."""
    from etl_geotab_spark.operators.clusters import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # canonicalize: representative = min node of the component
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in connected_components(pairs).collect()
    }
    assert got == want


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=2,
        max_size=10,
    ),
    probe_mask=st.lists(st.booleans(), min_size=10, max_size=10),
)
def test_probe_jaccard_is_exact_incident_subset(spark, docs, probe_mask):
    """ngram_jaccard_pairs_probe invariant vs the full operator, for
    arbitrary corpora: (a) with probe = everything, the pair sets are
    IDENTICAL (countDistinct direction-normalization is exact); (b) with
    any probe subset, the result is exactly the full pairs incident to
    the probe — no extras, no misses."""
    from etl_geotab_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_probe,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    full = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.3).collect()
    }
    all_ids = [i for i, _ in rows]
    probed_all = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs_probe(
            df, "text", "doc_id", all_ids, n=3, threshold=0.3
        ).collect()
    }
    assert probed_all == full

    probe = [i for i in all_ids if probe_mask[i % len(probe_mask)]]
    want = {(a, b, j) for (a, b, j) in full if a in probe or b in probe}
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs_probe(
            df, "text", "doc_id", probe, n=3, threshold=0.3
        ).collect()
    }
    assert got == want


@SLOW
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_naive_dominance(spark, pts):
    """Distributed skyline == naive NOT EXISTS dominance for arbitrary
    integer point sets (duplicates and total-order collisions
    included)."""
    from etl_geotab_spark.operators.skyline import skyline_2d

    rows = [(i, float(a), b) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "id long, vmax double, vmin long"
    ).repartition(4)
    got = {r.id for r in skyline_2d(df, "vmax", "vmin").collect()}

    def dom(p, q):
        return q[1] >= p[1] and q[2] <= p[2] and (q[1] > p[1] or q[2] < p[2])

    want = {p[0] for p in rows if not any(dom(p, q) for q in rows)}
    assert got == want


@SLOW
@given(
    stream=st.lists(st.integers(0, 9), min_size=1, max_size=200),
    s_pct=st.sampled_from([10, 25, 40]),
)
def test_heavy_hitters_exact_for_any_stream(spark, stream, s_pct):
    """heavy_hitters == plain GROUP BY HAVING for arbitrary streams and
    thresholds — the MG candidate pass may over-generate but the
    recount must make the result exact."""
    from collections import Counter

    from etl_geotab_spark.operators.frequency import heavy_hitters

    s = s_pct / 100.0
    df = spark.createDataFrame(
        [(f"k{v}",) for v in stream], "item string"
    ).repartition(4)
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", s).collect()}
    c = Counter(f"k{v}" for v in stream)
    want = {(k, n) for k, n in c.items() if n >= s * len(stream)}
    assert got == want


@SLOW
@given(
    build_keys=st.sets(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60),
    probe_keys=st.sets(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60),
)
def test_bloom_probe_has_no_false_negatives(spark, build_keys, probe_keys):
    """Every build key must survive the probe (bloom soundness); the
    probe output must be a superset of the true intersection and a
    subset of the probe set."""
    from etl_geotab_spark.operators.bloom import bloom_probe, build_bloom

    kdf = spark.createDataFrame([(k,) for k in build_keys], "k long")
    bitmap = build_bloom(kdf, "k", bits=1 << 12, num_hashes=3)
    pdf = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    kept = {r["k"] for r in bloom_probe(pdf, "k", bitmap, 3).collect()}
    truth = build_keys & probe_keys
    assert truth <= kept <= probe_keys


@SLOW
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_interleave_is_a_bijection(spark, pts):
    """De-interleaving the Morton code recovers the quantized inputs
    exactly for arbitrary 16-bit coordinates (so z-sorting loses no
    information about either dimension)."""
    from etl_geotab_spark.queries import _zorder_terms

    df = spark.createDataFrame(pts, "qx long, qy long")
    z = df.select(
        "qx", "qy", F.expr(_zorder_terms("qx", "qy", True)).alias("zval")
    )
    # de-interleave: even bits → x, odd bits → y
    dx = " | ".join(
        f"shiftleft(shiftright(zval, {2 * i}) & 1, {i})" for i in range(16)
    )
    dy = " | ".join(
        f"shiftleft(shiftright(zval, {2 * i + 1}) & 1, {i})" for i in range(16)
    )
    bad = z.where(
        (F.expr(dx) != F.col("qx")) | (F.expr(dy) != F.col("qy"))
    ).count()
    assert bad == 0


def test_embedding_quantize_bounds_and_extremes(spark, sf_dir):
    """int8 quantization invariants on the fixture corpus: every code
    in [0, 255]; each dimension's corpus-min maps to 0 and corpus-max
    to 255 (floor((mx-mn)/(mx-mn)*255) = 255)."""
    from etl_geotab_spark.queries import _REGISTRY

    df = _REGISTRY["embedding_quantize"][0](spark, sf_dir)
    # q8 is CSV-serialized for the driver's value hasher (round-4
    # harness err) — parse it back to ints for the invariant checks
    codes = F.transform(F.split("q8", ","), lambda s: s.cast("int"))
    ex = df.select(F.posexplode(codes).alias("pos", "q"))
    lo, hi = ex.agg(F.min("q"), F.max("q")).collect()[0]
    assert 0 <= lo and hi <= 255
    per_dim = ex.groupBy("pos").agg(
        F.min("q").alias("mn"), F.max("q").alias("mx")
    )
    bad = per_dim.where(
        (F.col("mn") != 0) | (F.col("mx") != 255)
    ).count()
    assert bad == 0

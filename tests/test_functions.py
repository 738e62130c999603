"""Unit tests for expression builders."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_geotab_spark.functions.scalar import haversine_km, js_coalesce, callsign
from etl_geotab_spark.functions.text import (
    bpe_ish_tokens,
    char_ngrams,
    doc_fingerprint,
    predict_language,
    quality_punct_ratio,
    token_count,
    word_shingles,
)
from etl_geotab_spark.functions.vector import cosine_similarity, dot_product, l2_norm


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_js_coalesce(spark):
    df = spark.createDataFrame([("x",), ("",), (None,)], "s string")
    out = [r.v for r in df.select(js_coalesce("s", "D").alias("v")).collect()]
    assert out == ["x", "D", "D"]


def test_callsign_matrix(spark):
    df = spark.createDataFrame(
        [("N", "CO", "P1"), (None, None, None), ("", "WY", ""), (None, "CA", "ZZ")],
        "n string, st string, pl string",
    )
    out = [r.v for r in df.select(callsign("n", "st", "pl").alias("v")).collect()]
    assert out == ["N", "US-Unknown", "WY-Unknown", "CA-ZZ"]


def test_haversine(spark):
    # Denver → Boulder ≈ 38.7 km
    v = one(
        spark,
        haversine_km(F.lit(39.7392), F.lit(-104.9903), F.lit(40.0150), F.lit(-105.2705)),
    )
    assert abs(v - 38.7) < 1.0


def test_vector_functions(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], "a array<float>, b array<float>")
    r = df.select(
        dot_product("a", "b").alias("dp"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cs"),
    ).collect()[0]
    assert abs(r.dp - 18.0) < 1e-12
    assert abs(r.na - 3.0) < 1e-12
    assert abs(r.cs - 1.0) < 1e-12


def test_cosine_zero_vector_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>")
    assert df.select(cosine_similarity("a", "b").alias("v")).collect()[0].v is None


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([("The quick  brown fox",)], "t string")
    r = df.select(
        token_count("t").alias("n"),
        word_shingles("t", 2).alias("sh"),
        char_ngrams("t", 3).alias("ng"),
    ).collect()[0]
    assert r.n == 4
    assert r.sh == ["the quick", "quick brown", "brown fox"]
    assert r.ng[:3] == ["the", "he ", "e q"]


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",), ("",)], "t string")
    out = [r.v for r in df.select(word_shingles("t", 3).alias("v")).collect()]
    assert out[0] == ["one two"]
    assert out[1] == []


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("Hello, world42!",)], "t string")
    r = df.select(bpe_ish_tokens("t").alias("v")).collect()[0].v
    assert r == ["hello", ",", "world", "42", "!"]


def test_punct_ratio(spark):
    df = spark.createDataFrame([("ab.,",), ("",)], "t string")
    out = [r.v for r in df.select(quality_punct_ratio("t").alias("v")).collect()]
    assert abs(out[0] - 0.5) < 1e-12
    assert out[1] == 0.0


def test_predict_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to the park for a walk",),
            ("el perro y la casa de los amigos en un lugar",),
            ("xyzzy qwerty plugh",),
        ],
        "t string",
    )
    out = [r.v for r in df.select(predict_language("t").alias("v")).collect()]
    assert out == ["en", "es", "und"]


def test_predict_language_tie_breaks_to_first_language(spark):
    # 'de la' scores 1.0 for BOTH es and fr (each list holds both
    # tokens); the tie must go to es — the earlier entry in STOPWORDS
    # order. Pins the argmax's first-index-of-max contract that the
    # oracle SQL cascades (sc_es >= sc_fr first) mirror.
    df = spark.createDataFrame([("de la",)], "t string")
    out = df.select(predict_language("t").alias("v")).collect()[0].v
    assert out == "es"


def test_doc_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "t string")
    out = [r.v for r in df.select(doc_fingerprint("t").alias("v")).collect()]
    assert out[0] == out[1] != out[2]
    # polynomial hash of 'abc' base 257 mod 2^31-1: a=97,b=98,c=99
    expect = ((97 * 257 + 98) * 257 + 99) % (2**31 - 1)
    assert out[0] == expect


def test_hll_rollup_and_approx_percentiles_accuracy(spark):
    """Sketch queries have no SQL oracle; pin accuracy vs exact here."""
    import etl_geotab_spark.queries as q
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    hll = {
        r.o_orderpriority: r.approx_custkeys
        for r in q.q_hll_sketch_rollup(spark, sf).collect()
    }
    o = q._t(spark, sf, "orders")
    exact_total = o.select(F.countDistinct("o_custkey")).first()[0]
    assert abs(hll["ALL"] - exact_total) / exact_total < 0.05

    # qty_quartiles is serialized at the harness boundary (driver
    # canonicalizer can't hash arrays) — parse it back
    approx = {
        r.l_returnflag: [float(x) for x in r.qty_quartiles.split(",")]
        for r in q.q_approx_percentiles(spark, sf).collect()
    }
    exact = {
        r.l_returnflag: [r.qty_p25, r.qty_median, r.qty_p75]
        for r in q.q_percentiles(spark, sf).collect()
    }
    # r16 §26b: the accuracy loop below iterates approx's keys — on
    # an empty read it would be a vacuous no-op. Pin the returnflag
    # domain (fixture lineitem carries exactly A/N/R).
    assert sorted(approx) == ["A", "N", "R"] == sorted(exact)
    for flag, quartiles in approx.items():
        for got, want in zip(quartiles, exact[flag]):
            assert abs(got - want) <= max(1.0, 0.05 * want)


def test_winnow_fingerprints_properties(spark):
    """Winnowing local guarantee: docs sharing a long substring share
    at least one fingerprint; short docs degrade gracefully."""
    from etl_geotab_spark.functions.text import with_winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "PREFIX one " + shared + " SUFFIX alpha"),
        (2, "completely different opening " + shared + " tail two"),
        (3, "no overlap here at all zzzz qqqq wwww"),
        (4, "tiny"),  # shorter than k → empty fingerprint set
        (5, "exactlyten"),  # >= k but fewer than `window` grams
    ]
    df = with_winnow_fingerprints(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", "fp",
        k=7, window=5,
    ).select("doc_id", "fp")
    got = {r["doc_id"]: set(r["fp"]) for r in df.collect()}
    # local guarantee: substring len >= k+w-1 = 11 chars shared
    assert got[1] & got[2], "docs sharing a long substring must share a fp"
    assert got[4] == set()
    assert len(got[5]) >= 1
    # determinism across evaluations
    again = {
        r["doc_id"]: set(r["fp"])
        for r in with_winnow_fingerprints(
            spark.createDataFrame(rows, ["doc_id", "text"]), "text", "fp",
            k=7, window=5,
        ).select("doc_id", "fp").collect()
    }
    assert got == again


def test_winnow_arrow_matches_expression_form(spark):
    """The vectorized pandas-UDF winnowing must be bit-identical to the
    pure-expression form, including non-BMP unicode (code-point
    iteration — surrogate pairs are ONE char to the JVM), NULL
    propagation, and the short-doc edge cases."""
    from etl_geotab_spark.functions.text import (
        winnow_fingerprints_arrow,
        with_winnow_fingerprints,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aé€ non-ascii ünïcødé text with accents héllo wörld"),
        (3, "tiny"),
        (4, "exactlyten"),
        (5, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate repeats
        (6, None),
        (7, ""),
        (8, "emoji 😀😀 text 𝄞 music beyond the BMP plane"),
        (9, "中文字符串测试一二三四五 mixed with ascii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = {
        r["doc_id"]: r["fp"]
        for r in with_winnow_fingerprints(df, "text", "fp", k=7, window=5)
        .select("doc_id", "fp")
        .collect()
    }
    arrow = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id",
            winnow_fingerprints_arrow("text", k=7, window=5).alias("fp"),
        ).collect()
    }
    # NULL text → [] in both forms (when() guard swallows the null)
    assert expr == arrow


def test_point_in_convex_polygon(spark):
    """Containment truth table on a unit square incl. boundary (inside)
    and the SQL twin producing the identical predicate semantics."""
    from etl_geotab_spark.functions.geo import (
        point_in_convex_polygon,
        polygon_sql_predicate,
    )

    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]  # CCW (lat,lon)
    pts = [
        (1, 5.0, 5.0, True),    # interior
        (2, 0.0, 5.0, True),    # edge -> inside
        (3, 10.0, 10.0, True),  # vertex -> inside
        (4, -0.1, 5.0, False),  # just outside
        (5, 5.0, 11.0, False),
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], "id long, lat double, lon double"
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id",
            point_in_convex_polygon(F.col("lat"), F.col("lon"), square).alias(
                "inside"
            ),
        ).collect()
    }
    assert got == {i: want for i, _, _, want in pts}

    import duckdb

    con = duckdb.connect()
    pred = polygon_sql_predicate("lat", "lon", square)
    rows = con.execute(
        "SELECT id, " + pred + " AS inside FROM (VALUES "
        + ", ".join(f"({i}, {la}, {lo})" for i, la, lo, _ in pts)
        + ") t(id, lat, lon)"
    ).fetchall()
    assert {i: bool(v) for i, v in rows} == got

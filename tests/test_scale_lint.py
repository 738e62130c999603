"""Machine check for the SCALE.md §16 bounding rule (round-7 verdict
item 6): literal modulo-stride sampling — ``col % <literal> == 0`` —
selects a corpus-PROPORTIONAL sample; feeding one into any pairwise
stage is the quadratic class that cost a 10× stress failure four
separate times (semdedup cells, contrastive anchors, contamination
grams, ANN probe sides). Every such literal in the engine source —
whether written as Python AST or inside an engine-side SQL string
(``F.expr``/``selectExpr``/``spark.sql``/string ``where``/``filter``)
— must either be rewritten onto the blessed ``max(<abs>, n // <k>)``
memoized-probe pattern or carry a justification here explaining why
its consumer is linear. A NEW unlisted literal stride fails this
suite, and so does a SECOND occurrence of an already-justified
(function, literal) pair — counts are part of the allowlist key, so
reusing a justified literal for a new unreviewed sample site cannot
ride an old entry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from scale_lint import find_literal_strides, scan_package  # noqa: E402

# (function, literal) → (expected occurrence count, why a corpus-
# proportional selection is safe HERE). The forcing function is the
# justification: to add or bump an entry you must be able to write the
# "consumer is linear/bounded" sentence.
ALLOWED: dict[tuple[str, int], tuple[int, str]] = {
    ("q_posexplode_terms", 50): (1, "consumer is explode+count — linear in sampled docs"),
    ("q_gap_fill_forward", 20): (1, "consumer is per-user window fill — linear in sampled rows"),
    ("q_regex_token_ops", 25): (1, "consumer is per-row regex maps — linear"),
    ("q_upsert_orders", 10): (1, "MERGE source side — one equi-join, linear"),
    ("q_pii_redact", 3): (1, "per-row string synthesis branch — linear"),
    ("q_vin_filter", 7): (1, "allowlist side of a semi-join — linear"),
    ("q_triangle_count", 5): (1, "subgraph SCOPE (shrinks input); degree-oriented count, sf1-stress in-band"),
    ("q_lateral_top_orders", 10): (1, "LATERAL decorrelates to equi-join + per-group top-2 — linear"),
    ("q_association_rules", 5): (1, "pairs are WITHIN-order (bounded basket size) — linear in orders"),
    ("q_pagerank_parts", 5): (1, "subgraph scope; iterative cost linear in edges/iter, sf1-stress 2.1x"),
    ("q_cdc_apply", 7): (1, "CDC update stream — equi-join apply, linear"),
    ("q_cdc_apply", 13): (1, "CDC delete stream — equi-join apply, linear"),
    ("q_snapshot_diff", 7): (1, "changed-row selection — full-outer equi-join diff, linear"),
    ("_fake_transport", 5): (1, "fixture generator branch — bounded fake fleet, not corpus data"),
    ("_fake_transport", 2): (1, "fixture generator branch — bounded fake fleet, not corpus data"),
    ("_fake_transport", 3): (1, "fixture generator branch — bounded fake fleet, not corpus data"),
}


def _hit_counts() -> dict[tuple[str, int], int]:
    counts: dict[tuple[str, int], int] = {}
    for hits in scan_package().values():
        for fn, lit, _ in hits:
            counts[(fn, lit)] = counts.get((fn, lit), 0) + 1
    return counts


def test_no_unjustified_literal_strides():
    problems = []
    counts = _hit_counts()
    for key, n in counts.items():
        exp = ALLOWED.get(key, (0, ""))[0]
        if n > exp:
            problems.append(f"{key[0]}: % {key[1]} == 0 occurs {n}x (justified: {exp}x)")
    assert not problems, (
        "literal modulo-stride sampling beyond the justified allowlist "
        "(SCALE.md §16: samples must be absolute or max(abs, n//k) via "
        "the memoized size probe; if the consumer is provably linear, "
        "add/bump a justified entry in ALLOWED in this test):\n"
        + "\n".join(problems)
    )


def test_allowlist_has_no_dead_entries():
    """Every ALLOWED entry must still match its exact hit count — a
    stale or over-counted entry would silently whitelist a future
    reintroduction at the same (function, literal)."""
    counts = _hit_counts()
    dead = {
        key: (exp, counts.get(key, 0))
        for key, (exp, _) in ALLOWED.items()
        if counts.get(key, 0) != exp
    }
    assert not dead, (
        f"allowlist entries whose (expected, actual) counts diverge — "
        f"code changed, re-review and prune/bump: {dead}"
    )


def test_lint_fires_on_new_literal_stride():
    """Failing-by-construction case: the exact shape of all four
    historical regressions must be flagged."""
    snippet = (
        "def q_new_eval(spark, sf):\n"
        "    emb = load(spark, sf)\n"
        "    probes = emb.where(F.col('vec_id') % 500 == 0)\n"
        "    return score(probes, emb)\n"
    )
    hits = find_literal_strides(snippet)
    assert hits == [("q_new_eval", 500, 3)]


def test_lint_fires_on_sql_string_stride():
    """Round-8 review: the same stride hidden in an engine-side SQL
    string (F.expr / selectExpr / spark.sql / string where) must be
    flagged too — the AST-only lint was blind to it."""
    snippet = (
        "def q_str_eval(spark, sf):\n"
        "    a = df.where(\"vec_id % 500 = 0\")\n"
        "    b = df.select(F.expr('id % 40 == 0'))\n"
        "    c = spark.sql('SELECT * FROM t WHERE k % 7 = 0')\n"
        "    d = df.selectExpr('doc_id % 9 = 0 as probe')\n"
        "    return a\n"
    )
    hits = find_literal_strides(snippet)
    assert [(f, l) for f, l, _ in hits] == [
        ("q_str_eval", 500),
        ("q_str_eval", 40),
        ("q_str_eval", 7),
        ("q_str_eval", 9),
    ]


def test_lint_fires_on_paren_and_function_form_strides():
    """Round-9 advice: near-miss spellings of the same sampling idiom
    — a parenthesized comparison operand, `pmod(...)`, `MOD(...)`
    (any case), and a one-level-nested first argument — must all be
    flagged; a sixth recurrence must not slip through on syntax."""
    snippet = (
        "def q_near_miss(spark, sf):\n"
        "    a = df.where('(vec_id % 100) = 0')\n"
        "    b = df.where('pmod(vec_id, 200) = 0')\n"
        "    c = spark.sql('SELECT * FROM t WHERE MOD(k, 30) == 0')\n"
        "    d = df.where('pmod(hash(doc_id), 400) = 0')\n"
        "    return a\n"
    )
    hits = find_literal_strides(snippet)
    assert [(f, l) for f, l, _ in hits] == [
        ("q_near_miss", 100),
        ("q_near_miss", 200),
        ("q_near_miss", 30),
        ("q_near_miss", 400),
    ]


def test_lint_ignores_key_derivation_blessed_pattern_and_oracles():
    """Non-sampling % uses (shard ids, hash mixing), the blessed
    variable-stride pattern, and DuckDB ORACLE SQL strings (passed to
    `register`, run only in DuckDB) must NOT be flagged — lint
    precision is what keeps the allowlist honest."""
    snippet = (
        "@register('q_ok', 'SELECT * FROM t WHERE k % 50 = 0')\n"
        "def q_ok(spark, sf, n):\n"
        "    shard = (F.col('doc_id') % 16).alias('shard')\n"
        "    coord = (F.col('k') % 360) - 179.5\n"
        "    stride = max(500, n // 20)\n"
        "    probes = df.where(F.col('vec_id') % stride == 0)\n"
        "    return probes\n"
    )
    assert find_literal_strides(snippet) == []

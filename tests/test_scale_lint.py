"""Machine check for the SCALE.md §16 bounding rule (round-7 verdict
item 6): literal modulo-stride sampling — ``col % <literal> == 0`` —
selects a corpus-PROPORTIONAL sample; feeding one into any pairwise
stage is the quadratic class that cost a 10× stress failure four
separate times (semdedup cells, contrastive anchors, contamination
grams, ANN probe sides). Every such literal in the engine source must
either be rewritten onto the blessed ``max(<abs>, n // <k>)``
memoized-probe pattern or carry a justification here explaining why
its consumer is linear. A NEW unlisted literal stride fails this
suite."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from scale_lint import find_literal_strides, scan_package  # noqa: E402

# (function, literal) → why a corpus-proportional selection is safe
# HERE. The forcing function is the justification: to add an entry you
# must be able to write the "consumer is linear/bounded" sentence.
ALLOWED: dict[tuple[str, int], str] = {
    ("q_posexplode_terms", 50): "consumer is explode+count — linear in sampled docs",
    ("q_gap_fill_forward", 20): "consumer is per-user window fill — linear in sampled rows",
    ("q_regex_token_ops", 25): "consumer is per-row regex maps — linear",
    ("q_upsert_orders", 10): "MERGE source side — one equi-join, linear",
    ("q_pii_redact", 3): "per-row string synthesis branch — linear",
    ("q_vin_filter", 7): "allowlist side of a semi-join — linear",
    ("q_triangle_count", 5): "subgraph SCOPE (shrinks input); degree-oriented count, sf1-stress in-band",
    ("q_association_rules", 5): "pairs are WITHIN-order (bounded basket size) — linear in orders",
    ("q_pagerank_parts", 5): "subgraph scope; iterative cost linear in edges/iter, sf1-stress 2.1x",
    ("q_cdc_apply", 7): "CDC update stream — equi-join apply, linear",
    ("q_cdc_apply", 13): "CDC delete stream — equi-join apply, linear",
    ("q_snapshot_diff", 7): "changed-row selection — full-outer equi-join diff, linear",
    ("_fake_transport", 5): "fixture generator branch — bounded fake fleet, not corpus data",
    ("_fake_transport", 2): "fixture generator branch — bounded fake fleet, not corpus data",
    ("_fake_transport", 3): "fixture generator branch — bounded fake fleet, not corpus data",
}


def test_no_unjustified_literal_strides():
    unlisted = []
    for path, hits in scan_package().items():
        for fn, lit, ln in hits:
            if (fn, lit) not in ALLOWED:
                unlisted.append(f"{path}:{ln} {fn}: % {lit} == 0")
    assert not unlisted, (
        "literal modulo-stride sampling outside the justified allowlist "
        "(SCALE.md §16: samples must be absolute or max(abs, n//k) via "
        "the memoized size probe; if the consumer is provably linear, "
        "add a justified entry to ALLOWED in this test):\n"
        + "\n".join(unlisted)
    )


def test_allowlist_has_no_dead_entries():
    """Every ALLOWED entry must still match a real hit — stale entries
    would silently whitelist a future reintroduction at the same
    (function, literal)."""
    live = {
        (fn, lit)
        for hits in scan_package().values()
        for fn, lit, _ in hits
    }
    dead = set(ALLOWED) - live
    assert not dead, f"stale allowlist entries (code changed — prune): {dead}"


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


def test_lint_ignores_key_derivation_and_blessed_pattern():
    """Non-sampling % uses (shard ids, hash mixing) and the blessed
    variable-stride pattern must NOT be flagged — lint precision is
    what keeps the allowlist honest."""
    snippet = (
        "def q_ok(spark, sf, n):\n"
        "    shard = (F.col('doc_id') % 16).alias('shard')\n"
        "    coord = (F.col('k') % 360) - 179.5\n"
        "    stride = max(500, n // 20)\n"
        "    probes = df.where(F.col('vec_id') % stride == 0)\n"
        "    return probes\n"
    )
    assert find_literal_strides(snippet) == []

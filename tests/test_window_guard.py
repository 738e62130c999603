"""The SCALE.md §21 shared-component rule as a machine check
(tools/window_guard.py + DEPMAP.json from tools/depmap.py).

Unit tier: the material-change classifier on synthetic module pairs —
docstrings/comments must be invisible, body/assignment/import/decorator
changes must attribute to the right top-level symbols.

Integration tier (real git history, no Spark session):
- guard vs the CURRENT round base must be clean (this round's diff is
  advice prose/tests/window-ordering only);
- guard vs the ROUND-10 base must re-derive, from the diff alone, the
  exact §21 pull set the round-11 window included by hand
  (`bucketed_colocated_join` for the `colocated_tables` info_out
  change; both geotab pipelines for the `register_geotab_source`
  logging edit) — and flag them as violations because the round-12
  window correctly no longer carries them.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import window_guard as wg  # noqa: E402


# ------------------------------------------------------------- units


def test_docstring_and_comment_changes_are_invisible():
    base = '''
"""Module doc."""
X = 1

def f(a):
    """old doc."""
    # old comment
    return a + X
'''
    cur = '''
"""Rewritten module doc."""
X = 1

def f(a):
    """completely new doc, new length."""
    # new comment, different text
    return a + X
'''
    defs, binds, other = wg.classify_module_change(base, cur)
    assert (defs, binds, other) == (set(), set(), False)


def test_body_change_flags_only_the_changed_def():
    base = "def f(a):\n    return a + 1\n\ndef g(a):\n    return a - 1\n"
    cur = "def f(a):\n    return a + 2\n\ndef g(a):\n    return a - 1\n"
    defs, binds, other = wg.classify_module_change(base, cur)
    assert defs == {"f"} and not binds and not other


def test_added_and_removed_defs_are_changed():
    defs, _, _ = wg.classify_module_change(
        "def f():\n    pass\n", "def g():\n    pass\n"
    )
    assert defs == {"f", "g"}


def test_nested_closure_change_attributes_to_toplevel():
    base = (
        "def outer():\n"
        "    def cb(x):\n"
        "        return x + 1\n"
        "    return cb\n"
    )
    cur = base.replace("x + 1", "x + 2")
    defs, _, _ = wg.classify_module_change(base, cur)
    assert defs == {"outer"}


def test_assignment_change_attributes_to_referencing_defs():
    base = "THRESH = 3\n\ndef uses():\n    return THRESH\n\ndef clean():\n    return 0\n"
    cur = base.replace("THRESH = 3", "THRESH = 4")
    defs, binds, other = wg.classify_module_change(base, cur)
    assert not defs and binds == {"THRESH"} and not other
    assert wg._referencing_defs(cur, binds) == {"uses"}


def test_decorator_constant_reference_is_attributed():
    # the oracle-SQL pattern: @register("q", _SQL) — a changed SQL
    # constant must implicate the decorated query function
    src = (
        "_SQL = 'select 1 AS one'\n"
        "def register(n, o):\n"
        "    return lambda f: f\n"
        "@register('q_x', _SQL)\n"
        "def q_x(spark, sf):\n"
        "    return None\n"
    )
    assert "q_x" in wg._referencing_defs(src, {"_SQL"})


def test_derived_bind_propagates_to_referencing_defs():
    # the r12-advice under-implication class: X changed, Y = X + 1,
    # a def references only Y — it must still be implicated
    src = (
        "X = 1\n"
        "Y = X + 1\n"
        "Z = Y * 2\n"
        "def uses_z():\n"
        "    return Z\n"
        "def clean():\n"
        "    return 0\n"
    )
    closed = wg._propagate_binds(src, {"X"})
    assert closed == {"X", "Y", "Z"}
    assert wg._referencing_defs(src, closed) == {"uses_z"}


def test_propagation_handles_augassign_and_is_bounded():
    src = "X = 1\nY = 0\nY += X\nA = 2\nB = A\n"
    assert wg._propagate_binds(src, {"X"}) == {"X", "Y"}
    assert wg._propagate_binds(src, {"A"}) == {"A", "B"}
    assert wg._propagate_binds(src, set()) == set()


def test_import_rebind_is_a_changed_name():
    base = "from .operators.asof import asof_join\n"
    cur = "from .operators.rangejoin import asof_join\n"
    _, binds, _ = wg.classify_module_change(base, cur)
    assert binds == {"asof_join"}


def test_module_level_statement_diff_is_conservative():
    base = "import os\nprint('setup A')\n"
    cur = "import os\nprint('setup B')\n"
    defs, binds, other = wg.classify_module_change(base, cur)
    assert other and not defs and not binds


def test_relative_import_resolution():
    src = "from .operators.dedup import THRESH as T\nfrom . import io\n"
    got = wg._imported_bindings(src, "etl_geotab_spark.queries")
    assert ("T", "etl_geotab_spark.operators.dedup", "THRESH") in got


# ------------------------------------------------- integration (git)


def _run(base=None):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = wg.run_guard(base=base)
    return rc, buf.getvalue()


def test_guard_clean_against_current_round_base():
    rc, out = _run()
    assert rc == 0, out


def test_guard_rederives_the_r11_manual_pull_set_from_history():
    """Diffing from the round-10 close: the r11 code changes
    (colocated_tables info_out, register_geotab_source logging) must
    implicate exactly the queries the r11 window pulled by hand.
    Whether each one then PRINTS as a violation depends on the
    CURRENT round's rotation window (the r15 window covers
    geotab_connector_pipeline again, for example), so assert on the
    implicated set and derive the expected rc/violations from the
    live window instead of freezing an old round's composition."""
    r10 = "f691110"
    _, implicated, registry_names = wg.compute_implicated(base=r10)
    expected = {
        "bucketed_colocated_join",
        "geotab_connector_pipeline",
        "geotab_stream_pipeline",
    }
    assert expected <= set(implicated), implicated
    window = set(registry_names[: wg.WINDOW_SIZE])
    outside = sorted(set(implicated) - window)
    rc, out = _run(base=r10)
    assert rc == (1 if outside else 0), out
    for q in outside:
        assert q in out, (q, out)


def _propose(*extra):
    import subprocess

    out = subprocess.run(
        [sys.executable, "tools/freshness.py", "--propose", *extra],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout
    names = []
    in_prop = False
    for ln in out.splitlines():
        if ln.startswith("proposed next window"):
            in_prop = True
            continue
        if in_prop and ln.startswith("  "):
            names.append(ln.strip().split()[0])
    return out, names


def test_freshness_proposer_matches_committed_round12_window():
    """The proposal IS the window, no manual edits — replayed against
    the PINNED ledger state the window was derived from (CORRECTNESS
    r01..r11). The unpinned form of this test was the r12 judge's one
    red: it was green at round close and went stale the moment the
    driver dropped CORRECTNESS_r12.json into the worktree (the live
    proposer moved on to proposing the r13 window). --max-round pins
    the inputs so the assertion is time-invariant; the §21 tier
    contributed zero names to this window and is skipped under replay
    (its history-replay coverage is the --guard-base test below)."""
    import etl_geotab_spark.queries as q

    out, names = _propose("--max-round", "11")
    assert "WARNING" not in out, out
    assert names == q._ROUND12_WINDOW


def test_freshness_proposer_matches_committed_round13_window():
    """Same pinned-replay contract for the round-13 window: ledger
    r01..r12 (the state it was proposed from, guard tier clean after
    the DEPMAP regeneration) must reproduce it verbatim — the full
    22-row r08 tier front-loaded, then the 28 oldest r09 rows."""
    import etl_geotab_spark.queries as q

    out, names = _propose("--max-round", "12")
    assert "WARNING" not in out, out
    assert names == q._ROUND13_WINDOW


# The §21 guard pulls the round-17 OPTIMIZATION batch front-loaded
# into the amended window (the r15/r16 amendment procedure): every
# query whose executed code the optimization pass touched. Kept as a
# literal list — several of these were ALSO rotation candidates in the
# original proposal, so the prefix cannot be derived from the replay.
_R17_GUARD_PULLS = [
    "ngram_jaccard_pairs",
    "simhash_near_dup",
    "dedup_clusters",
    "tfidf_top_terms",
    "grid_spatial_join",
    "bigram_pmi",
    "linear_fit_stats",
    "minhash_recall_eval",
    "recursive_order_chains",
    "heavy_hitters",
    "skyline_pareto",
    "market_share",
    "unigram_logprob",
    "cross_corpus_dedup",
    "token_entropy",
    "triangle_count",
    "association_rules",
    "pagerank_parts",
    "entity_resolution",
    "bpe_learn_merges",
    "spearman_correlation",
    "hotspot_regions",
    "dedup_keep_best",
]


def test_freshness_proposer_matches_committed_round17_window():
    """Pinned-replay contract for the AMENDED round-17 window: the
    replay (ledger r01..r16, guard tier skipped) reproduces the
    original proposal — 26 remaining r12 rows then the 24 oldest r13
    rows — and the committed window is exactly the §21 guard pulls of
    the r17 optimization batch front-loaded, then the replay's names
    minus those, truncated to 50 (the displaced tail rotates to r18).
    Time-invariant: both the replay inputs and the guard prefix are
    pinned (the live guard's own agreement with the prefix is
    tools/window_guard.py's job, re-run at every batch commit)."""
    import etl_geotab_spark.queries as q

    out, names = _propose("--max-round", "16")
    assert "WARNING" not in out, out
    guard = _R17_GUARD_PULLS
    assert q._ROUND17_WINDOW[: len(guard)] == guard
    expected = guard + [n for n in names if n not in set(guard)]
    assert q._ROUND17_WINDOW == expected[: len(q._ROUND17_WINDOW)]


def test_freshness_proposer_frontloads_guard_tier_from_history():
    """Replaying the round-10 base: the three §21 pulls the r11 window
    included by hand must lead the proposal, tagged with their
    attribution. Assert the INVARIANT (those three are guard-tagged
    and every guard-tagged name precedes every untagged name) — not
    the tier's exact membership: --guard-base diffs the LIVE worktree
    against the historical base, so any in-flight package change
    legitimately widens the tier (r15 lesson, second instance: the
    streaming-fixture fix added the stream_events dependents here)."""
    out, names = _propose("--guard-base", "f691110")
    tagged = {
        line.strip().split("  ")[0]
        for line in out.splitlines()
        if "§21: depends on changed" in line
    }
    assert {
        "bucketed_colocated_join",
        "geotab_connector_pipeline",
        "geotab_stream_pipeline",
    } <= tagged, tagged
    first_untagged = min(
        (i for i, n in enumerate(names) if n not in tagged),
        default=len(names),  # a fully guard-tagged proposal is a
        # legitimate state (every slot an implicated pull), not a crash
    )
    assert all(n in tagged for n in names[:first_untagged])
    assert tagged <= set(names[:first_untagged]), (
        "guard tier must be a window prefix"
    )
    assert len(names) == 50 and len(set(names)) == 50


def test_guard_fails_closed_when_depmap_predates_base(tmp_path, monkeypatch):
    """A depmap whose generation commit does not descend from the base
    AND differs from it in package content can be missing dependency
    edges whose creating change is outside the examined diff — the
    guard must demand regeneration (rc 2), not run. Fabricated by
    back-dating the real map to the round-7 close (package content
    differs hugely from the current base)."""
    import json

    with open(os.path.join(REPO, "DEPMAP.json")) as f:
        doc = json.load(f)
    doc["_meta"]["generated_at_commit"] = "07a1e17"  # round-7 close
    fake = tmp_path / "DEPMAP.json"
    fake.write_text(json.dumps(doc))
    monkeypatch.setattr(wg, "DEPMAP_PATH", str(fake))
    rc, out = _run()
    assert rc == 2 and "does not descend" in out, (rc, out)


def test_guard_tolerates_older_gen_when_package_content_identical(
    tmp_path, monkeypatch
):
    """The round-boundary case: the driver's round-close commit moves
    the base past the map's generation commit while touching only
    result JSONs — package content identical at gen and base, so the
    map is still sound and the guard must run (no forced 3-minute
    regeneration every round start)."""
    import json
    import subprocess

    with open(os.path.join(REPO, "DEPMAP.json")) as f:
        doc = json.load(f)
    gen = doc["_meta"]["generated_at_commit"]
    newer = subprocess.run(
        ["git", "log", "--format=%H", f"{gen}..HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.split()
    same = [
        c
        for c in newer
        if subprocess.run(
            ["git", "diff", "--quiet", gen, c, "--",
             "etl_geotab_spark", "__spark_entry__.py"],
            cwd=REPO,
        ).returncode
        == 0
    ]
    if not same:
        pytest.skip("no newer commit with identical package content")
    rc, out = _run(base=same[0])
    # rc may be 0 or 1 depending on the diff — the point is it RAN
    assert rc in (0, 1) and "does not descend" not in out, (rc, out)


def test_guard_fails_closed_on_dirty_generation(tmp_path, monkeypatch):
    """A map traced from a dirty package tree has a generation commit
    that doesn't reflect the traced code — the soundness checks can't
    reason from it, so the guard must demand a clean regeneration."""
    import json

    with open(os.path.join(REPO, "DEPMAP.json")) as f:
        doc = json.load(f)
    doc["_meta"]["dirty_package_files"] = ["etl_geotab_spark/io.py"]
    fake = tmp_path / "DEPMAP.json"
    fake.write_text(json.dumps(doc))
    monkeypatch.setattr(wg, "DEPMAP_PATH", str(fake))
    rc, out = _run()
    assert rc == 2 and "dirty package tree" in out, (rc, out)


def test_depmap_matches_registry():
    import json

    with open(os.path.join(REPO, "DEPMAP.json")) as f:
        doc = json.load(f)
    import __spark_entry__ as e

    names = list(e.queries())
    assert set(doc["queries"]) == set(names)
    # every query at least depends on its own registry function
    for q, deps in doc["queries"].items():
        assert any(
            d.startswith("etl_geotab_spark/queries.py::q_") for d in deps
        ), q


# §21 guard pulls of the round-18 optimization batches (literal — the
# r17 pattern: several were also rotation candidates, so the prefix
# cannot be derived from the replay).
_R18_GUARD_PULLS = [
    "minhash_near_dup",
    "dedup_clusters",
    "ivf_ann_topk",
    "doc_winnow_fingerprints",
    "bigram_pmi",
    "source_temperature_resample",
    "ann_recall_eval",
    "minhash_recall_eval",
    "heavy_hitters",
    "unigram_logprob",
    "pagerank_parts",
    "distribution_drift",
    "semdedup_buckets",
    "count_min_freq",
    "entity_resolution",
    "bpe_learn_merges",
    "ndcg_eval",
    "hotspot_regions",
    "dedup_keep_best",
]


def test_freshness_proposer_matches_committed_round18_window():
    """Pinned-replay contract for the round-18 window: the replay
    (ledger r01..r17, guard tier skipped) reproduces the rotation
    order, and the committed window is exactly the §21 guard pulls of
    the r18 optimization batches front-loaded, then the replay's names
    minus those, truncated to 50. Time-invariant: replay inputs and
    the guard prefix are pinned (the live guard's own agreement with
    the prefix is tools/window_guard.py's job, re-run at every batch
    commit)."""
    import etl_geotab_spark.queries as q

    out, names = _propose("--max-round", "17")
    assert "WARNING" not in out, out
    guard = _R18_GUARD_PULLS
    assert q._ROUND18_WINDOW[: len(guard)] == guard
    expected = guard + [n for n in names if n not in set(guard)]
    assert q._ROUND18_WINDOW == expected[: len(q._ROUND18_WINDOW)]

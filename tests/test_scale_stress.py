"""The 10x stress harness (tools/scale_stress.py) contract:

- ``cold_warm`` records (first, min) of n timed executions — the
  r15 refresh found a cold first run 7x its warm time
  (minhash_near_dup 74.8 s cold vs 10.4 s warm: per-query checkpoint
  init, scratch builds, worker-pool spin-up), and the opposite trap
  too (ndcg_eval warm 0.85 s vs cold 8.2 s: the warm run reuses the
  per-SF persisted index, hiding the build's own scaling) — so the
  record carries BOTH tiers instead of picking one;
- every STRESS name resolves in the query registry (a renamed or
  deleted query must fail here, not 20 minutes into a sweep) and
  appears once;
- DENSITY_BOUND names are a subset of STRESS (an exemption for a
  query the sweep never runs is a dead allowlist entry).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import scale_stress  # noqa: E402


def test_cold_warm_returns_first_and_min():
    calls = []

    def run_once():
        calls.append(1)
        return [9.0, 2.5, 7.0][len(calls) - 1]

    assert scale_stress.cold_warm(run_once, n=3) == (9.0, 2.5)
    assert len(calls) == 3


def test_cold_warm_default_is_two_runs():
    calls = []

    def run_once():
        calls.append(1)
        return float(len(calls))

    assert scale_stress.cold_warm(run_once) == (1.0, 1.0)
    assert len(calls) == 2


def test_stress_names_registered_and_unique():
    from etl_geotab_spark.queries import _REGISTRY

    missing = [n for n in scale_stress.STRESS if n not in _REGISTRY]
    assert missing == []
    assert len(scale_stress.STRESS) == len(set(scale_stress.STRESS))


def test_density_bound_subset_of_stress():
    assert scale_stress.DENSITY_BOUND <= set(scale_stress.STRESS)


def test_exponent_tier_registered_and_stress_covered():
    """Tier members must resolve in the registry AND already be in
    the two-point stress list (the exponent pass refines their
    ratio, it does not replace the within_10x gate)."""
    from etl_geotab_spark.queries import _REGISTRY

    assert all(n in _REGISTRY for n in scale_stress.EXPONENT_TIER)
    assert set(scale_stress.EXPONENT_TIER) <= set(scale_stress.STRESS)
    assert len(scale_stress.EXPONENT_TIER) == len(
        set(scale_stress.EXPONENT_TIER)
    )
    # every tier member declares a dominant input whose sf0.01/sf0.1
    # cardinalities are pinned (the live x-axis volume gate)
    assert set(scale_stress.EXPONENT_PRIMARY) == set(
        scale_stress.EXPONENT_TIER
    )
    for d in (scale_stress.SRC_SMALL, scale_stress.SRC):
        assert set(scale_stress.EXPONENT_PRIMARY.values()) <= set(
            scale_stress.EXPECTED_PRIMARY_ROWS[d]
        )


def test_fit_exponent_synthetic_triples():
    """The fit recovers a known power law from a synthetic timing
    triple at the real scale points (0.01 / 0.1 / 1)."""
    for true_exp in (1.0, 1.7, 2.0):
        pts = [(s, 2.0 * s ** true_exp) for s in (0.01, 0.1, 1.0)]
        f = scale_stress.fit_exponent(pts)
        assert abs(f["exponent"] - true_exp) < 1e-6
        assert abs(f["exponent_head"] - true_exp) < 1e-6
        assert abs(f["exponent_tail"] - true_exp) < 1e-6


def test_fit_exponent_overhead_floor_flattens_head_not_tail():
    """A fixed per-query overhead floor (the sf0.01 reality)
    flattens the HEAD segment and deflates the whole-curve fit;
    the tail segment stays close to the true exponent — which is
    why the gate reads max(fit, tail), never the fit alone."""
    pts = [(s, 0.3 + 30.0 * s ** 2.0) for s in (0.01, 0.1, 1.0)]
    f = scale_stress.fit_exponent(pts)
    assert f["exponent_head"] < 0.5          # floor-dominated
    assert f["exponent_tail"] > 1.5          # true growth visible
    assert f["exponent"] < f["exponent_tail"]


def test_fit_exponent_failed_probe_stamps_none():
    f = scale_stress.fit_exponent([(0.01, 0.4), (0.1, -1.0), (1.0, 3.0)])
    assert f == {"exponent": None, "exponent_head": None,
                 "exponent_tail": None}
    assert scale_stress.fit_exponent([(0.1, 1.0)])["exponent"] is None


def test_exponent_flags_gate_semantics():
    """Flags: gate breach on max(fit, tail); failed probe
    (UNCONDITIONAL — the density exemption covers a measured-but-
    steep curve, never a missing measurement); and the density-bound
    exemption for breaches."""
    rows = {
        "linear_ok": {"exponent": 1.0, "exponent_tail": 1.05},
        "nlogn_ok": {"exponent": 1.1, "exponent_tail": 1.2},
        "tail_breach": {"exponent": 1.1, "exponent_tail": 1.6},
        "fit_breach": {"exponent": 1.9, "exponent_tail": 1.2},
        "probe_failed": {"exponent": None, "exponent_tail": None},
        "density_exempt": {"exponent": 2.0, "exponent_tail": 2.0,
                           "density_bound": True},
        "density_probe_failed": {"exponent": None,
                                 "exponent_tail": None,
                                 "density_bound": True},
    }
    assert scale_stress.exponent_flags(rows) == [
        "density_probe_failed", "fit_breach", "probe_failed",
        "tail_breach",
    ]


def test_fit_exponent_duplicate_x_stamps_none():
    """Two points sharing a scale value (an SF-stepped table flat
    across adjacent dirs, e.g. documents = 500 at both sf0.001 and
    sf0.01) make the slope undefined — the probe must stamp the
    all-None failed-probe dict, never raise ZeroDivisionError
    (r16 advice)."""
    none = {"exponent": None, "exponent_head": None,
            "exponent_tail": None}
    # duplicate adjacent pair in a 3-point probe
    assert scale_stress.fit_exponent(
        [(500.0, 0.4), (500.0, 0.5), (5000.0, 1.0)]) == none
    # all points at one x (var == 0)
    assert scale_stress.fit_exponent(
        [(500.0, 0.4), (500.0, 0.5)]) == none


def test_carryforward_keeps_exponent_fields_and_recomputes_gate():
    doc = {"queries": {"a": {"ratio": 2.0}, "b": {"ratio": 1.5}}}
    prev = {"queries": {
        "a": {"ratio": 9.9, "exponent": 0.7, "exponent_tail": 0.8,
              "exponent_points": [[100, 1.0], [1000, 6.0]]},
        "gone": {"exponent": 2.0, "exponent_tail": 2.0},
    }, "exponent_gate": 99.0, "exponent_failures": ["gone"]}
    kept = scale_stress.merge_exponent_carryforward(doc, prev)
    assert kept == 1
    assert doc["queries"]["a"]["exponent"] == 0.7
    assert doc["queries"]["a"]["ratio"] == 2.0  # fresh ratio wins
    # verdict recomputed from carried rows + CURRENT gate constant,
    # never copied from prev: "gone" must not be flagged, the gate
    # must be the live code constant
    assert doc["exponent_gate"] == scale_stress.EXPONENT_GATE
    assert doc["exponent_failures"] == []


def test_carryforward_warns_when_all_exponent_rows_dropped(capsys):
    """prev had an exponent verdict but no tier name survives: the
    merge must warn loudly on stderr instead of silently dropping
    exponent_gate/exponent_failures (r16 advice)."""
    doc = {"queries": {"new_only": {"ratio": 1.0}}}
    prev = {"queries": {"old_only": {"exponent": 0.5,
                                     "exponent_tail": 0.6}},
            "exponent_gate": 1.3, "exponent_failures": []}
    kept = scale_stress.merge_exponent_carryforward(doc, prev)
    assert kept == 0
    assert "exponent_gate" not in doc
    err = capsys.readouterr().err
    assert "DROPPED" in err and "exponent" in err


def test_carryforward_silent_when_prev_had_no_exponent(capsys):
    doc = {"queries": {"a": {"ratio": 1.0}}}
    prev = {"queries": {"a": {"ratio": 2.0}}}
    assert scale_stress.merge_exponent_carryforward(doc, prev) == 0
    assert capsys.readouterr().err == ""

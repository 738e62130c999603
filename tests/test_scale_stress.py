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

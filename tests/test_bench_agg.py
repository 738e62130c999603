"""Unit tests for bench.py's run aggregation (round-9 advice: the
shared_builds/timings best-over-runs must iterate the union of keys
and mark any key missing from a run as an error, not silently drop
seconds from `value` while counting them in runs_totals)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import best_over_runs  # noqa: E402


def test_best_over_runs_takes_min_per_key():
    assert best_over_runs([{"a": 2.0, "b": 5.0}, {"a": 1.5, "b": 6.0}]) == {
        "a": 1.5,
        "b": 5.0,
    }


def test_best_over_runs_error_in_any_run_sticks():
    assert best_over_runs([{"a": 2.0}, {"a": -1.0}]) == {"a": -1.0}


def test_best_over_runs_missing_key_is_an_error_not_a_drop():
    # key only in run 1 (the advice's mixed-version-resume case):
    # run-0 keying would have dropped "b" entirely from the best dict
    # while later runs' totals still counted it.
    out = best_over_runs([{"a": 2.0}, {"a": 2.1, "b": 4.0}])
    assert out == {"a": 2.0, "b": -1.0}
    # and symmetrically when run 0 has the extra key
    out = best_over_runs([{"a": 2.0, "b": 4.0}, {"a": 2.1}])
    assert out == {"a": 2.0, "b": -1.0}


def test_best_over_runs_single_run_passthrough():
    assert best_over_runs([{"a": 2.0, "b": -1.0}]) == {"a": 2.0, "b": -1.0}

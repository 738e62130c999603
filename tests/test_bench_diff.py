"""tools/bench_diff.py — the round-over-round bench adjudication
report (SCALE.md §25 protocol as a tool). Pure-JSON logic, no Spark:
the contract under test is outlier classification (consistent vs
one-run, using per_run_queries against the BASELINE best), the exit
code gate (1 only on a consistent regression), dropped-key hygiene,
and the pre-r14 probe-comparability warning."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.bench_diff import classify_outliers, fmt_boxcal, main  # noqa: E402


def _rec(queries, per_run=None, value=100.0, boxcal=None, dropped=()):
    return {
        "value": value,
        "runs": [value, value * 1.1],
        "queries": queries,
        "per_run_queries": per_run or [],
        "boxcal": boxcal or {},
        "dropped": list(dropped),
    }


def test_classify_consistent_vs_one_run_vs_improved():
    base = _rec({"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0})
    cur = _rec(
        {"a": 2.5, "b": 2.5, "c": 0.4, "d": 1.1},
        per_run=[
            {"a": 2.5, "b": 2.5, "c": 0.5, "d": 1.1},
            {"a": 2.6, "b": 1.2, "c": 0.4, "d": 1.2},
        ],
    )
    consistent, one_run, improved = classify_outliers(cur, base, 2.0)
    # a: best 2.5x AND >2x in both runs -> consistent
    assert [e[0] for e in consistent] == ["a"]
    # b: best 2.5x but run 2 measured 1.2 -> the best-of-pair would
    # have absorbed it had the runs been swapped; one-run blip
    assert [e[0] for e in one_run] == ["b"]
    # c: 0.4x < 1/2 -> improvement; d: inside band -> nowhere
    assert [e[0] for e in improved] == ["c"]


def test_classify_skips_dropped_and_unmatched_keys():
    base = _rec({"a": 1.0, "gone": 1.0, "z": -1.0})
    cur = _rec({"a": -1.0, "new": 5.0, "z": 3.0})
    consistent, one_run, improved = classify_outliers(cur, base, 2.0)
    # a dropped in cur, z dropped in base, gone/new unmatched:
    # nothing classifiable either way
    assert consistent == [] and one_run == [] and improved == []


def test_empty_per_run_means_no_consistent_claim():
    """Without per-run evidence a >threshold best can only be called
    a blip, never a CONSISTENT regression — the gate (rc 1) must not
    fire on evidence the record doesn't contain."""
    base = _rec({"a": 1.0})
    cur = _rec({"a": 3.0}, per_run=[])
    consistent, one_run, _ = classify_outliers(cur, base, 2.0)
    assert consistent == [] and [e[0] for e in one_run] == ["a"]


def test_fmt_boxcal_flags_pre_r14_record():
    old = {"py_pre": 0.6, "py_post": 0.6, "np_pre": 0.02, "np_post": 0.001}
    new = {
        "py_pre": 0.6,
        "py_post": 0.6,
        "sustain_first5": 0.5,
        "sustain_last5": 0.5,
        "sustain_ratio": 1.0,
    }
    lines = "\n".join(fmt_boxcal(new, old))
    assert "not recorded" in lines
    assert "compare py/bw only" in lines
    # both modern -> no warning
    lines2 = "\n".join(fmt_boxcal(new, dict(new)))
    assert "compare py/bw only" not in lines2


def test_main_exit_codes_and_report(tmp_path):
    base_p = tmp_path / "base.json"
    cur_p = tmp_path / "cur.json"
    base_p.write_text(json.dumps(_rec({"a": 1.0, "b": 1.0})))
    # consistent regression on a -> rc 1
    cur_p.write_text(
        json.dumps(
            _rec(
                {"a": 3.0, "b": 1.0},
                per_run=[{"a": 3.0, "b": 1.0}, {"a": 3.1, "b": 1.1}],
                dropped=["b"],
            )
        )
    )
    assert main([str(base_p), "--current", str(cur_p)]) == 1
    # same shapes but within threshold -> rc 0
    cur_p.write_text(json.dumps(_rec({"a": 1.5, "b": 1.0})))
    assert main([str(base_p), "--current", str(cur_p)]) == 0


def test_cli_against_committed_history():
    """End-to-end over the real repo: the r13 round-close record is
    immutable history, so the rev path and the live BENCH_FULL.json
    must produce a report (rc 0 or 1 are both legal outcomes here —
    the contract is that it runs and prints the suite line)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py"), "98c41d7"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode in (0, 1), out.stderr[-500:]
    assert "best-of-pair ratio" in out.stdout


def test_singleton_run_never_consistent():
    """A budget-gated invocation records one run; a single valid
    measurement cannot support a CONSISTENT claim (the r13-verdict
    evidence shape needs at least two runs over threshold), so the
    rc-1 gate must not fire on it."""
    base = _rec({"a": 1.0})
    cur = _rec({"a": 2.5}, per_run=[{"a": 2.5}])
    consistent, one_run, _ = classify_outliers(cur, base, 2.0)
    assert consistent == [] and [e[0] for e in one_run] == ["a"]


def test_sustain_skipped_stamp_not_mistaken_for_pre_r14():
    skipped = {"py_pre": 0.6, "py_post": 0.6, "sustain_skipped": True}
    modern = {"py_pre": 0.6, "py_post": 0.6, "sustain_ratio": 1.0}
    lines = "\n".join(fmt_boxcal(modern, skipped))
    assert "skipped via env" in lines
    assert "compare py/bw only" not in lines  # np/mp stay trusted


def test_sustain_failure_rendered_not_numeric():
    """r14 advice: a failed sustain probe must read as a failure, not
    as ratio -1.0 an adjudicator could misparse. Both the explicit
    r15+ stamp and a legacy record that captured the -1.0 sentinel
    quartet render as FAILED; np/mp stay trusted (r14+ record)."""
    failed_stamp = {"py_pre": 0.6, "py_post": 0.6, "sustain_failed": True}
    legacy_sentinel = {
        "py_pre": 0.6,
        "py_post": 0.6,
        "sustain_first5": -1.0,
        "sustain_last5": -1.0,
        "sustain_ratio": -1.0,
    }
    modern = {"py_pre": 0.6, "py_post": 0.6, "sustain_ratio": 1.0}
    for bad in (failed_stamp, legacy_sentinel):
        lines = "\n".join(fmt_boxcal(modern, bad))
        assert "probe FAILED" in lines
        assert "ratio -1.0" not in lines
        assert "compare py/bw only" not in lines


def test_broken_pipe_preserves_gate_verdict(tmp_path):
    """r14 advice: `bench_diff ... | head -1` must still exit 1 when a
    CONSISTENT regression was detected — only the printing, never the
    verdict, is forgiven on a closed pipe. The records carry ~4000
    improvement rows so the report is far larger than the 64 KiB pipe
    buffer: head exits after line 1, a mid-report flush hits the
    closed pipe, and the BrokenPipeError handler actually runs (a
    one-query report fits the buffer and would never raise — the
    handler under test would be dead code to such a test)."""
    base_p = tmp_path / "base.json"
    cur_p = tmp_path / "cur.json"
    n = 4000
    base_q = {f"q{i:04d}": 1.0 for i in range(n)}
    base_q["a"] = 1.0
    cur_q = {f"q{i:04d}": 0.4 for i in range(n)}  # 4000 improvements
    cur_q["a"] = 3.0  # one CONSISTENT regression
    base_p.write_text(json.dumps(_rec(base_q)))
    cur_p.write_text(
        json.dumps(
            _rec(cur_q, per_run=[{"a": 3.0}, {"a": 3.1}])
        )
    )
    script = (
        f"{sys.executable} {REPO / 'tools' / 'bench_diff.py'} "
        f"{base_p} --current {cur_p} | head -1; "
        'echo "RC=${PIPESTATUS[0]}"'
    )
    out = subprocess.run(
        ["/bin/bash", "-c", script],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert "RC=1" in out.stdout, out.stdout + out.stderr
    # rc 1 alone cannot distinguish the handler from an UNHANDLED
    # BrokenPipeError (python exits 1 on a traceback too) — the
    # handler's job is the clean exit, so the traceback must be absent
    assert "BrokenPipeError" not in out.stderr, out.stderr


def test_identical_records_flagged_vacuous(tmp_path, capsys):
    """Once the driver's round-close commit carries the current
    BENCH_FULL.json, the bare invocation self-compares; that must be
    SAID (as the final line, which roundcheck surfaces as the gate
    verdict) rather than read as a real all-clear adjudication."""
    p = tmp_path / "same.json"
    p.write_text(json.dumps(_rec({"a": 1.0})))
    rc = main([str(p), "--current", str(p)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "IDENTICAL" in out.strip().splitlines()[-1]
    # differing records carry no such note
    q = tmp_path / "other.json"
    q.write_text(json.dumps(_rec({"a": 1.1})))
    rc = main([str(p), "--current", str(q)])
    assert "IDENTICAL" not in capsys.readouterr().out


def test_default_baseline_is_round_close_commit():
    """With no baseline argument the report adjudicates against the
    driver's last round-close commit — the exact comparison the
    roundcheck bench-diff gate needs."""
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_diff.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode in (0, 1), out.stderr[-500:]
    assert "baseline: rev " in out.stdout
    assert "best-of-pair ratio" in out.stdout

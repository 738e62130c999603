"""tools/roundcheck.py — the round-close checklist runner. The heavy
gates are the existing tools (each already tested end-to-end
elsewhere); what's under test here is the choreography contract:
gate registry shape, subset selection, unknown-gate rejection, and
that a real cheap gate runs through the subprocess path."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.roundcheck import FAST, GATES, main  # noqa: E402


def test_gate_registry_shape():
    # full-oracle is the only non-fast gate, and execution order puts
    # the diff-shaped gates (guard, lint) before the Spark suites
    assert set(FAST) == set(GATES) - {"full-oracle"}
    names = list(GATES)
    assert names.index("guard") < names.index("window-oracle")
    assert names.index("lint") < names.index("pytest")
    for argv, desc in GATES.values():
        assert argv[0] == sys.executable and desc


def test_unknown_gate_rejected(capsys):
    assert main(["--only", "guard,nope"]) == 2
    assert "unknown gate" in capsys.readouterr().err


def test_list_mode(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in GATES:
        assert name in out


def test_cheap_gate_runs_end_to_end():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "roundcheck.py"),
         "--only", "lint"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "all 1 gate(s) green" in out.stdout

"""tools/depmap.py::_clear_session_builds — the r14-advice fix that
makes builder-internal DEPMAP attribution order-independent. The
function must drop exactly THIS process's `_materialize_once` scratch
(`$TMPDIR/etl_geotab_*/<pid>-*` dirs + `.done` markers) and leave
foreign-pid scratch (a concurrently running bench/pytest) untouched.
The attribution outcome it buys is asserted separately against the
committed DEPMAP.json (every sharer of a shared build carries the
builder internals)."""

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.depmap import _clear_session_builds  # noqa: E402


def _mk_scratch(prefix: str, pid: int) -> tuple[Path, Path]:
    d = Path(tempfile.gettempdir()) / prefix / f"{pid}-deadbeef"
    d.mkdir(parents=True, exist_ok=True)
    (d / "part-0.parquet").write_text("x")
    marker = Path(str(d) + ".done")
    marker.write_text("ok")
    return d, marker


def test_clears_own_pid_scratch_only():
    own_dir, own_marker = _mk_scratch("etl_geotab_testclear", os.getpid())
    # a foreign pid that cannot be ours (pid 1 never runs this test)
    foreign_dir, foreign_marker = _mk_scratch("etl_geotab_testclear", 1)
    try:
        _clear_session_builds()
        assert not own_dir.exists() and not own_marker.exists()
        assert foreign_dir.exists() and foreign_marker.exists()
    finally:
        import shutil

        shutil.rmtree(foreign_dir, ignore_errors=True)
        foreign_marker.unlink(missing_ok=True)
        shutil.rmtree(own_dir, ignore_errors=True)
        own_marker.unlink(missing_ok=True)


def test_leaves_non_etl_tmpdirs_alone():
    d = Path(tempfile.gettempdir()) / "other_tool_scratch" / f"{os.getpid()}-x"
    d.mkdir(parents=True, exist_ok=True)
    try:
        _clear_session_builds()
        assert d.exists()
    finally:
        import shutil

        shutil.rmtree(d.parent, ignore_errors=True)


def test_committed_depmap_has_order_independent_builder_attribution():
    """The outcome the clearing buys, asserted on the committed map:
    both sharers of the session-cached ANN eval build carry the SAME
    similarity.py builder-internal symbols, and both dedup sharers
    the same dedup/clusters internals — so a builder-code change
    implicates every sharer regardless of trace order."""
    dm = json.loads((REPO / "DEPMAP.json").read_text())["queries"]

    def internals(q: str, fragment: str) -> set[str]:
        return {s for s in dm[q] if fragment in s}

    ann = internals("ann_recall_eval", "operators/similarity.py")
    assert ann and ann == internals("ndcg_eval", "operators/similarity.py")
    ded = internals("dedup_clusters", "operators/dedup.py")
    assert ded and ded == internals("dedup_keep_best", "operators/dedup.py")

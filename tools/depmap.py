"""Generate DEPMAP.json — the per-query package-dependency map that
turns the SCALE.md §21 shared-component rule into a machine check
(consumed by tools/window_guard.py).

Every registered query is executed end-to-end at a small scale factor
with a driver-side profiler active; the map records which package code
objects actually ran, truncated to TOP-LEVEL symbols:

    {"<query>": ["etl_geotab_spark/io.py::load_table",
                 "etl_geotab_spark/operators/asof.py::asof_join", ...]}

Top-level truncation (``Cls.method`` → ``Cls``, ``f.<locals>.g`` → ``f``)
is deliberate: the guard diffs BASE vs WORKTREE per top-level symbol,
so a change anywhere inside a closure/method attributes to the symbol
the depmap recorded. It also absorbs the one dynamic blind spot —
closures handed to other threads (foreachBatch callbacks, py4j
handlers) execute untraced, but the top-level function that CREATED
them runs in the traced driver thread and is recorded.

Known coverage notes (documented, accepted):
- Executor-side code (pandas UDF bodies) is not traced in the workers,
  but every UDF is *defined and cloudpickled* driver-side during plan
  construction, inside a traced package function — the enclosing
  top-level symbol is recorded.
- Session-cached shared builds (`_ann_eval_table`,
  `_dedup_labeled_table`, the other `_materialize_once` users): the
  scratch markers are CLEARED before every traced query, so each
  sharer rebuilds inside its own trace and records the builder
  INTERNALS (operators/similarity.py symbols etc.), not just the
  memoized getter. Without this, attribution of builder-internal
  symbols was run-order-dependent — only the first-traced sharer
  carried them, and a builder-code change would not implicate the
  others (r14 advice). Costs a rebuild per sharer at sf0.001.
- Data-dependent driver-side branching could differ at production SF;
  top-level granularity absorbs intra-function branches, which is the
  only place we observed it.

Usage: python tools/depmap.py [sf_dir]   (default /root/testdata/sf0.001)
Writes DEPMAP.json at the repo root. Regenerate whenever the registry
changes (the guard fails closed on a key mismatch).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG_PREFIX = os.path.join(REPO, "etl_geotab_spark") + os.sep
ENTRY_FILE = os.path.join(REPO, "__spark_entry__.py")

_seen: set[tuple[str, str]] = set()
_tracing = False


def _prof(frame, event, arg):
    if not _tracing or event != "call":
        return
    code = frame.f_code
    fname = code.co_filename
    if fname.startswith(PKG_PREFIX) or fname == ENTRY_FILE:
        top = code.co_qualname.split(".", 1)[0]
        if top == "<module>":
            top = ""
        _seen.add((os.path.relpath(fname, REPO), top))


def _entries() -> list[str]:
    return sorted(f"{p}::{q}" if q else p for p, q in _seen)


def _clear_session_builds() -> None:
    """Drop this process's `_materialize_once` scratch (the
    `$TMPDIR/etl_geotab_*/<pid>-*` dirs + `.done` markers) so the next
    traced query rebuilds its shared-build internals inside its own
    trace. Scoped to the CURRENT pid only — concurrent bench/pytest
    processes keep their scratch — and to the write-once scratch
    contract only (bucketed warehouse tables are file-format fixtures
    with their own _SUCCESS protocol and are deliberately left
    alone: their build internals are traced via the top-level
    ensure-functions every sharer calls)."""
    import glob
    import shutil
    import tempfile

    pid = os.getpid()
    pattern = os.path.join(
        tempfile.gettempdir(), "etl_geotab_*", f"{pid}-*"
    )
    for path in glob.glob(pattern):
        try:
            if path.endswith(".done"):
                os.unlink(path)
            else:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass


def volume_failures(spark, sf_dir: str,
                    pins: dict[str, int]) -> list[str]:
    """Compare the fixture tables' cardinalities (through the same
    load_table path the traced queries use) against the pinned
    volumes; returns mismatch descriptions (empty = gate passes)."""
    from etl_geotab_spark.io import load_table

    out = []
    for table, want in sorted(pins.items()):
        got = load_table(spark, sf_dir, table).count()
        if got != want:
            out.append(f"{table}: {got} rows, pinned {want}")
    return out


def main() -> int:
    global _tracing
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    # install on the MAIN thread and on every thread spawned later
    # (py4j callback/socket threads inherit it only if set before the
    # SparkSession starts them)
    threading.setprofile(_prof)
    sys.setprofile(_prof)
    _tracing = False  # armed per-query below

    from etl_geotab_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    registry = entrymod.queries()

    # §26b input-volume pin (r16 verdict item 4): a depmap generated
    # over a truncated fixture could miss data-dependent driver-side
    # branches and silently SHRINK the guard's dependency sets — the
    # fail-OPEN direction, worse than any gate failing. The guard
    # trusts this file, so refuse to write it from a wrong-volume
    # fixture. Unlike expected_for's skip-when-unpinned contract for
    # ad-hoc consumers, an UNPINNED dir fails here too: every sound
    # depmap so far was generated at a pinned driver fixture, and a
    # map from unknown inputs must not become the guard's basis.
    from fixture_volumes import expected_for

    pins = expected_for(sf_dir)
    if pins is None:
        print(f"no pinned cardinalities for {sf_dir} — depmap must be "
              "generated at a pinned driver fixture (see "
              "tools/fixture_volumes.py)")
        return 2
    bad = volume_failures(spark, sf_dir, pins)
    if bad:
        for msg in bad:
            print(f"FIXTURE VOLUME MISMATCH: {sf_dir}/{msg} — refusing "
                  "to generate DEPMAP over a wrong-volume fixture")
        return 2

    depmap: dict[str, list[str]] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(registry.items(), 1):
        _clear_session_builds()
        _seen.clear()
        _tracing = True
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        finally:
            _tracing = False
        deps = _entries()
        # the query's own registry symbol is a dependency even if the
        # profiler hiccuped on the outermost frame
        own = f"etl_geotab_spark/queries.py::{fn.__qualname__.split('.', 1)[0]}"
        if own not in deps:
            deps.append(own)
            deps.sort()
        depmap[name] = deps
        spark.catalog.clearCache()
        if i % 25 == 0 or i == len(registry):
            print(
                f"[{i}/{len(registry)}] {name} "
                f"({len(deps)} deps, {time.time() - t0:.0f}s elapsed)",
                flush=True,
            )

    rev = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    # the guard's ancestry/content soundness checks reason from the
    # generation COMMIT; uncommitted package edits at generation time
    # would make that commit a lie, so record them — the guard fails
    # closed on a map generated from a dirty package tree.
    dirty = [
        ln[3:]
        for ln in subprocess.run(
            ["git", "status", "--porcelain", "--", "etl_geotab_spark",
             "__spark_entry__.py"],
            capture_output=True, text=True, cwd=REPO,
        ).stdout.splitlines()
        if ln.strip()
    ]
    out = {
        "_meta": {
            "generated_at_commit": rev,
            "dirty_package_files": dirty,
            "sf_dir": sf_dir,
            "n_queries": len(depmap),
            "granularity": "top-level symbol (file::symbol)",
        },
        "queries": depmap,
    }
    path = os.path.join(REPO, "DEPMAP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(depmap)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

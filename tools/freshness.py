"""Driver-verification freshness ledger.

The correctness driver checks only the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so the exported ordering is
rotated per round (see the window lists at the top of
``etl_geotab_spark/queries.py``). This tool makes that rotation
mechanical and auditable:

- folds every ``CORRECTNESS_r*.json`` in the repo root into a ledger:
  for each query, the LATEST round it held a driver row and whether
  that row was green (rows+schema+hash) / red / err;
- reports freshness: how many queries' latest row is from each round,
  which oracle-paired queries have never been inside a window, and
  which are stale (latest row older than ``--fresh-horizon``);
- proposes the NEXT 50-slot window with the standing priority order:
  (0) §21 shared-component pulls — queries tools/window_guard.py
  implicates from the diff against the last round-close commit
  (round 12: the swaps rounds 10/11 applied by hand are now computed
  and front-loaded, so the proposal IS the window, not a base for
  manual edits), (1) red/err rows from the latest round (must be
  re-verified after fixes), (2) queries with no driver row EVER,
  paired before rows-only (no row at all is weaker evidence than any
  stale row), (3) ALL stale rows oldest-first, paired and rows-only
  merged (the round-7 judge caught the old proposer starving
  rows-only entries behind the paired backlog forever), (4) backfill
  with the oldest fresh rows across the whole registry. Registration
  order breaks ties so the proposal is deterministic.

Run: ``python tools/freshness.py [--fresh-horizon N] [--propose]
[--max-round N]``. No Spark session needed — this reads JSON and
imports the registry lazily via the pure-Python module top level.

``--max-round N`` pins the ledger to CORRECTNESS_r{1..N}.json — a
historical replay. The r12 judge caught the failure mode this exists
for: a pytest gate asserting "the proposer reproduces the committed
round-N window" read the LIVE ledger, so it was true at round close
and went stale the moment the driver dropped the next CORRECTNESS
file into the worktree. Replays pin the inputs instead. The §21
guard tier is skipped under --max-round (it diffs the live worktree
against the last round-close commit — there is no historical
worktree to pin it to), which matches how every committed window was
born: the guard tier contributed zero names to each (rounds 12/13)
or its pulls are asserted separately via --guard-base replay.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def load_ledger(max_round: int | None = None) -> dict[str, dict]:
    """name -> {round, green, err, history:[(round, status)]}"""
    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        rows = json.load(open(path))
        for name, row in rows.items():
            if row.get("err"):
                status = "err" if "no_oracle" not in str(row["err"]) else "rows_only"
            elif row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                status = "green"
            else:
                status = "red"
            ent = ledger.setdefault(name, {"history": []})
            ent["history"].append((rnd, status))
            ent["round"] = rnd
            ent["status"] = status
    return ledger


def registry_order() -> tuple[list[str], set[str]]:
    """All registered query names (registration order) and the subset
    that is oracle-paired."""
    sys.path.insert(0, REPO)
    from etl_geotab_spark.queries import _REGISTRY  # noqa: PLC0415

    names = list(_REGISTRY)
    paired = {n for n, (_, sql) in _REGISTRY.items() if sql is not None}
    return names, paired


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--fresh-horizon",
        type=int,
        default=None,
        help="rows older than this round count as stale "
        "(default: latest round - 2)",
    )
    ap.add_argument(
        "--propose",
        action="store_true",
        help="print the proposed next 50-slot window, one name per line",
    )
    ap.add_argument(
        "--guard-base",
        default=None,
        help="override the §21 tier's diff base commit (default: the "
        "last round-close commit; used by tests to replay history)",
    )
    ap.add_argument(
        "--max-round",
        type=int,
        default=None,
        help="pin the ledger to CORRECTNESS_r{1..N}.json (historical "
        "replay; skips the live-worktree §21 tier, see module doc)",
    )
    args = ap.parse_args()

    ledger = load_ledger(max_round=args.max_round)
    names, paired = registry_order()
    latest_round = max((e["round"] for e in ledger.values()), default=0)
    horizon = (
        args.fresh_horizon if args.fresh_horizon is not None else latest_round - 2
    )

    # --- freshness report -------------------------------------------------
    by_round: dict[int, int] = {}
    never, reds, errs = [], [], []
    for n in names:
        e = ledger.get(n)
        if e is None:
            never.append(n)
            continue
        by_round[e["round"]] = by_round.get(e["round"], 0) + 1
        if e["status"] == "red":
            reds.append(n)
        elif e["status"] == "err":
            errs.append(n)

    print(f"registered queries: {len(names)} ({len(paired)} oracle-paired)")
    print(f"driver rounds seen: 1..{latest_round}; fresh horizon: r{horizon}")
    for rnd in sorted(by_round):
        print(f"  latest row r{rnd:02d}: {by_round[rnd]:3d} queries")
    print(f"  never checked:  {len(never):3d} "
          f"({sum(1 for n in never if n in paired)} paired)")
    if reds:
        print(f"RED at latest check: {reds}")
    if errs:
        print(f"ERR at latest check: {errs}")

    stale_paired = [
        n
        for n in names
        if n in paired and n in ledger and ledger[n]["round"] < horizon
    ]
    stale_rows_only = [
        n
        for n in names
        if n not in paired and n in ledger and ledger[n]["round"] < horizon
    ]
    stale_paired.sort(key=lambda n: (ledger[n]["round"], names.index(n)))
    stale_rows_only.sort(key=lambda n: (ledger[n]["round"], names.index(n)))
    print(f"stale (< r{horizon}): {len(stale_paired)} paired, "
          f"{len(stale_rows_only)} rows-only")

    # --- next-window proposal ---------------------------------------------
    # Stale rows are ONE oldest-first tier, paired and rows-only
    # merged: a separate trailing rows-only bucket never gets reached
    # while any paired backlog exists (round-7 judge finding — the 7
    # never-windowed and 8 stale rows-only queries were starved for
    # seven straight rounds).
    stale_all = sorted(
        stale_paired + stale_rows_only,
        key=lambda n: (ledger[n]["round"], names.index(n)),
    )
    # tier 0: §21 shared-component pulls — mandatory regardless of
    # freshness (a dependent's old green row says nothing about the
    # changed code). Soft-fail loudly: a broken guard must not hide
    # the rest of the report, but a silent skip could under-propose.
    # Only computed when a proposal is actually being made (r12 advice:
    # a plain freshness report adopts nothing, so warning it about
    # missing mandatory pulls was noise), and never under --max-round
    # (the guard diffs the live worktree — unpinnable; see module doc).
    guard_reasons: dict[str, str] = {}
    implicated: list[str] = []
    if args.propose and args.max_round is None:
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import window_guard  # noqa: PLC0415

            _, guard_reasons, _ = window_guard.compute_implicated(
                base=args.guard_base
            )
            implicated = [n for n in names if n in guard_reasons]
        except Exception as ex:  # noqa: BLE001
            print(f"WARNING: §21 guard tier unavailable ({ex}) — the "
                  "proposal below may be missing MANDATORY pulls; run "
                  "tools/window_guard.py before adopting it")
    elif args.propose:
        print(f"note: §21 guard tier skipped (--max-round {args.max_round} "
              "replay — the guard diffs the live worktree, which has no "
              "pinned historical state)")
    proposal: list[str] = []
    for bucket in (
        implicated,
        reds,
        errs,
        [n for n in never if n in paired],
        [n for n in never if n not in paired],
        stale_all,
    ):
        for n in bucket:
            if n not in proposal:
                proposal.append(n)
            if len(proposal) == WINDOW:
                break
        if len(proposal) == WINDOW:
            break

    if len(proposal) < WINDOW:
        # everything urgent is covered — pad with the next-oldest fresh
        # rows across the WHOLE registry (steady state: 50 slots over
        # every query ⇒ worst-case staleness = ceil(N/50) rounds)
        backfill = sorted(
            (n for n in names if n in ledger and n not in proposal),
            key=lambda n: (ledger[n]["round"], names.index(n)),
        )
        proposal.extend(backfill[: WINDOW - len(proposal)])

    if args.propose:
        print(f"\nproposed next window ({len(proposal)}):")
        for n in proposal:
            e = ledger.get(n)
            tag = f"r{e['round']:02d}:{e['status']}" if e else "never"
            if n in guard_reasons:
                tag += f" §21: {guard_reasons[n]}"
            print(f"  {n}  [{tag}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

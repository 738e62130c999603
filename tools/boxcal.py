"""CLI for the bench box-calibration probes: print one JSON line
with the deterministic CPU microbenchmark bench.py embeds in every
bench record (``bench.boxcal`` — py_sec single-core CPython loop,
np_sec 512x512 BLAS matmul, mp_sec all-cores process-pool loop; the
mp probe is the one that catches oversubscribed-host contention a
1-thread probe cannot see).

Use it ad hoc to answer "is the box slow RIGHT NOW?" without paying a
full suite run — e.g. before adjudicating an elevated bench pair, or
to decide whether to wait out external load before measuring.
Reference points live in SCALE.md §24 (the round-13 box measured
py_sec ≈ 0.6-0.9, np_sec ≈ 0.001-0.02, mp_sec ≈ 1.0-1.3 at idle).

    $ python tools/boxcal.py
    {"py_sec": 0.634, "np_sec": 0.0227, "mp_sec": 1.2}
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import boxcal  # noqa: E402


def main() -> int:
    print(json.dumps(boxcal()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI for the bench box-calibration probes: print one JSON line
with the deterministic CPU microbenchmark bench.py embeds in every
bench record (``bench.boxcal`` — py_sec single-core CPython loop,
np_sec 512x512 BLAS matmul, bw_sec 256 MB DRAM copy, mp_sec
all-cores process-pool loop; the mp probe catches oversubscribed-host
contention a 1-thread probe cannot see, the bw probe the memory-
bandwidth dimension every cache-resident compute probe misses).

Use it ad hoc to answer "is the box slow RIGHT NOW?" without paying a
full suite run — e.g. before adjudicating an elevated bench pair, or
to decide whether to wait out external load before measuring.
Reference points live in SCALE.md §24 (the round-13 box measured
py_sec ≈ 0.6-0.9, np_sec ≈ 0.001-0.02, bw_sec ≈ 0.07-0.15,
mp_sec ≈ 1.0-1.3 at idle).

    $ python tools/boxcal.py
    {"py_sec": 0.634, "np_sec": 0.0227, "bw_sec": 0.0712, "mp_sec": 1.2}

``--sustain`` adds the probe the burst trio cannot replace: round 13
measured a suite running 40% slow while every ~1 s probe read
nominal, because the host throttled only SUSTAINED all-cores load
(the thing a 7-minute local[32] suite is and a 1 s burst is not).
``--sustain`` holds every core busy for ~20 waves of the mp workload
(~10-30 s) and reports per-wave wall seconds for the first and last
five waves plus their ratio — a ratio well above 1 means throttling
ramps in under sustained load and suite totals from this box sit
above its burst speed:

    $ python tools/boxcal.py --sustain
    {"py_sec": ..., "np_sec": ..., "mp_sec": ...,
     "sustain_first5_per_wave": 0.52, "sustain_last5_per_wave": 0.55,
     "sustain_ratio": 1.06, "sustain_waves": 20}

Stays CLI-only on purpose: bench.py records the cheap burst trio
pre/post every invocation; a 30 s probe in every bench record would
cost more than it tells.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _boxcal_task, boxcal  # noqa: E402

SUSTAIN_WAVES = 20


def sustain_probe(waves: int = SUSTAIN_WAVES) -> dict[str, float]:
    """Hold all cores busy for ``waves`` consecutive full-width waves
    of the mp workload and time each wave. Reported as mean per-wave
    wall seconds over the first five and last five waves: throttling
    that ramps in under sustained load (CPU credits, thermal, host
    rebalancing) shows as last5 > first5; a box that is merely slow
    shows both elevated against the SCALE.md §24 idle reference."""
    import multiprocessing as mp
    import os

    ncpu = os.cpu_count() or 1
    wave_secs: list[float] = []
    with mp.Pool(ncpu) as pool:
        for _ in range(waves):
            t0 = time.time()
            pool.map(_boxcal_task, range(ncpu))
            wave_secs.append(time.time() - t0)
    head = wave_secs[:5]
    tail = wave_secs[-5:]
    first5 = sum(head) / len(head)
    last5 = sum(tail) / len(tail)
    return {
        "sustain_first5_per_wave": round(first5, 3),
        "sustain_last5_per_wave": round(last5, 3),
        "sustain_ratio": round(last5 / first5, 3) if first5 > 0 else -1.0,
        "sustain_waves": float(waves),
    }


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    out = boxcal()
    if "--sustain" in args:
        out.update(sustain_probe())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

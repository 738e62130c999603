"""Box-calibration probes: the deterministic CPU microbenchmark
bench.py embeds in every bench record, plus the sustained all-cores
probe, in a module that imports NOTHING heavy (r13 ADVICE: the old
CLI imported bench, which imports pyspark and __spark_entry__ at
module top — multi-second import latency and a hard dependency the
pure-CPU probes don't need; the definitions now live HERE and
bench.py imports from this module, not the other way round).

``boxcal()`` — py_sec single-core CPython loop, np_sec 512x512 BLAS
matmul, bw_sec 256 MB DRAM copy, mp_sec all-cores process-pool loop;
the mp probe catches oversubscribed-host contention a 1-thread probe
cannot see, the bw probe the memory-bandwidth dimension every
cache-resident compute probe misses.

Use the CLI ad hoc to answer "is the box slow RIGHT NOW?" without
paying a full suite run — e.g. before adjudicating an elevated bench
pair, or to decide whether to wait out external load before
measuring. Reference points live in SCALE.md §24 (the round-13 box
measured py_sec ≈ 0.6-0.9, np_sec ≈ 0.001-0.02, bw_sec ≈ 0.07-0.15,
mp_sec ≈ 1.0-1.3 at idle — NOTE the r14 probe fixes below shift the
np and mp references: np_sec loses its one-time BLAS warm-up spike,
mp_sec loses pool-fork cost, so only r14+ values are comparable to
r14+ values for those two probes).

    $ python tools/boxcal.py
    {"py_sec": 0.634, "np_sec": 0.0006, "bw_sec": 0.0712, "mp_sec": 0.9}

``--sustain`` adds the probe the burst quartet cannot replace: round
13 measured a suite running 40% slow while every ~1 s probe read
nominal, because the host throttled only SUSTAINED all-cores load
(the thing a 7-minute local[32] suite is and a 1 s burst is not).
``--sustain`` holds every core busy for ~20 waves of the mp workload
(~10-30 s) and reports per-wave wall seconds for the first and last
five waves plus their ratio — a ratio well above 1 means throttling
ramps in under sustained load and suite totals from this box sit
above its burst speed:

    $ python tools/boxcal.py --sustain
    {"py_sec": ..., "np_sec": ..., "bw_sec": ..., "mp_sec": ...,
     "sustain_first5_per_wave": 0.52, "sustain_last5_per_wave": 0.55,
     "sustain_ratio": 1.06, "sustain_waves": 20}

Since r14 (verdict item 3) bench.py also runs the sustain probe ONCE
before run 1 and records it in the bench JSON — §24's own negative
result was that the burst probes stayed nominal while the sustained
suite ran 25-40% slow, so the probe that matches the symptom must be
in-record, not CLI-only, for slow-box adjudication to be complete.
"""

from __future__ import annotations

import json
import sys
import time


def _boxcal_task(_i: int) -> int:
    """Per-process unit of the all-cores probes (module-level so
    multiprocessing can pickle it)."""
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    return acc


def boxcal() -> dict[str, float]:
    """Deterministic CPU microbenchmark — the box-speed scalar that
    rides along in the bench JSON so cross-round comparisons are
    normalizable by MEASUREMENT, not by reasoning about the diff.

    Motivation (round 13): a byte-identical code state benched
    261-397 s total across same-day invocations; the standing
    >10%-spread policy adjudicated that as box noise, but the only
    evidence was "the window guard proves zero executed statements
    changed, so it must be the box". This scalar records the box
    itself: a round whose totals move together with ``boxcal`` moved
    because the box did.

    Four fixed probes, each best-of-N (a one-off scheduler blip or GC
    pause hits one sample; a genuinely slow/stolen box keeps all
    slow — same rationale as bench.probe_sec's best-of-2):

    - ``py_sec`` — 10M-iteration integer multiply-accumulate in pure
      CPython, best-of-2: single-core speed including hypervisor
      steal and frequency throttling.
    - ``np_sec`` — fixed 512x512 float64 matmul (numpy/BLAS),
      best-of-3 AFTER one discarded warm-up matmul (r13 ADVICE: the
      first-ever BLAS call pays one-time thread-pool/page-fault
      setup that best-of-3 didn't absorb — the r13 record shows
      np_pre=0.022 vs np_post=0.0006, a 37x artifact of call order,
      not load; with the warm-up, pre and post are both steady-state
      and comparable): the vectorized path, sensitive to multi-core
      contention when BLAS threads.
    - ``mp_sec`` — 2x cpu_count() five-M-iteration loops over a
      cpu_count()-process pool, single-shot wall seconds over
      pool.map ONLY — the pool is created and warmed (one discarded
      ncpu-wide wave) OUTSIDE the timed region (r13 ADVICE: timing
      pool creation partly measured fork cost of the parent's memory
      footprint, large after a pyspark import, rather than box
      speed). This is the ALL-CORES probe: round-13 measured a suite
      running 50% slow while ``py_sec`` stayed nominal — a 1-thread
      probe can always be scheduled on an oversubscribed host; only
      demanding every core at once (which is what local[32] Spark
      does) exposes the contention. On an idle box mp_sec ≈ 2x the
      per-task loop time (two full waves); rising mp_sec with flat
      py_sec reads as host-level multicore contention. -1.0 if the
      pool fails.
    - ``bw_sec`` — 256 MB float64 copy into a pre-faulted
      destination, best-of-3: DRAM bandwidth, the dimension Spark
      shuffles and row-to-columnar transposes saturate but every
      cache-resident compute probe misses (round-13 idle reference
      ≈ 0.07 s ≈ 7 GB/s single-thread).

    Runs outside Spark, before the JVM exists — it measures the box,
    not the engine."""
    import numpy as np

    py_best = float("inf")
    for _ in range(2):
        t0 = time.time()
        acc = 0
        for i in range(10_000_000):
            acc += i * i
        py_best = min(py_best, time.time() - t0)

    mat = np.arange(512 * 512, dtype=np.float64).reshape(512, 512)
    mat /= 1.0e6
    (mat @ mat).sum()  # discarded warm-up: one-time BLAS setup
    np_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        (mat @ mat).sum()
        np_best = min(np_best, time.time() - t0)

    src = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault both in so timing excludes allocation
    bw_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.copyto(dst, src)
        bw_best = min(bw_best, time.time() - t0)
    del src, dst

    mp_sec = -1.0
    try:
        import multiprocessing as mp
        import os

        ncpu = os.cpu_count() or 1
        with mp.Pool(ncpu) as pool:
            pool.map(_boxcal_task, range(ncpu))  # discarded warm wave
            t0 = time.time()
            pool.map(_boxcal_task, range(2 * ncpu))
            mp_sec = round(time.time() - t0, 3)
    except Exception as e:  # keep the bench alive on any pool failure
        print(f"boxcal: mp probe failed: {e}", file=sys.stderr)

    return {
        "py_sec": round(py_best, 3),
        "np_sec": round(np_best, 4),
        "bw_sec": round(bw_best, 4),
        "mp_sec": mp_sec,
    }


MINI_PY_ITERS = 1_500_000
MINI_TASK_ITERS = 500_000


def _mini_task(_i: int) -> int:
    """Per-process unit of the ~0.1 s window probe (module-level so
    multiprocessing can pickle it)."""
    acc = 0
    for i in range(MINI_TASK_ITERS):
        acc += i * i
    return acc


def mini_probe(pool=None) -> dict[str, float]:
    """~0.1 s box probe for INTERLEAVING between bench queries (r17
    verdict item 2): the r17 record proved endpoint probes miss
    mid-run host contamination (eight attempts; one run's endpoints
    read nominal while untouched trivial queries ran 10x), so bench
    runs this every few queries and annotates per-query rows with the
    nearest reading — a judge can then separate host phase from code
    without an 8-core rerun.

    Two dimensions, scaled to ~0.1 s so ~20 windows cost ~2-3 s/run:
    ``py`` a 1.5M-iteration single-core loop (steal/throttle), ``mp``
    one all-cores wave of 0.5M-iteration tasks over a CALLER-OWNED
    persistent pool (multicore contention — the dimension a 1-thread
    probe cannot see; pool is created+warmed once per run by the
    caller so fork cost never lands in a window). ``mp`` is -1.0
    when no pool is available."""
    t0 = time.time()
    acc = 0
    for i in range(MINI_PY_ITERS):
        acc += i * i
    py = time.time() - t0
    mp_s = -1.0
    if pool is not None:
        import os

        try:
            t0 = time.time()
            pool.map(_mini_task, range(os.cpu_count() or 1))
            mp_s = time.time() - t0
        except Exception as e:
            print(f"boxcal: mini mp probe failed: {e}", file=sys.stderr)
    return {"py": round(py, 4), "mp": round(mp_s, 4)}


SUSTAIN_WAVES = 20


def sustain_probe(waves: int = SUSTAIN_WAVES) -> dict[str, float]:
    """Hold all cores busy for ``waves`` consecutive full-width waves
    of the mp workload and time each wave. Reported as mean per-wave
    wall seconds over the first five and last five waves: throttling
    that ramps in under sustained load (CPU credits, thermal, host
    rebalancing) shows as last5 > first5; a box that is merely slow
    shows both elevated against the SCALE.md §24 idle reference.

    One discarded warm-up wave runs before the timed waves so pool
    worker spin-up (fork cost of the parent's footprint — large when
    called from bench.py after the pyspark import) never lands in
    wave 1 and fakes a ramp-DOWN. The early/late windows never
    overlap: their width is min(5, waves // 2), so a short-waves run
    compares genuinely-early vs genuinely-late waves instead of
    averaging a real ramp away through shared members. All values
    -1.0 if the pool fails or waves < 2 (the bench record must
    survive any probe failure)."""
    import multiprocessing as mp
    import os

    if waves < 2:  # no disjoint early/late windows possible
        return {
            "sustain_first5_per_wave": -1.0,
            "sustain_last5_per_wave": -1.0,
            "sustain_ratio": -1.0,
            "sustain_waves": -1.0,
        }
    try:
        ncpu = os.cpu_count() or 1
        wave_secs: list[float] = []
        with mp.Pool(ncpu) as pool:
            pool.map(_boxcal_task, range(ncpu))  # discarded warm wave
            for _ in range(waves):
                t0 = time.time()
                pool.map(_boxcal_task, range(ncpu))
                wave_secs.append(time.time() - t0)
    except Exception as e:
        print(f"boxcal: sustain probe failed: {e}", file=sys.stderr)
        return {
            "sustain_first5_per_wave": -1.0,
            "sustain_last5_per_wave": -1.0,
            "sustain_ratio": -1.0,
            "sustain_waves": -1.0,
        }
    k = min(5, waves // 2)  # disjoint early/late windows, always
    head = wave_secs[:k]
    tail = wave_secs[-k:]
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

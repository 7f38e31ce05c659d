"""STREAM-triad hardware control: the box's aggregate memory bandwidth at
1/8/32 pinned cores (pure numpy ``c = a + 1.7*b`` over 40M doubles).

The engine is memory-bandwidth-bound at >=8 cores (BENCH/BASELINE.md), so
EVERY scaling claim needs this control measured in the same session: the
pipeline's N->4N efficiency can never exceed the triad's, and a collapsed
or erratic wide-width triad (observed round 5: 32-core aggregate swinging
1.2-12.2 GB/s across minutes while 8-core held 5.5-29 — figures from the
pre-fix unfused instrument; the RATIOS are the signal) means the host —
a VM on shared hardware — is the bottleneck and engine numbers from that
window are not comparable across rounds. Run interleaved (``--reps``)
and report the RANGE.

Usage: python BENCH/run_triad.py [--reps 2] [--widths 1 8 32]
Prints one JSON line: {"triad_gbs": {"1": [..], "8": [..], "32": [..]}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

N = 40_000_000  # doubles per worker: 320 MB working set defeats caches


def _triad(core: int, q, dur: float) -> None:
    import numpy as np

    os.sched_setaffinity(0, {core})
    a = np.random.rand(N)
    b = np.random.rand(N)
    c = np.empty_like(a)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < dur:
        # out= kernels: no temporaries, no per-rep allocation. Credited
        # traffic per element: read b + write c (multiply), read a +
        # read c + write c (add) = 5 × 8 B (write-allocate RFO ignored,
        # as in STREAM convention). NB rounds 1-4 used the unfused
        # `c = a + 1.7*b` (a 320 MB temporary per rep) and credited only
        # 3 ops — those absolute GB/s under-report real traffic ~2× and
        # are NOT comparable to this instrument; within-session ratios
        # (the collapse forensics) are unaffected.
        np.multiply(b, 1.7, out=c)
        np.add(a, c, out=c)
        reps += 1
    dt = time.perf_counter() - t0
    q.put(reps * 5 * N * 8 / dt / 1e9)


def measure(width: int, dur: float = 10.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_triad, args=(i, q, dur)) for i in range(width)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return round(sum(q.get() for _ in ps), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--widths", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--dur", type=float, default=10.0)
    args = ap.parse_args()

    out: dict[str, list[float]] = {str(w): [] for w in args.widths}
    for _ in range(args.reps):  # interleave widths within each rep
        for w in args.widths:
            gbs = measure(w, args.dur)
            out[str(w)].append(gbs)
            print(f"{w:2d} cores: {gbs:.2f} GB/s", flush=True)
    print(json.dumps({"triad_gbs": out}))


if __name__ == "__main__":
    main()

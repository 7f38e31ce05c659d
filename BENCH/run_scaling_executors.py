"""Executor-count scaling (the north_rule's actual N-vs-4N shape): emulate
executors as separate pinned 8-core Spark processes, data-parallel over
conversation shards.

Every pipeline stage keys by conv_id, so a shard-per-executor run produces
exactly the union of the single-executor run's outputs — the same way a real
cluster splits the table by partition. Unlike thread-level local[N] scaling,
each emulated executor has its own JVM, driver thread, GC, Python workers
and page-cache slice, so none of the single-process artifacts (shared
scheduler, allocator contention, auxiliary-thread spillover) pollute the
measurement.

N=1: one pinned local[8] process over all conversations.
N=4: four concurrent pinned local[8] processes, shard i of 4 each.
Efficiency = throughput(4 exec) / (4 x throughput(1 exec)).

Usage: python BENCH/run_scaling_executors.py [--n-convs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
CORES_PER_EXEC = 8


def cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat. This box is a VM on a shared
    host: hypervisor STEAL during a run is the dominant variance source
    (measured collapses of concurrent 32-core-demand runs while 8-core runs
    barely moved), so every scaling artifact records it — a run with
    steal_pct more than a few % is a co-tenant artifact, not engine
    behavior; rerun it."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt else 0.0


def _cmd(cpu_lo: int, wd: str, n_convs: int, mega: int, seed: int, shard: int, nshards: int):
    return [
        "taskset", "-c", f"{cpu_lo}-{cpu_lo + CORES_PER_EXEC - 1}",
        sys.executable, str(REPO / "jobs" / "rollup_job.py"),
        "--workdir", wd,
        "--n-convs", str(n_convs),
        "--mega-turns", str(mega),
        "--seed", str(seed),
        "--cpus", str(CORES_PER_EXEC),
        "--buckets", "8",
        "--stats", "fast",
        "--shard-index", str(shard),
        "--shard-count", str(nshards),
    ]


def run_level(n_exec: int, n_convs: int, mega: int, seed: int) -> dict:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    dirs, procs = [], []
    ticks0 = cpu_ticks()
    t0 = time.perf_counter()
    for i in range(n_exec):
        wd = tempfile.mkdtemp(prefix=f"exec{n_exec}_{i}_", dir=base)
        sd = tempfile.mkdtemp(prefix=f"exec{n_exec}_{i}_shuffle_", dir=base)
        dirs += [wd, sd]
        env = dict(os.environ, SPARK_LOCAL_DIRS=sd)
        procs.append(
            subprocess.Popen(
                _cmd(i * CORES_PER_EXEC, wd, n_convs, mega, seed, i, n_exec),
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                cwd=REPO, env=env,
            )
        )
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    wall = time.perf_counter() - t0
    steal = steal_pct(ticks0, cpu_ticks())
    turns = 0
    for o in outs:
        last = [l for l in o.strip().splitlines() if l.startswith("{")][-1]
        turns += json.loads(last)["turns"]
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    return {"n_exec": n_exec, "wall_sec": round(wall, 2), "turns": turns,
            "turns_per_sec": round(turns / wall, 1), "steal_pct": steal}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=100000)
    ap.add_argument("--mega-turns", type=int, default=100000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "SCALING_EXECUTORS.json"))
    args = ap.parse_args()

    one = run_level(1, args.n_convs, args.mega_turns, args.seed)
    four = run_level(4, args.n_convs, args.mega_turns, args.seed)
    assert one["turns"] == four["turns"], "shards must cover the same input"
    eff = four["turns_per_sec"] / (4 * one["turns_per_sec"])
    result = {
        "protocol": "1 vs 4 emulated executors (pinned 8-core processes, conv shards)",
        "n_convs": args.n_convs,
        "turns": one["turns"],
        "one_exec": one,
        "four_exec": four,
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

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

Strong scaling (default): identical input at both levels.
  N=1: one pinned local[8] process over all conversations.
  N=4: four concurrent pinned local[8] processes, shard i of 4 each.
  efficiency = throughput(4 exec) / (4 x throughput(1 exec)).

Weak scaling (--weak): input grows with executors (each executor gets the
same per-executor work — the bandwidth-tolerant supplementary protocol from
VERDICT r5 item 1; on a real cluster this is "4x the nodes ingest 4x the
days in the same wall time").
  N=1: --n-convs N over one process.
  N=4: --n-convs 4N, shard i of 4 each (= N convs per process).
  efficiency = throughput(4 exec) / (4 x throughput(1 exec)) ~= wall1/wall4.

HOST GATING (VERDICT r5 item 1 — this box is a VM whose wide-width memory
bandwidth collapses erratically; BENCH/scaling_r05.md): every attempt is
BRACKETED by a STREAM-triad measurement at 8 and 32 pinned cores
(BENCH/run_triad.py's fused instrument, in-process). An attempt only counts
if, on BOTH brackets, the 32-wide aggregate bandwidth is at least
--gate-ratio x the 8-wide aggregate (a healthy memory system never loses
aggregate bandwidth when widening 8 -> 32; the round-5 collapse windows
showed 32-wide at 0.1-0.3x of 8-wide) AND the run's hypervisor steal stays
under --max-steal-pct. Unfit windows are retried up to --max-attempts with
--wait-sec between them; every attempt's forensics (triad GB/s, ratios,
steal) are recorded in the artifact either way, so a failing session leaves
a committed host-unfit record instead of silence.

Usage: python BENCH/run_scaling_executors.py [--n-convs 100000] [--weak]
       [--max-attempts 3] [--gate-ratio 1.0] [--max-steal-pct 3.0]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
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
    behavior; rerun it. Returns (0, 0) on hosts without /proc (matching
    bench.py's guard)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
    except OSError:
        return 0, 0
    vals = [int(x) for x in parts]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt else 0.0


def triad_bracket(dur: float = 6.0) -> dict:
    """8-wide and 32-wide aggregate STREAM-triad GB/s (run_triad.measure,
    imported — one instrument, one accounting convention). The RATIO is the
    gate: absolute GB/s on this VM swing minute-to-minute, but 32-wide
    falling BELOW 8-wide is unambiguous host collapse."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from run_triad import measure

    g8 = measure(8, dur)
    g32 = measure(32, dur)
    return {"gbs_8": g8, "gbs_32": g32,
            "ratio_32_over_8": round(g32 / g8, 3) if g8 else 0.0}


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
    """One scaling level: n_exec concurrent pinned 8-core processes covering
    conv shards 0..n_exec-1 of ``n_convs`` total conversations."""
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


def attempt(args) -> dict:
    """One gated attempt: triad -> (gate) -> 1-exec -> 4-exec -> triad ->
    (gate). Returns the full record; ``fit`` says whether it counts."""
    rec: dict = {"mode": "weak" if args.weak else "strong"}
    rec["triad_pre"] = triad_bracket(args.triad_dur)
    if rec["triad_pre"]["ratio_32_over_8"] < args.gate_ratio:
        rec["fit"] = False
        rec["unfit_reason"] = (
            f"pre-run triad collapse: 32-wide/8-wide = "
            f"{rec['triad_pre']['ratio_32_over_8']} < {args.gate_ratio}"
        )
        return rec
    if args.weak:
        one = run_level(1, args.n_convs, args.mega_turns, args.seed)
        four = run_level(4, 4 * args.n_convs, args.mega_turns, args.seed)
    else:
        one = run_level(1, args.n_convs, args.mega_turns, args.seed)
        four = run_level(4, args.n_convs, args.mega_turns, args.seed)
        assert one["turns"] == four["turns"], "shards must cover the same input"
    rec["one_exec"], rec["four_exec"] = one, four
    rec["efficiency"] = round(
        four["turns_per_sec"] / (4 * one["turns_per_sec"]), 3
    )
    rec["triad_post"] = triad_bracket(args.triad_dur)
    reasons = []
    if rec["triad_post"]["ratio_32_over_8"] < args.gate_ratio:
        reasons.append(
            f"post-run triad collapse: 32-wide/8-wide = "
            f"{rec['triad_post']['ratio_32_over_8']} < {args.gate_ratio}"
        )
    for lvl in (one, four):
        if lvl["steal_pct"] > args.max_steal_pct:
            reasons.append(
                f"{lvl['n_exec']}-exec steal {lvl['steal_pct']}% > "
                f"{args.max_steal_pct}%"
            )
    rec["fit"] = not reasons
    if reasons:
        rec["unfit_reason"] = "; ".join(reasons)
    return rec


def main() -> None:
    mp.set_start_method("spawn", force=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=100000)
    ap.add_argument("--mega-turns", type=int, default=100000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: input grows with executors")
    ap.add_argument("--max-attempts", type=int, default=3)
    ap.add_argument("--wait-sec", type=float, default=180.0,
                    help="pause between unfit windows before retrying")
    ap.add_argument("--gate-ratio", type=float, default=1.0,
                    help="min acceptable triad 32-wide/8-wide ratio")
    ap.add_argument("--max-steal-pct", type=float, default=3.0)
    ap.add_argument("--triad-dur", type=float, default=6.0)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "SCALING_EXECUTORS.json"))
    args = ap.parse_args()

    attempts = []
    final = None
    for i in range(args.max_attempts):
        print(f"attempt {i + 1}/{args.max_attempts} ...", file=sys.stderr, flush=True)
        rec = attempt(args)
        rec["attempt"] = i + 1
        attempts.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        if rec["fit"]:
            final = rec
            break
        if i + 1 < args.max_attempts:
            time.sleep(args.wait_sec)

    result = {
        "protocol": (
            "1 vs 4 emulated executors (pinned 8-core processes, conv shards), "
            + ("WEAK scaling (input prop. to executors), " if args.weak else "")
            + "triad-bracket host-gated"
        ),
        "n_convs": args.n_convs,
        "gate": {"min_triad_ratio": args.gate_ratio,
                 "max_steal_pct": args.max_steal_pct},
        "attempts": attempts,
        "host_fit": final is not None,
    }
    if final is not None:
        result["turns"] = final["one_exec"]["turns"]
        result["one_exec"] = final["one_exec"]
        result["four_exec"] = final["four_exec"]
        result["efficiency"] = final["efficiency"]
        result["pass"] = final["efficiency"] >= 0.8
    else:
        result["verdict"] = (
            "host unfit in every attempted window — forensics per attempt "
            "above; engine scaling cannot be judged from this session"
        )
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Scaling-efficiency protocol (BASELINE.md): run the identical pipeline job
at local[8] and local[32] on the identical input, cold JVM + cold workdir
each, and report throughput at both plus efficiency = (T8/T32)/(32/8).

Usage: python BENCH/run_scaling.py [--n-convs 50000] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_once(cpus: int, n_convs: int, mega: int, seed: int) -> dict:
    wd = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
    try:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "jobs" / "rollup_job.py"),
                "--workdir", wd,
                "--n-convs", str(n_convs),
                "--mega-turns", str(mega),
                "--seed", str(seed),
                "--cpus", str(cpus),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        wall = time.perf_counter() - t0
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        summary = json.loads(last)
        summary["proc_wall_sec"] = round(wall, 1)
        summary["cpus"] = cpus
        return summary
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=50000)
    ap.add_argument("--mega-turns", type=int, default=50000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--out", default=str(REPO / "BENCH" / "BASELINE.md"))
    args = ap.parse_args()

    lo, hi = args.levels
    runs = {p: run_once(p, args.n_convs, args.mega_turns, args.seed) for p in (lo, hi)}
    t_lo, t_hi = runs[lo]["total_wall_sec"], runs[hi]["total_wall_sec"]
    tp_lo, tp_hi = runs[lo]["turns_per_sec"], runs[hi]["turns_per_sec"]
    eff = (t_lo / t_hi) / (hi / lo)

    lines = [
        "# BENCH/BASELINE — scaling-efficiency evidence",
        "",
        "Protocol (BASELINE.md): identical full pipeline job (synth -> gap-fill ->",
        "treatment -> 1m/1h/1d rollup cascade -> Gorilla chunks, all stages",
        "checkpointed) at two parallelism levels, cold JVM + cold workdir each run.",
        f"Input: {args.n_convs} conversations (~{runs[lo]['turns']} turns, seed {args.seed},",
        f"mega-conversation of {args.mega_turns} turns for the skew case).",
        "",
        "| parallelism | pipeline wall (s) | turns/sec | per-stage (s) |",
        "|---|---|---|---|",
    ]
    for p in (lo, hi):
        st = runs[p]["stages"]
        per = ", ".join(f"{k}={v['wall_sec']}" for k, v in st.items())
        lines.append(
            f"| local[{p}] | {runs[p]['total_wall_sec']} | {runs[p]['turns_per_sec']} | {per} |"
        )
    lines += [
        "",
        f"**Scaling efficiency local[{lo}] → local[{hi}]** = (T{lo}/T{hi}) / ({hi}/{lo})"
        f" = ({t_lo:.1f}/{t_hi:.1f}) / {hi//lo} = **{eff:.3f}**"
        f" — {'PASS' if eff >= 0.8 else 'FAIL'} vs the ≥0.8 criterion.",
        "",
        f"Throughput: {tp_lo} turns/sec at local[{lo}] → {tp_hi} turns/sec at local[{hi}].",
        "",
        "Notes: single-JVM local mode shares the driver, the OS page cache and the",
        "Python worker pool across both levels; on a real multi-executor cluster the",
        "same job partitions by (p_day, p_bucket) and scales with executors the same",
        "way it scales with local cores here (no driver-side loops, no collect() in",
        "the pipeline; every stage is shuffle- or map-parallel).",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(json.dumps({"efficiency": round(eff, 3), "t_lo": t_lo, "t_hi": t_hi,
                      "tp_lo": tp_lo, "tp_hi": tp_hi}))


if __name__ == "__main__":
    main()

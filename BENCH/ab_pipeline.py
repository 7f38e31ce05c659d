"""Interleaved A/B of ``bench.run_transcript_pipeline`` between two repo
checkouts (e.g. a ``git worktree`` of a prior round vs the current tree).

Protocol (VERDICT r4 item 1): each rep is a COLD subprocess (fresh JVM,
fresh temp workdir) and the engines strictly alternate A,B,A,B,... so
slow host windows hit both sides equally — this box shows ±6.5-40%
same-commit wall-clock swings, so only interleaved medians support a
regression judgment. Run this EXCLUSIVELY (no concurrent pytest/bench).

Usage:
    python BENCH/ab_pipeline.py --a /tmp/r3eng --b /root/repo \
        --reps 3 --convs 60000 --cpus 32 --out BENCH/ab_r05.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time

RUNNER = r"""
import sys, time
repo = sys.argv[1]; convs = int(sys.argv[2]); cpus = int(sys.argv[3])
sys.path.insert(0, repo)
import bench
from pneuma_treatment_spark.session import get_spark
spark = get_spark("ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.perf_counter()
n = bench.run_transcript_pipeline(spark, n_convs=convs)
wall = time.perf_counter() - t0
print(f"ABRESULT {wall:.3f} {n}")
"""


def run_once(repo: str, convs: int, cpus: int) -> tuple[float, int]:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, str(convs), str(cpus)],
        capture_output=True, text=True, cwd=repo, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            _, wall, n = line.split()
            return float(wall), int(n)
    raise RuntimeError(
        f"no ABRESULT from {repo}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="repo path for engine A")
    ap.add_argument("--b", required=True, help="repo path for engine B")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    walls: dict[str, list[float]] = {args.label_a: [], args.label_b: []}
    turns = 0
    for rep in range(args.reps):
        for label, repo in ((args.label_a, args.a), (args.label_b, args.b)):
            t0 = time.strftime("%H:%M:%S")
            wall, turns = run_once(repo, args.convs, args.cpus)
            walls[label].append(round(wall, 3))
            print(f"[{t0}] rep {rep + 1} {label}: {wall:.1f}s "
                  f"({turns / wall:.0f} turns/s)", flush=True)

    med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    result = {
        "protocol": "interleaved cold-JVM A/B, bench.run_transcript_pipeline",
        "convs": args.convs, "turns": turns, "cpus": args.cpus,
        "reps": args.reps, "walls_sec": walls, "medians_sec": med,
        "median_turns_per_sec": {
            k: round(turns / v, 1) for k, v in med.items()
        },
        "delta_pct_b_vs_a": round(
            100.0 * (med[args.label_b] - med[args.label_a]) / med[args.label_a], 1
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

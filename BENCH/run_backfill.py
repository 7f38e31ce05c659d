"""Ops-path cost of the late-data backfill vs a from-scratch rebuild.

The backfill's 100 TB case is structural (recompute ∝ affected
conversations, rewrite ∝ their partition footprint — plans/backfill.py
docstring); this harness measures the same-box evidence at bench scale:
build a table, apply a small late-delta both ways — `backfill_pipeline`
into the live workdir vs `run_pipeline` from scratch on the updated
input — and record walls, bytes rewritten vs table bytes, and partitions
rewritten vs total. Wall floors out at fixed Spark job overhead for tiny
deltas; the bytes/partitions ratios are the host-independent signal.

    python BENCH/run_backfill.py --out BENCH/backfill_r06.json
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from jobs.rollup_job import run_pipeline  # noqa: E402

sys.path.insert(0, str(REPO / "BENCH"))
from hostmeta import cpu_ticks, steal_pct  # noqa: E402  (shared (steal, total) helper)
from pneuma_treatment_spark.io.tableio import TableIO  # noqa: E402
from pneuma_treatment_spark.plans.backfill import backfill_pipeline  # noqa: E402
from pneuma_treatment_spark.session import get_spark  # noqa: E402

RAW_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def leaf_partition_dirs(table_path: str) -> int:
    """Count leaf partition directories (dirs containing data files)."""
    n = 0
    for r, dirs, files in os.walk(table_path):
        if "=" in os.path.basename(r) and any(f.endswith(".parquet") for f in files):
            n += 1
    return n


def walk_bytes(root: str, min_mtime: float = 0.0) -> tuple[int, int]:
    total, n = 0, 0
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            if st.st_mtime >= min_mtime:
                total += st.st_size
                n += 1
    return total, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=30000)
    ap.add_argument("--delta-convs", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--workroot", default="/dev/shm/bf_bench")
    ap.add_argument("--out", default=str(REPO / "BENCH" / "backfill_r06.json"))
    args = ap.parse_args()

    shutil.rmtree(args.workroot, ignore_errors=True)
    wd_a = f"{args.workroot}/wd_a"
    wd_b = f"{args.workroot}/wd_b"
    upd = f"{args.workroot}/updated_raw"

    spark = get_spark(
        "backfill-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0, ticks0 = time.perf_counter(), cpu_ticks()
    run_pipeline(spark, wd_a, n_convs=args.n_convs, seed=42, mega_turns=20000)
    build_wall = time.perf_counter() - t0

    io = TableIO(spark, wd_a)
    ingest = io.read("ingest")
    step = max(1, args.n_convs // args.delta_convs)
    # offset by step//2 so conv00000000 — the mega conversation — stays out
    # of the sample: a mega-conv delta is a valid stress (first committed run
    # measured it: 20k rows recomputed, 47 partitions, worked fine) but it
    # swamps the typical-delta cost this artifact is about
    conv_ids = [f"conv{i * step + step // 2:08d}" for i in range(args.delta_convs)]
    tgt = ingest.where(F.col("conv_id").isin(conv_ids))
    corrected = tgt.where(F.col("turn_idx") == 1).select(RAW_COLS).withColumn(
        "text", F.lit("corrected by the backfill bench, rather more tokens than before")
    )
    last = (
        tgt.groupBy("conv_id").agg(F.max("turn_idx").alias("mi"), F.max("ts").alias("mts"))
    )
    late = last.select(
        "conv_id",
        (F.col("mi") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("one late turn per conversation").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("mts") + F.expr("INTERVAL 60 SECONDS")).alias("ts"),
    )
    delta = corrected.unionByName(late)
    delta_path = f"{args.workroot}/delta"
    delta.write.mode("overwrite").parquet(delta_path)
    delta = spark.read.parquet(delta_path)

    # updated raw input for the rebuild control (write cost excluded from both)
    ingest.select(RAW_COLS).join(
        delta.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    ).unionByName(delta).write.mode("overwrite").parquet(upd)

    table_bytes, table_files = walk_bytes(wd_a)

    mark = time.time()
    t0 = time.perf_counter()
    summary = backfill_pipeline(spark, wd_a, delta)
    backfill_wall = time.perf_counter() - t0
    rewritten_bytes, rewritten_files = walk_bytes(wd_a, min_mtime=mark)

    t0 = time.perf_counter()
    run_pipeline(spark, wd_b, n_convs=args.n_convs, seed=42, mega_turns=20000,
                 input_table=upd)
    rebuild_wall = time.perf_counter() - t0
    steal = steal_pct(ticks0, cpu_ticks())

    out = {
        "n_convs": args.n_convs,
        "turns": io.read("ingest").count(),
        "delta_convs": args.delta_convs,
        "delta_rows": delta.count(),
        "build_wall_sec": round(build_wall, 2),
        "backfill_wall_sec": round(backfill_wall, 2),
        "rebuild_wall_sec": round(rebuild_wall, 2),
        "speedup_vs_rebuild": round(rebuild_wall / backfill_wall, 1),
        "table_bytes": table_bytes,
        "rewritten_bytes": rewritten_bytes,
        "rewritten_frac": round(rewritten_bytes / max(1, table_bytes), 4),
        "table_files": table_files,
        "rewritten_files": rewritten_files,
        "merge_stats": summary["tables"],
        "table_total_parts": {
            t: leaf_partition_dirs(os.path.join(wd_a, t))
            for t in ("ingest", "filled", "treated", "rollup_1m", "rollup_1h",
                      "rollup_1d", "chunks")
        },
        "host_steal_pct": steal,
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(args.workroot, ignore_errors=True)


if __name__ == "__main__":
    main()

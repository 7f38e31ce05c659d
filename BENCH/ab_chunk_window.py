"""Warm-JVM alternating A/B: windowed chunk grouping (round 6, TTL-capable)
vs the round-5 flat conv-bucket grouping — the stage-level instrument from
CLAUDE.md (legacy path reconstructed verbatim in-script; __main__ functions
pickle by value, so workers never need the old module).

Also the closure record for VERDICT r5 item 4 (the chunk_roundtrip +7.2%
r4→r5 delta): `git diff 98578cd..519f248 -- pneuma_treatment_spark/compression/`
is EMPTY and the chunk_roundtrip query function + _events helper are
byte-identical between the two round commits — identical code cannot
regress, so that delta is attributable to protocol (r4 recorded a single
rep, r5 a 3-rep median) plus the documented host envelope. No engine fix
needed; this file's A/B covers the first REAL change to the path since.

Usage: taskset -c 16-31 python BENCH/ab_chunk_window.py [--reps 5]
Writes BENCH/ab_chunk_window.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CHUNK_SCHEMA_R5 = "conv_id string, tier string, metric string, n_points int, start_ts timestamp, end_ts timestamp, chunk binary"


def legacy_write_chunks(rollup, metrics, group_buckets=32):
    """Round-5 write_chunks, verbatim (519f248:compression/chunks.py):
    flat groupBy(__g), no window key, no p_day column."""
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.compression.gorilla import encode_chunks

    def enc_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)
        conv = pdf["conv_id"].to_numpy()
        tier = pdf["tier"].to_numpy()
        ts64 = pdf["bucket_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        n = len(pdf)
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
            change[1:] = (conv[1:] != conv[:-1]) | (tier[1:] != tier[:-1])
        firsts = np.flatnonzero(change)
        bounds = np.append(firsts, n)
        lengths = np.diff(bounds)
        nseries = len(firsts)
        lasts = bounds[1:] - 1
        conv_s = conv[firsts] if nseries else conv[:0]
        tier_s = tier[firsts] if nseries else tier[:0]
        start_s = ts64[firsts] if nseries else ts64[:0]
        end_s = ts64[lasts] if nseries else ts64[:0]
        blobs: list = []
        for m in metrics:
            blobs.extend(encode_chunks(ts64, pdf[m].to_numpy(dtype=np.float64), lengths))
        k = len(metrics)
        return pd.DataFrame(
            {
                "conv_id": np.tile(conv_s, k),
                "tier": np.tile(tier_s, k),
                "metric": np.repeat(np.array(metrics, dtype=object), nseries),
                "n_points": np.tile(lengths.astype(np.int32), k),
                "start_ts": pd.to_datetime(np.tile(start_s, k), unit="us"),
                "end_ts": pd.to_datetime(np.tile(end_s, k), unit="us"),
                "chunk": blobs,
            }
        )

    keyed = rollup.withColumn(
        "__g", F.pmod(F.xxhash64("conv_id"), F.lit(group_buckets)).cast("int")
    )
    return keyed.groupBy("__g").applyInPandas(
        lambda p: enc_bucket(p.drop(columns="__g")), CHUNK_SCHEMA_R5
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pneuma_treatment_spark.compression.chunks import read_chunks, write_chunks
    from pneuma_treatment_spark.session import get_spark

    spark = get_spark("ab_chunk", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    r = (
        e.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.col("user_id").cast("string").alias("conv_id"),
            F.date_trunc("minute", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.sum(F.col("value")).cast("double").alias("val_sum"),
        )
        .withColumn("tier", F.lit("1m"))
        .cache()
    )
    n_in = r.count()  # materialize ONCE; both arms read the same cache

    metrics = ("n_events", "val_sum")

    def arm_win(days):
        def run():
            pts = read_chunks(
                write_chunks(r, metrics=metrics, group_buckets=32,
                             window_days={"1m": days})
            )
            pts.write.mode("overwrite").format("noop").save()
        return run

    def arm_old():
        # read_chunks only touches conv_id/tier/metric/chunk, so the legacy
        # p_day-less schema flows through it unchanged — the arm is the r5
        # path verbatim, no extra columns added
        pts = read_chunks(legacy_write_chunks(r, metrics=metrics, group_buckets=32))
        pts.write.mode("overwrite").format("noop").save()

    # outputs must be pointwise identical (windowing only splits chunks)
    key = ["conv_id", "tier", "metric", "bucket_ts"]
    a = read_chunks(write_chunks(r, metrics=metrics)).toPandas().sort_values(key).reset_index(drop=True)
    b = read_chunks(
        legacy_write_chunks(r, metrics=metrics)
    ).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print(f"outputs equal ({len(a)} points from {n_in} rollup rows)", file=sys.stderr)

    arms = [
        ("win1d_r6", arm_win(1)),
        ("win7d_r6", arm_win(7)),
        ("flat_r5", arm_old),
    ]
    walls = {name: [] for name, _ in arms}
    for _, fn in arms:  # warmup one rep each
        fn()
    for i in range(args.reps):
        for name, fn in arms:
            t0 = time.perf_counter()
            fn()
            walls[name].append(round(time.perf_counter() - t0, 3))
            print(f"rep {i} {name}: {walls[name][-1]}s", file=sys.stderr)

    med = {k: statistics.median(v) for k, v in walls.items()}
    out = {
        "protocol": "warm-JVM alternating roundtrip (encode+decode+noop), cached input",
        "workload": "sparse 90-day user-keyed 1m rollup (worst case for windowing)",
        "input_rows": n_in,
        "walls": walls,
        "medians": med,
        "win1d_over_flat": round(med["win1d_r6"] / med["flat_r5"], 4),
        "win7d_over_flat": round(med["win7d_r6"] / med["flat_r5"], 4),
    }
    (REPO / "BENCH" / "ab_chunk_window.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

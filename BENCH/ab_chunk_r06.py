"""Resolve the r4->r5 chunk_roundtrip +7.2% (2.50 -> 2.68 s bench median).

Verdict r5 item 4 asked for a warm-JVM alternating A/B of "the r4 read
path vs the r5 batched decode path". Step 1 of that A/B made it moot:

    git diff 98578cd(b r4) .. b496615(r5) -- pneuma_treatment_spark/compression/   -> empty
    git diff r4..r5 -- pneuma_treatment_spark/session.py                           -> empty
    chunk_roundtrip() + _events() sources in queries.py                            -> byte-identical

The batched decode landed in ROUND 4 (a8b4ea0/6599c66) and was in both
benches; there is no "r4 read path" distinct from r5's to alternate
against. The only thing that changed between the two numbers is the
measurement protocol (bench.py: 1 rep -> median of 3, pipeline-first
ordering) and the host (which changed mid-round-5; CLAUDE.md sharp edges).

So the remaining question is just: what is the warm-JVM rep-to-rep spread
of this query on this host? If the spread envelope covers +-7%, the delta
is measurement noise by construction. This script times N back-to-back
reps of the exact bench query in ONE warm JVM (same session config as
bench.py: local[$SPARK_GRAFT_CPUS], 32 shuffle partitions) and writes the
spread to BENCH/ab_chunk_r06.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pneuma_treatment_spark.session import get_spark  # noqa: E402
import __spark_entry__ as em  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("REPS", "8"))
    spark = get_spark(
        "ab-chunk-r06", master=f"local[{cpus}]", shuffle_partitions=32
    )
    q = em.queries()["chunk_roundtrip"]
    walls = []
    for i in range(reps + 1):  # rep 0 is a cold-JVM warmup, excluded from stats
        t0 = time.monotonic()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
        print(f"rep {i}{' (warmup)' if i == 0 else ''}: {walls[-1]} s", flush=True)
    warm = walls[1:]
    walls_sorted = sorted(warm)
    med = walls_sorted[len(warm) // 2]
    out = {
        "query": "chunk_roundtrip",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "warmup_sec": walls[0],
        "reps": warm,
        "median_sec": med,
        "min_sec": walls_sorted[0],
        "max_sec": walls_sorted[-1],
        "spread_pct": round(100 * (walls_sorted[-1] - walls_sorted[0]) / med, 1),
        "r4_bench_sec": 2.50,
        "r5_bench_sec": 2.68,
        "delta_under_test_pct": 7.2,
        "code_identical_r4_r5": True,
    }
    (REPO / "BENCH" / "ab_chunk_r06.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

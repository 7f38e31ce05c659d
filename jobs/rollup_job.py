"""End-to-end rollup job: synth/ingest → gap-fill → treatment → tier
cascade → Gorilla chunks, every stage checkpointed + resumable.

Run locally or via spark-submit (M7 packaging):

    python jobs/rollup_job.py --workdir /tmp/ptsw --n-convs 4000
    spark-submit --py-files dist/pneuma_treatment_spark.zip jobs/rollup_job.py ...

Stage boundaries land exactly where the reference re-keys between its
numbered scripts (SURVEY.md §3): by series (treatment) → by (series, bucket)
(rollups) → by series (chunks). Each boundary is an idempotent partitioned
parquet table + manifest, so a killed job resumes at the first incomplete
stage (tests/test_resume.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from pneuma_treatment_spark.compression.chunks import (
    TIER_WINDOW_DAYS,
    chunk_ttl_sql_predicate,
    write_chunks,
)
from pneuma_treatment_spark.io.tableio import TableIO
from pneuma_treatment_spark.operators.gapfill import gap_fill
from pneuma_treatment_spark.operators.retention import ttl_sql_predicate
from pneuma_treatment_spark.operators.rollup import (
    rollup_from_tier,
    rollup_raw_clustered,
    with_turn_metrics,
)
from pneuma_treatment_spark.operators.treatment import (
    TreatmentConfig,
    conv_anomaly_flags,
    raw_anomaly_col,
    treat_transcripts,
)
from pneuma_treatment_spark.plans.lineage import PipelineRunner
from pneuma_treatment_spark.synth import generate_transcripts

#: tier TTLs (days) — finer tiers age out first (retention cascade)
DEFAULT_TTLS = {"1m": 90, "1h": 365, "1d": 3650}


def run_pipeline(
    spark,
    workdir: str,
    n_convs: int = 1000,
    seed: int = 42,
    mega_turns: int = 20000,
    chunked: bool = True,
    cfg: TreatmentConfig | None = None,
    input_table: str | None = None,
    ttl_now: str | None = None,
    stop_after: str | None = None,
    n_buckets: int = 8,
    stats: str = "full",
    shard_index: int = 0,
    shard_count: int = 1,
    stage_hook=None,
    surrogate_key: bool = False,
    chunk_window_days: dict[str, int] | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns a stage→metrics summary.

    ``input_table``: optional path to an existing transcripts parquet table;
    default synthesizes deterministically. ``stop_after``: stage name to halt
    after (used by the resume test to simulate a mid-job kill).
    ``stage_hook(name)``: called after each stage completes — the seam the
    bytes-per-stage instrumentation (BENCH/run_bytes.py) snapshots on.
    ``surrogate_key``: route the filled/treated stages' shuffles through an
    8-byte ``xxhash64(conv_id)`` surrogate instead of the conv_id string,
    joining the string back from a per-conversation dim immediately before
    each write — written table schemas are unchanged. A measured A/B lever
    (BENCH/run_bytes.py --surrogate; adoption decision in
    BENCH/BASELINE.md). The dim build fails fast on a hash collision
    (probability ~n²/2⁶⁵ — negligible below billions of conversations;
    past that, widen to a 128-bit surrogate).
    """
    cfg = cfg or TreatmentConfig()
    windows = chunk_window_days or dict(TIER_WINDOW_DAYS)
    io = TableIO(spark, workdir, n_buckets=n_buckets)
    runner = PipelineRunner(
        io,
        stats=stats,
        config={
            "n_convs": n_convs,
            "seed": seed,
            "mega_turns": mega_turns,
            "chunked": chunked,
            "input_table": input_table,
            "treatment": cfg.__dict__,
            # ops tooling (plans/backfill.py) ADOPTS these two from the
            # manifest — a backfill run with a contradicting bucket count
            # prunes the wrong p_bucket set (silent row duplication), and a
            # contradicting window map breaks chunk_ttl_sql_predicate's
            # written-with match (ADVICE r6)
            "n_buckets": n_buckets,
            "chunk_window_days": windows,
            # NB (r7): adding n_buckets/chunk_window_days to this dict
            # changed every stage signature — resuming a pre-r7 workdir
            # rebuilds from scratch once (correct: those params were never
            # part of the recorded identity, and resuming across the
            # recording boundary would adopt unverifiable values)
            # shard identity MUST be part of the stage signature: a different
            # shard against the same workdir must not see COMPLETE manifests
            # written by another shard (it would silently return that shard's
            # data and clobber overlapping p_day partitions)
            "shard_index": shard_index,
            "shard_count": shard_count,
            "surrogate_key": surrogate_key,
        },
    )

    order = []

    def stage(name, build, **kw):
        order.append(name)
        df = runner.run_stage(name, build, **kw)
        if stage_hook is not None:
            stage_hook(name)
        if stop_after == name:
            raise _StopPipeline(name)
        return df

    _dim_cache: list = []  # persisted surrogate conv dim, released on exit
    try:
        first = shard_index * n_convs // shard_count
        cnt = (shard_index + 1) * n_convs // shard_count - first
        ingest = stage(
            "ingest",
            lambda io: with_turn_metrics(
                spark.read.parquet(input_table)
                if input_table
                else generate_transcripts(
                    spark, cnt, seed=seed, mega_turns=mega_turns,
                    first_conv=first, total_convs=n_convs,
                )
            ),
        )
        if surrogate_key:
            _sk = F.xxhash64("conv_id")

            def conv_dim():
                # (__sk, conv_id) — one row per conversation; built,
                # collision-checked, and persisted ONCE (it is joined in
                # both the filled and treated builds — rebuilding it per
                # stage ran redundant distinct+count jobs inside exactly
                # the stages the bytes A/B measures). Fails fast on a
                # 64-bit collision (would silently merge two conversations).
                if not _dim_cache:
                    dim = ingest.select(
                        _sk.alias("__sk"), "conv_id"
                    ).distinct().persist()
                    if dim.groupBy("__sk").count().where("count > 1").limit(1).count():
                        raise RuntimeError(
                            "xxhash64(conv_id) collision — widen the surrogate key"
                        )
                    _dim_cache.append(dim)
                return _dim_cache[0]

            def _restore(df):
                # swap the surrogate back for the conv_id string just before
                # the write; column order (and thus table schema) unchanged
                cols = df.columns
                return (
                    df.withColumnRenamed("conv_id", "__sk")
                    .join(conv_dim(), "__sk")
                    .drop("__sk")
                    .select(*cols)
                )

            def _with_sk(df, *cols):
                return df.select(_sk.alias("conv_id"), *cols)
        else:
            def _restore(df):
                return df

            def _with_sk(df, *cols):
                return df.select("conv_id", *cols)

        # Gap-fill on the NARROW series only and join the payload columns
        # back once: text/tool otherwise ride through the densify join plus
        # two window sorts (~3x the bytes on this bandwidth-bound stage);
        # the join-back moves them exactly once, and filled rows get null
        # payloads either way. raw_anomaly rides along for free — the SQL
        # mask reuses this stage's conv-partitioned windows — so the treated
        # stage's conv_has_anomaly flags are a plain scan+aggregate instead
        # of a full-frame window exchange (see treat_transcripts).
        def run_treatment_branch():
            filled = stage(
                "filled",
                lambda io: _restore(
                    gap_fill(
                        _with_sk(
                            ingest, "turn_idx", "role", "ts", "token_count", "is_tool_call"
                        ),
                        lerp_cols=("token_count",),
                        lerp_ts_cols=("ts",),
                    ).join(
                        _with_sk(ingest, "turn_idx", "text", "tool"),
                        ["conv_id", "turn_idx"],
                        "left",
                    ).transform(
                        # only the chunked treatment consumes the flags (the
                        # non-chunked path computes conv_has_anomaly in-kernel)
                        lambda d: d.withColumn("raw_anomaly", raw_anomaly_col(cfg))
                        if chunked
                        else d
                    )
                ),
                deps=["ingest"],
            )
            # The kernels never read text/tool/role — shuttling payload or
            # meta columns through the treatment's ~4 shuffle passes
            # multiplies the stage's bytes. The treated table is a narrow
            # metric series (measured: dropping `role` here cuts more
            # shuffle bytes than dictionary-encoding it — ~20 B/row x 4
            # passes — BENCH/BASELINE.md bytes table); text/tool/role live
            # in `filled` and join back exactly on (conv_id, turn_idx) when
            # needed. `ts` stays for the p_day write clustering; `is_filled`
            # is load-bearing semantics.
            narrow = _with_sk(filled, "turn_idx", "ts", "token_count", "is_filled")
            # conv flags from the materialized filled table: map-side-combined
            # aggregate over the stored raw_anomaly column — no window, no
            # full-frame exchange, broadcast into the chunked stage-D join.
            # A resumed pre-round-5 filled table has no raw_anomaly column:
            # fall back to flags=None (treat_transcripts' slim pass).
            flags = (
                conv_anomaly_flags(_with_sk(filled, "raw_anomaly"))
                if chunked and "raw_anomaly" in filled.columns
                else None
            )
            stage(
                "treated",
                lambda io: _restore(
                    treat_transcripts(narrow, cfg, chunked=chunked, flags=flags)
                ),
                deps=["filled"],
            )

        def run_rollup_branch():
            m1 = stage(
                "rollup_1m",
                # clustered variant: the aggregation's one exchange doubles
                # as the (p_day, p_bucket) write clustering — bit-identical
                # rows to rollup_raw (test_plans pins both the equality and
                # the single-Exchange plan)
                lambda io: rollup_raw_clustered(ingest, "1m", n_buckets=n_buckets),
                deps=["ingest"],
                ts_col="bucket_ts",
                pre_clustered=True,
            )
            h1 = stage(
                "rollup_1h",
                lambda io: rollup_from_tier(m1, "1m", "1h"),
                deps=["rollup_1m"],
                ts_col="bucket_ts",
                bucketed=False,  # coarse tier: day-only partitioning
            )
            d1 = stage(
                "rollup_1d",
                lambda io: rollup_from_tier(h1, "1h", "1d"),
                deps=["rollup_1h"],
                ts_col="bucket_ts",
                bucketed=False,
            )
            # chunk the INT partials only — rates re-derive exactly on read
            # (compression/chunks.points_with_rates); full-entropy rate
            # doubles barely XOR-compress while integer-valued doubles
            # halve. Runs INSIDE this branch: chunks depends only on the
            # tiers, so it must not wait for the treatment branch.
            cols = [
                "conv_id", "tier", "bucket_ts", "turn_count", "token_sum",
                "tool_calls",
            ]
            stage(
                "chunks",
                lambda io: write_chunks(
                    m1.select(cols).unionByName(h1.select(cols)).unionByName(
                        d1.select(cols)
                    ),
                    window_days=windows,
                ),
                deps=["rollup_1m", "rollup_1h", "rollup_1d"],
                # (tier, window-start) dirs — the chunk TTL unit;
                # write_chunks guarantees no chunk crosses a window, so
                # retention drops whole partitions (chunk_ttl_sql_predicate)
                partition_cols=["tier", "p_day"],
            )

        # The treatment branch (filled → treated) and the rollup cascade
        # (1m → 1h → 1d) both depend only on the ingest table — submit them
        # from two driver threads so the second branch's jobs back-fill
        # executor capacity the first branch's stage tails leave idle
        # (guide §2.6 overlap; actions are sequential only because the
        # driver calls them sequentially). Stage signatures stay
        # deterministic: each branch reads only _sigs of its own deps.
        # Sequential fallbacks keep the two instrumented contracts intact:
        # stop_after must halt BEFORE later stages ever run
        # (tests/test_resume.py pins the stage set), and a stage_hook
        # consumer (BENCH/run_bytes.py) attributes per-stage bytes, which
        # overlapping stages would smear.
        if stop_after is None and stage_hook is None:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_treat = pool.submit(run_treatment_branch)
                f_roll = pool.submit(run_rollup_branch)
                # surface the FIRST branch failure even if the other also
                # raised; .result() re-raises inside the caller's context
                f_roll.result()
                f_treat.result()
        else:
            run_treatment_branch()
            run_rollup_branch()
        if ttl_now:
            for tier, days in DEFAULT_TTLS.items():
                io.delete_where(f"rollup_{tier}", ttl_sql_predicate(days, ttl_now))
            if io.exists("chunks"):
                io.delete_where(
                    "chunks",
                    chunk_ttl_sql_predicate(DEFAULT_TTLS, ttl_now, window_days=windows),
                )
    except _StopPipeline:
        pass
    finally:
        for d in _dim_cache:
            d.unpersist()

    return {
        "stages": {
            n: {
                "rows": r.rows,
                "skipped": r.skipped,
                "wall_sec": round(r.wall_sec, 3),
                "n_partitions": r.n_partitions,
            }
            for n, r in runner.results.items()
        },
        "order": order,
    }


class _StopPipeline(Exception):
    pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n-convs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mega-turns", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--no-chunked", action="store_true")
    ap.add_argument("--input-table", default=None)
    ap.add_argument("--ttl-now", default=None)
    ap.add_argument(
        "--compact", action="store_true",
        help="compact the rollup tier tables after the run (small-file "
        "maintenance; see TableIO.compact)",
    )
    ap.add_argument(
        "--buckets", type=int, default=None,
        help="hash-bucket count (default 8 for a fresh pipeline; a backfill "
        "with no --buckets ADOPTS the count recorded in the table manifests, "
        "and an explicit contradicting value is a loud error)",
    )
    ap.add_argument("--stats", default="full", choices=["full", "fast"])
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--shard-count", type=int, default=1)
    ap.add_argument(
        "--surrogate", action="store_true",
        help="route filled/treated shuffles through an 8-byte xxhash64 "
        "conv surrogate (A/B lever; see run_pipeline docstring)",
    )
    ap.add_argument(
        "--backfill-table", default=None,
        help="path to a parquet delta of late/corrected raw turns "
        "(conv_id, turn_idx, role, text, tool, ts); applies it through "
        "every pipeline table with conversation-scoped recompute + "
        "partition-scoped merges instead of running the pipeline "
        "(plans/backfill.py)",
    )
    ap.add_argument(
        "--delete-convs", default=None,
        help="path to a parquet table of conv_ids to REMOVE from every "
        "pipeline table (compliance-shaped whole-conversation deletion; "
        "partition-scoped merges, lineage re-spliced — "
        "plans/backfill.delete_conversations)",
    )
    ap.add_argument(
        "--scrub-deadletter", action="append", default=[], metavar="DIR",
        help="with --delete-convs: also scrub the victims' rows out of "
        "this dead-letter capture dir (repeatable; an uncleared delta "
        "would re-insert them at the next heal)",
    )
    args = ap.parse_args()

    from pneuma_treatment_spark.session import get_spark

    spark = get_spark(
        "rollup-job", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.delete_convs and args.backfill_table:
        ap.error("--delete-convs and --backfill-table are separate ops — run them one at a time")
    if args.scrub_deadletter and not args.delete_convs:
        ap.error(
            "--scrub-deadletter only acts with --delete-convs — alone it "
            "would silently scrub nothing (the victims come from the "
            "delete set)"
        )
    if args.delete_convs:
        from pneuma_treatment_spark.plans.backfill import delete_conversations

        if args.shard_count != 1:
            ap.error("--delete-convs: delete through the owning shard with --shard-count 1")
        t0 = time.perf_counter()
        summary = delete_conversations(
            spark,
            args.workdir,
            spark.read.parquet(args.delete_convs),
            n_buckets=args.buckets,  # None → adopt the recorded count
            deadletter_dirs=args.scrub_deadletter,
        )
        summary["total_wall_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(summary))
        return
    if args.backfill_table:
        from pneuma_treatment_spark.plans.backfill import backfill_pipeline

        if args.shard_count != 1:
            ap.error(
                "--backfill-table does not compose with sharding: the delta "
                "would upsert every conversation into THIS shard's tables, "
                "duplicating conversations owned by other shards. Pre-filter "
                "the delta to the owning shard and run with --shard-count 1."
            )
        t0 = time.perf_counter()
        summary = backfill_pipeline(
            spark,
            args.workdir,
            spark.read.parquet(args.backfill_table),
            n_buckets=args.buckets,  # None → adopt the recorded count
        )
        summary["total_wall_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(summary))
        return
    t0 = time.perf_counter()
    summary = run_pipeline(
        spark,
        args.workdir,
        n_convs=args.n_convs,
        seed=args.seed,
        mega_turns=args.mega_turns,
        chunked=not args.no_chunked,
        input_table=args.input_table,
        ttl_now=args.ttl_now,
        n_buckets=args.buckets if args.buckets is not None else 8,
        stats=args.stats,
        shard_index=args.shard_index,
        shard_count=args.shard_count,
        surrogate_key=args.surrogate,
    )
    if args.compact:
        io = TableIO(
            spark, args.workdir,
            n_buckets=args.buckets if args.buckets is not None else 8,
        )
        for tier in DEFAULT_TTLS:
            # A tier table may be absent (partial failure, or a future
            # --stop-after run): skip it with a message instead of letting
            # io.compact surface a raw path-not-found AnalysisException.
            if io.exists(f"rollup_{tier}"):
                io.compact(f"rollup_{tier}")
            else:
                print(f"compact: rollup_{tier} not built, skipping", file=sys.stderr)
        # the chunk table accumulates files per write/TTL-rewrite too;
        # same skip-if-absent contract as the tiers
        if io.exists("chunks"):
            io.compact("chunks")
        else:
            print("compact: chunks not built, skipping", file=sys.stderr)
    summary["total_wall_sec"] = round(time.perf_counter() - t0, 3)
    summary["turns"] = summary["stages"]["ingest"]["rows"]
    summary["turns_per_sec"] = round(summary["turns"] / summary["total_wall_sec"], 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

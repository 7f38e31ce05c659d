"""Streaming 1-minute rollup: ``readStream`` → watermarked tumbling window →
append sink.

The reference is pure batch (SURVEY.md §2.9) — its only late-data analog is
trimming output to complete windows (``09lane_node.py:303-318``). The
streaming tier provides the online variant of the same contract: a bucket is
emitted once its watermark passes (complete-window semantics), with the
identical metric set as :mod:`..operators.rollup`, so streamed buckets equal
batch buckets for closed windows (tests/test_streaming.py).

At scale this runs as a continuous ingest job feeding the raw tier; the
batch cascade (1m→1h→1d) then reads closed buckets — streaming only ever
owns the hot end of the timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pneuma_treatment_spark.operators.rollup import _with_rates, with_turn_metrics
from pneuma_treatment_spark.synth import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_rollup_1m(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling 1-minute rollup with the batch tier's metrics."""
    m = with_turn_metrics(stream).withWatermark("ts", watermark)
    agg = m.groupBy(
        F.col("conv_id"), F.window("ts", "1 minute").alias("win")
    ).agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.sum("token_count").alias("token_sum"),
        F.sum("is_tool_call").alias("tool_calls"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("assistant_turns"),
    )
    out = agg.select(
        "conv_id",
        F.col("win.start").alias("bucket_ts"),
        "turn_count",
        "token_sum",
        "tool_calls",
        "user_turns",
        "assistant_turns",
    ).withColumn("tier", F.lit("1m"))
    return _with_rates(out, 60)


def stream_tumbling_rollup(
    stream: DataFrame,
    keys: list[str],
    aggs: list,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Generic watermarked tumbling rollup over any keyed stream (the
    event-table counterpart of :func:`stream_rollup_1m`). Append-mode
    semantics: a bucket is emitted once the watermark passes its window end
    — on a bounded run, output = exactly the closed-window region of the
    batch rollup (the equality the batch-twin driver query hash-gates)."""
    m = stream.withWatermark(ts_col, watermark)
    agg = m.groupBy(
        *[F.col(k) for k in keys], F.window(ts_col, window).alias("win")
    ).agg(*aggs)
    return agg.withColumn("bucket_ts", F.col("win.start")).drop("win")


def run_to_memory_sink(
    rollup_stream: DataFrame, name: str = "stream_rollup", mode: str = "append"
):
    """Drain all available input (availableNow) into an in-memory table —
    the test/demo sink; production uses ``toTable``/parquet + checkpoint."""
    q = (
        rollup_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

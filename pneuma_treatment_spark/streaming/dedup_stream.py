"""Streaming exact dedup: watermarked ``dropDuplicates`` over a content hash.

Online variant of :func:`..operators.dedup.exact_dedup` (P8): the first
arrival of each normalized-content hash passes, later duplicates are
suppressed. State is bounded by the event-time watermark — a duplicate
arriving later than ``watermark`` after the original is NOT suppressed
(state for expired hashes is dropped; at 100 TB ingest an unbounded
dedup-state map is not survivable, so the horizon is explicit API).

Streamed output equals the batch keep-first result whenever duplicates
arrive within the watermark horizon (tests/test_streaming.py asserts
equality on such data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pneuma_treatment_spark.operators.dedup import normalize_text


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Keep the first row per content hash within the watermark horizon."""
    hashed = stream.where(F.col(text_col).isNotNull()).withColumn(
        "text_hash", F.md5(normalize_text(F.col(text_col)).cast("binary"))
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )

"""Streaming rollup == batch rollup for closed windows."""

from __future__ import annotations

import pandas as pd

from pneuma_treatment_spark.operators.rollup import rollup_raw, with_turn_metrics
from pneuma_treatment_spark.streaming.rollup_stream import (
    read_transcript_stream,
    run_to_memory_sink,
    stream_rollup_1m,
)
from tests.conftest import assert_pdf_equal


def test_stream_matches_batch(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "stream_src")
    transcripts_df.write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src, max_files=4)
    assert stream.isStreaming
    q = run_to_memory_sink(stream_rollup_1m(stream), name="t_stream")
    assert q.lastProgress is not None

    got = spark.table("t_stream").toPandas()
    want = rollup_raw(with_turn_metrics(transcripts_df), "1m").toPandas()

    # Append mode emits a bucket once the watermark passes it; buckets still
    # open at end-of-stream stay in state (they'd emit on the next run from
    # checkpoint). Compare the watermark-closed region only.
    cutoff = transcripts_df.agg({"ts": "max"}).collect()[0][0] - pd.Timedelta("11 minutes")
    got_c = got[got.bucket_ts < cutoff]
    want_c = want[want.bucket_ts < cutoff]
    assert len(want) - len(got) <= 5  # only the hot tail may be withheld
    assert_pdf_equal(got_c, want_c, ["conv_id", "bucket_ts"])


def test_stream_is_incremental(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "stream_src2")
    transcripts_df.write.mode("overwrite").parquet(src)
    stream = read_transcript_stream(spark, src, max_files=2)
    q = run_to_memory_sink(stream_rollup_1m(stream), name="t_stream2")
    # multiple micro-batches actually executed (incremental processing)
    assert q.recentProgress and len(q.recentProgress) >= 2
    n = spark.table("t_stream2").count()
    assert n > 0

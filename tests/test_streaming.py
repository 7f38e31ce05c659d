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


def test_stateful_sessionization_matches_batch(spark, transcripts_df, tmp_path):
    """applyInPandasWithState sessions (cross-batch state) == batch islands."""
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    src = str(tmp_path / "sess_src")
    # a real ingest stream arrives roughly in event-time order; model that
    # with time-range-partitioned files. FileStreamSource orders batches by
    # file MODIFICATION TIME (ties broken arbitrarily), so stagger mtimes to
    # match the time ranges — an append-only log has this property naturally.
    (
        transcripts_df.select("conv_id", "ts")
        .repartitionByRange(6, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    import glob
    import os
    import time as _time

    for i, f in enumerate(sorted(glob.glob(f"{src}/part-*.parquet"))):
        t = _time.time() - 1000 + i * 10
        os.utime(f, (t, t))

    stream = spark.readStream.schema("conv_id string, ts timestamp").option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_sec=600)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # state really crossed micro-batches

    got = spark.table("sessions").toPandas()
    want_all = sessionize_batch(
        transcripts_df.select("conv_id", "ts"), gap_sec=600
    ).toPandas()
    # stream emits CLOSED sessions only → batch minus each conv's last session
    last = want_all.sort_values("session_id").groupby("conv_id").tail(1)
    want = (
        want_all.merge(last, how="left", indicator=True)
        .query("_merge == 'left_only'")
        .drop(columns="_merge")
    )
    cols = ["conv_id", "session_id", "start_us", "end_us", "n_turns"]
    import pandas as pd

    a = got[cols].sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    b = want[cols].sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 50  # non-trivial workload


def test_streaming_dedup_keeps_first_within_watermark(spark, tmp_path):
    """dedup_stream == batch keep-first when duplicates arrive inside the
    watermark horizon."""
    import datetime as dt

    from pneuma_treatment_spark.streaming.dedup_stream import dedup_stream

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        text = f"doc number {i % 10}"  # 10 distinct texts, 4 copies each
        rows.append(("c1", i, "user", text, None, base + dt.timedelta(minutes=i)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    src = str(tmp_path / "dedup_src")
    # ONE in-order file: FileStreamSource orders micro-batches by file mtime
    # with arbitrary ties (CLAUDE.md sharp edge), and keep-FIRST is defined
    # by arrival order
    df.coalesce(1).sortWithinPartitions("turn_idx").write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src, max_files=2)
    q = run_to_memory_sink(dedup_stream(stream, watermark="2 hours"), name="t_dedup")
    assert q.lastProgress is not None
    got = spark.table("t_dedup").toPandas()
    # one survivor per distinct text, and it is the FIRST arrival
    assert len(got) == 10
    assert set(got["turn_idx"]) == set(range(10))


def test_sessionize_idle_timeout_closes_sessions(spark, tmp_path):
    """With close_idle, a conversation that goes quiet emits its session once
    the watermark (driven by OTHER convs' later events) passes end + gap."""
    import datetime as dt
    import glob
    import os
    import time as _time

    from pneuma_treatment_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    # c1 talks for 3 minutes then goes silent; c2 talks for an hour
    rows = [("c1", base + dt.timedelta(minutes=m)) for m in range(4)]
    rows += [("c2", base + dt.timedelta(minutes=m)) for m in range(0, 61, 5)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    src = str(tmp_path / "idle_src")
    (
        df.repartitionByRange(4, "ts").sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(src)
    )
    for i, f in enumerate(sorted(glob.glob(f"{src}/part-*.parquet"))):
        t = _time.time() - 1000 + i * 10
        os.utime(f, (t, t))

    stream = spark.readStream.schema("conv_id string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_sec=600, close_idle=True)
        .writeStream.format("memory").queryName("idle_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("idle_sessions").toPandas()
    c1 = got[got.conv_id == "c1"]
    # c1 never spoke again — only the event-time timeout can emit it
    assert len(c1) == 1
    assert c1.iloc[0]["n_turns"] == 4
    base_us = int(base.timestamp()) * 1_000_000
    assert c1.iloc[0]["start_us"] == base_us
    assert c1.iloc[0]["end_us"] == base_us + 3 * 60_000_000


def test_sessionize_drops_pre_watermark_events(spark, tmp_path):
    """Late/out-of-order micro-batches (VERDICT r4 item 6): batch 3 carries
    a PRE-WATERMARK event for a conversation whose session already closed by
    event-time timeout — the event must be DROPPED (watermark_delay '0
    seconds'), not reopen state, and the emitted set must equal the batch
    twin on the surviving rows under the timeout rule
    (emitted ⇔ closed-by-successor OR end + gap ≤ final watermark)."""
    import datetime as dt
    import os
    import time as _time

    from pneuma_treatment_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1)

    def mins(m):
        return base + dt.timedelta(minutes=m)

    batches = [
        # b1: c1 talks 4 turns then goes silent; c2 appears once
        [("c1", mins(m)) for m in range(4)] + [("c2", mins(0))],
        # b2: c2 alone advances the watermark to minute 40
        [("c2", mins(30)), ("c2", mins(40))],
        # b3: c1 minute-5 event is BEHIND the watermark (40) → must drop;
        # c2 minute-60 advances time further
        [("c1", mins(5)), ("c2", mins(60))],
    ]
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    now = _time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/stage{i}")
        import glob as _glob
        import shutil as _sh

        _sh.move(_glob.glob(f"{src}/stage{i}/part-*.parquet")[0], f"{src}/{i:03d}.parquet")
        _sh.rmtree(f"{src}/stage{i}")
        os.utime(f"{src}/{i:03d}.parquet", (now - 300 + i * 30, now - 300 + i * 30))

    stream = spark.readStream.schema("conv_id string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    gap_sec = 600
    q = (
        sessionize_stream(stream, gap_sec=gap_sec, close_idle=True)
        .writeStream.format("memory").queryName("late_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3  # the staged batches really ran separately
    # state-leak regression: after the timeout closed c1 and its straggler
    # was dropped, only c2's open session may remain in the state store —
    # a dropped-to-empty batch must NOT write a timeout-less state row
    # (it would never be evicted)
    import json as _json

    progs = [
        _json.loads(p if isinstance(p, str) else p.json)
        for p in q.recentProgress
    ]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"] for p in progs if p.get("stateOperators")
    ]
    assert state_rows and state_rows[-1] == 1
    got = spark.table("late_sessions").toPandas()

    # c1: exactly ONE session, 4 turns — the late minute-5 event neither
    # extended it (n_turns=5) nor opened a fresh session after timeout
    c1 = got[got.conv_id == "c1"]
    assert len(c1) == 1 and c1.iloc[0]["n_turns"] == 4
    base_us = int(base.timestamp()) * 1_000_000  # same formula as the idle test
    assert c1.iloc[0]["end_us"] == base_us + 3 * 60_000_000

    # batch twin over the SURVIVING rows, filtered by the timeout rule
    surviving = [r for b in batches for r in b if r != ("c1", mins(5))]
    want_all = sessionize_batch(
        spark.createDataFrame(surviving, "conv_id string, ts timestamp"),
        gap_sec=gap_sec,
    ).toPandas()
    final_wm_us = base_us + 60 * 60_000_000  # max event time, delay 0
    import pandas as pd

    nxt = want_all.sort_values(["conv_id", "session_id"]).groupby("conv_id")[
        "session_id"
    ].transform("max")
    closed_by_successor = want_all["session_id"] < nxt
    timed_out = want_all["end_us"] + gap_sec * 1_000_000 <= final_wm_us
    want = want_all[closed_by_successor | timed_out]
    cols = ["conv_id", "session_id", "start_us", "end_us", "n_turns"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(["conv_id", "session_id"]).reset_index(drop=True),
        want[cols].sort_values(["conv_id", "session_id"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_stream_tumbling_rollup_closed_window_rule(spark, tmp_path):
    """The generic event-stream rollup emits exactly the windows whose end
    precedes (ms-floored max event time − delay) — the rule the
    rollup_stream driver oracle encodes."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pneuma_treatment_spark.streaming.rollup_stream import (
        run_to_memory_sink,
        stream_tumbling_rollup,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        ("a", base + dt.timedelta(seconds=90 * i), float(i)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    src = str(tmp_path / "tumbling_src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("k string, ts timestamp, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = stream_tumbling_rollup(
        stream, ["k"], [F.count(F.lit(1)).alias("n")], watermark="5 minutes"
    )
    run_to_memory_sink(out, name="t_tumbling")
    got = {r["bucket_ts"] for r in spark.table("t_tumbling").collect()}
    mx = max(r[1] for r in rows)
    wm = mx.replace(microsecond=(mx.microsecond // 1000) * 1000) - dt.timedelta(minutes=5)
    want = {
        r[1].replace(second=0, microsecond=0)
        for r in rows
        if r[1].replace(second=0, microsecond=0) + dt.timedelta(minutes=1) <= wm
    }
    assert got == want and len(want) > 5


def test_parquet_sink_resumes_exactly_once(spark, transcripts_df, tmp_path):
    """Production sink contract: a second availableNow run against the SAME
    checkpoint processes only the newly-arrived input — no closed bucket is
    ever emitted twice — and the combined sink equals the batch rollup on
    the closed-window region of all data."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.streaming.rollup_stream import (
        read_transcript_stream,
        run_to_parquet_sink,
        stream_rollup_1m,
    )

    src = str(tmp_path / "psink_src")
    sink = str(tmp_path / "psink_out")
    ckpt = str(tmp_path / "psink_ckpt")
    os.makedirs(src)

    # arrival batch 1: everything before the split point
    split = transcripts_df.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).select(
        (F.col("mn") + (F.col("mx") - F.col("mn")) / 2).cast("string")
    ).first()[0]
    early = transcripts_df.where(F.col("ts") < F.lit(split).cast("timestamp"))
    late = transcripts_df.where(F.col("ts") >= F.lit(split).cast("timestamp"))
    early.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    # the stream reads the directory recursively? No — stage files flat:
    import glob as _glob
    import shutil as _sh

    _sh.move(_glob.glob(f"{src}/b1/part-*.parquet")[0], f"{src}/000.parquet")
    _sh.rmtree(f"{src}/b1")
    now = _time.time()
    os.utime(f"{src}/000.parquet", (now - 60, now - 60))

    run_to_parquet_sink(
        stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt
    )
    first = spark.read.parquet(sink).toPandas()
    assert len(first) > 0

    # arrival batch 2: the rest lands later; SAME checkpoint
    late.coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    _sh.move(_glob.glob(f"{src}/b2/part-*.parquet")[0], f"{src}/001.parquet")
    _sh.rmtree(f"{src}/b2")
    os.utime(f"{src}/001.parquet", (now - 30, now - 30))

    run_to_parquet_sink(
        stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt
    )
    got = spark.read.parquet(sink).toPandas()

    # exactly-once: no (conv, bucket) appears twice across the two runs
    assert not got.duplicated(["conv_id", "bucket_ts"]).any()

    # combined closed-window region == batch rollup of ALL data
    want = rollup_raw(with_turn_metrics(transcripts_df), "1m").toPandas()
    cutoff = transcripts_df.agg({"ts": "max"}).collect()[0][0] - pd.Timedelta(
        "11 minutes"
    )
    assert_pdf_equal(
        got[got.bucket_ts < cutoff],
        want[want.bucket_ts < cutoff],
        ["conv_id", "bucket_ts"],
    )


def test_stream_chunk_dirs_discardable_after_batch_cascade(
    spark, transcripts_df, tmp_path
):
    """The hot/cold handoff contract (VERDICT r6 item 4): every point the
    streaming chunk sink holds also decodes, value-equal, from the batch
    chunk table built over the same input — the batch cascade re-owns
    closed windows, so epoch dirs behind its high-water mark are
    discardable."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    import numpy as np

    from pneuma_treatment_spark.compression.chunks import read_chunks, write_chunks
    from pneuma_treatment_spark.streaming.rollup_stream import (
        read_transcript_stream,
        run_chunk_append_sink,
        stream_rollup_1m,
    )

    src = str(tmp_path / "hc_src")
    sink = str(tmp_path / "hc_sink")
    ckpt = str(tmp_path / "hc_ckpt")
    os.makedirs(src)
    transcripts_df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b")
    _sh.move(_glob.glob(f"{src}/b/part-*.parquet")[0], f"{src}/000.parquet")
    _sh.rmtree(f"{src}/b")
    now = _time.time()
    os.utime(f"{src}/000.parquet", (now - 60, now - 60))
    run_chunk_append_sink(
        stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt
    )
    stream_pts = read_chunks(
        spark.read.option("basePath", sink).parquet(sink)
    ).toPandas()
    assert len(stream_pts) > 0

    # batch re-owns the same range: 1m tier + chunks from the full input
    m1 = rollup_raw(with_turn_metrics(transcripts_df), "1m")
    batch_pts = read_chunks(
        write_chunks(m1.select("conv_id", "tier", "bucket_ts", "turn_count", "token_sum", "tool_calls"))
    ).toPandas()

    keys = ["conv_id", "tier", "metric", "bucket_ts"]
    j = stream_pts.merge(
        batch_pts, on=keys, how="left", suffixes=("_s", "_b"), indicator=True
    )
    # every streamed point exists in the batch table…
    assert (j["_merge"] == "both").all(), j[j["_merge"] != "both"].head()
    # …with the identical value (NaN == NaN for the load-bearing nulls)
    assert np.allclose(j["value_s"], j["value_b"], equal_nan=True, rtol=0, atol=0)

    # the delete step: behind the batch high-water mark, epoch dirs go;
    # at/after it, they stay; re-pruning is idempotent
    from pneuma_treatment_spark.streaming.rollup_stream import prune_stream_epochs

    max_day = max(
        os.path.basename(p).split("=", 1)[1]
        for p in _glob.glob(f"{sink}/batch_id=*/tier=*/p_day=*")
    )
    keep = prune_stream_epochs(sink, max_day)  # newest window still open
    assert keep["kept"] and not keep["removed"]
    gone = prune_stream_epochs(sink, "9999-01-01")
    assert gone["removed"] and not _glob.glob(f"{sink}/batch_id=*")
    again = prune_stream_epochs(sink, "9999-01-01")
    assert again == {"removed": [], "kept": []}


def test_deadletter_capture_heals_batch_tables(spark, tmp_path):
    """The lambda closure, end-to-end (VERDICT r6 item 1): rows the rollup
    watermark drops are captured by the dead-letter tee, the rollup sink
    provably lacks them, and running the captured delta through
    backfill_pipeline leaves every batch table bit-equal to a from-scratch
    build on the full input."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from jobs.rollup_job import run_pipeline
    from pneuma_treatment_spark.io.tableio import TableIO
    from pneuma_treatment_spark.plans.backfill import backfill_pipeline
    from pneuma_treatment_spark.streaming.rollup_stream import (
        read_dead_letter,
        read_transcript_stream,
        run_deadletter_capture,
        run_to_parquet_sink,
        stream_rollup_1m,
    )
    from pneuma_treatment_spark.synth import generate_transcripts

    args = dict(n_convs=12, seed=9, mega_turns=0)
    full_path = str(tmp_path / "full_raw")
    generate_transcripts(spark, 12, seed=9).write.parquet(full_path)
    full = spark.read.parquet(full_path)
    c0 = full.select("conv_id").distinct().orderBy("conv_id").first()["conv_id"]
    late = full.where((F.col("conv_id") == c0) & (F.col("turn_idx") < 3))
    on_time = full.join(
        late.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    )
    # the scenario only exercises the drop if the late rows are genuinely
    # behind the watermark the on-time data will have established
    mx_us = on_time.agg(F.max(F.unix_micros(F.col("ts").cast("timestamp")))).first()[0]
    late_mx_us = late.agg(F.max(F.unix_micros(F.col("ts").cast("timestamp")))).first()[0]
    assert late_mx_us < mx_us - 10 * 60_000_000, "fixture: late rows not late enough"
    on_path = str(tmp_path / "on_raw")
    on_time.write.parquet(on_path)

    # ---- stream: cycle 1 drains the on-time arrival, cycle 2 the late one
    src = str(tmp_path / "dl_src")
    sink = str(tmp_path / "dl_sink")
    dead = str(tmp_path / "dl_dead")
    ckpt_r = str(tmp_path / "dl_ckpt_rollup")
    ckpt_c = str(tmp_path / "dl_ckpt_capture")
    os.makedirs(src)
    now = _time.time()

    def stage(df, name, mt):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/__stage")
        _sh.move(_glob.glob(f"{src}/__stage/part-*.parquet")[0], f"{src}/{name}")
        _sh.rmtree(f"{src}/__stage")
        os.utime(f"{src}/{name}", (mt, mt))

    def cycle():
        run_to_parquet_sink(
            stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt_r
        )
        run_deadletter_capture(spark, src, dead, ckpt_c)

    stage(on_time, "000.parquet", now - 60)
    cycle()
    assert not os.path.exists(dead)  # nothing droppable in the first arrival
    stage(late, "001.parquet", now - 30)
    cycle()

    # captured set == the late rows, in the backfill delta shape
    cap = read_dead_letter(spark, dead)
    got_keys = sorted(
        (r["conv_id"], r["turn_idx"]) for r in cap.select("conv_id", "turn_idx").collect()
    )
    want_keys = sorted(
        (r["conv_id"], r["turn_idx"]) for r in late.select("conv_id", "turn_idx").collect()
    )
    assert got_keys == want_keys

    # the rollup sink really dropped them: every emitted turn is an on-time
    # turn of a closed window — sum(turn_count) equals exactly that count
    got_sink = spark.read.parquet(sink).toPandas()
    ot = on_time.select(
        F.col("conv_id"), F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).toPandas()
    wm_us = (mx_us // 1000) * 1000 - 10 * 60_000_000
    closed = ot[(ot.us // 60_000_000 + 1) * 60_000_000 <= wm_us]
    assert int(got_sink["turn_count"].sum()) == len(closed)

    # ---- heal: batch tables on on-time input + captured delta ≡ full build
    wd_a, wd_b = str(tmp_path / "wa"), str(tmp_path / "wb")
    run_pipeline(spark, wd_a, **args, input_table=on_path)
    backfill_pipeline(spark, wd_a, cap)
    run_pipeline(spark, wd_b, **args, input_table=full_path)
    io_a, io_b = TableIO(spark, wd_a), TableIO(spark, wd_b)
    sort_keys = {
        "chunks": ["conv_id", "tier", "metric", "start_ts"],
        "rollup_1m": ["conv_id", "tier", "bucket_ts"],
        "rollup_1h": ["conv_id", "tier", "bucket_ts"],
        "rollup_1d": ["conv_id", "tier", "bucket_ts"],
    }
    for t in ("ingest", "filled", "treated", "rollup_1m", "rollup_1h", "rollup_1d", "chunks"):
        keys = sort_keys.get(t, ["conv_id", "turn_idx"])
        a = io_a.read(t).toPandas().sort_values(keys).reset_index(drop=True)
        b = io_b.read(t).toPandas().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False), t


def test_stream_ingest_job_cycles(spark, transcripts_df, tmp_path):
    """The ops surface (jobs/stream_ingest_job.run_stream_cycle): one drain
    fills the rollup + chunk sinks and captures nothing; a late arrival in
    the second drain lands in the dead-letter dir in the delta schema."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    from pyspark.sql import functions as F

    from jobs.stream_ingest_job import run_stream_cycle

    src = str(tmp_path / "job_src")
    wd = str(tmp_path / "job_wd")
    os.makedirs(src)
    now = _time.time()

    late = transcripts_df.orderBy("ts").limit(5)
    on_time = transcripts_df.join(
        late.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    )

    def stage(df, name, mt):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/__s")
        _sh.move(_glob.glob(f"{src}/__s/part-*.parquet")[0], f"{src}/{name}")
        _sh.rmtree(f"{src}/__s")
        os.utime(f"{src}/{name}", (mt, mt))

    stage(on_time, "000.parquet", now - 60)
    s1 = run_stream_cycle(spark, src, wd)
    assert s1["rollup_input_rows"] > 0
    assert spark.read.parquet(f"{wd}/rollup_1m_stream").count() > 0
    assert s1["chunk_epoch_dirs"] >= 1
    assert s1["deadletter_epoch_dirs"] == 0 and not os.path.exists(f"{wd}/deadletter")

    stage(late, "001.parquet", now - 30)
    s2 = run_stream_cycle(spark, src, wd)
    assert s2["deadletter_epoch_dirs"] >= 1
    cap = spark.read.option("basePath", f"{wd}/deadletter").parquet(
        f"{wd}/deadletter"
    )
    assert cap.count() == 5
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= set(cap.columns)

    # capture state stays O(1): older batch maxima fold into the floor
    import json as _json

    stage(transcripts_df.orderBy(F.desc("ts")).limit(3), "002.parquet", now - 10)
    run_stream_cycle(spark, src, wd)
    state = _json.loads(
        open(f"{wd}/checkpoints/deadletter/deadletter_maxts.json").read()
    )
    assert set(state) == {"floor", "last"}
    assert len(state["last"]) <= 2 and state["floor"] is not None


def test_strict_capture_overcapture_still_heals_exactly(spark, tmp_path):
    """The strict-mode safety claim, end-to-end: strict capture grabs a
    SUPERSET of the dropped rows (here: most of the on-time backlog on the
    first drain), and healing that over-captured delta is idempotent —
    batch tables still end bit-equal to a from-scratch build."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from jobs.rollup_job import run_pipeline
    from pneuma_treatment_spark.io.tableio import TableIO
    from pneuma_treatment_spark.plans.backfill import backfill_pipeline
    from pneuma_treatment_spark.streaming.rollup_stream import (
        read_dead_letter,
        run_deadletter_capture,
    )
    from pneuma_treatment_spark.synth import generate_transcripts

    args = dict(n_convs=10, seed=21, mega_turns=0)
    full_path = str(tmp_path / "sfull_raw")
    generate_transcripts(spark, 10, seed=21).write.parquet(full_path)
    full = spark.read.parquet(full_path)
    c0 = full.select("conv_id").distinct().orderBy("conv_id").first()["conv_id"]
    late = full.where((F.col("conv_id") == c0) & (F.col("turn_idx") < 2))
    on_time = full.join(
        late.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    )
    on_path = str(tmp_path / "son_raw")
    on_time.write.parquet(on_path)

    src = str(tmp_path / "s_src")
    dead = str(tmp_path / "s_dead")
    ckpt = str(tmp_path / "s_ckpt")
    os.makedirs(src)
    now = _time.time()

    def stage(df, name, mt):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/__s")
        _sh.move(_glob.glob(f"{src}/__s/part-*.parquet")[0], f"{src}/{name}")
        _sh.rmtree(f"{src}/__s")
        os.utime(f"{src}/{name}", (mt, mt))

    stage(on_time, "000.parquet", now - 60)
    run_deadletter_capture(spark, src, dead, ckpt, strict=True)
    stage(late, "001.parquet", now - 30)
    run_deadletter_capture(spark, src, dead, ckpt, strict=True)

    cap = read_dead_letter(spark, dead)
    cap_keys = {(r["conv_id"], r["turn_idx"]) for r in cap.select("conv_id", "turn_idx").collect()}
    late_keys = {(r["conv_id"], r["turn_idx"]) for r in late.select("conv_id", "turn_idx").collect()}
    assert late_keys <= cap_keys          # superset guarantee…
    assert len(cap_keys) > len(late_keys)  # …and genuinely over-captured here

    wd_a, wd_b = str(tmp_path / "swa"), str(tmp_path / "swb")
    run_pipeline(spark, wd_a, **args, input_table=on_path)
    backfill_pipeline(spark, wd_a, cap)
    run_pipeline(spark, wd_b, **args, input_table=full_path)
    io_a, io_b = TableIO(spark, wd_a), TableIO(spark, wd_b)
    for t in ("ingest", "treated", "rollup_1d", "chunks"):
        keys = {"chunks": ["conv_id", "tier", "metric", "start_ts"],
                "rollup_1d": ["conv_id", "tier", "bucket_ts"]}.get(t, ["conv_id", "turn_idx"])
        a = io_a.read(t).toPandas().sort_values(keys).reset_index(drop=True)
        b = io_b.read(t).toPandas().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False), t


def test_strict_capture_bounds_first_drain(spark, transcripts_df, tmp_path):
    """strict=True includes the current batch's max in the bound — the
    guaranteed-superset mode: the very first drain already captures the
    pre-horizon backlog (non-strict captures nothing on batch 0)."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    from pyspark.sql import functions as F

    from pneuma_treatment_spark.streaming.rollup_stream import (
        run_deadletter_capture,
    )

    src = str(tmp_path / "strict_src")
    os.makedirs(src)
    transcripts_df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b")
    _sh.move(_glob.glob(f"{src}/b/part-*.parquet")[0], f"{src}/000.parquet")
    _sh.rmtree(f"{src}/b")
    os.utime(f"{src}/000.parquet", (_time.time() - 60,) * 2)

    dead_ns = str(tmp_path / "dead_nonstrict")
    run_deadletter_capture(spark, src, dead_ns, str(tmp_path / "ck_ns"))
    assert not os.path.exists(dead_ns)  # batch 0, no prior: nothing

    dead_s = str(tmp_path / "dead_strict")
    run_deadletter_capture(spark, src, dead_s, str(tmp_path / "ck_s"), strict=True)
    cap = spark.read.option("basePath", dead_s).parquet(dead_s)
    mx = transcripts_df.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).first()[0]
    want = transcripts_df.where(
        F.unix_micros(F.col("ts").cast("timestamp")) < F.lit(mx - 10 * 60_000_000)
    ).count()
    assert want > 0 and cap.count() == want


def test_prune_epochs_rejects_malformed_dates(tmp_path):
    """A malformed high-water string must raise, never lexicographically
    out-sort every ISO p_day and delete the whole sink; unparseable p_day
    layouts are kept, never guessed at."""
    import os

    import pytest as _pytest

    from pneuma_treatment_spark.streaming.rollup_stream import prune_stream_epochs

    root = tmp_path / "sink"
    os.makedirs(root / "batch_id=0" / "tier=1m" / "p_day=2024-01-01")
    os.makedirs(root / "batch_id=1" / "tier=1m" / "p_day=weird")
    for bad in ("2024/01/02", "tomorrow", "9999-99-99"):
        with _pytest.raises(ValueError):
            prune_stream_epochs(str(root), bad)
    # compact ISO parses (py3.11 fromisoformat) — and as a DATE it compares
    # correctly, unlike the lexicographic trap this test guards against
    assert prune_stream_epochs(str(root), "20230101") == {
        "removed": [], "kept": ["batch_id=0", "batch_id=1"]
    }
    out = prune_stream_epochs(str(root), "2025-01-01")
    assert out["removed"] == ["batch_id=0"]
    assert out["kept"] == ["batch_id=1"]  # unparseable p_day: kept


def test_parse_duration_rejects_garbage():
    import pytest as _pytest

    from pneuma_treatment_spark.streaming.rollup_stream import _parse_duration_us

    assert _parse_duration_us("10 minutes") == 600_000_000
    assert _parse_duration_us("1 day") == 86_400_000_000
    assert _parse_duration_us("0 seconds") == 0
    for bad in ("10", "ten minutes", "10 fortnights", "-5 minutes"):
        with _pytest.raises(ValueError):
            _parse_duration_us(bad)


def test_chunk_append_sink_exactly_once(spark, transcripts_df, tmp_path):
    """Streaming chunk append (VERDICT r5 item 7): two availableNow runs on
    one checkpoint — new input arriving between them — produce every chunk
    exactly once, the decoded union equals the batch rollup on the
    closed-window region, and the sink carries the (tier, p_day) TTL layout
    under each epoch dir."""
    import glob as _glob
    import os
    import shutil as _sh
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.compression.chunks import read_chunks
    from pneuma_treatment_spark.streaming.rollup_stream import (
        read_transcript_stream,
        run_chunk_append_sink,
        stream_rollup_1m,
    )

    src = str(tmp_path / "csink_src")
    sink = str(tmp_path / "csink_out")
    ckpt = str(tmp_path / "csink_ckpt")
    os.makedirs(src)

    split = transcripts_df.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).select(
        (F.col("mn") + (F.col("mx") - F.col("mn")) / 2).cast("string")
    ).first()[0]
    early = transcripts_df.where(F.col("ts") < F.lit(split).cast("timestamp"))
    late = transcripts_df.where(F.col("ts") >= F.lit(split).cast("timestamp"))

    now = _time.time()
    for i, part in enumerate((early, late)):
        part.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
    _sh.move(_glob.glob(f"{src}/b0/part-*.parquet")[0], f"{src}/000.parquet")
    _sh.rmtree(f"{src}/b0")
    os.utime(f"{src}/000.parquet", (now - 60, now - 60))

    run_chunk_append_sink(
        stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt
    )
    first = spark.read.option("basePath", sink).parquet(sink).toPandas()
    assert len(first) > 0

    _sh.move(_glob.glob(f"{src}/b1/part-*.parquet")[0], f"{src}/001.parquet")
    _sh.rmtree(f"{src}/b1")
    os.utime(f"{src}/001.parquet", (now - 30, now - 30))

    run_chunk_append_sink(
        stream_rollup_1m(read_transcript_stream(spark, src)), sink, ckpt
    )
    chunks = spark.read.option("basePath", sink).parquet(sink)
    got_chunks = chunks.toPandas()

    # exactly once: across ALL epoch dirs, no (conv, tier, p_day, metric,
    # start_ts) chunk appears twice
    assert not got_chunks.duplicated(
        ["conv_id", "tier", "p_day", "metric", "start_ts"]
    ).any()
    assert got_chunks["batch_id"].nunique() >= 2  # both runs contributed

    # TTL layout: tier/p_day dirs nest under each epoch dir
    epoch_dirs = _glob.glob(f"{sink}/batch_id=*/tier=1m/p_day=*")
    assert len(epoch_dirs) > 0

    # decoded union == batch rollup on the closed-window region
    pts = read_chunks(chunks).toPandas()
    # pivot (not pivot_table) keeps the load-bearing nulls — an
    # all-null-token window stores NaN in its chunk and must compare
    # equal to the batch tier's null, not be silently dropped
    wide = (
        pts.pivot(index=["conv_id", "bucket_ts"], columns="metric", values="value")
        .reset_index()
        .rename_axis(None, axis=1)
    )
    want = rollup_raw(with_turn_metrics(transcripts_df), "1m").toPandas()
    cutoff = transcripts_df.agg({"ts": "max"}).collect()[0][0] - pd.Timedelta(
        "11 minutes"
    )
    w = want[want.bucket_ts < cutoff]
    g = wide[wide.bucket_ts < cutoff]
    mcols = ["turn_count", "token_sum", "tool_calls"]
    cast = dict.fromkeys(mcols, "float64")
    assert_pdf_equal(
        g[["conv_id", "bucket_ts", *mcols]].astype(cast),
        w[["conv_id", "bucket_ts", *mcols]].astype(cast),
        ["conv_id", "bucket_ts"],
    )


def test_fused_cycle_single_scan_and_consistent_sinks(spark, transcripts_df, tmp_path):
    """r8 fusion contract (VERDICT r7 item 1): one cycle reads each arrival
    file once per SINK-CLASS (aggregated sinks share one query; capture is
    the second), the rollup parquet rows and the decoded chunk points of
    every epoch agree (one aggregation, one batching order), and a
    pre-fusion workdir is refused loudly instead of double-appending."""
    import os

    import pytest as _pytest

    from jobs.stream_ingest_job import run_stream_cycle
    from pneuma_treatment_spark.compression.chunks import read_chunks

    src = str(tmp_path / "fuse_src")
    wd = str(tmp_path / "fuse_wd")
    transcripts_df.coalesce(2).write.mode("overwrite").parquet(src)
    n_src = spark.read.parquet(src).count()

    s = run_stream_cycle(spark, src, wd)
    # each sink-class's query saw every source row exactly once
    assert s["rollup_input_rows"] == n_src
    assert s["deadletter_input_rows"] == n_src

    rollup = spark.read.option("basePath", f"{wd}/rollup_1m_stream").parquet(
        f"{wd}/rollup_1m_stream"
    )
    pts = read_chunks(
        spark.read.option("basePath", f"{wd}/chunks_stream").parquet(
            f"{wd}/chunks_stream"
        )
    )
    # chunk points decode to exactly the rollup rows' stored partials,
    # epoch for epoch (same aggregation fed both sinks)
    want = (
        rollup.selectExpr(
            "conv_id", "bucket_ts", "CAST(turn_count AS DOUBLE) AS v"
        ).orderBy("conv_id", "bucket_ts").collect()
    )
    got = (
        pts.where("metric = 'turn_count'")
        .selectExpr("conv_id", "bucket_ts", "value AS v")
        .orderBy("conv_id", "bucket_ts").collect()
    )
    assert got == want and len(got) > 0

    # a pre-fusion workdir (separate rollup checkpoint) is refused
    legacy_wd = str(tmp_path / "legacy_wd")
    os.makedirs(f"{legacy_wd}/checkpoints/rollup_1m_stream")
    with _pytest.raises(ValueError, match="pre-fusion"):
        run_stream_cycle(spark, src, legacy_wd)

"""Custom stateful streaming operator: conversation sessionization with
cross-batch state (``applyInPandasWithState``).

Splits each conv_id's turn stream into sessions separated by inactivity
gaps ≥ ``gap_sec``; a session's rows may arrive across many micro-batches,
so the operator carries (session ordinal, session start, last seen ts,
turn count) in GroupState and emits one row per *closed* session (a new
turn arriving after the gap closes the previous session). The batch
equivalent is the lag/cumsum gap-island pattern — tests assert the
streamed closed sessions equal the batch islands exactly.

Assumes per-conv event-time-ordered arrival ACROSS micro-batches (the
normal shape for an append-only ingest log; NB FileStreamSource orders
batches by file modification time, with ties broken arbitrarily — a bulk
write that stamps identical mtimes can violate this). Out-of-order sources
need a watermark + buffer stage in front, or ``session_window`` aggregation.

In ``close_idle`` (watermarked) mode, PRE-WATERMARK rows are dropped inside
the state function: Spark does not filter late input for
``applyInPandasWithState`` (unlike windowed aggregations, late-data
handling is the operator's responsibility), and an unfiltered late row
would both corrupt session state and set an invalid pre-watermark timeout.
Tested by ``test_sessionize_drops_pre_watermark_events``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_id", T.IntegerType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_turns", T.IntegerType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_sec: int = 1800,
    close_idle: bool = False,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """conv_id-keyed stateful sessionization over a transcript stream.

    Emits closed sessions; a new turn arriving after the gap closes the
    previous session. With ``close_idle=True`` an EVENT-TIME TIMEOUT also
    closes a session once the stream's watermark passes its end + gap — so
    a conversation that simply goes quiet still emits (and its state is
    dropped; without timeouts, idle-key state accumulates forever on a
    100 TB ingest). Input needs columns (conv_id, ts).

    ``watermark_delay`` (close_idle mode) bounds tolerated cross-key event
    skew: with "0 seconds", an event older than the max event time already
    seen is DROPPED as late — size it to the source's actual disorder
    (FileStreamSource orders micro-batches by file mtime, ties arbitrary).
    """
    gap_us = gap_sec * 1_000_000

    def fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if close_idle and state.hasTimedOut:
            sess_id, start_us, last_us, n_turns = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "session_id": sess_id,
                        "start_us": start_us,
                        "end_us": last_us,
                        "n_turns": n_turns,
                    }
                ],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return
        if state.exists:
            sess_id, start_us, last_us, n_turns = state.get
        else:
            sess_id, start_us, last_us, n_turns = 0, None, None, 0

        # applyInPandasWithState does NOT filter late input against the
        # watermark (unlike windowed aggs — dropping late rows is the state
        # function's job): a pre-watermark event would regress last_us and
        # make the event-time timeout below invalid (the engine rejects
        # INVALID_TIMEOUT_TIMESTAMP). Enforce the documented drop rule here.
        wm_ms = state.getCurrentWatermarkMs() if close_idle else 0

        closed: list[dict[str, Any]] = []
        # the grouped iterator yields this batch's rows in arbitrary
        # post-shuffle chunk order — materialize and sort the WHOLE batch
        # before scanning (chunk-local sorting silently drops sessions)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            ts_all = (
                pd.to_datetime(batch["ts"])
                .astype("datetime64[us]")
                .astype("int64")
                .sort_values()
            )
            if close_idle:
                ts_all = ts_all[ts_all >= wm_ms * 1000]
            for t in ts_all:
                t = int(t)
                if start_us is None:
                    start_us, last_us, n_turns = t, t, 1
                elif t - last_us >= gap_us:
                    closed.append(
                        {
                            "conv_id": conv_id,
                            "session_id": sess_id,
                            "start_us": start_us,
                            "end_us": last_us,
                            "n_turns": n_turns,
                        }
                    )
                    sess_id += 1
                    start_us, last_us, n_turns = t, t, 1
                else:
                    last_us = max(last_us, t)
                    n_turns += 1
        timeout_ms = (
            last_us // 1000 + gap_sec * 1000 if last_us is not None else None
        )
        if last_us is None:
            # nothing to track (e.g. every row of a straggler batch was
            # dropped as pre-watermark and no session is open): do NOT
            # create an empty state row — it would carry no timeout, so
            # EventTimeTimeout could never evict it and idle-key state
            # would grow without bound on a large ingest
            if state.exists:
                state.remove()
        elif close_idle and timeout_ms <= wm_ms:
            # The open session already expired relative to the current
            # watermark (its group got a data call this batch — e.g. a
            # dropped late row — so the hasTimedOut path won't fire for
            # it). Setting a pre-watermark timeout is rejected by the
            # engine; the timeout would fire immediately anyway, so close
            # the session now and drop the state.
            closed.append(
                {
                    "conv_id": conv_id,
                    "session_id": sess_id,
                    "start_us": start_us,
                    "end_us": last_us,
                    "n_turns": n_turns,
                }
            )
            if state.exists:
                state.remove()
        else:
            state.update((sess_id, start_us, last_us, n_turns))
            if close_idle and timeout_ms is not None:
                # close once the watermark passes the open session's end + gap
                state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    src = stream.withWatermark("ts", watermark_delay) if close_idle else stream
    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if close_idle
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_batch(
    df: DataFrame, gap_sec: int = 1800, tie_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Batch twin: lag + gap flag + running island id (the SURVEY
    'sessionization' pattern). Returns ALL sessions incl. the last open one.

    ``tie_cols`` break ordering ties among duplicate per-conv timestamps —
    without one, session membership (and thus min/max/count) is
    nondeterministic when (conv_id, ts) repeats."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", *tie_cols)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    d = df.withColumn("__us", us).withColumn(
        "__new", (F.col("__us") - F.lag("__us").over(w) >= gap_sec * 1_000_000).cast("int")
    )
    d = d.withColumn(
        "session_id",
        F.coalesce(
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            F.lit(0),
        ).cast("int"),
    )
    return d.groupBy("conv_id", "session_id").agg(
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )

"""Gorilla chunk tables: rollup tiers stored as per-(partition, series)
byte-array chunks (north_star storage format).

Tall layout: one row per (conv_id [, p_day], tier, metric) holding the
Gorilla blob for that metric's (bucket_ts, value) series, plus chunk stats
(n_points, start/end ts) for pruning. Encoding runs inside Arrow-batched
``applyInPandas`` per series — executors each compress their own groups, no
driver involvement; reading explodes chunks back to points via
``mapInPandas``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pneuma_treatment_spark.compression.gorilla import decode_chunks, encode_chunks


# Store the EXACT integer partials, never derived float rates: the XOR
# codec compresses integer-valued doubles ~2x (trailing-zero mantissas)
# while a full-entropy rate barely compresses (measured 1.04x), and rates
# re-derive exactly from the ints on read — the same algebraic-tier rule the
# rollup cascade follows.
DEFAULT_METRICS = ("turn_count", "token_sum", "tool_calls")

#: Per-tier chunk time-window length in DAYS. A chunk never crosses a
#: window boundary (the window is part of the encode group key), so
#: retention can drop whole (tier, p_day=window-start) partitions —
#: without this a chunk spanning years could never TTL without a rewrite
#: of live data (VERDICT r5 item 5).
#:
#: Sizing: window length affects only retention SLACK (a boundary window
#: survives until fully expired — ≤ window extra days vs the tier's TTL),
#: never correctness, so windows are deliberately COARSE. Fine windows
#: shatter sparse long-lived series into per-window fragments: a measured
#: warm-JVM A/B (BENCH/ab_chunk_window.json) on a 90-day sparse 1m-tier
#: workload showed 1-day windows costing +64% roundtrip wall (90x the
#: chunk count) while 7-day windows hold within a few % of the unwindowed
#: path. Slack at the DEFAULT_TTLS: 7/90 ≈ 8%, 45/365 ≈ 12%, 365/3650 = 10%
#: — standard TSDB shard-group trade-offs.
TIER_WINDOW_DAYS = {"1m": 7, "1h": 45, "1d": 365}

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("p_day", T.DateType(), False),  # chunk window START day
        T.StructField("metric", T.StringType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("start_ts", T.TimestampType(), False),
        T.StructField("end_ts", T.TimestampType(), False),
        T.StructField("chunk", T.BinaryType(), False),
    ]
)

POINT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("bucket_ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def write_chunks(
    rollup: DataFrame,
    metrics: tuple[str, ...] = DEFAULT_METRICS,
    group_buckets: int = 256,
    window_days: dict[str, int] | None = None,
) -> DataFrame:
    """Compress a rollup tier DataFrame (conv_id, bucket_ts, tier, metrics…)
    into Gorilla chunk rows, one chunk per (conv_id, tier, window, metric).

    Shuffles on a hash bucket of conv_id ONLY (the same single exchange as
    ever — pinned by test_chunk_write_single_exchange; hash buckets, not
    per-series or per-window groups, because per-group Arrow overhead
    dominates with many small groups — a measured warm-JVM A/B of putting
    (tier, p_day) into the group key cost +56-80% roundtrip wall,
    BENCH/ab_chunk_window.json). The window boundary is enforced INSIDE the
    kernel instead: every row of a conversation lands in one bucket, so
    adding the tier's TIER_WINDOW_DAYS-aligned window id to the
    series-change mask splits chunks at window starts with a few numpy ops.
    """
    from pyspark.sql import functions as F

    windows = window_days if window_days is not None else TIER_WINDOW_DAYS

    def enc_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one bucket-wide sort + numpy slice bounds instead of a pandas
        # groupby over millions of tiny series (per-group frame construction
        # dominated the stage, not the encoding), and ONE batched
        # encode_chunks call per metric instead of a per-series encode
        # (per-chunk numpy dispatch was ~260 µs on 2-8-point series — 28x)
        pdf = pdf.sort_values(["conv_id", "tier", "bucket_ts"]).reset_index(drop=True)
        conv = pdf["conv_id"].to_numpy()
        tier = pdf["tier"].to_numpy()
        ts64 = pdf["bucket_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # tier-dependent TTL window id: chunks never cross a window start
        wd = pdf["tier"].map(windows).fillna(1).astype("int64").to_numpy()
        eday = np.floor_divide(ts64, 86_400_000_000)
        win = np.floor_divide(eday, wd) * wd
        n = len(pdf)
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
            change[1:] = (
                (conv[1:] != conv[:-1])
                | (tier[1:] != tier[:-1])
                | (win[1:] != win[:-1])
            )
        firsts = np.flatnonzero(change)
        bounds = np.append(firsts, n)
        lengths = np.diff(bounds)
        nseries = len(firsts)
        lasts = bounds[1:] - 1
        conv_s = conv[firsts] if nseries else conv[:0]
        tier_s = tier[firsts] if nseries else tier[:0]
        pday_s = (
            pd.to_datetime(win[firsts] * 86400, unit="s").date
            if nseries
            else np.array([], dtype=object)
        )
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
                "p_day": np.tile(pday_s, k),
                "metric": np.repeat(np.array(metrics, dtype=object), nseries),
                "n_points": np.tile(lengths.astype(np.int32), k),
                "start_ts": pd.to_datetime(np.tile(start_s, k), unit="us"),
                "end_ts": pd.to_datetime(np.tile(end_s, k), unit="us"),
                "chunk": blobs,
            }
        )

    from pneuma_treatment_spark.session import pin_bucket_parallelism

    # pin the encode stage's task count (AQE would coalesce the few-MB
    # shuffle to 1-2 tasks and serialize the Python encode — see
    # session.pin_bucket_parallelism)
    keyed = pin_bucket_parallelism(
        rollup.withColumn(
            "__g", F.pmod(F.xxhash64("conv_id"), F.lit(group_buckets)).cast("int")
        ),
        group_buckets,
    )
    return keyed.groupBy("__g").applyInPandas(
        lambda p: enc_bucket(p.drop(columns="__g")), CHUNK_SCHEMA
    )


def chunk_ttl_sql_predicate(
    ttl_days: dict[str, int],
    now_date: str,
    window_days: dict[str, int] | None = None,
) -> str:
    """Partition-aligned TTL predicate for a (tier, p_day)-partitioned chunk
    table (TableIO.delete_where / Iceberg DELETE WHERE): a window
    [p_day, p_day + wdays) is dropped only once its LAST covered day is past
    the tier's retention — boundary windows survive until fully expired
    (standard TSDB chunk-retention semantics), so no live point is ever
    deleted. Both predicate columns are partition columns: the delete's
    keep-scan prunes dropped partitions entirely, and on real Iceberg the
    operation is metadata-only. ``window_days`` must match what the table
    was written with (defaults to TIER_WINDOW_DAYS on both sides)."""
    windows = window_days if window_days is not None else TIER_WINDOW_DAYS
    parts = [
        f"(tier = '{tier}' AND p_day < date_sub(date'{now_date}', "
        f"{ttl + windows.get(tier, 1) - 1}))"
        for tier, ttl in ttl_days.items()
    ]
    return " OR ".join(parts)


def read_chunks(chunks: DataFrame) -> DataFrame:
    """Explode Gorilla chunk rows back into (conv_id, tier, metric,
    bucket_ts, value) points.

    Decodes each Arrow batch of chunks in ONE vectorized
    :func:`~pneuma_treatment_spark.compression.gorilla.decode_chunks` pass
    and assembles the output columnar (np.repeat keys over concatenated
    series) — per-chunk decode + per-chunk DataFrame construction was
    ~300 µs/chunk, the read path's wall for tiers storing millions of
    small chunks."""
    def dec(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lens, ts, vals = decode_chunks(list(pdf["chunk"]))
            yield pd.DataFrame(
                {
                    "conv_id": np.repeat(pdf["conv_id"].to_numpy(), lens),
                    "tier": np.repeat(pdf["tier"].to_numpy(), lens),
                    "metric": np.repeat(pdf["metric"].to_numpy(), lens),
                    "bucket_ts": pd.to_datetime(ts, unit="us"),
                    "value": vals,
                }
            )

    return chunks.mapInPandas(dec, POINT_SCHEMA)


def read_chunks_range(chunks: DataFrame, start, end) -> DataFrame:
    """Time-range read over a chunk table: prune on the per-chunk
    (start_ts, end_ts) stats JVM-side BEFORE any blob reaches Python —
    the Gorilla-chunk analog of parquet row-group min/max pruning — then
    decode only the surviving chunks and trim boundary chunks with a
    point-level residual filter. On a day-partitioned chunk table the
    stat filter composes with p_day partition pruning, so a narrow window
    over years of data touches only its overlapping chunks' bytes.

    ``start``/``end`` are inclusive bounds as ISO strings (parsed in the
    session timezone — never pass python datetimes to literals; see the
    driver-OS-timezone sharp edge) or Columns."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    def _lit(v):
        return v if isinstance(v, Column) else F.lit(str(v)).cast("timestamp")

    lo, hi = _lit(start), _lit(end)
    pruned = chunks.where((F.col("end_ts") >= lo) & (F.col("start_ts") <= hi))
    pts = read_chunks(pruned)
    return pts.where((F.col("bucket_ts") >= lo) & (F.col("bucket_ts") <= hi))


def points_with_rates(points: DataFrame) -> DataFrame:
    """Pivot decoded (metric, value) points back to wide rows and re-derive
    the float rates from the stored integer partials — bit-identical to the
    rollup tier the chunks were written from."""
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.operators.rollup import TIERS, _with_rates

    wide = (
        points.groupBy("conv_id", "tier", "bucket_ts")
        .pivot("metric", list(DEFAULT_METRICS))
        .agg(F.first("value"))
    )
    for m in DEFAULT_METRICS:
        wide = wide.withColumn(m, F.col(m).cast("long"))
    secs = F.create_map(
        *[x for t, s in TIERS.items() for x in (F.lit(t), F.lit(s))]
    )[F.col("tier")]
    return _with_rates(wide, secs)

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

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
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
) -> DataFrame:
    """Compress a rollup tier DataFrame (conv_id, bucket_ts, tier, metrics…)
    into Gorilla chunk rows.

    Shuffles on a hash bucket of conv_id (not per-series groups — per-group
    Arrow overhead dominates with millions of tiny series; see
    operators/treatment._apply) and encodes each (conv_id, tier) series with
    a pandas groupby inside the task.
    """
    from pyspark.sql import functions as F

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
        lambda p: enc_bucket(p.drop(columns="__g")), CHUNK_SCHEMA
    )


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

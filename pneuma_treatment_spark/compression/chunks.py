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

from pneuma_treatment_spark.compression.gorilla import decode_chunk, encode_chunk

DEFAULT_METRICS = ("turn_count", "token_rate", "tool_call_rate", "turns_norm")

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
        rows = []
        for (conv_id, tier), g in pdf.groupby(["conv_id", "tier"], sort=False):
            g = g.sort_values("bucket_ts")
            ts_us = g["bucket_ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for m in metrics:
                rows.append(
                    {
                        "conv_id": conv_id,
                        "tier": tier,
                        "metric": m,
                        "n_points": len(g),
                        "start_ts": g["bucket_ts"].iloc[0],
                        "end_ts": g["bucket_ts"].iloc[-1],
                        "chunk": encode_chunk(ts_us, g[m].to_numpy(dtype=np.float64)),
                    }
                )
        return pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    keyed = rollup.withColumn(
        "__g", F.pmod(F.xxhash64("conv_id"), F.lit(group_buckets)).cast("int")
    )
    return keyed.groupBy("__g").applyInPandas(
        lambda p: enc_bucket(p.drop(columns="__g")), CHUNK_SCHEMA
    )


def read_chunks(chunks: DataFrame) -> DataFrame:
    """Explode Gorilla chunk rows back into (conv_id, tier, metric,
    bucket_ts, value) points."""

    def dec(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                ts, vals = decode_chunk(bytes(r.chunk))
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": r.conv_id,
                            "tier": r.tier,
                            "metric": r.metric,
                            "bucket_ts": pd.to_datetime(ts, unit="us"),
                            "value": vals,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return chunks.mapInPandas(dec, POINT_SCHEMA)

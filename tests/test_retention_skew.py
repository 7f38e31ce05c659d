"""Retention (mask nulling + TTL) and skew (salted two-phase agg) tests."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from pneuma_treatment_spark.io.tableio import TableIO
from pneuma_treatment_spark.operators.retention import apply_interval_mask, ttl_sql_predicate
from pneuma_treatment_spark.operators.rollup import rollup_raw, with_turn_metrics
from pneuma_treatment_spark.operators.skew import salted_agg


def test_interval_mask_nulling(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, m), float(m)) for m in range(10)
    ] + [("b", dt.datetime(2024, 1, 1, 0, m), float(m)) for m in range(10)]
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp, token_rate double")
    mask = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0, 2), dt.datetime(2024, 1, 1, 0, 5)),
            ("a", dt.datetime(2024, 1, 1, 0, 8), dt.datetime(2024, 1, 1, 0, 9)),
        ],
        "conv_id string, start_ts timestamp, end_ts timestamp",
    )
    out = apply_interval_mask(df, mask, metric_cols=("token_rate",)).toPandas()
    a = out[out.conv_id == "a"].set_index(out[out.conv_id == "a"].bucket_ts.dt.minute)
    # half-open [start, end): minutes 2,3,4 and 8 observed; 5 and 9 not
    assert set(a.index[a.is_observed]) == {2, 3, 4, 8}
    assert a.loc[3, "token_rate"] == 3.0
    assert pd.isna(a.loc[6, "token_rate"])
    # key 'b' has no intervals → fully nulled but rows kept
    b = out[out.conv_id == "b"]
    assert len(b) == 10 and b["token_rate"].isna().all()
    # drop mode removes unobserved rows
    dropped = apply_interval_mask(
        df, mask, metric_cols=("token_rate",), remove_filtered=True
    )
    assert dropped.count() == 4


def test_interval_mask_keeps_duplicate_rows(spark):
    """Legitimate duplicate fact rows must survive the mask (the round-1
    groupBy(*columns) formulation silently deduplicated them)."""
    row = ("a", dt.datetime(2024, 1, 1, 0, 3), 1.5)
    df = spark.createDataFrame(
        [row, row, row], "conv_id string, bucket_ts timestamp, token_rate double"
    )
    mask = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 10))],
        "conv_id string, start_ts timestamp, end_ts timestamp",
    )
    out = apply_interval_mask(df, mask, metric_cols=("token_rate",))
    assert out.count() == 3
    assert out.where(F.col("is_observed")).count() == 3


def test_interval_mask_no_fact_shuffle(spark):
    """The fact side must reach the broadcast join without an exchange: the
    only hash shuffle in the whole plan is the tiny mask-side collect_list."""
    rows = [("a", dt.datetime(2024, 1, 1, 0, m), float(m)) for m in range(10)]
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp, token_rate double")
    mask = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 2), dt.datetime(2024, 1, 1, 0, 5))],
        "conv_id string, start_ts timestamp, end_ts timestamp",
    )
    out = apply_interval_mask(df, mask, metric_cols=("token_rate",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert final.count("Exchange hashpartitioning") <= 1  # mask agg only


def test_interval_mask_preserves_rowcount(spark, transcripts_df):
    tier = rollup_raw(with_turn_metrics(transcripts_df), "1h")
    mask = tier.groupBy("conv_id").agg(
        F.min("bucket_ts").alias("start_ts"),
        F.max("bucket_ts").alias("end_ts"),  # half-open: max bucket excluded
    )
    out = apply_interval_mask(tier, mask)
    assert out.count() == tier.count()


def test_ttl_delete(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "t"))
    rows = [
        ("c1", dt.datetime(2024, 1, d, 12, 0), 1.0) for d in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, v double")
    io.write(df, "tier")
    io.delete_where("tier", ttl_sql_predicate(ttl_days=5, now_date="2024-01-20"))
    left = io.read("tier").toPandas()
    assert len(left) == 6  # days 15..20 survive (p_day >= now - 5)
    assert left["ts"].dt.day.min() == 15


def test_salted_agg_exact(spark, transcripts_df):
    m = with_turn_metrics(transcripts_df)
    plain = (
        m.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("token_count").alias("tok"),
            F.max("turn_idx").alias("mx"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            m,
            ["conv_id"],
            {"n": ("*", "count"), "tok": ("token_count", "sum"), "mx": ("turn_idx", "max")},
            salt_buckets=16,
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted[plain.columns], check_dtype=False)


def test_ttl_expiring_every_row_keeps_table_readable(spark, tmp_path):
    """A TTL pass that expires EVERY row must leave a readable,
    schema-bearing empty table (an empty partitioned parquet write emits
    no data file — the rewrite falls back to one flat schema file), and
    the table must accept a subsequent write and a compact()."""
    from pyspark.sql import functions as F

    from pneuma_treatment_spark.io.tableio import TableIO

    io = TableIO(spark, str(tmp_path / "ttl_all"), n_buckets=2)
    e = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .limit(500)
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
    )
    io.write(e, "t")
    io.delete_where("t", "TRUE")  # everything expires
    empty = io.read("t")
    assert empty.count() == 0
    assert set(("conv_id", "ts", "value")) <= set(empty.columns)
    io.compact("t")  # maintenance on the empty table must not crash
    assert io.read("t").count() == 0
    io.write(e, "t")  # and the table regrows on the next write
    assert io.read("t").count() == 500
    # the regrow takes the STATIC path over the empty table, so the flat
    # schema file cannot survive at the root next to partition dirs (a
    # stale-schema hazard once columns evolve)
    import os as _os

    assert not any(
        f.endswith(".parquet") for f in _os.listdir(io.path("t"))
    )

"""Sketch aggregates: approximate results must land inside their error
bounds vs the exact forms the oracle gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pneuma_treatment_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    quantile_bins,
)

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_within_error(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["event_type"]: r["quantiles"]
        for r in approx_quantiles(
            e, "value", (0.25, 0.5, 0.75), ("event_type",)
        ).collect()
    }
    exact = {
        r["event_type"]: r["q"]
        for r in e.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("q"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        spread = max(exact[k]) - min(exact[k]) or 1.0
        for a, b in zip(got[k], exact[k]):
            assert abs(a - b) <= 0.05 * spread, (k, got[k], exact[k])


def test_approx_distinct_within_rsd(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(e, "user_id", ("event_type",), rsd=0.01).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k in exact:
        assert abs(got[k] - exact[k]) <= max(3, 0.05 * exact[k]), (k, got[k], exact[k])


def test_quantile_bins_monotone(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    splits = [r[0] for r in approx_quantiles(e, "value", (0.25, 0.5, 0.75)).collect()][0]
    binned = e.select("value", quantile_bins(F.col("value"), list(splits)).alias("bin"))
    agg = binned.groupBy("bin").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"), F.count(F.lit(1)).alias("n")
    ).orderBy("bin").collect()
    assert [r["bin"] for r in agg] == [0, 1, 2, 3]
    for prev, cur in zip(agg, agg[1:]):
        assert prev["hi"] <= cur["lo"]
    total = sum(r["n"] for r in agg)
    for r in agg:  # quartile bins → ~25% each
        assert 0.15 * total <= r["n"] <= 0.35 * total

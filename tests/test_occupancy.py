"""Hand-computed cases for the A3 occupancy spill and J9 set-diff operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pneuma_treatment_spark.operators.occupancy import (
    compare_keyed_sets,
    occupancy_spill,
    transition_edges,
    with_next_node,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user u1 walks A → A → B → C inside one minute
        ("u1", 1, "A", 10, base + dt.timedelta(seconds=1)),
        ("u1", 2, "A", 20, base + dt.timedelta(seconds=2)),
        ("u1", 3, "B", 30, base + dt.timedelta(seconds=3)),
        ("u1", 4, "C", 40, base + dt.timedelta(seconds=4)),
        # user u2: B → A in the next minute
        ("u2", 5, "B", 50, base + dt.timedelta(seconds=61)),
        ("u2", 6, "A", 60, base + dt.timedelta(seconds=62)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id int, event_type string, cents long, ts timestamp"
    )
    return df.withColumn("epoch_s", F.unix_timestamp(F.col("ts").cast("timestamp")))


def test_with_next_node_islands(spark):
    nn = {r["event_id"]: r["next_node"] for r in with_next_node(_events(spark)).collect()}
    assert nn[1] == "B" and nn[2] == "B"  # both A-island rows point at B
    assert nn[3] == "C" and nn[4] is None
    assert nn[5] == "A" and nn[6] is None


def test_occupancy_spill_hand_values(spark):
    e = _events(spark)
    edges = spark.createDataFrame([("A", "B")], "src string, dst string")  # only A→B direct
    out = {
        (r["node"], r["bucket_ts"].second if r["bucket_ts"].minute == 0 else 60):
            r["occ_quarters"]
        for r in occupancy_spill(e, edges).collect()
    }
    # minute 0: own A=10+20=30, B=30, C=40; spill into B from A-island rows
    # (events 1,2 have next_node B and A→B is direct) = 10+20=30
    assert out[("A", 0)] == 3 * 30
    assert out[("B", 0)] == 3 * 30 + 30
    assert out[("C", 0)] == 3 * 40  # B→C not a direct edge → no spill
    # minute 1: own B=50, A=60; B→A not direct → no spill
    assert out[("B", 60)] == 3 * 50
    assert out[("A", 60)] == 3 * 60


def test_transition_edges_threshold(spark):
    e = _events(spark)
    all_edges = {(r["src"], r["dst"]) for r in transition_edges(e).collect()}
    assert all_edges == {("A", "B"), ("B", "C"), ("B", "A")}
    assert transition_edges(e, min_count=2).count() == 0


def test_compare_keyed_sets(spark):
    a = spark.createDataFrame(
        [("n1", "x"), ("n1", "y"), ("n2", "x"), ("n3", "z")], "src string, dst string"
    )
    b = spark.createDataFrame(
        [("n1", "y"), ("n1", "x"), ("n2", "q"), ("n4", "w")], "src string, dst string"
    )
    out = {r["src"]: r["status"] for r in compare_keyed_sets(a, b).collect()}
    # n1 sets equal ignoring order → absent; n2 differs; n3/n4 one-sided
    assert out == {"n2": "different", "n3": "only_left", "n4": "only_right"}


def test_occupancy_spill_derived_equals_unfused(spark):
    """The fused island-pass form must equal occupancy_spill over
    transition_edges on the same input, for both a permissive and a
    filtering min_count (the r8 optimization contract)."""
    from pneuma_treatment_spark.operators.occupancy import occupancy_spill_derived

    df = _events(spark)
    for mc in (1, 2):
        ref = occupancy_spill(df, transition_edges(df, min_count=mc)).orderBy(
            "node", "bucket_ts"
        )
        fused = occupancy_spill_derived(df, min_count=mc).orderBy("node", "bucket_ts")
        assert [r.asDict() for r in fused.collect()] == [
            r.asDict() for r in ref.collect()
        ]

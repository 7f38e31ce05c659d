"""State estimation (W11/W12), comparison metrics (A9-A11), event matching
(W13) and DTW (W14) against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from pneuma_treatment_spark.operators.dtw import dtw_compare, dtw_distance
from pneuma_treatment_spark.operators.metrics import (
    classification_report,
    compare_series,
    match_events,
)
from pneuma_treatment_spark.operators.state import (
    DISSIPATING,
    FORMING,
    FREE_FLOW,
    QUEUED,
    SATURATED,
    estimate_states,
    thresholds_kmeans,
    transition_events,
)


def _series(spark, vals, conv="c1"):
    rows = [
        (conv, dt.datetime(2024, 1, 1, 0, i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp, token_rate double")


def test_estimate_states_thresholds(spark):
    df = _series(spark, [10.0, 0.1, None, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0])
    out = {r["bucket_ts"].minute: r["state"] for r in
           estimate_states(df, low=0.5, high=5.0).collect()}
    assert out[0] == FREE_FLOW        # > high
    assert out[1] == QUEUED           # < low
    assert out[2] == FREE_FLOW        # null → FREE (22stateEstimate.py:97-99)
    assert out[5] == SATURATED        # flat mid-band → SATURATED


def test_thresholds_kmeans_recovers_regimes(spark):
    """A14 k-means option (reference test_clustering.py:40-51): the
    reference-style seeded 3-regime fixture — N(30,3) free flow, N(15,3)
    saturated, N(3,1) stopped — must yield midpoint thresholds that
    separate the regimes, with the per-regime classification agreeing with
    ground truth for ≥95% of points."""
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            np.clip(rng.normal(30, 3, 300), 0, None),
            np.clip(rng.normal(15, 3, 300), 0, None),
            np.clip(rng.normal(3, 1, 300), 0, None),
        ]
    )
    truth = np.repeat([2, 1, 0], 300)  # regime index, high→low
    rows = [
        ("c1", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts timestamp, token_rate double"
    )
    centers, (low, high) = thresholds_kmeans(df, "token_rate", k=3, seed=42)
    assert len(centers) == 3 and centers == sorted(centers)
    # centers land on the regime means, thresholds on the midpoints
    assert abs(centers[0] - 3) < 2 and abs(centers[1] - 15) < 3 and abs(centers[2] - 30) < 3
    assert centers[0] < low < centers[1] < high < centers[2]
    pred = np.where(vals < low, 0, np.where(vals < high, 1, 2))
    assert (pred == truth).mean() >= 0.95


def test_estimate_states_slope_voting(spark):
    falling = _series(spark, [3.0, 2.8, 2.6, 2.4, 2.2, 2.0, 1.8, 1.6])
    out = estimate_states(falling, low=0.5, high=5.0, slope_thr=0.05).collect()
    assert out[0]["state"] == FORMING
    rising = _series(spark, [1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.2, 2.4])
    out = estimate_states(rising, low=0.5, high=5.0, slope_thr=0.05).collect()
    assert out[0]["state"] == DISSIPATING


def test_transition_events(spark):
    df = _series(spark, [10.0, 10.0, 0.1, 0.1, 10.0])
    st = estimate_states(df, low=0.5, high=5.0)
    ev = transition_events(st).orderBy("bucket_ts").collect()
    assert [e["event_type"] for e in ev] == ["TO_CONGESTION", "TO_FREE_FLOW"]
    assert ev[0]["bucket_ts"].minute == 2 and ev[1]["bucket_ts"].minute == 4


def test_compare_series_hand_values(spark):
    truth = _series(spark, [1.0, 2.0, 3.0, 4.0])
    model = _series(spark, [1.5, 2.0, 2.5, 5.0])
    r = compare_series(truth, model).collect()[0]
    errs = np.array([0.5, 0.0, -0.5, 1.0])
    assert r["n_points"] == 4
    assert r["mae"] == round(np.abs(errs).mean(), 6)
    assert r["rmse"] == round(float(np.sqrt((errs**2).mean())), 6)
    # DA: truth diffs all +1 → signs +; model diffs 0.5,0.5,2.5 → signs + → 3/3
    assert r["da"] == 1.0
    # baseline = |t - median(t)| mean = mean(1.5,0.5,0.5,1.5)=1.0 → rss = 1-0.5
    assert r["rss"] == 0.5


def test_classification_report(spark):
    pairs = [("a", "a")] * 5 + [("a", "b")] * 2 + [("b", "b")] * 3 + [("b", "a")] * 1
    df = spark.createDataFrame(pairs, "gt string, pred string")
    per, summary = classification_report(df)
    p = {r["label"]: r for r in per.collect()}
    assert p["a"]["tp"] == 5 and p["a"]["support"] == 7 and p["a"]["predicted"] == 6
    assert p["a"]["precision"] == 5 / 6 and p["a"]["recall"] == 5 / 7
    s = summary.collect()[0]
    assert s["accuracy"] == 8 / 11


def test_match_events_greedy(spark):
    def ev(ts_list):
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [("c1", "T", base + dt.timedelta(seconds=t)) for t in ts_list],
            "conv_id string, event_type string, bucket_ts timestamp",
        )

    gt = ev([10, 100, 200])
    pred = ev([12, 95, 500])  # two matches within ±30s, one FP, one FN
    r = match_events(gt, pred, max_delay=30).collect()[0]
    assert (r["tp"], r["fn"], r["fp"]) == (2, 1, 1)
    # signed delays: +2 (12 vs 10), −5 (95 vs 100)
    assert r["mean_abs_delay"] == pytest.approx(3.5)
    assert r["median_abs_delay"] == pytest.approx(3.5)
    assert r["mean_delay"] == pytest.approx(-1.5)
    assert r["median_delay"] == pytest.approx(-1.5)
    # population std of [2, −5]: sqrt(2·29 − 9)/2 = 3.5 (≡ np.std)
    assert r["std_delay"] == pytest.approx(3.5)


def test_dtw_known_values():
    a = np.array([0.0, 1.0, 2.0])
    assert dtw_distance(a, a) == 0.0
    # classic small case: warping absorbs the repeated element
    d = dtw_distance(np.array([1.0, 2.0, 3.0]), np.array([1.0, 2.0, 2.0, 3.0]))
    assert d == 0.0
    d2 = dtw_distance(np.array([1.0, 1.0]), np.array([2.0, 2.0]))
    assert d2 == pytest.approx(np.sqrt(1 + 1 + 0) if False else np.sqrt(2.0))


def test_dtw_compare_spark(spark):
    t = _series(spark, [1.0, 2.0, 3.0, 2.0, 1.0])
    m = _series(spark, [1.0, 2.0, 3.0, 2.0, 1.0])
    r = dtw_compare(t, m).collect()[0]
    assert r["dtw"] == 0.0 and r["dtw_normalized"] == 0.0


def test_dtw_path_hand_computed():
    """Hand-computed DP for a=[0,3,1], b=[1,2,2] (24dtwDistance.py:112-188):
    D[3][3]=3, optimal path is the pure diagonal (0,0),(1,1),(2,2),(3,3),
    interior errors all |a_i − b_i| = 1."""
    from pneuma_treatment_spark.operators.dtw import (
        backtrack_path,
        dtw_matrix,
        path_error_stats,
    )

    a = np.array([0.0, 3.0, 1.0])
    b = np.array([1.0, 2.0, 2.0])
    D = dtw_matrix(a, b)
    assert D[3][3] == 3.0
    assert backtrack_path(D) == [(0, 0), (1, 1), (2, 2), (3, 3)]
    s = path_error_stats(a, b)
    assert s == {
        "path_len": 4,
        "avg_path_error": 1.0,
        "std_path_error": 0.0,
        "max_path_error": 1.0,
    }


def test_dtw_path_tie_breaks_up_first():
    """All-equal cost matrix: the reference's min() takes the FIRST minimal
    candidate — (i-1, j) before (i, j-1) before diagonal — so the path for
    a=b=[1,1] walks up then left (length 4), not the diagonal (length 3)."""
    from pneuma_treatment_spark.operators.dtw import backtrack_path, dtw_matrix

    D = dtw_matrix(np.array([1.0, 1.0]), np.array([1.0, 1.0]))
    assert backtrack_path(D) == [(0, 0), (1, 1), (1, 2), (2, 2)]


def test_dtw_compare_with_path(spark):
    t = _series(spark, [0.0, 3.0, 1.0])
    m = _series(spark, [1.0, 2.0, 2.0])
    r = dtw_compare(t, m, with_path=True).collect()[0]
    assert r["path_len"] == 4
    assert r["max_path_error"] == 1.0
    assert r["avg_path_error"] == pytest.approx(1.0)
    assert r["std_path_error"] == pytest.approx(0.0)

"""Evaluation metrics: truth-vs-model comparison and classification scores.

Re-expresses the reference's evaluation harness as grouped aggregations:

* **A9 — error metrics** (``/root/reference/src/15compare_lane_stats.py:87-128``):
  per key MAE, RMSE, MAPE (non-zero truth only), baseline = median(truth),
  RSS = 1 − MAE/MAE_baseline.
* **A10 — directional accuracy** (``:131-146``): sign-match rate of first
  differences of truth vs model.
* **A11 — classification P/R/F1** (``23stateFscore.py:431-525``): per-class
  precision/recall/F1/support from a confusion matrix, plus macro and
  weighted averages.

The reference inner-joins truth and model CSVs per node then loops; here one
join + one grouped aggregation covers all keys (J3 + A9/A10 in a single
shuffle; the lag-diff needs a window over the same partitioning, reusing the
sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compare_series(
    truth: DataFrame,
    model: DataFrame,
    key: str = "conv_id",
    time_col: str = "bucket_ts",
    value_col: str = "token_rate",
) -> DataFrame:
    """Per-key error metrics between aligned series (A9 + A10)."""
    t = truth.select(key, time_col, F.col(value_col).alias("t"))
    m = model.select(key, time_col, F.col(value_col).alias("m"))
    j = t.join(m, [key, time_col], "inner")

    w = Window.partitionBy(key).orderBy(time_col)
    j = (
        j.withColumn("dt", F.col("t") - F.lag("t").over(w))
        .withColumn("dm", F.col("m") - F.lag("m").over(w))
        .withColumn("err", F.col("m") - F.col("t"))
    )
    agg = j.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg(F.abs("err")), 6).alias("mae"),
        F.round(F.sqrt(F.avg(F.pow("err", 2))), 6).alias("rmse"),
        F.round(
            F.avg(F.when(F.col("t") != 0, F.abs(F.col("err") / F.col("t")))), 6
        ).alias("mape"),
        F.expr("percentile(t, 0.5)").alias("t_median"),
        F.round(
            F.avg(
                F.when(
                    F.col("dt").isNotNull() & F.col("dm").isNotNull(),
                    (F.signum("dt") == F.signum("dm")).cast("int"),
                )
            ),
            6,
        ).alias("da"),
    )
    # RSS = 1 - MAE / MAE_baseline, baseline predicts median(truth)
    base = j.groupBy(key).agg(F.expr("percentile(t, 0.5)").alias("med"))
    mae_base = (
        j.join(base, key)
        .groupBy(key)
        .agg(F.avg(F.abs(F.col("t") - F.col("med"))).alias("mae_baseline"))
    )
    return (
        agg.join(mae_base, key)
        .withColumn(
            "rss",
            F.round(
                F.when(
                    F.col("mae_baseline") > 0, 1 - F.col("mae") / F.col("mae_baseline")
                ),
                6,
            ),
        )
        .drop("t_median")
    )


def classification_report(
    pred: DataFrame, gt_col: str = "gt", pred_col: str = "pred"
) -> tuple[DataFrame, DataFrame]:
    """Per-class and aggregate P/R/F1 (A11) from label pairs.

    Returns (per_class, summary). All ratios are single divisions of exact
    counts → deterministic across engines.
    """
    conf = pred.groupBy(gt_col, pred_col).agg(F.count(F.lit(1)).alias("n"))
    labels = (
        conf.select(F.col(gt_col).alias("label"))
        .union(conf.select(F.col(pred_col).alias("label")))
        .distinct()
    )
    tp = conf.where(F.col(gt_col) == F.col(pred_col)).select(
        F.col(gt_col).alias("label"), F.col("n").alias("tp")
    )
    gt_n = conf.groupBy(F.col(gt_col).alias("label")).agg(F.sum("n").alias("support"))
    pred_n = conf.groupBy(F.col(pred_col).alias("label")).agg(F.sum("n").alias("predicted"))
    per = (
        labels.join(tp, "label", "left")
        .join(gt_n, "label", "left")
        .join(pred_n, "label", "left")
        .fillna(0, ["tp", "support", "predicted"])
        .withColumn(
            "precision",
            F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted")).otherwise(0.0),
        )
        .withColumn(
            "recall",
            F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
    summary = per.agg(
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("weighted_f1"),
        (F.sum("tp") / F.sum("support")).alias("accuracy"),
    )
    return per, summary


def match_events(
    gt_events: DataFrame,
    pred_events: DataFrame,
    key: str = "conv_id",
    time_col: str = "bucket_ts",
    type_col: str = "event_type",
    max_delay: int = 30,
) -> DataFrame:
    """Event matching with greedy nearest-match + reassignment (W13/A12,
    ``23stateFscore.py:229-309``): per (key, type), each predicted event
    matches the closest ground-truth event within ±max_delay steps; a closer
    later prediction steals an earlier match. Unmatched gt → FN, unmatched
    pred → FP; matched pairs report signed delay.

    Per-(key, type) event counts are tiny (they are transitions, not rows),
    so the quadratic greedy runs in a grouped pandas kernel like the
    reference — but across all keys at once.

    Delay distribution (23stateFscore.py:345-361): signed delay = pred − gt
    per matched pair; reports mean/median of |delay|, mean/median/std of the
    signed delay. std is the POPULATION std (np.std semantics) computed via
    the exact integer identity sqrt(n·Σx² − (Σx)²)/n — algebraically equal
    to np.std but exactly reproducible (delays are integer seconds), so the
    SQL oracle matches bit-for-bit. Empty matches report null, not 0 (the
    engine's load-bearing-null convention; the reference reports 0.0).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    g = gt_events.select(key, type_col, F.col(time_col).alias("gt_ts")).withColumn(
        "__side", F.lit("gt")
    )
    p = pred_events.select(key, type_col, F.col(time_col).alias("gt_ts")).withColumn(
        "__side", F.lit("pred")
    )
    both = g.unionByName(p)

    schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(type_col, T.StringType()),
            T.StructField("tp", T.IntegerType()),
            T.StructField("fn", T.IntegerType()),
            T.StructField("fp", T.IntegerType()),
            T.StructField("mean_abs_delay", T.DoubleType()),
            T.StructField("median_abs_delay", T.DoubleType()),
            T.StructField("mean_delay", T.DoubleType()),
            T.StructField("median_delay", T.DoubleType()),
            T.StructField("std_delay", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (k, t), grp in pdf.groupby([key, type_col], sort=False):
            def secs(side):
                s = pd.to_datetime(grp.loc[grp.__side == side, "gt_ts"])
                # unit-explicit: Arrow may hand us datetime64[us] or [ns]
                return sorted(s.astype("datetime64[us]").astype("int64") // 10**6)

            gt_ts = secs("gt")
            pr_ts = secs("pred")
            match: dict[int, int] = {}  # gt index -> pred index
            dist: dict[int, float] = {}
            for pi, pt in enumerate(pr_ts):
                best, bestd = None, None
                for gi, gtt in enumerate(gt_ts):
                    d = abs(pt - gtt)
                    if d <= max_delay and (bestd is None or d < bestd):
                        if gi in match and dist[gi] <= d:
                            continue  # existing match is closer; can't steal
                        best, bestd = gi, d
                if best is not None:
                    match[best] = pi
                    dist[best] = bestd
            tp = len(match)
            sdel = [pr_ts[pi] - gt_ts[gi] for gi, pi in match.items()]
            delays = [abs(d) for d in sdel]
            if sdel:
                var_num = tp * sum(d * d for d in sdel) - sum(sdel) ** 2
                stats = {
                    "mean_abs_delay": sum(delays) / tp,
                    "median_abs_delay": float(np.median(delays)),
                    "mean_delay": sum(sdel) / tp,
                    "median_delay": float(np.median(sdel)),
                    "std_delay": math.sqrt(var_num) / tp,
                }
            else:
                stats = dict.fromkeys(
                    ["mean_abs_delay", "median_abs_delay", "mean_delay",
                     "median_delay", "std_delay"]
                )
            out.append(
                {
                    key: k,
                    type_col: t,
                    "tp": tp,
                    "fn": len(gt_ts) - tp,
                    "fp": len(pr_ts) - tp,
                    **stats,
                }
            )
        return pd.DataFrame(out, columns=[f.name for f in schema.fields])

    keyed = both.withColumn("__g", F.pmod(F.xxhash64(key), F.lit(64)).cast("int"))
    return keyed.groupBy("__g").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns="__g")), schema
    )

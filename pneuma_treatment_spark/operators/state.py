"""Discrete state estimation from rollup series + transition events.

Re-expresses the reference's traffic-state classifier over token-rate series:

* **W11 — future-window slope voting**
  (``/root/reference/src/22stateEstimate.py:68-154`` classify_state_by_voting,
  ``estimate_states :173-227``): value below ``low`` → QUEUED, above ``high``
  (or null — ``:97-99``) → FREE_FLOW; mid-band: the slopes of the next
  ``vote_window`` values vote FORMING (< -slope_thr) / DISSIPATING
  (> slope_thr) / SATURATED, majority wins with FORMING > DISSIPATING >
  SATURATED priority on ties.
* **W12 — transition events** (``23stateFscore.py:47-66,178-227``): states
  map to 3 simplified classes; an event row is emitted at each change
  (… → CONGESTED ⇒ TO_CONGESTION, QUEUED → … ⇒ TO_FREE_FLOW).

Everything is window + array expressions — JVM-side, one shuffle per
partitioning, no Python (the reference slices a pandas frame per output row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FREE_FLOW, FORMING, SATURATED, DISSIPATING, QUEUED = 0, 1, 2, 3, 4
STATE_NAMES = {0: "FREE_FLOW", 1: "FORMING", 2: "SATURATED", 3: "DISSIPATING", 4: "QUEUED"}


def estimate_states(
    df: DataFrame,
    key: str = "conv_id",
    time_col: str = "bucket_ts",
    value_col: str = "token_rate",
    low: float = 0.5,
    high: float = 5.0,
    vote_window: int = 5,
    slope_thr: float = 0.05,
) -> DataFrame:
    """Add a ``state`` int column per row (W11)."""
    w = Window.partitionBy(key).orderBy(time_col)
    v = F.col(value_col)
    futures = F.array(*[F.lead(value_col, i).over(w) for i in range(vote_window + 1)])
    # consecutive slopes over the future window, nulls dropped
    pairs = F.filter(
        F.zip_with(
            F.slice(futures, 1, vote_window),
            F.slice(futures, 2, vote_window),
            lambda a, b: b - a,
        ),
        lambda s: s.isNotNull(),
    )
    n_down = F.size(F.filter(pairs, lambda s: s < -slope_thr))
    n_up = F.size(F.filter(pairs, lambda s: s > slope_thr))
    n_flat = F.size(pairs) - n_down - n_up
    mid_state = (
        # majority with FORMING > DISSIPATING > SATURATED tie priority
        F.when((n_down >= n_up) & (n_down >= n_flat), F.lit(FORMING))
        .when(n_up >= n_flat, F.lit(DISSIPATING))
        .otherwise(F.lit(SATURATED))
    )
    state = (
        F.when(v.isNull(), F.lit(FREE_FLOW))  # NaN → FREE_FLOW (22stateEstimate.py:97-99)
        .when(v < low, F.lit(QUEUED))
        .when(v > high, F.lit(FREE_FLOW))
        .otherwise(mid_state)
    )
    return df.withColumn("state", state)


def thresholds_kmeans(
    df: DataFrame,
    value_col: str = "token_rate",
    k: int = 3,
    seed: int = 42,
    max_iter: int = 40,
) -> tuple[list[float], list[float]]:
    """A14 — the reference's actual k-means-derived state thresholds
    (``/root/reference/test_clustering.py:40-51``, ``聚类功能说明.md``):
    1-D k-means over the value column, thresholds = midpoints of adjacent
    SORTED cluster centers. With ``k=3`` the returned thresholds are
    ``[low, high]``, directly usable by :func:`estimate_states`.

    Distributed: ``pyspark.ml.clustering.KMeans`` (seeded k-means||) over a
    single-component vector column — no collect, scales to any table size.
    Seeded runs are reproducible on a fixed cluster layout, but k-means
    iteration order is not bit-stable across partitionings, so the
    deterministic quantile path (``quantile_bins`` / the fixed low/high
    defaults) remains the oracle-facing surface; this is the opt-in
    semantic twin of the reference's sklearn call.

    Returns ``(centers_sorted, thresholds)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(value_col).cast("double")
    # NaN passes isNotNull and would silently poison the centers/thresholds
    feats = df.where(v.isNotNull() & ~F.isnan(v)).select(
        array_to_vector(F.array(v)).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    centers = sorted(float(c[0]) for c in model.clusterCenters())
    thresholds = [(a + b) / 2 for a, b in zip(centers, centers[1:])]
    return centers, thresholds


def simplified(state: Column) -> Column:
    """6→3 class map (23stateFscore.py:47-66): FREE, CONGESTED, QUEUED."""
    return (
        F.when(state == FREE_FLOW, F.lit("FREE"))
        .when(state == QUEUED, F.lit("QUEUED"))
        .otherwise(F.lit("CONGESTED"))
    )


def transition_events(
    df: DataFrame, key: str = "conv_id", time_col: str = "bucket_ts"
) -> DataFrame:
    """Emit one row per state transition (W12). Event types follow
    23stateFscore.py:178-227: entering CONGESTED/QUEUED from FREE (or
    CONGESTED→QUEUED) ⇒ TO_CONGESTION; leaving QUEUED ⇒ TO_FREE_FLOW."""
    w = Window.partitionBy(key).orderBy(time_col)
    d = df.withColumn("simple", simplified(F.col("state"))).withColumn(
        "prev_simple", F.lag("simple").over(w)
    )
    changed = d.where(F.col("prev_simple").isNotNull() & (F.col("prev_simple") != F.col("simple")))
    event = (
        F.when(
            (F.col("prev_simple") == "FREE") & F.col("simple").isin("CONGESTED", "QUEUED"),
            F.lit("TO_CONGESTION"),
        )
        .when(
            (F.col("prev_simple") == "CONGESTED") & (F.col("simple") == "QUEUED"),
            F.lit("TO_CONGESTION"),
        )
        .when(F.col("prev_simple") == "QUEUED", F.lit("TO_FREE_FLOW"))
        .otherwise(F.lit("OTHER"))
    )
    return changed.select(
        key, time_col, F.col("prev_simple"), F.col("simple"), event.alias("event_type")
    )


def sign_change_burst(
    df: DataFrame,
    key: str = "conv_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts",),
    threshold: int = 25,
) -> DataFrame:
    """W6 zero-crossing burst detector (``processor.py:75-85``
    check_sign_change): a key is bursty when two consecutive sign toggles of
    its series are fewer than ``threshold`` steps apart.

    ``np.where(np.diff(np.sign(x)))`` marks the 0-based index of the element
    BEFORE each sign change; the minimum difference of consecutive toggle
    indices is compared to the threshold. Keys with fewer than two toggles
    report false (the reference raises on np.min of an empty diff; we null
    min_toggle_gap instead — load-bearing nulls).
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    sgn = F.signum(F.col(value_col))
    d = df.select(
        key,
        (F.row_number().over(w) - 1).alias("__rn"),
        sgn.alias("__s"),
        F.lag(sgn).over(w).alias("__ps"),
    )
    tog = d.where(F.col("__ps").isNotNull() & (F.col("__s") != F.col("__ps"))).select(
        key, (F.col("__rn") - 1).alias("__idx")
    )
    wg = Window.partitionBy(key).orderBy("__idx")
    gaps = tog.withColumn("__gap", F.col("__idx") - F.lag("__idx").over(wg))
    per_key = gaps.groupBy(key).agg(
        (F.count(F.lit(1))).alias("n_toggles"),
        F.min("__gap").alias("min_toggle_gap"),
    )
    all_keys = df.select(key).distinct()
    out = all_keys.join(per_key, key, "left")
    return out.select(
        key,
        F.coalesce(F.col("n_toggles"), F.lit(0)).cast("long").alias("n_toggles"),
        F.col("min_toggle_gap").cast("long").alias("min_toggle_gap"),
        F.coalesce(F.col("min_toggle_gap") < threshold, F.lit(False)).alias("is_bursty"),
    )

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

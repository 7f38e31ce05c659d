"""Dense-grid expansion + forward-fill + linear interpolation.

Reproduces, entirely with JVM-side window functions (no Python in the hot
path):

* **dense grid expansion** — the reference emits every (t, node) cell of the
  full time x node grid (``/root/reference/src/12nodemask2timemask.py:77-116``,
  driver-memory dict there; here ``sequence()``+``explode`` distributed);
* **gap interpolation** — ``Series.interpolate(method='linear',
  limit_direction='both')`` (``/root/reference/src/22stateEstimate.py:54-66``,
  same in ``23stateFscore.py:68-72``): interior gaps lerp between nearest
  non-null neighbors; leading/trailing gaps take the nearest value.

Scale notes: the grid explode multiplies rows by the gap fraction only
(``sequence(min..max)`` per key — no cross join with a global time axis);
fills use two window passes per column (forward `last ignorenulls`, backward
`first ignorenulls`) over (key, idx)-sorted partitions — one shuffle total,
shared by all filled columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FILLED_FLAG = "is_filled"


def densify(df: DataFrame, key: str = "conv_id", idx: str = "turn_idx") -> DataFrame:
    """Emit one row per (key, idx) for every idx in [min(idx), max(idx)] of
    that key; original columns are null on inserted rows; adds ``is_filled``.
    """
    grid = (
        df.groupBy(key)
        .agg(F.min(idx).alias("__lo"), F.max(idx).alias("__hi"))
        .select(key, F.explode(F.sequence("__lo", "__hi")).alias(idx))
    )
    out = grid.join(df.withColumn("__orig", F.lit(1)), [key, idx], "left")
    return out.withColumn(_FILLED_FLAG, F.col("__orig").isNull()).drop("__orig")


def gap_fill(
    df: DataFrame,
    key: str = "conv_id",
    idx: str = "turn_idx",
    ffill_cols: tuple[str, ...] = ("role",),
    lerp_cols: tuple[str, ...] = (),
    lerp_ts_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Densify then fill.

    * ``ffill_cols``: forward-fill (last observed value), bfill at the head —
      the ``limit_direction='both'`` edge rule.
    * ``lerp_cols``: numeric linear interpolation on the ``idx`` axis.
    * ``lerp_ts_cols``: timestamps lerped via epoch-microseconds.
    """
    dense = densify(df, key, idx)
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(idx)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(key)
        .orderBy(idx)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    out = dense
    for c in ffill_cols:
        out = out.withColumn(
            c,
            F.coalesce(
                F.last(c, ignorenulls=True).over(w_fwd),
                F.first(c, ignorenulls=True).over(w_bwd),
            ),
        )

    def lerp(out: DataFrame, c: str, as_ts: bool) -> DataFrame:
        src = F.unix_micros(F.col(c).cast("timestamp")) if as_ts else F.col(c).cast("double")
        out = out.withColumn("__v", src)
        prev_v = F.last("__v", ignorenulls=True).over(w_fwd)
        prev_i = F.last(F.when(F.col("__v").isNotNull(), F.col(idx)), ignorenulls=True).over(w_fwd)
        next_v = F.first("__v", ignorenulls=True).over(w_bwd)
        next_i = F.first(F.when(F.col("__v").isNotNull(), F.col(idx)), ignorenulls=True).over(w_bwd)
        frac = (F.col(idx) - prev_i).cast("double") / (next_i - prev_i).cast("double")
        filled = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
            F.when(prev_v.isNull(), next_v)
            .when(next_v.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        if as_ts:
            return out.withColumn(
                c, F.timestamp_micros(F.floor(filled + F.lit(0.5)).cast("long"))
            ).drop("__v")
        return out.withColumn(c, filled).drop("__v")

    for c in lerp_cols:
        out = lerp(out, c, as_ts=False)
    for c in lerp_ts_cols:
        out = lerp(out, c, as_ts=True)
    return out

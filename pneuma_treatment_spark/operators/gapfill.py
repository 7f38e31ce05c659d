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

    Join-free: each row explodes its own index span up to (exclusive) the
    next row's index — the grid materializes inside the SAME key-partitioned
    window pass the fills use, so the whole gap-fill costs ONE exchange
    (the previous grid-groupBy + left-join formulation cost three).
    ``greatest`` guards duplicate (key, idx) rows: Spark's ``sequence(a, b)``
    runs DESCENDING when a > b, which would silently re-emit the span."""
    w = Window.partitionBy(key).orderBy(idx)
    nxt = F.lead(idx).over(w)
    span = F.sequence(
        F.col(idx), F.coalesce(F.greatest(nxt - 1, F.col(idx)), F.col(idx))
    )
    other_cols = [c for c in df.columns if c not in (key, idx)]
    # the span (a window expression) must be projected before the Generate
    ex = (
        df.withColumn("__span", span)
        .withColumn("__emit", F.explode("__span"))
        .drop("__span")
    )
    orig = F.col("__emit") == F.col(idx)
    return ex.select(
        key,
        F.col("__emit").alias(idx),
        *[F.when(orig, F.col(c)).alias(c) for c in other_cols],
        (~orig).alias(_FILLED_FLAG),
    )


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
    # Execution shape: exactly TWO Window blocks — every forward expression
    # in one projection (ascending running frame), every backward one in a
    # second (DESCENDING running frame) — so the whole fill costs one
    # shuffle + two sorts regardless of how many columns are filled.
    # Running frames evaluate incrementally (O(n) per partition); a
    # (current → unboundedFollowing) frame is re-aggregated from scratch per
    # row — O(n²), which a single mega-conversation turns into minutes.
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col(idx).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(key)
        .orderBy(F.col(idx).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def src(c: str, as_ts: bool):
        return F.unix_micros(F.col(c).cast("timestamp")) if as_ts else F.col(c).cast("double")

    lerps = [(c, False) for c in lerp_cols] + [(c, True) for c in lerp_ts_cols]

    fwd_exprs = [F.last(c, ignorenulls=True).over(w_fwd).alias(f"__f_{c}") for c in ffill_cols]
    bwd_exprs = [F.last(c, ignorenulls=True).over(w_bwd).alias(f"__b_{c}") for c in ffill_cols]
    for c, as_ts in lerps:
        nn_idx = F.when(src(c, as_ts).isNotNull(), F.col(idx))
        fwd_exprs += [
            F.last(src(c, as_ts), ignorenulls=True).over(w_fwd).alias(f"__pv_{c}"),
            F.last(nn_idx, ignorenulls=True).over(w_fwd).alias(f"__pi_{c}"),
        ]
        bwd_exprs += [
            F.last(src(c, as_ts), ignorenulls=True).over(w_bwd).alias(f"__nv_{c}"),
            F.last(nn_idx, ignorenulls=True).over(w_bwd).alias(f"__ni_{c}"),
        ]

    out = dense.select("*", *fwd_exprs).select("*", *bwd_exprs)

    temps: list[str] = []
    for c in ffill_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__f_{c}"), F.col(f"__b_{c}")))
        temps += [f"__f_{c}", f"__b_{c}"]
    for c, as_ts in lerps:
        v = src(c, as_ts)
        pv, pi = F.col(f"__pv_{c}"), F.col(f"__pi_{c}")
        nv, ni = F.col(f"__nv_{c}"), F.col(f"__ni_{c}")
        frac = (F.col(idx) - pi).cast("double") / (ni - pi).cast("double")
        filled = F.when(v.isNotNull(), v).otherwise(
            F.when(pv.isNull(), nv).when(nv.isNull(), pv).otherwise(pv + (nv - pv) * frac)
        )
        if as_ts:
            filled = F.timestamp_micros(F.floor(filled + F.lit(0.5)).cast("long"))
        out = out.withColumn(c, filled)
        temps += [f"__pv_{c}", f"__pi_{c}", f"__nv_{c}", f"__ni_{c}"]
    return out.drop(*temps)

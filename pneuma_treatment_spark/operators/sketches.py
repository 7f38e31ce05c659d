"""Approximate sketches: the 100 TB twins of the exact aggregates.

The exact forms the oracle gates (`percentile`, `countDistinct`) are full
sorts / full shuffles of the value stream at scale; these wrappers expose
Spark's mergeable sketch aggregates — bounded-memory partials that combine
map-side, exactly like the integer rollup partials the tier cascade uses:

* ``approx_quantiles`` → `percentile_approx` (KLL-ish rank sketch,
  accuracy set by ``relative_error``);
* ``approx_distinct`` → `approx_count_distinct` (HyperLogLog++, accuracy
  set by ``rsd``).

No driver query: sketches are nondeterministic across partitionings only in
their ERROR term, but the hash gate requires bit-equality, so the exact
variants stay the oracle surface (per_type_stats, count_distinct_1m) and
these carry pytest tolerance gates instead (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5,),
    group_cols: tuple[str, ...] = (),
    relative_error: float = 0.001,
) -> DataFrame:
    """Grouped approximate quantiles with bounded-memory partials."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    agg = F.percentile_approx(
        F.col(value_col), probs, F.lit(int(1.0 / relative_error))
    ).alias("quantiles")
    g = df.groupBy(*[F.col(c) for c in group_cols]) if group_cols else df.groupBy()
    return g.agg(agg)


def approx_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    rsd: float = 0.01,
) -> DataFrame:
    """Grouped HyperLogLog++ distinct counts (mergeable, ~1.5 kB state at
    rsd=0.01 vs a full distinct shuffle)."""
    agg = F.approx_count_distinct(F.col(value_col), rsd).alias("approx_distinct")
    g = df.groupBy(*[F.col(c) for c in group_cols]) if group_cols else df.groupBy()
    return g.agg(agg)


def quantile_bins(value: Column, splits: list[float]) -> Column:
    """Static binning by precomputed split points (the two-pass pattern:
    sketch the splits once, then bin the stream with a pure expression).
    NULL values stay NULL — a masked cell must never read as a top-bin
    observation (nulls are load-bearing engine-wide)."""
    expr = F.lit(len(splits))
    for i in range(len(splits) - 1, -1, -1):
        expr = F.when(value <= F.lit(float(splits[i])), F.lit(i)).otherwise(expr)
    return F.when(value.isNotNull(), expr)

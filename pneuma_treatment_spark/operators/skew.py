"""Salted two-phase aggregation for skewed keys (mega-conversations).

The reference processes one series at a time in a Python loop
(``/root/reference/src/processor.py:311-314``), so skew is invisible to it.
At 10^12 turns a single mega-conversation lands its entire history on one
reducer. Fix (explicit in BASELINE.json:north_rule): append a salt to the
group key, partially aggregate on (key, salt) — map-side combine already
shrinks each partition — then aggregate the ≤``salt_buckets`` partials per
key. Both phases are algebraic sums/counts, so the result is exact.

AQE's skew-join splitting does NOT cover groupBy skew; this does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str | Column],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase groupBy.

    ``aggs`` maps output column name -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the algebraic set — exactly mergeable).

    >>> salted_agg(df, ['conv_id'], {'n': ('*', 'count'), 's': ('tokens', 'sum')})
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    named = [c.alias(f"__k{i}") for i, c in enumerate(key_cols)]
    knames = [f"__k{i}" for i in range(len(key_cols))]

    salted = df.select(
        *named,
        *[F.col(c) for c in {c for c, _ in aggs.values() if c != "*"}],
        (F.spark_partition_id() % salt_buckets).alias("__salt"),
    )

    def phase1(name: str, col: str, fn: str) -> Column:
        if fn == "count":
            return F.count(F.lit(1) if col == "*" else F.col(col)).alias(name)
        return getattr(F, fn)(F.col(col)).alias(name)

    partial = salted.groupBy(*knames, "__salt").agg(
        *[phase1(n, c, fn) for n, (c, fn) in aggs.items()]
    )

    def phase2(name: str, fn: str) -> Column:
        merge = "sum" if fn == "count" else fn  # counts merge by summing
        return getattr(F, merge)(F.col(name)).alias(name)

    final = partial.groupBy(*knames).agg(
        *[phase2(n, fn) for n, (_, fn) in aggs.items()]
    )
    renames = dict(zip(knames, [_key_name(k) for k in keys]))
    for old, new in renames.items():
        final = final.withColumnRenamed(old, new)
    return final


def _key_name(k: str | Column) -> str:
    if isinstance(k, str):
        return k
    # Column: use its planned name (e.g. an .alias() the caller set)
    return k._jc.toString().split(" AS ")[-1].strip("`")

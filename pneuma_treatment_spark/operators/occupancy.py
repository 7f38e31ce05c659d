"""A3 graph-aware occupancy with neighbor spill.

The reference's signature two-level aggregate
(``/root/reference/src/09lane_node.py:184-254``) attributes 3/4 of each
vehicle's length to the node it occupies and 1/4 to the NEXT node on its
trajectory — but only when that next node is a ``direct`` graph neighbor of
the current one; the spill is summed into the neighbor's occupancy.

Transcript analog: each event contributes 3/4 of its weight to its own
(event_type, minute) cell and spills 1/4 into its user's next-different
event_type, gated by a (src → dst) edge dim. Spark shape:

* next node = the J7 as-of island pattern (one window pass, no per-row
  rescan like the reference's ``get_next_node_for_vehicle``);
* the edge gate is a tiny broadcast dim (J8);
* both attribution legs are plain groupBy sums that meet in one
  full-outer join — integer weights, so the result is exact
  (``occ_quarters`` = 4× the occupancy mass; divide once for the rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_prev_next(
    df: DataFrame,
    key: str,
    node_col: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Rows + ``__prev`` (lag of node) + ``next_node`` (next DIFFERENT node
    value) in ONE window exchange, join-free.

    ``next_node`` is the island-start marker (the node value of rows where
    the value changes) picked up by a descending-sort RUNNING frame that
    excludes the current row — the first change strictly after each row.
    Both frames are incremental (O(n) per partition; the sharp-edge
    alternative ``currentRow → unboundedFollowing`` re-aggregates per row).
    Replaces the former islands formulation (running-sum island id →
    groupBy island → lead → join back), which cost an aggregate plus a
    row-count join on top of the same exchange."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(node_col).over(w)
    w_desc = (
        Window.partitionBy(key)
        .orderBy(*[F.desc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marker = F.when(prev.isNull() | (prev != F.col(node_col)), F.col(node_col))
    return (
        df.withColumn("__prev", prev)
        .withColumn("__m", marker)
        .withColumn("next_node", F.last("__m", ignorenulls=True).over(w_desc))
        .drop("__m")
    )


def with_next_node(
    df: DataFrame,
    key: str = "user_id",
    node_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Add ``next_node``: the next DIFFERENT node value in the key's ordered
    stream (J7 islands — 09lane_node.py:113-145 without the O(T) rescan)."""
    return _with_prev_next(df, key, node_col, order_cols).drop("__prev")


def occupancy_spill(
    df: DataFrame,
    edges: DataFrame,
    key: str = "user_id",
    node_col: str = "event_type",
    weight_col: str = "cents",
    epoch_col: str = "epoch_s",
    bucket_sec: int = 60,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per (node, bucket) occupancy with 3/4-own + 1/4-next-neighbor split
    (09lane_node.py:208-249). ``edges``: (src, dst) direct-connection dim —
    broadcast. Returns exact integer ``occ_quarters`` (= 3·own + 1·spill)
    plus the float ``occupancy`` rate in weight units / 4."""
    bucket = F.timestamp_seconds(
        F.col(epoch_col) - F.col(epoch_col) % bucket_sec
    ).alias("bucket_ts")
    own = (
        df.groupBy(F.col(node_col).alias("node"), bucket)
        .agg(F.sum(weight_col).alias("own_w"))
    )
    nn = with_next_node(df, key, node_col, order_cols)
    e = edges.select(F.col("src").alias("__src"), F.col("dst").alias("__dst"))
    spill = (
        nn.join(
            F.broadcast(e),
            (F.col(node_col) == F.col("__src")) & (F.col("next_node") == F.col("__dst")),
        )
        .groupBy(F.col("next_node").alias("node"), bucket)
        .agg(F.sum(weight_col).alias("spill_w"))
    )
    out = own.join(spill, ["node", "bucket_ts"], "full_outer")
    quarters = 3 * F.coalesce(F.col("own_w"), F.lit(0)) + F.coalesce(
        F.col("spill_w"), F.lit(0)
    )
    return out.select(
        "node",
        "bucket_ts",
        quarters.alias("occ_quarters"),
        (quarters / F.lit(4.0)).alias("occupancy"),
    )


def occupancy_spill_derived(
    df: DataFrame,
    key: str = "user_id",
    node_col: str = "event_type",
    weight_col: str = "cents",
    epoch_col: str = "epoch_s",
    bucket_sec: int = 60,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    min_count: int = 1,
) -> DataFrame:
    """:func:`occupancy_spill` with the edge dim derived from observed
    transitions (≡ ``occupancy_spill(df, transition_edges(df, min_count))``
    — pinned by tests/test_occupancy.py), fused onto ONE island pass.

    ``transition_edges`` counts the rows where the node value changes;
    ``__prev`` from the shared single-exchange pass gives exactly those
    rows, so the edge dim comes from the SAME window pass that computes
    ``next_node`` — one window exchange over the events instead of two."""
    bucket = F.timestamp_seconds(
        F.col(epoch_col) - F.col(epoch_col) % bucket_sec
    ).alias("bucket_ts")
    own = (
        df.groupBy(F.col(node_col).alias("node"), bucket)
        .agg(F.sum(weight_col).alias("own_w"))
    )
    nn = _with_prev_next(df, key, node_col, order_cols)
    edges = (
        nn.where(F.col("__prev").isNotNull() & (F.col("__prev") != F.col(node_col)))
        .groupBy(F.col("__prev").alias("__src"), F.col(node_col).alias("__dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select("__src", "__dst")
    )
    spill = (
        nn.join(
            F.broadcast(edges),
            (F.col(node_col) == F.col("__src")) & (F.col("next_node") == F.col("__dst")),
        )
        .groupBy(F.col("next_node").alias("node"), bucket)
        .agg(F.sum(weight_col).alias("spill_w"))
    )
    out = own.join(spill, ["node", "bucket_ts"], "full_outer")
    quarters = 3 * F.coalesce(F.col("own_w"), F.lit(0)) + F.coalesce(
        F.col("spill_w"), F.lit(0)
    )
    return out.select(
        "node",
        "bucket_ts",
        quarters.alias("occ_quarters"),
        (quarters / F.lit(4.0)).alias("occupancy"),
    )


def transition_edges(
    df: DataFrame,
    key: str = "user_id",
    node_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    min_count: int = 1,
) -> DataFrame:
    """Derive the direct-connection dim from observed transitions (the
    engine has no shapefile graph; the reference's node_dict['direct'] is
    replaced by transitions seen at least ``min_count`` times — A5 feeding
    J8)."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(node_col).over(w)
    return (
        df.withColumn("__prev", prev)
        .where(F.col("__prev").isNotNull() & (F.col("__prev") != F.col(node_col)))
        .groupBy(F.col("__prev").alias("src"), F.col(node_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select("src", "dst")
    )


def compare_keyed_sets(
    a: DataFrame,
    b: DataFrame,
    key: str = "src",
    member_col: str = "dst",
) -> DataFrame:
    """J9 graph-compare anti-join (08audo_compare_graph.py:20-60): keys whose
    NORMALIZED member sets (sorted, order-insensitive) differ between two
    graph snapshots — including keys present on only one side. The sets are
    compared as comma-joined sorted strings so the result is flat/scalar
    (driver-friendly) and the comparison is one full-outer join."""

    def norm(df: DataFrame, alias: str) -> DataFrame:
        # U+001F (unit separator) — a comma-joined form would collide for
        # members that themselves contain commas ({'x,y'} vs {'x','y'})
        return df.groupBy(key).agg(
            F.concat_ws("\x1f", F.sort_array(F.collect_set(member_col))).alias(alias)
        )

    j = norm(a, "set_a").join(norm(b, "set_b"), key, "full_outer")
    status = (
        F.when(F.col("set_a").isNull(), "only_right")
        .when(F.col("set_b").isNull(), "only_left")
        .otherwise("different")
    )
    differs = (
        F.col("set_a").isNull()
        | F.col("set_b").isNull()
        | (F.col("set_a") != F.col("set_b"))
    )
    return j.where(differs).select(key, status.alias("status"), "set_a", "set_b")

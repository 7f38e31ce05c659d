"""Per-series treatment: SG smooth → rolling-median reconstruction →
tolerance anomaly mask → run merge → replace → Gaussian smooth → derivative.

Faithful re-expression of the reference's per-vehicle loop
(``/root/reference/src/processor.py:314-465``) over transcript token-count
series, with the one documented substitution (SURVEY.md §7.1): the
non-deterministic per-vehicle XGBoost reconstruction (``processor.py:112-133``)
is replaced by a centered rolling median, keeping the tolerance-mask,
run-merge and replacement logic (``processor.py:366-399``) semantically
identical.

Execution shape (vs the reference's sequential ``for v_id in ids`` loop):

* **Stage A** (bounded-support kernels: SG window 25, median window 5) —
  Arrow-batched ``applyInPandas`` per conv_id, or **chunked** per
  (conv_id, chunk) with halo rows for mega-conversations whose full series
  must not land on one executor. Halo ≥ kernel radius ⇒ chunked == unchunked
  bit-for-bit.
* **Stage B** (anomaly run merge, ``processor.py:390-399``) — global per
  conv, but expressible as two window passes in SQL (JVM-side), so it needs
  no Python and no whole-series materialization.
* **Stage C** (replace) — a ``when()`` column expression.
* **Stage D** (Gaussian sigma-12 smooth + gradient, ``processor.py:401-448``
  incl. the no-anomaly passthrough branch) — second pandas stage, chunkable
  with halo ≥ the Gaussian truncation radius (49).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pneuma_treatment_spark import kernels as K


@dataclass(frozen=True)
class TreatmentConfig:
    sg_window: int = 25          # processor.py:324 (window_length=25, polyorder=1)
    med_window: int = 5          # XGBoost-substitute reconstruction support
    tol: float = 6.0             # tolerance mask threshold (processor.py:302: 0.1 on accel)
    merge_gap: int = 10          # merge anomaly runs < 10 apart (processor.py:303)
    gauss_sigma: float = 12.0    # processor.py:91 (gaussian_filter1d sigma=12)
    chunk_len: int = 4096        # chunked-mode segment length (mega-conversations)
    group_buckets: int = 256     # pandas-stage task granularity (see _apply)

    @property
    def halo_a(self) -> int:
        return max(self.sg_window // 2, self.med_window // 2) + 1

    @property
    def halo_d(self) -> int:
        return int(4.0 * self.gauss_sigma + 0.5) + 1


def _group_bounds(pdf: pd.DataFrame, group_cols: tuple[str, ...]) -> np.ndarray:
    """Slice boundaries of consecutive equal-key runs in a pre-sorted frame:
    returns indices [0, b1, ..., len]. Replaces a pandas groupby iteration —
    at millions of ~20-row series the per-group DataFrame construction was
    the dominant treatment cost, not the math."""
    n = len(pdf)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in group_cols:
        v = pdf[c].to_numpy()
        change[1:] |= v[1:] != v[:-1]
    return np.append(np.flatnonzero(change), n)


def _stage_a_kernel(
    pdf: pd.DataFrame, cfg: TreatmentConfig, group_cols: tuple[str, ...]
) -> pd.DataFrame:
    """Whole-bucket stage A: per-series kernels over numpy slices (the
    bucket arrives sorted by (*group_cols, turn_idx))."""
    x = pdf["token_count"].to_numpy(dtype=np.float64)
    n = len(x)
    filled = np.empty(n)
    sg = np.empty(n)
    med = np.empty(n)
    raw = np.empty(n, dtype=bool)
    b = _group_bounds(pdf, group_cols)
    for s, e in zip(b[:-1], b[1:]):
        seg = K.interpolate_linear_both(x[s:e])
        filled[s:e] = seg
        sg[s:e] = K.savgol_poly1(seg, cfg.sg_window)
        m = K.rolling_median(seg, cfg.med_window)
        med[s:e] = m
        raw[s:e] = K.anomaly_mask(seg, m, cfg.tol)
    pdf["tokens_filled"] = filled
    pdf["sg_tokens"] = sg
    pdf["med_tokens"] = med
    pdf["raw_anomaly"] = raw
    return pdf


def _stage_d_kernel(
    pdf: pd.DataFrame, cfg: TreatmentConfig, group_cols: tuple[str, ...]
) -> pd.DataFrame:
    treated = pdf["treated_tokens"].to_numpy(np.float64)
    sg = pdf["sg_tokens"].to_numpy(np.float64)
    has_anom = pdf["conv_has_anomaly"].to_numpy()
    n = len(treated)
    g_ns = np.empty(n)
    g_na = np.empty(n)
    b = _group_bounds(pdf, group_cols)
    for s, e in zip(b[:-1], b[1:]):
        if bool(has_anom[s]):
            # anomalous branch: gaussian-smooth the treated series, derive
            # (processor.py:401-431: new_speed -> g_ns -> g_na)
            seg = K.gaussian1d(treated[s:e], cfg.gauss_sigma)
        else:
            # passthrough branch (processor.py:433-448): keep the SG series
            seg = sg[s:e]
        g_ns[s:e] = seg
        g_na[s:e] = K.gradient(seg, K.DT)
    pdf["g_ns"] = g_ns
    pdf["g_na"] = g_na
    return pdf


def _added(schema: T.StructType, fields: list[tuple[str, T.DataType]]) -> T.StructType:
    out = T.StructType(list(schema.fields))
    for name, dtype in fields:
        out = out.add(name, dtype, True)
    return out


def _apply(df: DataFrame, kernel, added_fields, cfg: TreatmentConfig, halo: int, chunked: bool) -> DataFrame:
    """Run a bounded-support per-series kernel per conv_id, or — in chunked
    mode — per (conv_id, chunk) with ``halo`` overlap rows, keeping each
    row's own-chunk output only.

    Execution granularity: Spark groups carry a fixed Arrow/scheduling
    overhead (~ms each), so grouping BY series (millions of tiny groups at
    scale) wastes most of the time on overhead. Instead we shuffle on a hash
    bucket of the series key (``cfg.group_buckets`` groups — scale it with
    the cluster) and iterate the actual series with a pandas groupby inside
    the task: per-series overhead drops to microseconds, and task memory is
    bounded by bucket size (chunked mode additionally bounds any single
    series unit by chunk_len + 2·halo).

    Chunked mode requires a dense ``turn_idx`` and pre-filled values (run
    :func:`...gapfill.gap_fill` first so in-kernel interpolation is a no-op);
    then halo ≥ kernel radius ⇒ identical to whole-series apply — this is
    what lets a 10^8-turn conversation flow through fixed-memory executors.
    """
    G = cfg.group_buckets

    if not chunked:
        keyed = df.withColumn(
            "__g", F.pmod(F.xxhash64("conv_id"), F.lit(G)).cast("int")
        )
        out_schema = _added(keyed.schema, added_fields)

        def run_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            return kernel(pdf, cfg, ("conv_id",))

        return keyed.groupBy("__g").applyInPandas(run_bucket, out_schema).drop("__g")

    L, H = cfg.chunk_len, halo
    own = F.floor(F.col("turn_idx") / L).cast("long")
    pos = F.col("turn_idx") % L
    chunks = F.array_compact(
        F.array(
            own,
            F.when(pos < H, own - 1),          # serve previous chunk's right halo
            F.when(pos >= L - H, own + 1),     # serve next chunk's left halo
        )
    )
    exploded = (
        df.withColumn("__chunk", F.explode(chunks))
        .where(F.col("__chunk") >= 0)
        .withColumn(
            "__g",
            F.pmod(F.xxhash64("conv_id", "__chunk"), F.lit(G)).cast("int"),
        )
    )
    grouped_schema = _added(exploded.schema, added_fields)

    def run_bucket_chunked(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "__chunk", "turn_idx"]).reset_index(drop=True)
        res = kernel(pdf, cfg, ("conv_id", "__chunk"))
        # keep each row's own-chunk output only (halo rows drop here)
        return res[(res["turn_idx"] // L) == res["__chunk"]]

    res = exploded.groupBy("__g").applyInPandas(run_bucket_chunked, grouped_schema)
    return res.drop("__chunk", "__g")


def treat_transcripts(
    df: DataFrame, cfg: TreatmentConfig | None = None, chunked: bool = False
) -> DataFrame:
    """Full treatment chain. Input: transcripts with ``token_count`` (from
    ``rollup.with_turn_metrics``) and dense ``turn_idx`` (from ``gap_fill``).

    Adds: tokens_filled, sg_tokens, med_tokens, raw_anomaly, is_anomaly,
    treated_tokens, conv_has_anomaly, g_ns (smoothed), g_na (derivative).
    """
    cfg = cfg or TreatmentConfig()

    # Stage A — bounded-support kernels (Arrow-batched pandas).
    a_fields = [
        ("tokens_filled", T.DoubleType()),
        ("sg_tokens", T.DoubleType()),
        ("med_tokens", T.DoubleType()),
        ("raw_anomaly", T.BooleanType()),
    ]
    a = _apply(df, _stage_a_kernel, a_fields, cfg, cfg.halo_a, chunked)

    # Stage B — run merge in SQL (processor.py:390-399): anomalies whose
    # INDEX difference is < merge_gap merge (clean stretch ≤ merge_gap - 2).
    # Backward lookup uses a running frame over a descending sort (the
    # unboundedFollowing frame is O(n²) per partition — see gapfill.py).
    w_fwd = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_bwd = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    anom_idx = F.when(F.col("raw_anomaly"), F.col("turn_idx"))
    b = (
        a.withColumn("__prev", F.last(anom_idx, ignorenulls=True).over(w_fwd))
        .withColumn("__next", F.last(anom_idx, ignorenulls=True).over(w_bwd))
        .withColumn(
            "is_anomaly",
            F.col("raw_anomaly")
            | (
                F.col("__prev").isNotNull()
                & F.col("__next").isNotNull()
                & ((F.col("__next") - F.col("__prev")) < cfg.merge_gap)
            ),
        )
        .drop("__prev", "__next")
    )

    # Stage C — replacement (processor.py:366-371,401-410): anomalous points
    # take the reconstruction, clean points keep the (filled) raw value.
    c = b.withColumn(
        "treated_tokens",
        F.when(F.col("is_anomaly"), F.col("med_tokens")).otherwise(F.col("tokens_filled")),
    ).withColumn(
        "conv_has_anomaly",
        F.max(F.col("is_anomaly").cast("int")).over(Window.partitionBy("conv_id")) > 0,
    )

    # Stage D — final smooth + derivative with per-conv branch.
    d_fields = [("g_ns", T.DoubleType()), ("g_na", T.DoubleType())]
    return _apply(c, _stage_d_kernel, d_fields, cfg, cfg.halo_d, chunked)

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

* **Stages A+B+C** (bounded-support kernels: SG window 25, median window 5,
  run merge radius merge_gap, replacement) — ONE Arrow-batched
  ``applyInPandas`` per conv_id, or **chunked** per (conv_id, chunk) with
  halo rows (halo_a + merge_gap) for mega-conversations whose full series
  must not land on one executor. Halo ≥ total dependency radius ⇒ chunked
  == unchunked bit-for-bit. (The run merge, ``processor.py:390-399``, was
  formerly a separate SQL window stage — two full-frame sorts and a
  conv-partitioned exchange between the pandas stages; it is
  bounded-support, so round 5 fused it into the kernel.)
* **conv_has_anomaly** — the one genuinely conv-global bit (== any
  raw_anomaly). Non-chunked: in-slice any (groups hold whole convs), so
  the WHOLE chain is one pandas stage / one exchange. Chunked: a tiny
  (conv_id, bool) flags side joins in — precomputed by the caller via
  :func:`raw_anomaly_col` + :func:`conv_anomaly_flags` (free when a prior
  stage already runs conv windows), else derived by a slim 3-column pass.
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
from pneuma_treatment_spark.session import pin_bucket_parallelism as _pin_bucket_parallelism


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


def _run_merge_values(raw: np.ndarray, turns: np.ndarray, gap: int) -> np.ndarray:
    """Anomaly run merge on turn-index VALUES: row j becomes anomalous when
    its nearest raw anomalies at-or-before and at-or-after satisfy
    ``next_turn - prev_turn < gap`` — exactly the former SQL window
    formulation (``last(anom_idx) over asc`` / ``over desc``); equals
    :func:`kernels.merge_anomaly_runs` (position-based) on dense turn_idx.
    Bounded support: a row's decision only reads raw flags within ``gap``
    turn values, so chunked execution with halo ≥ gap + mask radius is
    exact."""
    idx = np.flatnonzero(raw)
    out = raw.copy()
    if idx.size < 2:
        return out
    pos = np.arange(len(raw))
    kr = np.searchsorted(idx, pos, side="right")  # count of anomalies ≤ j
    kl = np.searchsorted(idx, pos, side="left")   # idx[kl] = first anomaly ≥ j
    has_prev = kr > 0
    has_next = kl < idx.size
    prev_t = turns[idx[np.maximum(kr - 1, 0)]]
    next_t = turns[idx[np.minimum(kl, idx.size - 1)]]
    out |= has_prev & has_next & ((next_t - prev_t) < gap)
    return out


def _abc_compute(pdf: pd.DataFrame, cfg: TreatmentConfig, bounds: np.ndarray):
    """Shared A+B+C math over precomputed slice bounds: returns
    (filled, sg, med, raw, merged, treated) numpy arrays."""
    x = pdf["token_count"].to_numpy(dtype=np.float64)
    t = pdf["turn_idx"].to_numpy()
    n = len(x)
    filled = np.empty(n)
    sg = np.empty(n)
    med = np.empty(n)
    raw = np.empty(n, dtype=bool)
    merged = np.empty(n, dtype=bool)
    treated = np.empty(n)
    for s, e in zip(bounds[:-1], bounds[1:]):
        seg = K.interpolate_linear_both(x[s:e])
        filled[s:e] = seg
        sg[s:e] = K.savgol_poly1(seg, cfg.sg_window)
        m = K.rolling_median(seg, cfg.med_window)
        med[s:e] = m
        r = K.anomaly_mask(seg, m, cfg.tol)
        raw[s:e] = r
        mr = _run_merge_values(r, t[s:e], cfg.merge_gap)
        merged[s:e] = mr
        treated[s:e] = np.where(mr, m, seg)
    return filled, sg, med, raw, merged, treated


def _stage_abc_kernel(
    pdf: pd.DataFrame, cfg: TreatmentConfig, group_cols: tuple[str, ...]
) -> pd.DataFrame:
    """Whole-bucket stages A+B+C: per-series kernels, anomaly run-merge and
    replacement over numpy slices (the bucket arrives sorted by
    (*group_cols, turn_idx)). The merge is bounded-support (radius
    merge_gap + mask radius), so fusing it here removes the former
    full-frame conv-partitioned window exchange between stages A and D."""
    b = _group_bounds(pdf, group_cols)
    filled, sg, med, raw, merged, treated = _abc_compute(pdf, cfg, b)
    pdf["tokens_filled"] = filled
    pdf["sg_tokens"] = sg
    pdf["med_tokens"] = med
    pdf["raw_anomaly"] = raw
    pdf["is_anomaly"] = merged
    pdf["treated_tokens"] = treated
    return pdf


def _stage_full_kernel(
    pdf: pd.DataFrame, cfg: TreatmentConfig, group_cols: tuple[str, ...]
) -> pd.DataFrame:
    """Whole-series single-pass treatment (non-chunked): stages A+B+C+D in
    one kernel — each group is a complete conversation, so the per-conv
    global ``conv_has_anomaly`` is an in-slice ``any`` and the whole chain
    runs in ONE exchange (was three). One bounds pass and no
    pandas→numpy round-trips between the sub-stages."""
    b = _group_bounds(pdf, group_cols)
    filled, sg, med, raw, merged, treated = _abc_compute(pdf, cfg, b)
    n = len(filled)
    conv_has = np.empty(n, dtype=bool)
    g_ns = np.empty(n)
    g_na = np.empty(n)
    for s, e in zip(b[:-1], b[1:]):
        has = bool(merged[s:e].any())
        conv_has[s:e] = has
        seg = K.gaussian1d(treated[s:e], cfg.gauss_sigma) if has else sg[s:e]
        g_ns[s:e] = seg
        g_na[s:e] = K.gradient(seg, K.DT)
    pdf["tokens_filled"] = filled
    pdf["sg_tokens"] = sg
    pdf["med_tokens"] = med
    pdf["raw_anomaly"] = raw
    pdf["is_anomaly"] = merged
    pdf["treated_tokens"] = treated
    pdf["conv_has_anomaly"] = conv_has
    pdf["g_ns"] = g_ns
    pdf["g_na"] = g_na
    return pdf


def _slim_raw_kernel(
    pdf: pd.DataFrame, cfg: TreatmentConfig, group_cols: tuple[str, ...]
) -> pd.DataFrame:
    """Raw anomaly mask only (interp + rolling median + tolerance mask) —
    the slim flags branch for chunked mode when no precomputed flags are
    supplied. conv_has_anomaly == any(raw_anomaly): the run merge only
    fills rows BETWEEN existing raw anomalies, so the per-conv any is
    identical on raw and merged masks."""
    x = pdf["token_count"].to_numpy(dtype=np.float64)
    n = len(x)
    raw = np.empty(n, dtype=bool)
    b = _group_bounds(pdf, group_cols)
    for s, e in zip(b[:-1], b[1:]):
        seg = K.interpolate_linear_both(x[s:e])
        m = K.rolling_median(seg, cfg.med_window)
        raw[s:e] = K.anomaly_mask(seg, m, cfg.tol)
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
        v = has_anom[s]
        if v is None or (isinstance(v, float) and np.isnan(v)):
            # a null flag means the caller-supplied flags frame is missing
            # (or null for) this conversation — silently treating that as
            # "no anomaly" would route the conv down the wrong branch
            raise ValueError(
                f"conv_has_anomaly is null for {pdf[group_cols[0]].iloc[s]!r}: "
                "flags= must cover every conversation with a non-null boolean"
            )
        if bool(v):
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
        keyed = _pin_bucket_parallelism(
            df.withColumn(
                "__g", F.pmod(F.xxhash64("conv_id"), F.lit(G)).cast("int")
            ),
            G,
        )
        out_schema = _added(keyed.schema, added_fields)

        def run_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            return kernel(pdf, cfg, ("conv_id",))

        return keyed.groupBy("__g").applyInPandas(run_bucket, out_schema).drop("__g")

    L, H = cfg.chunk_len, halo
    if H > L:
        # the explode only serves ±1 adjacent chunk, so the effective halo
        # is capped at chunk_len — beyond it chunked output silently
        # diverges from whole-series output. Fail loud instead.
        raise ValueError(
            f"halo {H} exceeds chunk_len {L}: raise chunk_len or shrink the "
            "kernel support (sg_window/merge_gap/gauss_sigma)"
        )
    own = F.floor(F.col("turn_idx") / L).cast("long")
    pos = F.col("turn_idx") % L
    chunks = F.array_compact(
        F.array(
            own,
            F.when(pos < H, own - 1),          # serve previous chunk's right halo
            F.when(pos >= L - H, own + 1),     # serve next chunk's left halo
        )
    )
    exploded = _pin_bucket_parallelism(
        df.withColumn("__chunk", F.explode(chunks))
        .where(F.col("__chunk") >= 0)
        .withColumn(
            "__g",
            F.pmod(F.xxhash64("conv_id", "__chunk"), F.lit(G)).cast("int"),
        ),
        G,
    )
    grouped_schema = _added(exploded.schema, added_fields)

    def run_bucket_chunked(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "__chunk", "turn_idx"]).reset_index(drop=True)
        res = kernel(pdf, cfg, ("conv_id", "__chunk"))
        # keep each row's own-chunk output only (halo rows drop here)
        return res[(res["turn_idx"] // L) == res["__chunk"]]

    res = exploded.groupBy("__g").applyInPandas(run_bucket_chunked, grouped_schema)
    return res.drop("__chunk", "__g")


def raw_anomaly_col(
    cfg: TreatmentConfig | None = None,
    value_col: str = "token_count",
    key: str = "conv_id",
    idx: str = "turn_idx",
):
    """SQL twin of the kernel raw-anomaly mask over an ALREADY GAP-FILLED
    series: centered rolling median (min_periods=1) via sorted neighbor
    arrays + tolerance mask, bit-identical to
    ``anomaly_mask(x, rolling_median(x, med_window), tol)`` — missing
    neighbors (partition edge) and null values both drop from the array,
    exactly the shrunken-window / nanmedian semantics; even counts average
    the two middles with the same IEEE op; null value or empty window ⇒
    anomalous (NaN rule).

    Use case: a pipeline whose gap-fill stage already runs conv-partitioned
    windows can add this column FOR FREE (same exchange), so
    ``conv_has_anomaly`` flags become a plain scan+aggregate over the
    materialized table and the chunked treatment skips its slim flags pass
    (pass ``flags=`` to :func:`treat_transcripts`)."""
    cfg = cfg or TreatmentConfig()
    w = Window.partitionBy(key).orderBy(idx)
    c = F.col(value_col)
    left = cfg.med_window // 2
    right = cfg.med_window - left - 1
    neighbors = (
        [F.lag(c, i).over(w) for i in range(left, 0, -1)]
        + [c]
        + [F.lead(c, i).over(w) for i in range(1, right + 1)]
    )
    vals = F.array_sort(F.array_compact(F.array(*neighbors)))
    n = F.size(vals)
    lo = F.floor(n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(vals, lo + 1)
    ).otherwise((F.element_at(vals, lo) + F.element_at(vals, lo + 1)) / 2.0)
    return F.coalesce(~(F.abs(c - med) < cfg.tol), F.lit(True))


def conv_anomaly_flags(rawed: DataFrame, key: str = "conv_id") -> DataFrame:
    """(conv_id, conv_has_anomaly) from a frame carrying ``raw_anomaly`` —
    a map-side-combined aggregate (tiny shuffle). any(raw) == any(merged):
    the run merge only fills rows between existing raw anomalies."""
    return rawed.groupBy(key).agg(
        (F.max(F.col("raw_anomaly").cast("int")) == 1).alias("conv_has_anomaly")
    )


def treat_transcripts(
    df: DataFrame,
    cfg: TreatmentConfig | None = None,
    chunked: bool = False,
    flags: DataFrame | None = None,
) -> DataFrame:
    """Full treatment chain. Input: transcripts with ``token_count`` (from
    ``rollup.with_turn_metrics``) and dense ``turn_idx`` (from ``gap_fill``).

    Adds: tokens_filled, sg_tokens, med_tokens, raw_anomaly, is_anomaly,
    treated_tokens, conv_has_anomaly, g_ns (smoothed), g_na (derivative).

    Execution (round-5 fusion — the former SQL run-merge stage cost a
    full-frame conv-partitioned window exchange between the two pandas
    stages; the merge is bounded-support, so it now runs inside the first
    kernel):

    * non-chunked: ONE pandas stage (A+B+C+D fused — each group holds whole
      conversations, so the global ``conv_has_anomaly`` is an in-slice any).
      One exchange total, was three.
    * chunked: fused A+B+C kernel (halo extends by merge_gap), then the
      per-conv ``conv_has_anomaly`` bit joins in and stage D runs chunked.
      ``flags`` supplies it precomputed — (conv_id, conv_has_anomaly),
      e.g. from :func:`conv_anomaly_flags` over a table carrying
      :func:`raw_anomaly_col` — with no extra full-frame exchange (the
      tiny flags side broadcasts below the AQE threshold; above it — many
      billions of conversations per shard — it degrades to a narrow
      shuffle join, still strictly cheaper than the full-frame window
      exchange it replaced). Without ``flags`` a slim 3-column pandas pass
      derives them (still cheaper than the old full-frame exchange).
      Two full-frame exchanges total, was three.
    """
    cfg = cfg or TreatmentConfig()

    abc_fields = [
        ("tokens_filled", T.DoubleType()),
        ("sg_tokens", T.DoubleType()),
        ("med_tokens", T.DoubleType()),
        ("raw_anomaly", T.BooleanType()),
        ("is_anomaly", T.BooleanType()),
        ("treated_tokens", T.DoubleType()),
    ]

    if not chunked:
        full_fields = abc_fields + [
            ("conv_has_anomaly", T.BooleanType()),
            ("g_ns", T.DoubleType()),
            ("g_na", T.DoubleType()),
        ]
        return _apply(df, _stage_full_kernel, full_fields, cfg, 0, chunked=False)

    halo_abc = cfg.halo_a + cfg.merge_gap
    abc = _apply(df, _stage_abc_kernel, abc_fields, cfg, halo_abc, chunked=True)

    if flags is None:
        slim = df.select("conv_id", "turn_idx", "token_count")
        rawed = _apply(
            slim,
            _slim_raw_kernel,
            [("raw_anomaly", T.BooleanType())],
            cfg,
            cfg.med_window // 2 + 1,
            chunked=True,
        )
        flags = conv_anomaly_flags(rawed)

    # LEFT join: a flags frame that misses conversations must not silently
    # drop their rows — the null flag fails loudly in _stage_d_kernel
    c = abc.join(flags, "conv_id", "left")

    d_fields = [("g_ns", T.DoubleType()), ("g_na", T.DoubleType())]
    return _apply(c, _stage_d_kernel, d_fields, cfg, cfg.halo_d, chunked=True)

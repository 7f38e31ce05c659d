"""Pandas oracle for gap-fill, treatment and tier rollups.

Written in the style of the reference (eager pandas, per-series loop —
``/root/reference/src/processor.py:311-465`` and per-window aggregation
``src/09lane_node.py:341-417``) and used as the ground truth for
``tests/test_treatment_parity.py``. Shares the numpy kernels in
:mod:`pneuma_treatment_spark.kernels` so float behavior is bit-identical;
everything *around* the kernels (ordering, grouping, gap semantics, run
merge, rollup math) is implemented independently of the Spark path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pneuma_treatment_spark import kernels as K
from pneuma_treatment_spark.operators.treatment import TreatmentConfig

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}


def oracle_gap_fill(pdf: pd.DataFrame) -> pd.DataFrame:
    """Densify turn_idx per conv; ffill role; lerp token_count and ts."""
    out = []
    for conv_id, g in pdf.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        full = pd.DataFrame({"turn_idx": np.arange(g["turn_idx"].min(), g["turn_idx"].max() + 1)})
        m = full.merge(g, on="turn_idx", how="left")
        m["conv_id"] = conv_id
        m["is_filled"] = ~m["turn_idx"].isin(g["turn_idx"])
        m["role"] = m["role"].ffill().bfill()
        m["token_count"] = K.interpolate_linear_both(m["token_count"].to_numpy(np.float64))
        ts_us = (
            m["ts"].astype("datetime64[us]").astype("int64").where(m["ts"].notna(), np.nan)
        ).to_numpy(np.float64)
        filled_us = np.floor(K.interpolate_linear_both(ts_us) + 0.5).astype("int64")
        m["ts"] = pd.to_datetime(filled_us, unit="us")
        out.append(m)
    return pd.concat(out, ignore_index=True)


def oracle_treat(pdf: pd.DataFrame, cfg: TreatmentConfig | None = None) -> pd.DataFrame:
    """Per-series treatment chain (processor.py main loop analog)."""
    cfg = cfg or TreatmentConfig()
    out = []
    for conv_id, g in pdf.groupby("conv_id", sort=True):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        x = K.interpolate_linear_both(g["token_count"].to_numpy(np.float64))
        g["tokens_filled"] = x
        g["sg_tokens"] = K.savgol_poly1(x, cfg.sg_window)
        med = K.rolling_median(x, cfg.med_window)
        g["med_tokens"] = med
        raw = K.anomaly_mask(x, med, cfg.tol)
        g["raw_anomaly"] = raw
        merged = K.merge_anomaly_runs(raw, cfg.merge_gap)
        g["is_anomaly"] = merged
        treated = np.where(merged, med, x)
        g["treated_tokens"] = treated
        has_anom = bool(merged.any())
        g["conv_has_anomaly"] = has_anom
        if has_anom:
            g_ns = K.gaussian1d(treated, cfg.gauss_sigma)
        else:
            g_ns = g["sg_tokens"].to_numpy(np.float64)
        g["g_ns"] = g_ns
        g["g_na"] = K.gradient(g_ns, K.DT)
        out.append(g)
    return pd.concat(out, ignore_index=True)


def oracle_rollup(pdf: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Tumbling rollup per (conv_id, bucket) with the engine's metric set."""
    secs = TIERS[tier]
    df = pdf.copy()
    epoch = df["ts"].astype("int64") // 1_000_000
    df["bucket_ts"] = pd.to_datetime((epoch - epoch % secs) * 1_000_000_000)
    tok = df["token_count"]
    grp = df.groupby(["conv_id", "bucket_ts"], sort=True)
    out = grp.agg(
        turn_count=("turn_idx", "size"),
        token_sum=("token_count", lambda s: s.sum() if s.notna().any() else np.nan),
        tool_calls=("tool", lambda s: s.notna().sum()),
        user_turns=("role", lambda s: (s == "user").sum()),
        assistant_turns=("role", lambda s: (s == "assistant").sum()),
    ).reset_index()
    del tok
    out["token_rate"] = _round_half_up(out["token_sum"] / secs, 2)
    out["tool_call_rate"] = _round_half_up(out["tool_calls"] / out["turn_count"], 4)
    out["turns_norm"] = _round_half_up(np.log1p(out["turn_count"]) / np.log(15.0), 4)
    return out


def _round_half_up(x, ndigits: int):
    """Spark's ``F.round`` semantics (HALF_UP), vs numpy's banker's rounding."""
    scale = 10.0 ** ndigits
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale

"""Pure-numpy series kernels shared by the Spark UDF path and the pandas
oracle (``reference_impl/``), guaranteeing bit-identical float behavior on
both sides of the parity gate.

Each kernel reproduces a reference call (cited); scipy is not available in
this container, so the two scipy kernels are reimplemented from their public
definitions (verified against scipy when importable — see
``tests/test_kernels.py``).

All kernels have bounded support (±radius) except the cumulative ones, which
makes the chunked/halo execution of mega-conversations exact (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np

DT = 1.0  # turn-index spacing; the reference uses 0.04 s frames (processor.py:64)


def savgol_poly1(x: np.ndarray, window: int = 25) -> np.ndarray:
    """Savitzky-Golay, polyorder=1, mode='nearest'.

    ≡ ``scipy.signal.savgol_filter(x, window, 1, mode='nearest')``
    (reference: ``/root/reference/src/processor.py:100-107``, applied with
    window 25 at ``:324-327,416-419``). For polyorder 1 on a symmetric window
    the least-squares line evaluated at the center equals the window mean;
    'nearest' pads with the edge values.
    """
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0:
        return x
    r = window // 2
    padded = np.pad(x, r, mode="edge")
    kernel = np.full(window, 1.0 / window)
    return np.convolve(padded, kernel, mode="valid")


def rolling_median(x: np.ndarray, window: int = 5) -> np.ndarray:
    """Centered rolling median, min_periods=1 (pandas
    ``rolling(window, center=True, min_periods=1).median()`` semantics —
    the engine's deterministic stand-in for the reference's XGBoost
    reconstruction, ``processor.py:112-133``; substitution documented in
    SURVEY.md §7.1)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    left = window // 2
    right = window - left - 1
    if n <= window or np.isnan(x).any():
        # small series / NaN present: per-window nanmedian (pandas semantics)
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            out[i] = np.nanmedian(x[max(0, i - left) : min(n, i + right + 1)])
        return out
    out = np.empty(n, dtype=np.float64)
    # interior: full windows → median = k-th order statistic via partition
    # (vectorized O(w) per row; odd windows take one k, even average two)
    win = np.lib.stride_tricks.sliding_window_view(x, window)
    if window % 2:
        out[left : n - right] = np.partition(win, window // 2, axis=1)[:, window // 2]
    else:
        part = np.partition(win, [window // 2 - 1, window // 2], axis=1)
        out[left : n - right] = (part[:, window // 2 - 1] + part[:, window // 2]) / 2.0
    # edges: shrunken windows (min_periods=1 semantics)
    for i in range(left):
        out[i] = np.median(x[: i + right + 1])
    for i in range(n - right, n):
        out[i] = np.median(x[i - left :])
    return out


def gaussian1d(x: np.ndarray, sigma: float = 12.0, truncate: float = 4.0) -> np.ndarray:
    """≡ ``scipy.ndimage.gaussian_filter1d(x, sigma)`` default mode='reflect'
    (reference: ``processor.py:91-92``, applied ``:413,422-427``).

    scipy's 'reflect' boundary (d c b a | a b c d) is numpy's 'symmetric' pad.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n == 0:
        return x
    radius = int(truncate * sigma + 0.5)
    i = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (i / sigma) ** 2)
    w /= w.sum()
    padded = np.pad(x, radius, mode="symmetric")
    return np.convolve(padded, w, mode="valid")


def gradient(x: np.ndarray, dt: float = DT, ndigits: int = 4) -> np.ndarray:
    """Central-difference derivative with fixed spacing, rounded — ≡
    ``np.round(np.gradient(x, dt), 4)`` (``processor.py:60-64``)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < 2:
        return np.zeros_like(x)
    return np.round(np.gradient(x, dt), ndigits)


def anomaly_mask(raw: np.ndarray, recon: np.ndarray, tol: float) -> np.ndarray:
    """Pointwise tolerance mask: anomalous iff ``|raw - recon| >= tol``
    (``processor.py:302-304,366-371``). NaN raw counts as anomalous."""
    diff = np.abs(np.asarray(raw, dtype=np.float64) - np.asarray(recon, dtype=np.float64))
    return ~(diff < tol)  # NaN-safe: NaN comparisons are False → anomalous


def merge_anomaly_runs(mask: np.ndarray, max_gap: int = 10) -> np.ndarray:
    """Merge anomaly runs whose anomaly-INDEX difference is < ``max_gap``
    (``processor.py:393-399``: ``ano_index[k] - ano_index[k-1] < 10``), i.e.
    the clean gap between two runs is marked anomalous when its length
    < max_gap - 1 (clean gaps of ≤ 8 points merge at the default 10)."""
    mask = np.asarray(mask, dtype=bool).copy()
    idx = np.flatnonzero(mask)
    if len(idx) < 2:
        return mask
    diffs = idx[1:] - idx[:-1]  # anomaly-index difference (gap = diff - 1)
    for a, b, d in zip(idx[:-1], idx[1:], diffs):
        if 1 < d < max_gap:
            mask[a + 1 : b] = True
    return mask


def reintegrate(v0: float, acc: np.ndarray, dt: float = DT) -> np.ndarray:
    """Trapezoidal re-integration: rebuild the level series from a treated
    derivative (``processor.py:373-380``)."""
    acc = np.asarray(acc, dtype=np.float64)
    if len(acc) == 0:
        return acc
    trap = (acc[1:] + acc[:-1]) / 2.0
    return v0 + dt * np.concatenate([[0.0], np.cumsum(trap)])


def interpolate_linear_both(x: np.ndarray) -> np.ndarray:
    """≡ ``pd.Series.interpolate(method='linear', limit_direction='both')``
    (``22stateEstimate.py:54-66``): interior NaNs lerp, edge NaNs take the
    nearest value; all-NaN stays NaN."""
    x = np.asarray(x, dtype=np.float64).copy()
    n = len(x)
    good = np.flatnonzero(~np.isnan(x))
    if len(good) == 0 or len(good) == n:
        return x
    x = np.interp(np.arange(n), good, x[good])
    return x

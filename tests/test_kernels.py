from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pneuma_treatment_spark import kernels as K

try:
    import scipy.ndimage
    import scipy.signal

    HAVE_SCIPY = True
except ImportError:
    HAVE_SCIPY = False

rng = np.random.default_rng(123)
SERIES = [
    rng.normal(10, 3, 200),
    np.arange(30, dtype=float),
    np.full(50, 7.0),
    rng.exponential(5, 7),
]


@pytest.mark.parametrize("x", SERIES, ids=["noise", "ramp", "const", "tiny"])
def test_savgol_matches_scipy(x):
    if not HAVE_SCIPY:
        pytest.skip("scipy unavailable; cross-check skipped")
    ours = K.savgol_poly1(x, 25)
    ref = scipy.signal.savgol_filter(x, 25, 1, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("x", SERIES, ids=["noise", "ramp", "const", "tiny"])
def test_gaussian_matches_scipy(x):
    if not HAVE_SCIPY:
        pytest.skip("scipy unavailable; cross-check skipped")
    ours = K.gaussian1d(x, 12.0)
    ref = scipy.ndimage.gaussian_filter1d(x, 12.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)


def test_savgol_properties():
    assert np.allclose(K.savgol_poly1(np.full(50, 3.0), 25), 3.0)
    ramp = np.arange(100, dtype=float)
    # linear signal is invariant under polyorder-1 SG in the interior
    np.testing.assert_allclose(K.savgol_poly1(ramp, 25)[12:-12], ramp[12:-12])


def test_rolling_median_matches_pandas():
    x = rng.normal(0, 1, 101)
    ours = K.rolling_median(x, 5)
    ref = pd.Series(x).rolling(5, center=True, min_periods=1).median().to_numpy()
    np.testing.assert_allclose(ours, ref)


def test_merge_anomaly_runs():
    m = np.zeros(30, dtype=bool)
    m[[2, 3, 8, 25]] = True  # gap 4..7 (len 4) < 10 → merged; 9..24 (len 16) → not
    out = K.merge_anomaly_runs(m, max_gap=10)
    assert out[2:9].all()
    assert not out[9:25].any()
    assert out[25]


def test_interpolate_matches_pandas():
    x = np.array([np.nan, np.nan, 1.0, np.nan, 3.0, np.nan])
    ref = pd.Series(x).interpolate(method="linear", limit_direction="both").to_numpy()
    np.testing.assert_allclose(K.interpolate_linear_both(x), ref)


def test_reintegrate_inverts_gradient_of_linear():
    v = 2.0 + 0.5 * np.arange(50)
    acc = np.gradient(v, 1.0)
    np.testing.assert_allclose(K.reintegrate(v[0], acc), v)

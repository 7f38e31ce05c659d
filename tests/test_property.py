"""Property-based tests (hypothesis) for the pure-numpy layers: the Gorilla
codec must round-trip ANY float64 payload bit-for-bit (NaN/inf included —
nulls are load-bearing), and the run-merge kernel must match a direct
reimplementation of the reference's index loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from pneuma_treatment_spark import kernels as K
from pneuma_treatment_spark.compression.gorilla import decode_chunk, encode_chunk

finite_or_special = st.floats(
    allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64
)


@settings(max_examples=200, deadline=None)
@given(
    ts0=st.integers(min_value=-(2**40), max_value=2**40),
    deltas=st.lists(st.integers(min_value=0, max_value=2**33), max_size=64),
    data=st.data(),
)
def test_gorilla_roundtrip_any_floats(ts0, deltas, data):
    ts = np.cumsum(np.array([ts0] + deltas, dtype=np.int64))
    vals = data.draw(
        arrays(np.float64, shape=len(ts), elements=finite_or_special)
    )
    blob = encode_chunk(ts, vals)
    ts2, vals2 = decode_chunk(blob)
    assert np.array_equal(ts, ts2)
    # bit-level equality: NaN payloads and signed zeros must survive
    assert np.array_equal(vals.view(np.uint64), vals2.view(np.uint64))


def _merge_reference(mask: np.ndarray, max_gap: int = 10) -> np.ndarray:
    """Direct transcription of processor.py:391-399: anomaly indices whose
    difference is < max_gap pull the gap in between into the anomaly set."""
    out = mask.astype(bool).copy()
    idx = list(np.flatnonzero(out))
    for k in range(1, len(idx)):
        if idx[k] - idx[k - 1] < max_gap:
            out[idx[k - 1] : idx[k]] = True
    return out


@settings(max_examples=300, deadline=None)
@given(
    mask=st.lists(st.booleans(), max_size=80),
    max_gap=st.integers(min_value=2, max_value=12),
)
def test_merge_anomaly_runs_matches_reference_loop(mask, max_gap):
    m = np.array(mask, dtype=bool)
    got = K.merge_anomaly_runs(m, max_gap)
    want = _merge_reference(m, max_gap)
    assert np.array_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e9, max_value=1e9)),
        max_size=50,
    )
)
def test_interpolate_matches_pandas(vals):
    x = np.array([np.nan if v is None else v for v in vals], dtype=np.float64)
    got = K.interpolate_linear_both(x)
    want = (
        pd.Series(x).interpolate(method="linear", limit_direction="both").to_numpy()
    )
    assert np.allclose(got, want, equal_nan=True, rtol=0, atol=1e-9)

"""Gorilla time-series codec: delta-of-delta timestamps + XOR floats.

Implements the encoding of Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database" (VLDB 2015, public paper), generalized to
microsecond int64 timestamps and float64 values (the paper uses seconds /
float64):

Timestamps (delta-of-delta, zigzag-free bucket classes):
  header: n (uint32), t0 (int64 raw), d0 = t1 - t0 (int64 raw)
  per point i >= 2, dod = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}):
    dod == 0                  -> '0'
    dod in [-63, 64]          -> '10'   + 7  bits (dod + 63)
    dod in [-255, 256]        -> '110'  + 9  bits (dod + 255)
    dod in [-2047, 2048]      -> '1110' + 12 bits (dod + 2047)
    else                      -> '1111' + 64 bits raw (two's complement)

Values (XOR with predecessor):
  v0: 64 bits raw. For each xor = bits(v_i) ^ bits(v_{i-1}):
    xor == 0 -> '0'
    else '1' + (  '0' + meaningful bits if the meaningful window fits the
                  previous window (same leading zeros / length reuse)
                | '1' + 6 bits leading-zero count + 6 bits length-1
                      + that many meaningful bits )

(The paper stores 5 leading bits / 6 length bits with 64 meaning "use 32";
we use a flat 6+6 with length-1 so a full 64-bit payload is representable —
a documented deviation, this is our own codec not a wire-format port.)

Encoding is fully vectorized: per-element (code, bitlen) pairs are computed
with numpy, then packed in one shot via a searchsorted scatter + packbits —
no per-point Python in the encode hot path. Decode is a sequential bit
reader (used on the read/verify path).

NaN-safe: NaN payload bits round-trip exactly (XOR operates on raw bit
patterns) — required because empty rollup windows are null, not 0
(SURVEY.md §1.2).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GOR1"


# --------------------------------------------------------------------------
# bit packing helpers (vectorized)
# --------------------------------------------------------------------------

def _pack_codes(codes: np.ndarray, bitlens: np.ndarray) -> bytes:
    """Pack per-element MSB-first codes of varying bit length into bytes."""
    codes = codes.astype(np.uint64)
    bitlens = bitlens.astype(np.int64)
    total = int(bitlens.sum())
    if total == 0:
        return b""
    starts = np.concatenate([[0], np.cumsum(bitlens)[:-1]])
    elem = np.repeat(np.arange(len(codes)), bitlens)
    bit_in_elem = np.arange(total) - starts[elem]
    shift = (bitlens[elem] - 1 - bit_in_elem).astype(np.uint64)
    bits = ((codes[elem] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        b = self.bits
        p = self.pos
        for i in range(n):
            out = (out << 1) | int(b[p + i])
        self.pos = p + n
        return out


# --------------------------------------------------------------------------
# timestamps
# --------------------------------------------------------------------------

_TS_BOUNDS = (64, 256, 2048)  # class upper bounds (inclusive) on dod
_TS_OFFS = (63, 255, 2047)
_TS_PAYLOAD = (7, 9, 12)
_TS_PREFIX = (0b10, 0b110, 0b1110)
_TS_PREFIX_LEN = (2, 3, 4)


def _encode_ts(ts: np.ndarray) -> tuple[bytes, bytes]:
    n = len(ts)
    head = struct.pack("<Iqq", n, int(ts[0]) if n else 0, int(ts[1] - ts[0]) if n > 1 else 0)
    if n <= 2:
        return head, b""
    deltas = np.diff(ts.astype(np.int64))
    dod = np.diff(deltas)
    codes = np.zeros(len(dod), dtype=np.uint64)
    lens = np.ones(len(dod), dtype=np.int64)  # default class '0' (dod==0)
    done = dod == 0
    for bound, off, pay, pre, prelen in zip(
        _TS_BOUNDS, _TS_OFFS, _TS_PAYLOAD, _TS_PREFIX, _TS_PREFIX_LEN
    ):
        sel = (~done) & (dod >= -(bound - 1)) & (dod <= bound)
        codes[sel] = (np.uint64(pre) << np.uint64(pay)) | (dod[sel] + off).astype(np.uint64)
        lens[sel] = prelen + pay
        done |= sel
    rest = ~done
    # 4-bit prefix + 64-bit payload won't fit one uint64 code; split into two
    # entries: prefix code then raw payload.
    if rest.any():
        idx = np.flatnonzero(rest)
        # interleave: build expanded arrays
        codes_list, lens_list = [], []
        last = 0
        for i in idx:
            codes_list.append(codes[last:i])
            lens_list.append(lens[last:i])
            codes_list.append(np.array([0b1111, dod[i].astype(np.uint64)], dtype=np.uint64))
            lens_list.append(np.array([4, 64], dtype=np.int64))
            last = i + 1
        codes_list.append(codes[last:])
        lens_list.append(lens[last:])
        codes = np.concatenate(codes_list)
        lens = np.concatenate(lens_list)
    return head, _pack_codes(codes, lens)


def _decode_ts(head: bytes, payload: bytes) -> np.ndarray:
    n, t0, d0 = struct.unpack("<Iqq", head)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0], out[1] = t0, t0 + d0
    if n == 2:
        return out
    r = _BitReader(payload)
    delta = d0
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# --------------------------------------------------------------------------
# values
# --------------------------------------------------------------------------

def _encode_vals(vals: np.ndarray) -> tuple[bytes, bytes]:
    n = len(vals)
    bits = vals.astype(np.float64).view(np.uint64)
    head = struct.pack("<Q", int(bits[0]) if n else 0)
    if n <= 1:
        return head, b""
    xor = bits[1:] ^ bits[:-1]
    nz = xor != 0
    # leading/trailing zero counts (vectorized via bit tricks)
    lead = 64 - _bit_length_u64(xor)
    trail = _trailing_zeros_u64(xor)
    mlen = np.where(nz, 64 - lead - trail, 0)  # meaningful bits

    # Window reuse depends on the previous non-zero encode (sequential
    # state); emit control bits and payload as separate pack entries so no
    # single code can exceed 64 bits. Zero-xor points are a single '0' bit.
    codes: list[int] = []
    lens: list[int] = []
    cur_lead, cur_mlen = -1, -1
    for i in range(len(xor)):
        if not nz[i]:
            codes.append(0)
            lens.append(1)
            continue
        li, ti, mi, x = int(lead[i]), int(trail[i]), int(mlen[i]), int(xor[i])
        prev_trail = 64 - cur_lead - cur_mlen
        if cur_lead >= 0 and li >= cur_lead and ti >= prev_trail:
            # fits previous window: '10' + prev_mlen payload bits
            payload = (x >> prev_trail) & ((1 << cur_mlen) - 1)
            codes.extend((0b10, payload))
            lens.extend((2, cur_mlen))
        else:
            # new window: '11' + 6b lead + 6b (mlen-1) + mlen payload bits
            payload = x >> ti
            codes.extend((0b11, li, mi - 1, payload))
            lens.extend((2, 6, 6, mi))
            cur_lead, cur_mlen = li, mi
    return head, _pack_codes(np.array(codes, dtype=np.uint64), np.array(lens, dtype=np.int64))


def _decode_vals(n: int, head: bytes, payload: bytes) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    (b0,) = struct.unpack("<Q", head)
    out = np.empty(n, dtype=np.uint64)
    out[0] = b0
    if n == 1:
        return out.view(np.float64)
    r = _BitReader(payload)
    cur_lead, cur_mlen = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read(1) == 0:
            mlen, lead = cur_mlen, cur_lead
        else:
            lead = r.read(6)
            mlen = r.read(6) + 1
            cur_lead, cur_mlen = lead, mlen
        payload_bits = r.read(mlen)
        xor = payload_bits << (64 - lead - mlen)
        out[i] = out[i - 1] ^ np.uint64(xor)
    return out.view(np.float64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        out[m] += shift
        v[m] >>= np.uint64(shift)
    out[x != 0] += 1
    return out


def _trailing_zeros_u64(x: np.ndarray) -> np.ndarray:
    lsb = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, _bit_length_u64(lsb) - 1)


# --------------------------------------------------------------------------
# public chunk API
# --------------------------------------------------------------------------

def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one (sorted-by-ts) series chunk into a self-describing blob."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    assert len(ts_us) == len(values)
    th, tp = _encode_ts(ts_us)
    vh, vp = _encode_vals(values)
    return b"".join(
        [_MAGIC, th, struct.pack("<I", len(tp)), tp, vh, struct.pack("<I", len(vp)), vp]
    )


def decode_chunk(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    assert blob[:4] == _MAGIC, "bad chunk magic"
    off = 4
    th = blob[off : off + 20]
    off += 20
    (tplen,) = struct.unpack("<I", blob[off : off + 4])
    off += 4
    tp = blob[off : off + tplen]
    off += tplen
    vh = blob[off : off + 8]
    off += 8
    (vplen,) = struct.unpack("<I", blob[off : off + 4])
    off += 4
    vp = blob[off : off + vplen]
    ts = _decode_ts(th, tp)
    vals = _decode_vals(len(ts), vh, vp)
    return ts, vals

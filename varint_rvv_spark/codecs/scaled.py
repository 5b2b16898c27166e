"""SCALED codec (codec 8): decimals-in-doubles → integer codec stack.

Analytical double columns are very often exact decimals — quantities,
prices, rates stored as float64 (every TPC-H money/quantity column).
For a chunk where every value is bit-exactly representable as
`int / 10^k` (k ≤ 4), we store `k` plus the int64 stream through the
*integer* codec auto-selection (zigzag-delta varint / bitpack / RLE /
dict), which beats zstd-on-raw-doubles by a wide margin (8-byte
doubles → often 1-2 byte varints).

Bit-exactness is the contract, not an approximation: the encoder
verifies `rint(v * 10^k).astype(f64) / 10^k` reproduces every value's
exact bit pattern (so NaN, ±inf, -0.0 and true floating-point values
simply make the chunk ineligible and fall back to zstd/dict/raw), and
the selection gate runs this check on the FULL chunk before the codec
can be chosen — an eligible chunk can never fail mid-encode.

This codec is beyond the reference's family (uint32-only); it follows
the same per-chunk-dispatch philosophy as its all-1-byte fast path
(varint_decode_vecshift.c:23-32) one level up.
"""

from __future__ import annotations

import numpy as np

from . import blob as B

POWERS = (1.0, 10.0, 100.0, 1000.0, 10000.0)


def scaled_exponent(values: np.ndarray) -> int | None:
    """Smallest k with `rint(v*10^k)/10^k` bit-identical to v for every
    value, or None if the chunk is not exactly 10^k-scaled integers."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    if v.size == 0:
        return 0
    if not np.isfinite(v).all():
        return None
    if v.size > 512:
        # prefix fast-path: a true-float chunk (the common ineligible
        # case) is rejected after ~5 small passes instead of 5
        # full-chunk ones; eligible prefixes fall through to the full
        # verification below
        if scaled_exponent(v[:256]) is None:
            return None
    bits = v.view(np.int64)
    for k, p in enumerate(POWERS):
        s = np.rint(v * p)
        if np.abs(s).max() >= float(1 << 62):  # int64/zigzag headroom
            return None  # larger k only grows magnitude
        si = s.astype(np.int64)
        if ((si.astype(np.float64) / p).view(np.int64) == bits).all():
            return k
    return None


def enc_scaled(values, dtype_code: int) -> bytes:
    if dtype_code != B.DT_F64:
        raise TypeError("scaled codec applies to f64 columns only")
    k = scaled_exponent(values)
    if k is None:
        raise ValueError("chunk is not exactly 10^k-scaled integers")
    v = np.ascontiguousarray(values, dtype=np.float64)
    si = np.rint(v * POWERS[k]).astype(np.int64)
    from .select import encode_auto  # late import: select imports blob

    inner, _, _ = encode_auto(si, B.DT_I64)
    return bytes([k]) + inner


def dec_scaled(payload, n: int, dtype_code: int) -> np.ndarray:
    mv = memoryview(payload)
    if len(mv) < 1:
        raise ValueError("truncated scaled payload")
    k = mv[0]
    if k >= len(POWERS):
        raise ValueError(f"scaled exponent {k} out of range")
    si, _, inner_dt = B.decode_blob(mv[1:])
    if inner_dt != B.DT_I64 or len(si) != n:
        raise ValueError("scaled inner stream mismatch")
    return np.asarray(si, dtype=np.int64).astype(np.float64) / POWERS[k]


def register_all() -> None:
    B.register(B.SCALED, enc_scaled, dec_scaled)

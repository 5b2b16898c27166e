"""Numeric codecs: VARINT, DELTA_VARINT (FOR/delta+zigzag), BITPACK.

Generalizations of the reference varint kernel per SURVEY.md §2.4:
varint byte layout contract is /root/reference/lib/src/varint_encode.c:4-58;
delta/FOR and bit-packing are new codecs the north_rule requires, built on
the same Arrow-batch numpy style (no per-row Python anywhere).

All arithmetic is modular uint64 (two's-complement reinterpretation for
signed dtypes), so round-trips are exact for every int32/int64/uint32/
uint64 input including boundary values.
"""

from __future__ import annotations

import struct

import numpy as np

from . import blob as B
from .varint import (
    varint_decode,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)


def _as_u64(values: np.ndarray, dtype_code: int) -> np.ndarray:
    """Reinterpret integer values as modular uint64 (C-cast semantics)."""
    np_dt = B.NUMERIC_NP[dtype_code]
    v = np.ascontiguousarray(values, dtype=np_dt)
    if np_dt.kind == "f":
        raise TypeError("integer codec applied to float column")
    with np.errstate(over="ignore"):
        return v.astype(np.uint64)


def _from_u64(u: np.ndarray, dtype_code: int) -> np.ndarray:
    np_dt = B.NUMERIC_NP[dtype_code]
    if np_dt == np.dtype("<u8"):
        return u
    if np_dt.kind == "i":
        # modular narrowing: uint64 → signed via two's complement
        bits = np_dt.itemsize * 8
        if bits == 64:
            return u.view(np.int64).copy()
        return u.astype(getattr(np, f"uint{bits}")).view(np_dt).copy()
    return u.astype(np_dt)


# --- VARINT (codec 1): plain LEB128 of the unsigned reinterpretation ---

def enc_varint(values, dtype_code: int) -> bytes:
    return varint_encode(_as_u64(values, dtype_code)).tobytes()


def dec_varint(payload, n: int, dtype_code: int):
    buf = np.frombuffer(payload, dtype=np.uint8)
    # uint32 columns zero-extend (≤5-byte varints), so the kernel can
    # run its uint32 accumulator; signed types sign-extend to u64
    out_dt = (np.uint32 if B.NUMERIC_NP[dtype_code] == np.dtype("<u4")
              else np.uint64)
    u = varint_decode(buf, out_dtype=out_dt)
    if u.shape[0] != n:
        raise ValueError(f"varint decode produced {u.shape[0]} values, expected {n}")
    return _from_u64(u, dtype_code)


# --- DELTA_VARINT (codec 2): zigzag(delta) + LEB128 ---
# First value is delta-from-zero; deltas are modular uint64 so any
# input order round-trips (sorted inputs get 1-byte deltas).

def enc_delta_varint(values, dtype_code: int) -> bytes:
    u = _as_u64(values, dtype_code)
    if u.shape[0] == 0:
        return b""
    d = np.empty_like(u)
    d[0] = u[0]
    np.subtract(u[1:], u[:-1], out=d[1:])  # modular
    zz = zigzag_encode(d.view(np.int64))
    return varint_encode(zz).tobytes()


def dec_delta_varint(payload, n: int, dtype_code: int):
    if n == 0:
        return _from_u64(np.empty(0, dtype=np.uint64), dtype_code)
    buf = np.frombuffer(payload, dtype=np.uint8)
    zz = varint_decode(buf, out_dtype=np.uint64)
    if zz.shape[0] != n:
        raise ValueError("delta_varint length mismatch")
    d = zigzag_decode(zz).view(np.uint64)
    u = np.cumsum(d, dtype=np.uint64)  # modular cumsum
    return _from_u64(u, dtype_code)


# --- BITPACK (codec 5): frame-of-reference + fixed-width bit packing ---
# payload = ref:u64 | width:u8 | ceil(n*width/8) packed bytes (LSB-first)

_BP_HDR = struct.Struct("<QB")


def enc_bitpack(values, dtype_code: int) -> bytes:
    u = _as_u64(values, dtype_code)
    if u.shape[0] == 0:
        return _BP_HDR.pack(0, 0)
    ref = u.min()
    d = u - ref  # modular; all results in [0, max-min]
    mx = int(d.max())
    width = mx.bit_length()
    if width == 0:
        return _BP_HDR.pack(int(ref), 0)
    # byte-plane expansion: view the u64 deltas as (n, 8) bytes and let
    # unpackbits(axis=1) produce the (n, 64) LSB-first bit matrix in one
    # C pass, then keep the low `width` bit columns.  The previous
    # (d[:, None] >> shifts) & 1 built an (n, width) uint64 temporary —
    # 8 bytes per bit — and was the single hottest line of the encode
    # kernel (47% of a lineitem chunk, r6 profile).
    b8 = np.ascontiguousarray(d, dtype="<u8").view(np.uint8) \
        .reshape(-1, 8)
    bits = np.unpackbits(b8, axis=1, bitorder="little")[:, :width]
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return _BP_HDR.pack(int(ref), width) + packed.tobytes()


def dec_bitpack(payload, n: int, dtype_code: int):
    ref, width = _BP_HDR.unpack_from(payload, 0)
    if n == 0:
        return _from_u64(np.empty(0, dtype=np.uint64), dtype_code)
    if width == 0:
        return _from_u64(np.full(n, ref, dtype=np.uint64), dtype_code)
    packed = np.frombuffer(payload, dtype=np.uint8, offset=_BP_HDR.size)
    bits = np.unpackbits(packed, count=n * width, bitorder="little")
    # inverse byte-plane trick (see enc_bitpack): zero-pad each value's
    # bits to 64 columns, packbits(axis=1) back to (n, 8) bytes, view as
    # u64 — replaces the (n, width) uint64 shift+sum reduction
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, :width] = bits.reshape(n, width)
    d = np.packbits(full, axis=1, bitorder="little").view("<u8") \
        .ravel().astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        u = d + np.uint64(ref)  # modular
    return _from_u64(u, dtype_code)


def register_all() -> None:
    B.register(B.VARINT, enc_varint, dec_varint)
    B.register(B.DELTA_VARINT, enc_delta_varint, dec_delta_varint)
    B.register(B.BITPACK, enc_bitpack, dec_bitpack)

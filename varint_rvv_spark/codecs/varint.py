"""LEB128/varint codec — the port-of-semantics core.

Re-expresses the reference kernels as numpy batch ops:

* ``varint_encode``  — vectorized minimal-length LEB128 encoder.
  Byte layout contract: /root/reference/lib/src/varint_encode.c:4-58
  (7 payload bits per byte, LSB group first, MSB=1 means "more bytes";
  canonical = smallest byte count, so our output is byte-for-byte the
  reference encoder's output for any uint32 input).
* ``varint_decode_scalar`` — pure-Python golden oracle mirroring the
  protobuf-derived scalar decoder
  (/root/reference/lib/src/varint_decode_scalar.c:4-66): accumulate
  ``result += b << 7k`` then subtract ``0x80 << 7k`` per continuation.
  Used only in tests; never in the hot path.
* ``varint_decode`` — the single vectorized decode (the Spark-side
  analogue of vecshift/maskshift/maskedvbyte,
  /root/reference/lib/src/varint_decode_vecshift.c:4-121): classify
  continuation bits, group bytes by value via cumsum over terminators,
  reassemble 7-bit groups with shifts + reduceat. Includes the shared
  all-1-byte fast path (vecshift.c:23-32).

Domain: the reference is uint32-only (libvarintrvv.h:13-19).  We
generalize to uint64 (10-byte LEB128 max) for epoch-µs timestamps and
int64 keys; for uint32 inputs the byte stream is identical to the
reference's.
"""

from __future__ import annotations

import numpy as np

# Thresholds at which a value needs one more LEB128 byte:
# value < 2**(7*k) fits in k bytes (varint_encode.c:11,16,23,32 for k=1..4).
_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Minimal LEB128 byte count per value (1..10 for uint64, 1..5 for uint32)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return (np.searchsorted(_THRESHOLDS, v, side="right") + 1).astype(np.int64)


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Encode an unsigned integer array into one LEB128 byte stream.

    Returns a 1-D uint8 array.  Vectorized: one pass per byte *level*
    (max 10), each pass a masked scatter — the transpose of the
    reference's per-value loop (varint_encode.c:4-58).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = varint_byte_lengths(v)
    offsets = np.empty(n, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.empty(total, dtype=np.uint8)
    # level 0 writes every value; higher levels shrink to the values
    # that still have bytes (progressive subset — the numpy analogue of
    # the reference's early-out per byte-level, maskshift.c:186-210)
    lvl0 = (v & np.uint64(0x7F)).astype(np.uint8)
    lvl0 |= (nbytes > 1).astype(np.uint8) << 7
    out[offsets] = lvl0
    idx = np.flatnonzero(nbytes > 1)
    k = 1
    while idx.size:
        vv = ((v[idx] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        more = nbytes[idx] > k + 1
        vv |= more.astype(np.uint8) << 7
        out[offsets[idx] + k] = vv
        idx = idx[more]
        k += 1
    return out


def varint_decode(buf: np.ndarray, out_dtype=np.uint64) -> np.ndarray:
    """Decode a LEB128 byte stream into an unsigned integer array.

    The vectorized twin of varint_decode_vecshift.c:4-121.  The buffer
    must end on a varint boundary (same contract as the reference:
    decoders only ever see buffers our encoder produced).
    """
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=out_dtype)
    cont = buf >= 0x80
    # Fast path: whole window is 1-byte values (vecshift.c:23-32).
    if not cont.any():
        return buf.astype(out_dtype)
    ends = np.flatnonzero(~cont)  # terminator byte = last byte of a value
    if ends.size == 0 or ends[-1] != buf.size - 1:
        raise ValueError("truncated varint stream (no terminator at end)")
    # Backward accumulation from each terminator: res = (res<<7) | byte,
    # walking toward the value's first byte; the active set shrinks to
    # only still-multi-byte values each round — the numpy transpose of
    # the reference's early-out per byte-level (vecshift.c:68-71,
    # maskshift.c:186-210).  Two measured wins over the naive version
    # (interleaved A/B in BENCH/KERNELS.md, 1.3-1.7x):
    # * a value active at round k is always reading byte ends-k, so no
    #   per-round position array to gather/scatter;
    # * when the caller's dtype fits 32 bits (≤5-byte varints), the
    #   accumulator runs in uint32 — half the memory traffic.
    acc_dt = (np.uint32 if np.dtype(out_dtype).itemsize <= 4
              else np.uint64)
    max_rounds = 4 if acc_dt == np.uint32 else 9
    # max-length varints carry only the accumulator's leftover bits in
    # their top byte (4 for uint32, 1 for uint64 — encoder contract
    # /root/reference/lib/src/varint_encode.c:53); anything larger
    # would silently wrap modulo 2^width, so it must raise instead
    top_limit = np.uint8(0x0F) if acc_dt == np.uint32 else np.uint8(0x01)
    res = buf[ends].astype(acc_dt)
    idx = np.flatnonzero((ends >= 1) & cont[np.maximum(ends - 1, 0)])
    k = 1
    while idx.size:
        if k > max_rounds:
            raise ValueError(
                f"varint longer than {max_rounds + 1} bytes (malformed "
                f"stream for {np.dtype(out_dtype)})")
        pi = ends[idx] - k
        if k == max_rounds and (buf[ends[idx]] > top_limit).any():
            # values still active at the final round are max-length;
            # their terminator (the MOST significant 7-bit group) must
            # fit the accumulator's leftover bits
            raise ValueError(
                f"varint overflows {np.dtype(out_dtype)}: top byte of a "
                f"{max_rounds + 1}-byte varint exceeds "
                f"0x{int(top_limit):02X}")
        res[idx] = (res[idx] << acc_dt(7)) | (buf[pi] & np.uint8(0x7F))
        nxt = pi - 1
        keep = nxt >= 0
        idx = idx[keep]
        idx = idx[cont[nxt[keep]]]
        k += 1
    return res.astype(out_dtype, copy=False)


def varint_decode_gather(buf: np.ndarray, out_dtype=np.uint64,
                         max_len: int = 10) -> np.ndarray:
    """Masked-VByte-style branch-free decode (K6 parity kernel).

    The reference's masked_vbyte
    (/root/reference/lib/src/varint_decode_maskedvbyte.c:26-97) turns
    the continuation-bit mask into a 4096-entry pshufb LUT that
    *expands* each value's bytes into fixed lanes, then combines lanes
    with fixed shifts — no data-dependent branches.  numpy has real
    gather indexing, so the LUT's shuffle control collapses to index
    arithmetic: lane k of value i is buf[starts[i] + k], masked by
    k < len[i]; the combine is the same fixed-shift OR tree.

    Measured (BENCH/KERNELS.md round-2 history): the (n × max_len)
    gather is 5-9× slower than the active-set kernel on this host at
    every continuation density, so `varint_decode` stays the default —
    this kernel exists for algorithmic parity with the reference and is
    oracle-tested to bit-identity.
    """
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    n = buf.size
    if n == 0:
        return np.empty(0, dtype=out_dtype)
    cont = buf >= 0x80
    if not cont.any():
        return buf.astype(out_dtype)
    ends = np.flatnonzero(~cont)
    if ends[-1] != n - 1:
        raise ValueError("truncated varint stream (no terminator at end)")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    if int(lens.max()) > max_len:
        raise ValueError(f"varint longer than {max_len} bytes")
    width = int(lens.max())
    acc_dt = (np.uint32 if np.dtype(out_dtype).itemsize <= 4
              and width <= 5 else np.uint64)
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = np.arange(width)[None, :] < lens[:, None]
    lanes = buf[np.minimum(idx, n - 1)].astype(acc_dt)
    lanes &= acc_dt(0x7F)
    lanes *= valid
    # same top-byte overflow guard as the active-set kernel
    full_w = 5 if np.dtype(out_dtype).itemsize <= 4 else 10
    if width == full_w:
        limit = 0x0F if full_w == 5 else 0x01
        if (lanes[:, full_w - 1] > limit).any():
            raise ValueError(
                f"varint overflows {np.dtype(out_dtype)}: top byte of a "
                f"{full_w}-byte varint exceeds 0x{limit:02X}")
    res = lanes[:, 0].copy()
    for k in range(1, width):
        res |= lanes[:, k] << acc_dt(7 * k)
    return res.astype(out_dtype, copy=False)


def varint_decode_scalar(buf, out_dtype=np.uint64):
    """Golden scalar oracle (tests only).

    Faithful re-expression of ReadVarint32FromArray
    (/root/reference/lib/src/varint_decode_scalar.c:4-53): add each raw
    byte shifted by 7k, subtract the continuation bit's contribution
    (0x80 << 7k) when the next byte exists — arithmetically identical
    to masking with 0x7F, which is what ``varint_decode`` does.
    """
    buf = bytes(bytearray(np.asarray(buf, dtype=np.uint8).tobytes()))
    out = []
    i = 0
    n = len(buf)
    while i < n:
        result = 0
        shift = 0
        while True:
            b = buf[i]
            result += b << shift
            i += 1
            if b < 0x80:
                break
            result -= 0x80 << shift
            shift += 7
            if shift > 63:
                raise ValueError("malformed varint")
        out.append(result)
    return np.array(out, dtype=out_dtype)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 so small magnitudes get short varints."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(values, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))

"""Composite / container codecs: RAW, ZSTD, DICT, RLE.

SURVEY.md §2.4 codec family.  Varlen (string/binary) heavy lifting is
done by pyarrow compute kernels (dictionary_encode, not_equal) — C++
vectorized, zero per-row Python — matching the north_rule's
"mapInArrow/pandas UDFs over numpy bitwise ops" discipline.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import blob as B
from .varint import varint_decode, varint_encode

_U64 = struct.Struct("<Q")


def _frame(b: bytes) -> bytes:
    return _U64.pack(len(b)) + b


def _unframe(mv: memoryview, pos: int) -> tuple:
    (ln,) = _U64.unpack_from(mv, pos)
    start = pos + _U64.size
    return mv[start:start + ln], start + ln


# --- varlen ⟷ pyarrow bridges (zero-copy) ---

def varlen_to_pa(va: B.VarlenArray) -> pa.Array:
    return pa.Array.from_buffers(
        pa.large_binary(), len(va),
        [None, pa.py_buffer(np.ascontiguousarray(va.offsets)),
         pa.py_buffer(np.ascontiguousarray(va.data))])


def pa_to_varlen(arr: pa.Array) -> B.VarlenArray:
    """LargeBinary/Binary/String Arrow array → VarlenArray (handles offsets).

    ZERO-COPY on the data buffer: frombuffer keeps the Arrow buffer
    alive via refcount and returns a read-only view — VarlenArray
    values are immutable by contract (same as dec_raw's views), and
    the old defensive .copy() was ~10% of the whole encode kernel on
    a web-page chunk (BENCH/KERNELS.md r5 profile)."""
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    bufs = arr.buffers()
    raw_off = np.frombuffer(bufs[1], dtype=np.int64,
                            count=arr.offset + n + 1)[arr.offset:]
    base = int(raw_off[0])
    offsets = raw_off - base  # fresh int64 array — no further copy
    total = int(offsets[-1])
    if bufs[2] is not None and total:
        data = np.frombuffer(bufs[2], dtype=np.uint8,
                             count=base + total)[base:]
    else:
        data = np.empty(0, dtype=np.uint8)
    return B.VarlenArray(offsets=offsets, data=data)


# --- RAW (codec 0): dumb baseline / zstd carrier ---
# numeric payload: values.tobytes()
# varlen payload:  offsets int64[n+1] | data

def _raw_inner_blob(values, dtype_code: int) -> np.ndarray:
    """Full RAW blob (header+payload) assembled with one memcpy pass.

    np.empty, not bytearray(n): bytearray zero-fills its allocation,
    which for the zstd carrier path meant a full extra pass over
    hundreds of MB of html/text bytes per chunk (r6 profile: ~10% of
    the pages encode kernel).  Returns a writable uint8 ndarray —
    buffer-protocol-compatible with every consumer (py_buffer,
    memoryview, bytes())."""
    n = len(values)
    if B.is_varlen(dtype_code):
        offs = np.ascontiguousarray(values.offsets, dtype="<i8")
        data = np.ascontiguousarray(values.data)
        buf = np.empty(B.HEADER_LEN + offs.nbytes + data.nbytes,
                       dtype=np.uint8)
        B.HEADER.pack_into(buf, 0, B.RAW, dtype_code, n)
        buf[B.HEADER_LEN:B.HEADER_LEN + offs.nbytes] = offs.view(np.uint8)
        buf[B.HEADER_LEN + offs.nbytes:] = data
        return buf
    arr = np.ascontiguousarray(values, dtype=B.NUMERIC_NP[dtype_code])
    buf = np.empty(B.HEADER_LEN + arr.nbytes, dtype=np.uint8)
    B.HEADER.pack_into(buf, 0, B.RAW, dtype_code, n)
    buf[B.HEADER_LEN:] = arr.view(np.uint8).reshape(-1)
    return buf


def enc_raw(values, dtype_code: int) -> bytes:
    return bytes(memoryview(_raw_inner_blob(values, dtype_code))
                 [B.HEADER_LEN:])


def dec_raw(payload, n: int, dtype_code: int):
    # zero-copy views: frombuffer keeps the payload alive via refcount,
    # and every decode consumer treats values as immutable
    if B.is_varlen(dtype_code):
        offsets = np.frombuffer(payload, dtype="<i8",
                                count=n + 1).astype(np.int64)
        data = np.frombuffer(payload, dtype=np.uint8, offset=(n + 1) * 8)
        return B.VarlenArray(offsets=offsets, data=data)
    np_dt = B.NUMERIC_NP[dtype_code]
    return np.frombuffer(payload, dtype=np_dt, count=n)


# --- ZSTD (codec 6): wraps an inner blob ---
# payload = inner_uncompressed_len:u64 | zstd(inner_blob)

# level 2 beats Arrow's default (level 1) on BOTH axes for web text
# measured SOLO single-core (html 0.351 vs 0.335 GB/s AND 3.54x vs
# 3.33x, interleaved min-of-7) — but see BENCH/KERNELS.md r5 for the
# parallel-contention A/B that picked the default.  Decode reads any
# level (zstd frames are self-describing), so stored blobs stay
# compatible and the knob is safe to tune per deployment.
import os as _os

_ZSTD_LEVEL = int(_os.environ.get("SPARK_GRAFT_ZSTD_LEVEL", "2"))
_ZSTD = pa.Codec("zstd", compression_level=_ZSTD_LEVEL)


def enc_zstd(values, dtype_code: int, inner_codec: int = B.RAW) -> bytes:
    if inner_codec == B.RAW:
        inner = _raw_inner_blob(values, dtype_code)  # single-copy path
    else:
        inner = B.encode_blob(inner_codec, dtype_code, values)
    comp = _ZSTD.compress(pa.py_buffer(inner), asbytes=True)
    return _U64.pack(len(inner)) + comp


def dec_zstd(payload, n: int, dtype_code: int):
    mv = memoryview(payload)
    (raw_len,) = _U64.unpack_from(mv, 0)
    inner = pa.decompress(mv[_U64.size:], decompressed_size=raw_len,
                          codec="zstd", asbytes=True)
    values, _, inner_dt = B.decode_blob(inner)
    if inner_dt != dtype_code:
        raise ValueError("zstd inner dtype mismatch")
    return values


# --- SPLIT (codec 9): byte-stream split + zstd for true floats ---
# payload = itemsize:u8 | raw_len:u64 | zstd(byte-plane-transposed data)
# The byte-plane transpose (plane k = byte k of every value) groups
# same-significance bytes — exponents/high-mantissa bytes of similar
# floats compress far better together than interleaved (the public
# Parquet BYTE_STREAM_SPLIT encoding).  Pure byte permutation:
# bit-exact for every value including NaN/±0.0/inf.

def enc_split(values, dtype_code: int) -> bytes:
    if B.is_varlen(dtype_code):
        raise TypeError("split is a fixed-width codec")
    v = np.ascontiguousarray(values, dtype=B.NUMERIC_NP[dtype_code])
    item = v.dtype.itemsize
    planes = v.view(np.uint8).reshape(-1, item).T.copy()
    raw = planes.tobytes()
    comp = _ZSTD.compress(pa.py_buffer(raw), asbytes=True)
    return bytes([item]) + _U64.pack(len(raw)) + comp


def dec_split(payload, n: int, dtype_code: int):
    mv = memoryview(payload)
    if len(mv) < 1 + _U64.size:
        raise ValueError("truncated split payload")
    item = mv[0]
    np_dt = B.NUMERIC_NP[dtype_code]
    if item != np_dt.itemsize:
        raise ValueError(f"split itemsize {item} != dtype {np_dt}")
    (raw_len,) = _U64.unpack_from(mv, 1)
    raw = pa.decompress(mv[1 + _U64.size:], decompressed_size=raw_len,
                        codec="zstd", asbytes=True)
    planes = np.frombuffer(raw, dtype=np.uint8).reshape(item, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(np_dt).copy()


# --- DICT (codec 3) ---
# payload = frame(codes_blob) | frame(values_blob)
# codes: uint32 positions into the unique-values blob, BITPACKed;
# numeric uniques are sorted → DELTA_VARINT shines on them.

def _float_bits_view(values: np.ndarray, dtype_code: int):
    """Bijective integer view of float values so -0.0/+0.0 and distinct
    NaN payloads stay distinct (bit-identity contract)."""
    np_dt = B.NUMERIC_NP[dtype_code]
    u = np.dtype(f"<u{np_dt.itemsize}")
    return np.ascontiguousarray(values, dtype=np_dt).view(u)


def dict_parts(values, dtype_code: int):
    """Return (codes uint32 ndarray, unique values) — vectorized."""
    if B.is_varlen(dtype_code):
        arr = varlen_to_pa(values)
        denc = arr.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint32)
        uniq = pa_to_varlen(denc.dictionary)
        return codes, uniq
    v = np.ascontiguousarray(values)
    if B.NUMERIC_NP[dtype_code].kind == "f":
        # dedupe on bit patterns: NaN != NaN and -0.0 == 0.0 under
        # float compare would otherwise break bit-exact reconstruction
        bits = _float_bits_view(v, dtype_code)
        uniq_bits, inv = np.unique(bits, return_inverse=True)
        uniq = uniq_bits.view(B.NUMERIC_NP[dtype_code])
        return inv.astype(np.uint32), uniq
    uniq, inv = np.unique(v, return_inverse=True)
    return inv.astype(np.uint32), uniq


def enc_dict(values, dtype_code: int) -> bytes:
    codes, uniq = dict_parts(values, dtype_code)
    codes_blob = B.encode_blob(B.BITPACK, B.DT_U32, codes)
    if B.is_varlen(dtype_code):
        values_blob = B.encode_blob(B.ZSTD, dtype_code, uniq)
    elif B.NUMERIC_NP[dtype_code].kind == "f":
        values_blob = B.encode_blob(B.RAW, dtype_code, uniq)
    else:
        values_blob = B.encode_blob(B.DELTA_VARINT, dtype_code, uniq)
    return _frame(codes_blob) + _frame(values_blob)


def dec_dict(payload, n: int, dtype_code: int):
    mv = memoryview(payload)
    codes_blob, pos = _unframe(mv, 0)
    values_blob, _ = _unframe(mv, pos)
    codes = B.decode_values(codes_blob).astype(np.int64)
    uniq = B.decode_values(values_blob)
    if B.is_varlen(dtype_code):
        return uniq.take(codes)
    return uniq[codes]


# --- RLE (codec 4) ---
# payload = frame(run_lengths_blob: VARINT u64) | frame(run_values_blob)

def run_bounds(values, dtype_code: int) -> np.ndarray:
    """Boolean change[i] = values[i+1] != values[i], vectorized."""
    n = len(values)
    if n <= 1:
        return np.zeros(0, dtype=bool)
    if B.is_varlen(dtype_code):
        arr = varlen_to_pa(values)
        ne = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        return ne.to_numpy(zero_copy_only=False).astype(bool)
    v = np.ascontiguousarray(values)
    if B.NUMERIC_NP[dtype_code].kind == "f":
        v = _float_bits_view(v, dtype_code)  # bit-exact run detection
    return v[1:] != v[:-1]


def enc_rle(values, dtype_code: int) -> bytes:
    n = len(values)
    if n == 0:
        return _frame(B.encode_blob(B.VARINT, B.DT_U64,
                                    np.empty(0, dtype=np.uint64))) + \
            _frame(B.encode_blob(B.RAW, dtype_code, values))
    change = run_bounds(values, dtype_code)
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    lens = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
    if B.is_varlen(dtype_code):
        run_vals = values.take(starts)
        values_blob = B.encode_blob(B.ZSTD, dtype_code, run_vals)
    else:
        run_vals = np.ascontiguousarray(values)[starts]
        if B.NUMERIC_NP[dtype_code].kind == "f":
            values_blob = B.encode_blob(B.RAW, dtype_code, run_vals)
        else:
            values_blob = B.encode_blob(B.BITPACK, dtype_code, run_vals)
    lens_blob = B.encode_blob(B.VARINT, B.DT_U64, lens)
    return _frame(lens_blob) + _frame(values_blob)


def dec_rle(payload, n: int, dtype_code: int):
    mv = memoryview(payload)
    lens_blob, pos = _unframe(mv, 0)
    values_blob, _ = _unframe(mv, pos)
    lens = B.decode_values(lens_blob).astype(np.int64)
    run_vals = B.decode_values(values_blob)
    if int(lens.sum()) != n:
        raise ValueError("rle length mismatch")
    idx = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    if B.is_varlen(dtype_code):
        return run_vals.take(idx)
    return run_vals[idx]


def register_all() -> None:
    B.register(B.RAW, enc_raw, dec_raw)
    B.register(B.ZSTD, enc_zstd, dec_zstd)
    B.register(B.DICT, enc_dict, dec_dict)
    B.register(B.RLE, enc_rle, dec_rle)
    B.register(B.SPLIT, enc_split, dec_split)

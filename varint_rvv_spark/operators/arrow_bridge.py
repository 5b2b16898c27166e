"""Arrow ⟷ codec-values bridge used inside mapInArrow kernels.

The Arrow RecordBatch is the engine's "vector register window"
(SURVEY.md §1.2): one JVM⟷Python crossing per batch, numpy/pyarrow
vector ops inside, zero per-row Python.

Null handling: the reference domain has no nulls
(/root/reference/lib/include/libvarintrvv.h:13-19), but real tables do.
We carry the validity bitmap out-of-band: values are encoded with
nulls filled (0 / empty), and each chunk row stores a packed validity
bitmap (empty bytes ⇒ no nulls), restored on decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..codecs import blob as B
from ..codecs.composite import pa_to_varlen, varlen_to_pa

# logical type tags persisted in the footer so decode can reconstruct
# the exact Arrow/Spark type from the physical dtype_code
LT_TIMESTAMP_US = "timestamp_us"
LT_NARROW_INT = "narrow_int"
LT_PLAIN = "plain"

_NARROW_PA = {"int8": pa.int8(), "int16": pa.int16(),
              "uint8": pa.uint8(), "uint16": pa.uint16()}


def arrow_to_values(arr: pa.Array):
    """Arrow array → (values, dtype_code, logical_type, validity_bytes).

    values is a numpy array or VarlenArray with nulls filled;
    validity_bytes is b"" when there are no nulls, else a
    little-endian packed bitmap (1 = valid).
    """
    validity = b""
    if arr.null_count:
        mask = arr.is_valid().to_numpy(zero_copy_only=False).astype(bool)
        validity = np.packbits(mask.view(np.uint8), bitorder="little").tobytes()
        arr = arr.fill_null(_null_fill(arr.type))
    t = arr.type
    logical = LT_PLAIN
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            arr = arr.cast(pa.timestamp("us", tz=t.tz))
        arr = arr.cast(pa.int64())
        # carry the tz so decode rebuilds the exact arrow type — a
        # naive reconstruction would be re-interpreted as session-local
        # wall time in non-UTC sessions (silent value shift)
        logical = (f"{LT_TIMESTAMP_US}:{t.tz}" if t.tz
                   else LT_TIMESTAMP_US)
        return arr.to_numpy(zero_copy_only=False), B.DT_I64, logical, validity
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        code = {
            pa.int32(): B.DT_I32, pa.int64(): B.DT_I64,
            pa.uint32(): B.DT_U32, pa.uint64(): B.DT_U64,
            pa.float32(): B.DT_F32, pa.float64(): B.DT_F64,
        }.get(t)
        if code is None:  # narrow ints: encode widened, remember type
            if str(t) not in _NARROW_PA:
                raise TypeError(f"unsupported integer arrow type {t}")
            logical = f"{LT_NARROW_INT}:{t}"
            arr = arr.cast(pa.int64())
            code = B.DT_I64
        return arr.to_numpy(zero_copy_only=False), code, logical, validity
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa_to_varlen(arr), B.DT_STR, logical, validity
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa_to_varlen(arr), B.DT_BIN, logical, validity
    raise TypeError(f"unsupported arrow type {t}")


def _null_fill(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_timestamp(t):
        return 0
    return 0


def values_to_arrow(values, dtype_code: int, logical: str,
                    validity: bytes) -> pa.Array:
    """Inverse of arrow_to_values (bit-identical reconstruction)."""
    if B.is_varlen(dtype_code):
        arr = varlen_to_pa(values)
        if dtype_code == B.DT_STR:
            arr = arr.cast(pa.large_string())
    else:
        arr = pa.array(values)
    if logical == LT_TIMESTAMP_US:
        arr = arr.cast(pa.timestamp("us"))
    elif logical.startswith(LT_TIMESTAMP_US + ":"):
        arr = arr.cast(pa.timestamp(
            "us", tz=logical.split(":", 1)[1]))
    elif logical.startswith(LT_NARROW_INT + ":"):
        arr = arr.cast(_NARROW_PA[logical.split(":", 1)[1]])
    if validity:
        n = len(arr)
        mask = np.unpackbits(np.frombuffer(validity, dtype=np.uint8),
                             count=n, bitorder="little").astype(bool)
        arr = pa.compute.if_else(pa.array(mask), arr, pa.nulls(n, arr.type))
    return arr


def raw_nbytes(values, dtype_code: int) -> int:
    if B.is_varlen(dtype_code):
        return int(values.nbytes)
    return int(np.ascontiguousarray(values).nbytes)


def values_sha256(values, dtype_code: int) -> str:
    """Layout-independent content hash — the bit-identity witness.

    Varlen hashes (lengths || data) so the hash is invariant to offset
    rebasing; numeric hashes the little-endian value bytes.
    """
    h = hashlib.sha256()
    if B.is_varlen(dtype_code):
        h.update(np.ascontiguousarray(values.lengths(), dtype="<i8").data)
        h.update(np.ascontiguousarray(values.data).data)
    else:
        arr = np.ascontiguousarray(values)
        if arr.dtype.byteorder == ">":  # never on this platform, but exact
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        h.update(arr.data)
    return h.hexdigest()

"""LIST codec (codec 10): list<numeric|string|binary> columns via
decomposition.

The reference kernel is a flat uint32 stream
(/root/reference/lib/include/libvarintrvv.h:13-19); nested columns are
our generalization, done the standard columnar way: a list column is
ONE flattened child values stream plus per-row lengths.  Both streams
then reuse the existing codec stack with auto-selection:

* lengths — int64, tiny domain → RLE/bitpack/varint (a fixed-dim
  embedding column costs ~a dozen bytes of lengths per chunk);
* child   — numeric: float32/64 → SPLIT/SCALED/zstd, ints →
  varint/delta/bitpack/dict; string/binary (token/tag lists) →
  zstd/dict/FSST via the varlen stack.  Deeper nesting
  (list<list<...>>, list<struct<...>>) routes through the STRUCT/MAP
  container codecs instead.

payload = child_dtype:u8 | frame(lengths_blob) | frame(child_blob)
"""

from __future__ import annotations

import numpy as np

from . import blob as B
from .composite import _frame, _unframe


def enc_list(values: B.ListValues, dtype_code: int) -> bytes:
    if dtype_code != B.DT_LIST:
        raise TypeError("LIST codec applies only to DT_LIST values")
    from .select import encode_auto

    lens = np.ascontiguousarray(values.lengths(), dtype=np.int64)
    lens_blob, _, _ = encode_auto(lens, B.DT_I64)
    if B.is_varlen(values.child_dtype):
        child = values.child  # VarlenArray (list<string>/list<binary>)
    else:
        child = np.ascontiguousarray(
            values.child, dtype=B.NUMERIC_NP[values.child_dtype])
    child_blob, _, _ = encode_auto(child, values.child_dtype)
    return (bytes([values.child_dtype]) + _frame(lens_blob)
            + _frame(child_blob))


def dec_list(payload, n: int, dtype_code: int) -> B.ListValues:
    mv = memoryview(payload)
    child_dtype = mv[0]
    lens_blob, pos = _unframe(mv, 1)
    child_blob, _ = _unframe(mv, pos)
    lens = np.asarray(B.decode_values(lens_blob), dtype=np.int64)
    if lens.shape[0] != n:
        raise ValueError("list lengths count mismatch")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    child = B.decode_values(child_blob)
    if not B.is_varlen(child_dtype):
        child = np.asarray(child, dtype=B.NUMERIC_NP[child_dtype])
    if len(child) != int(offsets[-1]):
        raise ValueError("list child length mismatch")
    return B.ListValues(offsets=offsets, child=child,
                        child_dtype=int(child_dtype))


def register_all() -> None:
    B.register(B.LIST, enc_list, dec_list)

"""LIST codec (codec 10): list<T> columns via decomposition.

The reference kernel is a flat uint32 stream
(/root/reference/lib/include/libvarintrvv.h:13-19); nested columns are
our generalization, done the standard columnar way: a list column is
ONE flattened child values stream plus per-row lengths.  Both streams
then reuse the existing codec stack with auto-selection:

* lengths — int64, tiny domain → RLE/bitpack/varint (a fixed-dim
  embedding column costs ~a dozen bytes of lengths per chunk);
* child   — numeric: float32/64 → SPLIT/SCALED/zstd, ints →
  varint/delta/bitpack/dict; string/binary (token/tag lists) →
  zstd/dict/FSST via the varlen stack; struct/list/map and
  logical-typed children (timestamp/date/bool/decimal/narrow-int,
  or any child with element nulls) recurse through encode_auto with
  the same tagged-child framing the STRUCT/MAP codecs use, so
  list<struct<...>> token-annotation columns and list<list<...>>
  compose for free.

payloads (high bit of the first byte discriminates):
  plain:  child_dtype:u8        | frame(lengths_blob) | frame(child_blob)
  tagged: child_dtype|0x80 : u8 | frame(lengths_blob) |
          frame(logical) | frame(validity) | frame(child_blob)
"""

from __future__ import annotations

import numpy as np

from . import blob as B
from .composite import _frame, _unframe

_TAGGED = 0x80


def enc_list(values: B.ListValues, dtype_code: int) -> bytes:
    if dtype_code != B.DT_LIST:
        raise TypeError("LIST codec applies only to DT_LIST values")
    from .select import encode_auto

    lens = np.ascontiguousarray(values.lengths(), dtype=np.int64)
    lens_blob, _, _ = encode_auto(lens, B.DT_I64)
    tagged = (values.child_validity or values.child_logical != "plain"
              or B.is_nested(values.child_dtype))
    if tagged:
        child_blob, _, _ = encode_auto(values.child, values.child_dtype)
        return (bytes([values.child_dtype | _TAGGED])
                + _frame(lens_blob)
                + _frame(values.child_logical.encode("utf-8"))
                + _frame(values.child_validity)
                + _frame(child_blob))
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
    tagged = bool(mv[0] & _TAGGED)
    child_dtype = mv[0] & ~_TAGGED
    lens_blob, pos = _unframe(mv, 1)
    logical, validity = "plain", b""
    if tagged:
        log_b, pos = _unframe(mv, pos)
        try:
            logical = bytes(log_b).decode("utf-8")
        except UnicodeDecodeError as e:
            # corrupt/truncated payloads surface in the same
            # ValueError family as every other malformed-payload path
            raise ValueError(
                f"list payload: bad logical tag ({e})") from e
        val_b, pos = _unframe(mv, pos)
        validity = bytes(val_b)
    child_blob, _ = _unframe(mv, pos)
    lens = np.asarray(B.decode_values(lens_blob), dtype=np.int64)
    if lens.shape[0] != n:
        raise ValueError("list lengths count mismatch")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    child = B.decode_values(child_blob)
    if not B.is_varlen(child_dtype) and not B.is_nested(child_dtype):
        child = np.asarray(child, dtype=B.NUMERIC_NP[child_dtype])
    if len(child) != int(offsets[-1]):
        raise ValueError("list child length mismatch")
    return B.ListValues(offsets=offsets, child=child,
                        child_dtype=int(child_dtype),
                        child_logical=logical, child_validity=validity)


def register_all() -> None:
    B.register(B.LIST, enc_list, dec_list)

"""STRUCT (codec 11) and MAP (codec 12): nested columns via recursive
per-stream decomposition.

The reference kernel is a flat uint32 stream
(/root/reference/lib/include/libvarintrvv.h:13-19); nested types are
our generalization, done the standard columnar way (Parquet/Dremel
shredding, without repetition levels since Arrow carries offsets):

* struct<...> → one independent stream per field, each auto-selected
  (a struct of (id, score) costs a delta-varint stream + a SCALED
  stream, not a row-wise blob);
* map<k,v>   → per-row entry counts (varint/RLE) + flattened key and
  item streams.

Children recurse through encode_auto, so struct-of-list,
map<string, array<float>> etc. compose for free.  Each child embeds
its logical-type tag and validity bitmap (the nested twin of the
footer's logical_type/validity columns).

payloads:
  STRUCT: n_fields:u16 | per field:
          frame(name) | frame(logical) | frame(validity) | frame(blob)
  MAP:    frame(lengths_blob) | 2 × (frame(logical) | frame(validity)
          | frame(blob))          (keys stream, then items stream)
"""

from __future__ import annotations

import struct

import numpy as np

from . import blob as B
from .composite import _frame, _unframe

_U16 = struct.Struct("<H")


def _frame_child(c: B.ChildCol) -> bytes:
    from .select import encode_auto

    blob, _, _ = encode_auto(c.values, c.dtype_code)
    return (_frame(c.logical.encode("utf-8")) + _frame(c.validity)
            + _frame(blob))


def _unframe_child(mv, pos: int):
    logical, pos = _unframe(mv, pos)
    validity, pos = _unframe(mv, pos)
    blob, pos = _unframe(mv, pos)
    values, _, dt = B.decode_blob(blob)
    return B.ChildCol(values=values, dtype_code=dt,
                      logical=bytes(logical).decode("utf-8"),
                      validity=bytes(validity)), pos


def enc_struct(values: B.StructValues, dtype_code: int) -> bytes:
    if dtype_code != B.DT_STRUCT:
        raise TypeError("STRUCT codec applies only to DT_STRUCT values")
    out = [_U16.pack(len(values.names))]
    for name, child in zip(values.names, values.children):
        out.append(_frame(name.encode("utf-8")))
        out.append(_frame_child(child))
    return b"".join(out)


def dec_struct(payload, n: int, dtype_code: int) -> B.StructValues:
    mv = memoryview(payload)
    (n_fields,) = _U16.unpack_from(mv, 0)
    pos = _U16.size
    names, children = [], []
    for _ in range(n_fields):
        name, pos = _unframe(mv, pos)
        names.append(bytes(name).decode("utf-8"))
        child, pos = _unframe_child(mv, pos)
        if len(child.values) != n:
            raise ValueError("struct field length mismatch")
        children.append(child)
    return B.StructValues(names=names, children=children, n=n)


def enc_map(values: B.MapValues, dtype_code: int) -> bytes:
    if dtype_code != B.DT_MAP:
        raise TypeError("MAP codec applies only to DT_MAP values")
    from .select import encode_auto

    lens = np.ascontiguousarray(values.lengths(), dtype=np.int64)
    lens_blob, _, _ = encode_auto(lens, B.DT_I64)
    return (_frame(lens_blob) + _frame_child(values.keys)
            + _frame_child(values.items))


def dec_map(payload, n: int, dtype_code: int) -> B.MapValues:
    mv = memoryview(payload)
    lens_blob, pos = _unframe(mv, 0)
    lens = np.asarray(B.decode_values(lens_blob), dtype=np.int64)
    if lens.shape[0] != n:
        raise ValueError("map lengths count mismatch")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    keys, pos = _unframe_child(mv, pos)
    items, _ = _unframe_child(mv, pos)
    if len(keys.values) != int(offsets[-1]) \
            or len(items.values) != int(offsets[-1]):
        raise ValueError("map key/item stream length mismatch")
    return B.MapValues(offsets=offsets, keys=keys, items=items)


def register_all() -> None:
    B.register(B.STRUCT, enc_struct, dec_struct)
    B.register(B.MAP, enc_map, dec_map)

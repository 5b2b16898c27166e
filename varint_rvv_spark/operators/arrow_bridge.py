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
LT_DATE32 = "date32"     # stored as int32 day numbers → delta/varint
LT_BOOL = "bool"         # stored as uint8 0/1 → RLE/bitpack
LT_DECIMAL = "decimal"   # "decimal:p:s", unscaled int64 (p ≤ 18)
LT_DECIMAL2 = "decimal2"  # "decimal2:p:s", p > 18: two int64 limb
#                           streams (lo/hi words) via the STRUCT
#                           container — hi is sign-extension runs for
#                           p ≤ 37 magnitudes, so it RLEs to ~nothing
LT_LIST = "list"         # "list:<spark child type, or arrow repr>"
LT_STRUCT = "struct"     # "struct:<spark type>" when nameable;
#                          children carry their own logical tags
LT_MAP = "map"           # "map:<spark type>" when nameable

_NARROW_PA = {"int8": pa.int8(), "int16": pa.int16(),
              "uint8": pa.uint8(), "uint16": pa.uint16()}

# numeric child types a list column may carry (code ⟷ arrow type)
_LIST_CHILD_CODES = {
    pa.int32(): B.DT_I32, pa.int64(): B.DT_I64,
    pa.uint32(): B.DT_U32, pa.uint64(): B.DT_U64,
    pa.float32(): B.DT_F32, pa.float64(): B.DT_F64,
}
_LIST_CHILD_PA = {v: k for k, v in _LIST_CHILD_CODES.items()}


_SIMPLE_SPARK = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "float": "float", "double": "double",
    "bool": "boolean", "date32[day]": "date",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
}


def _spark_type_name(t: pa.DataType) -> str | None:
    """Spark simpleString for an arrow type, or None when Spark has no
    equivalent (unsigned ints).  Makes nested logical tags
    self-describing so evolve.stored_table_schema can name
    array<struct<...>> columns without an explicit schema."""
    if pa.types.is_struct(t):
        parts = []
        for i in range(t.num_fields):
            f = t.field(i)
            cn = _spark_type_name(f.type)
            if cn is None:
                return None
            parts.append(f"{f.name}:{cn}")
        return "struct<" + ",".join(parts) + ">"
    if pa.types.is_map(t):
        k = _spark_type_name(t.key_type)
        v = _spark_type_name(t.item_type)
        return f"map<{k},{v}>" if k and v else None
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        c = _spark_type_name(t.value_type)
        return f"array<{c}>" if c else None
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz else "timestamp_ntz"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return _SIMPLE_SPARK.get(str(t))


def _validity_of(arr: pa.Array) -> bytes:
    if not arr.null_count:
        return b""
    mask = arr.is_valid().to_numpy(zero_copy_only=False).astype(bool)
    return np.packbits(mask.view(np.uint8), bitorder="little").tobytes()


def _struct_to_values(arr: pa.StructArray):
    """struct<...> → per-field ChildCol streams (recursive).  Parent
    validity rides the usual footer bitmap; Arrow struct children are
    fully materialized under null parents, so no fill is needed."""
    validity = _validity_of(arr)
    names, children = [], []
    for i in range(arr.type.num_fields):
        names.append(arr.type.field(i).name)
        v, dt, logical, cv = arrow_to_values(arr.field(i))
        children.append(B.ChildCol(values=v, dtype_code=dt,
                                   logical=logical, validity=cv))
    sv = B.StructValues(names=names, children=children, n=len(arr))
    sn = _spark_type_name(arr.type)
    logical = f"{LT_STRUCT}:{sn}" if sn else LT_STRUCT
    return sv, B.DT_STRUCT, logical, validity


def _map_to_values(arr: pa.MapArray):
    """map<k,v> → per-row entry counts + flattened key/item streams.

    Null rows keep their validity bitmap; if a writer gave a null row
    a nonzero entry range (legal in Arrow), the entries are compacted
    out so decode's zero-length reconstruction is exact.
    """
    validity = _validity_of(arr)
    raw_off = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    base = int(raw_off[0])
    offsets = (raw_off - base).astype(np.int64)
    n = len(arr)
    keys = arr.keys.slice(base, int(offsets[-1]))
    items = arr.items.slice(base, int(offsets[-1]))
    if validity:
        valid = _unpack_validity(validity, n)
        lens = np.diff(offsets)
        if (lens[~valid] != 0).any():
            lens = lens.copy()
            lens[~valid] = 0
            new_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=new_off[1:])
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            within = np.arange(int(new_off[-1]), dtype=np.int64) \
                - new_off[row_ids]
            src = offsets[:-1][row_ids] + within
            keys = keys.take(pa.array(src))
            items = items.take(pa.array(src))
            offsets = new_off
    kv, kdt, klog, kval = arrow_to_values(keys)
    iv, idt, ilog, ival = arrow_to_values(items)
    mv_ = B.MapValues(
        offsets=offsets,
        keys=B.ChildCol(kv, kdt, klog, kval),
        items=B.ChildCol(iv, idt, ilog, ival))
    sn = _spark_type_name(arr.type)
    logical = f"{LT_MAP}:{sn}" if sn else LT_MAP
    return mv_, B.DT_MAP, logical, validity


def _list_to_values(arr: pa.Array) -> B.ListValues:
    """list/large_list/fixed_size_list<T> → ListValues (flattened
    child stream + offsets).

    Numeric and string/binary children take the direct fast paths
    (payloads stay byte-identical to the pre-nested format); every
    other child type — struct, list, map, timestamp, date, bool,
    decimal, narrow int — recurses through arrow_to_values, carrying
    the child's logical tag and element-level validity bitmap."""
    from ..codecs.composite import pa_to_varlen

    vt = arr.type.value_type
    code = _LIST_CHILD_CODES.get(vt)
    simple_varlen = (pa.types.is_string(vt) or pa.types.is_large_string(vt)
                     or pa.types.is_binary(vt)
                     or pa.types.is_large_binary(vt))
    arr = arr.cast(pa.large_list(vt))
    raw_off = arr.offsets.to_numpy(zero_copy_only=False)
    base = int(raw_off[0])
    offsets = (raw_off - base).astype(np.int64)
    child = arr.values.slice(base, int(offsets[-1]))
    if (code is None and not simple_varlen) or child.null_count:
        # general child: recurse — element nulls ride the child's own
        # validity bitmap, exactly like any top-level column's (this
        # also lifts the old hard error on null numeric/string
        # elements)
        cv, cdt, clog, cval = arrow_to_values(child)
        return B.ListValues(offsets=offsets, child=cv, child_dtype=cdt,
                            child_logical=clog, child_validity=cval)
    if code is None:  # varlen child: tokens/tags lists
        is_str = (pa.types.is_string(vt)
                  or pa.types.is_large_string(vt))
        code = B.DT_STR if is_str else B.DT_BIN
        child_vals = pa_to_varlen(child.combine_chunks()
                                  if isinstance(child, pa.ChunkedArray)
                                  else child)
    else:
        child_vals = child.to_numpy(zero_copy_only=False).astype(
            B.NUMERIC_NP[code], copy=False)
    return B.ListValues(offsets=offsets, child=child_vals,
                        child_dtype=code)


def arrow_to_values(arr: pa.Array):
    """Arrow array → (values, dtype_code, logical_type, validity_bytes).

    values is a numpy array or VarlenArray with nulls filled;
    validity_bytes is b"" when there are no nulls, else a
    little-endian packed bitmap (1 = valid).
    """
    if pa.types.is_struct(arr.type):
        return _struct_to_values(arr)   # manages its own validity
    if pa.types.is_map(arr.type):
        return _map_to_values(arr)      # manages its own validity
    if pa.types.is_fixed_size_list(arr.type):
        # a null fixed-size row cannot be filled with [] — widen to a
        # variable-length list first (metadata-level cast)
        arr = arr.cast(pa.large_list(arr.type.value_type))
    validity = _validity_of(arr)
    if validity:
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
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        lv = _list_to_values(arr)
        sn = _spark_type_name(t.value_type)
        # spark-style child name when nameable (self-describing for
        # stored_table_schema); arrow repr otherwise (exact-match only)
        logical = f"{LT_LIST}:{sn or t.value_type}"
        return lv, B.DT_LIST, logical, validity
    if pa.types.is_date32(t):
        # day numbers: sorted dates → 1-2 byte deltas through the
        # existing integer stack
        return (arr.cast(pa.int32()).to_numpy(zero_copy_only=False),
                B.DT_I32, LT_DATE32, validity)
    if pa.types.is_boolean(t):
        return (arr.cast(pa.uint8()).to_numpy(zero_copy_only=False),
                B.DT_U8, LT_BOOL, validity)
    if pa.types.is_decimal(t):
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        buf = arr.buffers()[1]
        raw = np.frombuffer(buf, dtype="<i8",
                            count=(arr.offset + len(arr)) * 2)
        vals = raw[arr.offset * 2::2].copy()
        if t.precision > 18:
            # two-limb encoding: lo (bit pattern) + hi (signed high
            # word) as independent int64 streams through the STRUCT
            # container — bit-exact for the full decimal128 domain
            hi = raw[arr.offset * 2 + 1::2].copy()
            sv = B.StructValues(
                names=["lo", "hi"],
                children=[B.ChildCol(vals, B.DT_I64, LT_PLAIN, b""),
                          B.ChildCol(hi, B.DT_I64, LT_PLAIN, b"")],
                n=len(arr))
            return (sv, B.DT_STRUCT,
                    f"{LT_DECIMAL2}:{t.precision}:{t.scale}", validity)
        # unscaled int64: the low word of the 128-bit little-endian
        # storage (exact for p ≤ 18 since |unscaled| < 10^18 < 2^63)
        return vals, B.DT_I64, f"{LT_DECIMAL}:{t.precision}:{t.scale}", \
            validity
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
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.scalar([], type=t)
    if pa.types.is_boolean(t):
        return False
    return 0


def values_to_arrow(values, dtype_code: int, logical: str,
                    validity: bytes) -> pa.Array:
    """Inverse of arrow_to_values (bit-identical reconstruction)."""
    if logical.startswith(LT_DECIMAL2 + ":"):
        # before the generic STRUCT dispatch: the lo/hi limb streams
        # rebuild a decimal128, not a struct
        _, p, s = logical.split(":")
        arr = _int64_to_decimal(values.children[0].values, int(p),
                                int(s), hi=values.children[1].values)
        if validity:
            n = len(arr)
            mask = _unpack_validity(validity, n)
            arr = pa.compute.if_else(pa.array(mask), arr,
                                     pa.nulls(n, arr.type))
        return arr
    if dtype_code == B.DT_STRUCT:
        return _values_to_struct_arrow(values, validity)
    if dtype_code == B.DT_MAP:
        return _values_to_map_arrow(values, validity)
    if B.is_list(dtype_code):
        return _values_to_list_arrow(values, logical, validity)
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
    elif logical == LT_DATE32:
        arr = arr.cast(pa.date32())
    elif logical == LT_BOOL:
        arr = arr.cast(pa.bool_())
    elif logical.startswith(LT_DECIMAL + ":"):
        _, p, s = logical.split(":")
        arr = _int64_to_decimal(values, int(p), int(s))
    if validity:
        n = len(arr)
        mask = _unpack_validity(validity, n)
        arr = pa.compute.if_else(pa.array(mask), arr, pa.nulls(n, arr.type))
    return arr


def _values_to_list_arrow(values: "B.ListValues", logical: str,
                          validity: bytes) -> pa.Array:
    """ListValues → Arrow list array (Spark's arrow type for ArrayType).

    The validity bitmap (already little-endian packed, 1 = valid) plugs
    straight into the list layout's own validity buffer — null rows
    were encoded as empty lists, so offsets stay monotone.
    """
    tagged = (values.child_validity
              or values.child_logical not in ("", LT_PLAIN)
              or B.is_nested(values.child_dtype))
    if tagged:
        # general child (struct/list/map/timestamp/decimal/... or
        # element nulls): rebuild through the full inverse bridge
        child = _narrow(values_to_arrow(
            values.child, values.child_dtype, values.child_logical,
            values.child_validity))
        child_type = child.type
    elif B.is_varlen(values.child_dtype):
        from ..codecs.composite import varlen_to_pa

        child = varlen_to_pa(values.child).cast(
            pa.string() if values.child_dtype == B.DT_STR
            else pa.binary())
        child_type = child.type
    else:
        child_type = _LIST_CHILD_PA[values.child_dtype]
        child = pa.array(np.ascontiguousarray(
            values.child, dtype=B.NUMERIC_NP[values.child_dtype]))
    n = len(values)
    bufs = [pa.py_buffer(bytes(validity)) if validity else None,
            pa.py_buffer(np.ascontiguousarray(values.offsets,
                                              dtype="<i8"))]
    arr = pa.Array.from_buffers(
        pa.large_list(child_type), n, bufs, children=[child])
    # Spark's mapInArrow/applyInArrow expect 32-bit-offset list for
    # ArrayType; the cast is overflow-checked (raises past 2^31 child
    # values per chunk)
    return arr.cast(pa.list_(child_type))


def _narrow(arr: pa.Array) -> pa.Array:
    """large_string/large_binary → string/binary (Spark's arrow types)
    for nested children."""
    if pa.types.is_large_string(arr.type):
        return arr.cast(pa.string())
    if pa.types.is_large_binary(arr.type):
        return arr.cast(pa.binary())
    return arr


def _unpack_validity(validity: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(validity, dtype=np.uint8),
                         count=n, bitorder="little").astype(bool)


def _values_to_struct_arrow(sv: "B.StructValues",
                            validity: bytes) -> pa.Array:
    children = [_narrow(values_to_arrow(c.values, c.dtype_code,
                                        c.logical, c.validity))
                for c in sv.children]
    mask = None
    if validity:
        mask = pa.array(~_unpack_validity(validity, sv.n))
    return pa.StructArray.from_arrays(children, names=sv.names,
                                      mask=mask)


def _values_to_map_arrow(mv_: "B.MapValues", validity: bytes) -> pa.Array:
    keys = _narrow(values_to_arrow(mv_.keys.values, mv_.keys.dtype_code,
                                   mv_.keys.logical, mv_.keys.validity))
    items = _narrow(values_to_arrow(
        mv_.items.values, mv_.items.dtype_code,
        mv_.items.logical, mv_.items.validity))
    n = len(mv_)
    if int(mv_.offsets[-1]) > np.iinfo(np.int32).max:
        # Arrow map layout carries int32 offsets; silent wrap would
        # corrupt every row past the overflow point
        raise ValueError("map chunk exceeds 2^31 flattened entries; "
                         "lower rows_per_chunk/num_chunks")
    off = np.ascontiguousarray(mv_.offsets, dtype=np.int32)
    if validity:
        # a null offset slot marks the row null (Arrow list/map rule;
        # the final slot is never null)
        mask = np.zeros(n + 1, dtype=bool)
        mask[:n] = ~_unpack_validity(validity, n)
        off_arr = pa.array(off, mask=mask)
    else:
        off_arr = pa.array(off)
    return pa.MapArray.from_arrays(off_arr, keys, items)


def _int64_to_decimal(values: np.ndarray, precision: int, scale: int,
                      hi: np.ndarray | None = None) -> pa.Array:
    """int64 limb(s) → decimal128(p, s), bit-exact.  With `hi` None
    (p ≤ 18 path) the high word is two's-complement sign extension of
    the unscaled lo word; the decimal2 path passes its stored hi-limb
    stream."""
    lo = np.ascontiguousarray(values, dtype="<i8")
    words = np.empty(lo.shape[0] * 2, dtype="<i8")
    words[0::2] = lo
    words[1::2] = (lo >> 63 if hi is None  # arith shift = sign ext
                   else np.ascontiguousarray(hi, dtype="<i8"))
    return pa.Array.from_buffers(
        pa.decimal128(precision, scale), lo.shape[0],
        [None, pa.py_buffer(words)])


def raw_nbytes(values, dtype_code: int) -> int:
    if B.is_varlen(dtype_code) or B.is_nested(dtype_code):
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
    elif dtype_code == B.DT_STRUCT:
        for name, c in zip(values.names, values.children):
            h.update(name.encode("utf-8"))
            h.update(bytes([c.dtype_code]))
            h.update(c.validity)
            h.update(values_sha256(c.values, c.dtype_code).encode())
    elif dtype_code == B.DT_MAP:
        h.update(np.ascontiguousarray(values.lengths(), dtype="<i8").data)
        for c in (values.keys, values.items):
            h.update(bytes([c.dtype_code]))
            h.update(c.validity)
            h.update(values_sha256(c.values, c.dtype_code).encode())
    elif B.is_list(dtype_code):
        h.update(np.ascontiguousarray(values.lengths(), dtype="<i8").data)
        h.update(bytes([values.child_dtype]))
        if values.child_validity or values.child_logical != LT_PLAIN:
            # tagged child: fold logical + element validity into the
            # witness (absent for plain children, so hashes of
            # pre-nested stores stay stable)
            h.update(values.child_logical.encode("utf-8"))
            h.update(values.child_validity)
        h.update(values_sha256(values.child,
                               values.child_dtype).encode())
    else:
        arr = np.ascontiguousarray(values)
        if arr.dtype.byteorder == ">":  # never on this platform, but exact
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        h.update(arr.data)
    return h.hexdigest()

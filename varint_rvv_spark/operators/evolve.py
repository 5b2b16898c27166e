"""Decode-time schema evolution over the encoded chunk store.

A 100 TB chunk store outlives its writers: readers add columns, widen
integer types, and rename fields without rewriting petabytes.
`decode_table_evolved` reconstructs a *target* schema from chunks
written under an older one:

* **added column** — not in any footer row → filled with a per-column
  default (NULL if none given), as a pure JVM literal after decode;
* **dropped column** — simply not requested (decode_table already
  prunes by column name, and the column-partitioned sink never even
  scans the dropped column's files);
* **widened type** — decoded at the stored type, then a JVM-side
  vectorized cast; only provably-lossless widenings are allowed
  (int→long, float→double, date→timestamp, ... see _SAFE_WIDEN), a
  narrowing raises;
* **renamed column** — `renames={old: new}` remaps the footer column
  names before decode (metadata-only, pure Column expr).

Everything happens after the Python decode kernel or on footer
metadata — the kernel itself stays evolution-unaware, so the change
surface is zero for the hot path.  The stored-schema probe is one
bounded driver action over the footer (one row per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..codecs import blob as B
from .decode import decode_table

_NARROW_SPARK = {"int8": "tinyint", "int16": "smallint",
                 "uint8": "smallint", "uint16": "int"}
_DT_SPARK = {B.DT_STR: "string", B.DT_BIN: "binary",
             B.DT_I32: "int", B.DT_I64: "bigint",
             B.DT_F32: "float", B.DT_F64: "double"}

# target types each stored type may be losslessly widened to
_SAFE_WIDEN = {
    "tinyint": {"smallint", "int", "bigint", "double"},
    "smallint": {"int", "bigint", "double"},
    "int": {"bigint", "double"},
    "float": {"double"},
    "date": {"timestamp", "timestamp_ntz"},
}


def _stored_spark_type(dt: int, logical: str) -> str | None:
    """Spark type string for a stored column, or None when the engine
    cannot reason about widening (nested / unsigned64) — such columns
    must match the target type exactly."""
    if logical.startswith("timestamp_us:"):
        return "timestamp"
    if logical == "timestamp_us":
        return "timestamp_ntz"
    if logical == "date32":
        return "date"
    if logical == "bool":
        return "boolean"
    if logical.startswith("narrow_int:"):
        return _NARROW_SPARK.get(logical.split(":", 1)[1])
    if logical.startswith("decimal:") or logical.startswith("decimal2:"):
        _, p, s = logical.split(":")
        return f"decimal({p},{s})"
    if logical != "plain":
        return None  # list/struct/map — exact-match only
    return _DT_SPARK.get(dt)


_CANON = {"long": "bigint", "short": "smallint", "byte": "tinyint",
          "integer": "int"}


def _canon(t: str) -> str:
    return _CANON.get(t, t)


def stored_table_schema(chunks: DataFrame,
                        columns: list[str] | None = None) -> str:
    """Infer a Spark schema string from the footer's logical types —
    lets a reader decode a store it didn't write (jobs/decode_job.py).

    One bounded driver action (one footer row per column).  Column
    order follows `columns` when given, else sorted names (the footer
    does not record the writer's column order).  Raises for columns
    whose stored type the engine cannot name (nested children carry
    their own tags; top-level list/struct/map are supported via the
    logical tag only when the tag is self-describing).
    """
    rows = (chunks.select("column", "dtype_code", "logical_type")
            .distinct().collect())
    types: dict[str, str] = {}
    for r in rows:
        t = _stored_spark_type(int(r.dtype_code), r.logical_type)
        if t is None:
            t = _nested_spark_type(r.logical_type)
        if t is None:
            raise ValueError(
                f"stored_table_schema: cannot name the Spark type of "
                f"column {r.column!r} (stored logical "
                f"{r.logical_type!r}) — pass an explicit schema to "
                f"decode_table instead")
        if r.column in types and types[r.column] != t:
            raise ValueError(
                f"stored_table_schema: column {r.column!r} has "
                f"inconsistent stored types ({types[r.column]} vs {t})")
        types[r.column] = t
    names = columns if columns is not None else sorted(types)
    missing = [c for c in names if c not in types]
    if missing:
        raise ValueError(f"stored_table_schema: no footer rows for "
                         f"columns {missing}")
    return ", ".join(f"{c} {types[c]}" for c in names)


_LIST_CHILD_SPARK = {"float": "float", "double": "double",
                     "int32": "int", "int64": "bigint",
                     "string": "string", "large_string": "string",
                     "binary": "binary", "large_binary": "binary"}


def _nested_spark_type(logical: str) -> str | None:
    """Spark type from a self-describing nested logical tag.

    Round-4 tags carry the spark simpleString directly
    ("list:struct<pos:int,tok:string>", "struct:struct<...>",
    "map:map<string,string>"); legacy list tags carried the arrow
    child-type name ("list:int64").  Anything unparseable stays None
    (exact-match-only, caller raises with a clear message)."""
    if ":" not in logical:
        return None
    kind, child = logical.split(":", 1)
    if kind == "list":
        legacy = _LIST_CHILD_SPARK.get(child)
        if legacy:
            return f"array<{legacy}>"
        candidate = f"array<{child}>"
    elif kind in ("struct", "map"):
        candidate = child
    else:
        return None
    from pyspark.sql.types import _parse_datatype_string

    try:
        _parse_datatype_string(candidate)
    except Exception:
        return None
    return candidate


def decode_table_evolved(chunks: DataFrame, target_schema: str,
                         defaults: dict | None = None,
                         renames: dict[str, str] | None = None,
                         contiguous: bool = False) -> DataFrame:
    """Reconstruct `target_schema` from chunks written under an older
    schema (see module doc).  defaults: {column: value} for columns
    absent from the chunk store; renames: {stored_name: target_name}.
    """
    from pyspark.sql.types import _parse_datatype_string

    struct = _parse_datatype_string(target_schema)
    target = {f.name: f.dataType.simpleString() for f in struct.fields}
    if renames:
        stored_names = {r.column for r in
                        chunks.select("column").distinct().collect()}
        clash = [new for old, new in renames.items()
                 if new in stored_names and new not in renames]
        if clash:
            raise ValueError(
                f"decode_table_evolved: rename target(s) {clash} "
                f"collide with existing stored columns — the merged "
                f"chunk set would carry two streams per name")
        unknown = sorted(set(renames) - stored_names)
        if unknown:
            # a typo'd source would silently null-fill the target
            raise ValueError(
                f"decode_table_evolved: rename source(s) {unknown} "
                f"match no stored column")
        kv = [F.lit(x) for pair in renames.items() for x in pair]
        mapping = F.create_map(*kv)
        # try_element_at: ANSI mode raises on missing map keys
        chunks = chunks.withColumn(
            "column", F.coalesce(F.try_element_at(mapping, F.col("column")),
                                 F.col("column")))
    # bounded driver action: one footer row per stored column
    stored_rows = (chunks.select("column", "dtype_code", "logical_type")
                   .distinct().collect())
    stored: dict[str, str | None] = {}
    for r in stored_rows:
        t = _stored_spark_type(int(r.dtype_code), r.logical_type)
        if r.column in stored and stored[r.column] != t:
            raise ValueError(
                f"decode_table_evolved: column {r.column!r} has "
                f"inconsistent stored types across chunks "
                f"({stored[r.column]} vs {t}) — compact or migrate "
                f"the store before evolving the schema")
        stored[r.column] = t
    present = [c for c in target if c in stored]
    missing = [c for c in target if c not in stored]
    decode_types, casts = {}, {}
    for c in present:
        st, tt = stored[c], _canon(target[c])
        if st is None or _canon(st) == tt:
            decode_types[c] = target[c]  # exact (or unreasoned) match
        elif tt in _SAFE_WIDEN.get(_canon(st), ()):
            decode_types[c] = st
            casts[c] = target[c]
        else:
            raise ValueError(
                f"decode_table_evolved: column {c!r} stored as {st} "
                f"cannot be losslessly read as {target[c]} — only "
                f"widenings are supported ({sorted(_SAFE_WIDEN)})")
    sub_schema = ", ".join(f"{c} {decode_types[c]}" for c in present)
    d = decode_table(chunks, present, sub_schema, contiguous=contiguous)
    for c, t in casts.items():
        d = d.withColumn(c, F.col(c).cast(t))
    defaults = defaults or {}
    bad = set(defaults) - set(missing)
    if bad:
        raise ValueError(
            f"decode_table_evolved: defaults given for stored columns "
            f"{sorted(bad)} — defaults only apply to added columns")
    for c in missing:
        d = d.withColumn(c, F.lit(defaults.get(c)).cast(target[c]))
    return d.select(*target.keys())

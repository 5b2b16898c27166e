"""Decode pipeline: chunk blobs → columns, plus bit-identity verification.

Decode is embarrassingly parallel (SURVEY.md §4 "complete-varint-only
stride"): chunks are self-contained, so the plan is Scan → mapInArrow —
zero shuffles.  Verification recomputes each chunk's content hash from
the decoded values and compares with the footer's encode-time hash;
`verify_roundtrip` reduces that to a single (total, mismatched) pair.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs import blob as B
from .arrow_bridge import values_sha256, values_to_arrow

VERIFY_SCHEMA = ("chunk_id long, column string, n_values long, "
                 "decoded_sha256 string, expected_sha256 string, "
                 "ok boolean, diag string")


def _mismatch_samples(values, dt, stats: dict, n_expected: int) -> list:
    """First ≤10 (index, expected, got) triples from the encode-time
    head/tail witness samples (reference example.c:154-168 twin)."""
    if B.is_varlen(dt) or dt in (B.DT_LIST, B.DT_MAP):
        got_vals = [int(x) for x in values.lengths()]
    elif dt not in B.NUMERIC_NP:
        return []  # struct: no row-level witness representation
    else:
        kind = B.NUMERIC_NP[dt].kind
        cast = float if kind == "f" else int
        got_vals = [cast(x) for x in values]
    n = len(got_vals)
    regions = [(0, stats.get("head") or [])]
    tail = stats.get("tail") or []
    regions.append((max(n_expected - len(tail), 0), tail))
    samples = []
    for base, exp in regions:
        for j, e in enumerate(exp):
            if e is None:  # non-finite witness was persisted as null
                continue
            i = base + j
            g = got_vals[i] if i < n else None
            if g != e and len(samples) < 10:
                samples.append([i, e, g])
    return samples


def _verify_kernel(batch_iter):
    import json

    for batch in batch_iter:
        d = batch.to_pydict()
        out = {"chunk_id": d["chunk_id"], "column": d["column"],
               "n_values": [], "decoded_sha256": [],
               "expected_sha256": d["value_sha256"], "ok": [],
               "diag": []}
        for payload, expected, n_exp, stats_json in zip(
                d["payload"], d["value_sha256"], d["n_values"],
                d["stats_json"]):
            try:
                values, _, dt = B.decode_blob(payload)
            except Exception as exc:  # corruption must report, not kill
                out["n_values"].append(-1)
                out["decoded_sha256"].append("")
                out["ok"].append(False)
                out["diag"].append(json.dumps(
                    {"decode_error": f"{type(exc).__name__}: {exc}"}))
                continue
            got = values_sha256(values, dt)
            ok = got == expected
            out["n_values"].append(len(values))
            out["decoded_sha256"].append(got)
            out["ok"].append(ok)
            if ok:
                out["diag"].append(None)
            else:
                stats = json.loads(stats_json or "{}")
                diag = {"n_values_expected": int(n_exp),
                        "n_values_got": len(values),
                        "mismatch_samples":
                            _mismatch_samples(values, dt, stats,
                                              int(n_exp))}
                if B.is_varlen(dt) or B.is_list(dt):
                    diag["samples_are"] = "row_lengths"
                out["diag"].append(json.dumps(diag))
        yield pa.RecordBatch.from_pydict(out)


DECODE_BENCH_SCHEMA = ("chunk_id long, column string, n_values long, "
                       "decoded_bytes long")


def _decode_only_kernel(batch_iter):
    from .arrow_bridge import raw_nbytes

    for batch in batch_iter:
        d = batch.to_pydict()
        out = {"chunk_id": d["chunk_id"], "column": d["column"],
               "n_values": [], "decoded_bytes": []}
        for payload in d["payload"]:
            values, _, dt = B.decode_blob(payload)
            out["n_values"].append(len(values))
            out["decoded_bytes"].append(raw_nbytes(values, dt))
        yield pa.RecordBatch.from_pydict(out)


def decode_only(chunks: DataFrame) -> DataFrame:
    """Pure decode pass (no hashing) — the decode-throughput job.

    Bit-identity is `verify_chunks`'s job; this measures the decode
    path itself (scan → mapInArrow, zero shuffle).
    """
    return chunks.select("chunk_id", "column", "payload").mapInArrow(
        _decode_only_kernel, DECODE_BENCH_SCHEMA)


def verify_chunks(chunks: DataFrame) -> DataFrame:
    """Decode every chunk and compare content hashes (bit-identity).

    On mismatch the `diag` column carries a JSON diagnostic: decode
    exceptions are captured (corruption reports instead of killing the
    task), and the encode-time head/tail witness samples yield concrete
    (index, expected, got) triples."""
    cols = ["chunk_id", "column", "payload", "value_sha256", "n_values",
            "stats_json"]
    return chunks.select(*cols).mapInArrow(_verify_kernel, VERIFY_SCHEMA)


def verify_roundtrip(chunks: DataFrame) -> tuple[int, int]:
    """Returns (n_chunks_checked, n_mismatched)."""
    agg = (verify_chunks(chunks)
           .agg(F.count("*").alias("n"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("bad"))
           .collect()[0])
    return int(agg["n"]), int(agg["bad"] or 0)


def prune_chunks(chunks: DataFrame, column: str,
                 lo=None, hi=None) -> DataFrame:
    """Zone-map chunk pruning — the engine twin of parquet row-group
    statistics.

    Keeps only the chunks whose encode-time [vmin, vmax] for `column`
    can overlap [lo, hi]; all columns of a surviving chunk are kept
    (whole-chunk granularity), everything else never reaches the
    Python decode kernel.  The stats filter is pure JVM
    (get_json_object on the footer stats); chunks without a zone map
    (varlen/NaN columns) are conservatively kept, as is any chunk when
    the stats parse to NULL.  A residual row filter after decode is
    still required.  Comparisons are double-precision: exact for
    |value| < 2^53 (epoch-µs timestamps included), conservative use
    only beyond that.

    At 100 TB this runs on the footer/chunks *scan* — with a
    column-partitioned sink the stats column is a few bytes per chunk,
    so pruning cost is O(chunks), not O(data).  Cache the chunks
    DataFrame when it is a freshly-encoded lineage (the qualifying-id
    branch would otherwise recompute the encode).
    """
    col_rows = chunks.filter(F.col("column") == column)
    if col_rows.isEmpty():
        # a typo'd / varlen-only column name would otherwise produce an
        # empty qualifying set and silently drop EVERY chunk
        raise ValueError(
            f"prune_chunks: no footer rows for column {column!r} — "
            f"check the column name (pruning on it would drop all "
            f"chunks, not zero)")
    # no .distinct(): a semi-join build side tolerates duplicate ids,
    # and the dedup would add a pointless (if tiny) exchange
    qual = col_rows.filter(_range_overlap(lo, hi)).select("chunk_id")
    return chunks.join(F.broadcast(qual), "chunk_id", "left_semi")


def _range_overlap(lo, hi):
    """Zone-map overlap Column over footer rows (NULL stats → kept)."""
    vmin = F.get_json_object("stats_json", "$.vmin").cast("double")
    vmax = F.get_json_object("stats_json", "$.vmax").cast("double")
    overlap = F.lit(True)
    if lo is not None:
        overlap = overlap & (vmax.isNull() | (vmax >= F.lit(float(lo))))
    if hi is not None:
        overlap = overlap & (vmin.isNull() | (vmin <= F.lit(float(hi))))
    return overlap


def prune_chunks_multi(chunks: DataFrame, eq: dict | None = None,
                       ranges: dict | None = None) -> DataFrame:
    """All of scan_encoded's predicates in ONE footer pass.

    Chaining prune_chunks/prune_chunks_eq costs one footer scan + one
    guard action + one broadcast per predicate; this evaluates every
    predicate's condition on its own column's footer rows in a single
    aggregation — a chunk qualifies when `min(ok)` over its predicate
    rows is true (boolean min = AND; a chunk with no footer row for
    some predicate column is conservatively kept, matching the
    per-predicate operators).  One bounded driver action validates
    column existence + probe types for all predicates together.
    """
    eq = eq or {}
    ranges = ranges or {}
    cols = list(eq) + [c for c in ranges if c not in eq]
    if not cols:
        return chunks
    heads = {r.column: int(r.dt) for r in
             chunks.filter(F.col("column").isin(cols))
             .groupBy("column")
             .agg(F.first("dtype_code").alias("dt")).collect()}
    missing = [c for c in cols if c not in heads]
    if missing:
        raise ValueError(
            f"prune_chunks_multi: no footer rows for columns "
            f"{missing} — check the column names")
    for col, v in eq.items():
        _check_probe_type(heads[col], v, col, "prune_chunks_multi")
    cond = None
    for col in cols:
        c = F.lit(True)
        if col in eq:
            c = c & _eq_may_contain(eq[col])
        if col in ranges:
            c = c & _range_overlap(*ranges[col])
        cond = (F.when(F.col("column") == col, c) if cond is None
                else cond.when(F.col("column") == col, c))
    qual = (chunks.filter(F.col("column").isin(cols))
            .withColumn("_ok", cond)
            .groupBy("chunk_id")
            .agg(F.min("_ok").alias("_all_ok"))
            .filter(F.col("_all_ok"))
            .select("chunk_id"))
    return chunks.join(F.broadcast(qual), "chunk_id", "left_semi")


def prune_chunks_eq(chunks: DataFrame, column: str, value) -> DataFrame:
    """Equality chunk pruning on a string/binary/integer column.

    For integers this complements the zone map: `prune_chunks(col, v,
    v)` only helps when the table is clustered on the column, while
    the eq stats (dvset_i / bloom over distinct values) prune id
    point lookups on *any* layout.

    Keeps only the chunks whose footer equality stats
    (operators/eqstats.py) say the chunk *may* contain `value`:

    * ``dvset`` present → exact membership (`array_contains` on the
      parsed JSON list);
    * else ``bloom`` present → the BLOOM_K double-hashed bit tests,
      evaluated as pure JVM Column arithmetic over the hex bitmap
      (substr → conv → bit extract) — the footer scan never crosses
      into Python;
    * else (long-text / high-cardinality columns, pre-eqstats
      footers) → conservatively kept.

    One-sided like all pruning here: a chunk containing `value` always
    survives (bloom false positives only cost a decode); a residual
    row filter after decode is still required.  At 100 TB this is an
    O(chunks) footer-metadata scan, same cost shape as prune_chunks.
    """
    col_rows, dt = _eq_col_rows(chunks, column, "prune_chunks_eq")
    _check_probe_type(dt, value, column, "prune_chunks_eq")
    qual = (col_rows.filter(_eq_may_contain(value))
            .select("chunk_id"))
    return chunks.join(F.broadcast(qual), "chunk_id", "left_semi")


def prune_chunks_in(chunks: DataFrame, column: str, values,
                    max_probes: int = 64) -> DataFrame:
    """IN-list chunk pruning: keep chunks that may contain *any* of
    `values` (OR of the prune_chunks_eq conditions).  Probe lists
    longer than `max_probes` skip pruning entirely (conservatively
    keeping every chunk) — a thousand-term OR of bit tests would bloat
    codegen for marginal selectivity; route huge id lists through a
    semi-join on the decoded column instead."""
    vals = list(values)
    if not vals:
        raise ValueError("prune_chunks_in: empty probe list (did you "
                         "mean to prune everything?)")
    if len(vals) > max_probes:
        # bail before touching the footer — validating the column
        # name would cost a full lineage job on a path that prunes
        # nothing anyway
        return chunks
    col_rows, dt = _eq_col_rows(chunks, column, "prune_chunks_in")
    for v in vals:
        _check_probe_type(dt, v, column, "prune_chunks_in")
    cond = _eq_may_contain(vals[0])
    for v in vals[1:]:
        cond = cond | _eq_may_contain(v)
    qual = col_rows.filter(cond).select("chunk_id")
    return chunks.join(F.broadcast(qual), "chunk_id", "left_semi")


def _eq_col_rows(chunks: DataFrame, column: str, who: str):
    col_rows = chunks.filter(F.col("column") == column)
    head = col_rows.select("dtype_code").head()
    if head is None:
        raise ValueError(
            f"{who}: no footer rows for column {column!r} — check the "
            f"column name (pruning on it would drop all chunks, not "
            f"zero)")
    return col_rows, int(head.dtype_code)


def _check_probe_type(dt: int, value, column: str, who: str) -> None:
    """An int probe against a string column (or vice versa) would test
    the wrong hash family and silently prune chunks that DO contain
    the value (the residual Spark filter would have cast-matched it) —
    a correctness bug, so it raises instead."""
    is_int_col = dt in (B.DT_U32, B.DT_U64, B.DT_I32, B.DT_I64, B.DT_U8)
    if isinstance(value, int) and not is_int_col:
        raise TypeError(
            f"{who}: integer probe against non-integer column "
            f"{column!r} (dtype_code {dt}) — pass the column's own "
            f"type (pruning with a mismatched probe type would drop "
            f"matching chunks)")
    if isinstance(value, (str, bytes, bytearray)) and not B.is_varlen(dt):
        raise TypeError(
            f"{who}: string/bytes probe against non-varlen column "
            f"{column!r} (dtype_code {dt}) — pass an int probe")


def _eq_may_contain(value):
    """Column predicate over footer rows: may this chunk contain
    `value`?  Pure JVM (get_json_object / from_json / substr / conv);
    chunks without eq stats evaluate True (conservatively kept)."""
    from .eqstats import BLOOM_K, eq_hashes, int_hashes

    if value is None:
        raise ValueError("eq pruning: probing for NULL is not "
                         "supported (validity lives outside eq stats)")
    if isinstance(value, bool):
        raise ValueError("eq pruning: probe booleans as ints (0/1)")
    if isinstance(value, int):
        c1, c2 = int_hashes(value)
        dv = F.from_json(F.get_json_object("stats_json", "$.dvset_i"),
                         "array<bigint>")
        # dvset_i is only written for int64-representable domains, so
        # an out-of-range probe can simply never match it
        in_dv = (F.array_contains(dv, F.lit(value).cast("bigint"))
                 if -(1 << 63) <= value < (1 << 63) else F.lit(False))
    else:
        vb = (value.encode("utf-8") if isinstance(value, str)
              else bytes(value))
        try:
            vs = vb.decode("utf-8")
        except UnicodeDecodeError:
            vs = None  # utf-8 columns (the only dvset writers) can't
            #            hold a non-utf8 byte string
        dv = F.from_json(F.get_json_object("stats_json", "$.dvset"),
                         "array<string>")
        in_dv = (F.array_contains(dv, vs) if vs is not None
                 else F.lit(False))
        c1, c2 = eq_hashes(vb)
    bloom = F.get_json_object("stats_json", "$.bloom")
    m = F.get_json_object("stats_json", "$.bloom_m").cast("long")

    def bit_set(i: int):
        # combined hash computed driver-side; cast defends against the
        # literal being inferred 32-bit (ANSI mode would raise on *)
        pos = F.lit(c1 + i * c2).cast("long") % m
        hexpair = bloom.substr((F.floor(pos / 8) * 2 + 1).cast("int"),
                               F.lit(2))
        byte_val = F.conv(hexpair, 16, 10).cast("long")
        # byte_val < 256 so the double-precision route is exact
        return (F.floor(byte_val / F.pow(F.lit(2.0),
                                         (pos % 8).cast("double")))
                .cast("long") % 2) == 1
    bloom_hit = bit_set(0)
    for i in range(1, BLOOM_K):
        bloom_hit = bloom_hit & bit_set(i)
    return (F.when(dv.isNotNull(), in_dv)
            .when(bloom.isNotNull() & m.isNotNull(), bloom_hit)
            .otherwise(F.lit(True)))


def decode_table(chunks: DataFrame, columns: list[str],
                 spark_schema: str, contiguous: bool = False) -> DataFrame:
    """Reconstruct the original table from chunk blobs.

    Two plans (row order within a chunk is preserved by every codec,
    so columns re-align positionally either way):

    * contiguous=False (default): one shuffle (groupBy chunk_id)
      co-locates a chunk's column blobs — required when chunks come
      from the column-partitioned sink, where a chunk's rows live in
      different files.
    * contiguous=True: zero-shuffle mapInArrow — valid whenever each
      chunk's column rows are adjacent in partition order, which holds
      for chunks straight out of encode_chunks/encode_chunks_scan.
      This is the 100 TB decode path: Scan → kernel, no data movement.
    """
    if contiguous:
        return _decode_table_contiguous(chunks, columns, spark_schema)

    # Spark quirk: applyInArrow expects timestamp[us, tz=<session tz>]
    # for TimestampType fields but naive timestamp[us] for NTZ fields;
    # attaching/stripping the tz is metadata-only (values stay epoch-µs)
    from pyspark.sql.types import TimestampType, _parse_datatype_string

    session_tz = chunks.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC")
    struct = _parse_datatype_string(spark_schema)
    ts_tz = {f.name: pa.timestamp("us", tz=session_tz)
             if isinstance(f.dataType, TimestampType)
             else pa.timestamp("us")
             for f in struct.fields}

    expected = _expected_arrow_types(spark_schema)

    def rebuild(tbl: pa.Table) -> pa.Table:
        d = tbl.to_pydict()
        arrays = {}
        for col, payload, logical, validity in zip(
                d["column"], d["payload"], d["logical_type"],
                d["validity"]):
            values, _, dt = B.decode_blob(payload)
            arr = _cast_narrow(values_to_arrow(
                values, dt, logical, bytes(validity or b"")))
            if pa.types.is_timestamp(arr.type):
                arr = arr.cast(ts_tz[col])
            _check_decoded_type(col, arr, expected)
            arrays[col] = arr
        return pa.table({c: arrays[c] for c in columns})

    # applyInArrow (not applyInPandas): pandas float columns cannot
    # represent NaN-the-value distinctly from null, which would turn
    # decoded NaNs into NULLs.
    # Column pruning BEFORE the shuffle: only requested columns'
    # payloads move and decode (previously every stored column was
    # decoded, and an unrequested timestamp column crashed the tz
    # lookup)
    return (chunks
            .filter(F.col("column").isin(list(columns)))
            .select("chunk_id", "column", "logical_type", "validity",
                    "payload")
            .groupBy("chunk_id")
            .applyInArrow(rebuild, spark_schema))


def _cast_narrow(arr: pa.Array) -> pa.Array:
    """large_string/large_binary → string/binary (Spark's arrow types)."""
    if pa.types.is_large_string(arr.type):
        return arr.cast(pa.string())
    if pa.types.is_large_binary(arr.type):
        return arr.cast(pa.binary())
    return arr


def _expected_arrow_types(spark_schema: str) -> dict:
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_string

    return {f.name: to_arrow_type(f.dataType)
            for f in _parse_datatype_string(spark_schema).fields}


def _check_decoded_type(col: str, arr: pa.Array, expected: dict) -> None:
    """A declared-vs-decoded type mismatch (e.g. `html string` for a
    binary column) otherwise surfaces as an opaque JVM
    ArrowColumnVector accessor error deep inside the first filter —
    fail at the kernel boundary with an actionable message instead."""
    exp = expected.get(col)
    if exp is None:
        return
    if pa.types.is_timestamp(arr.type) and pa.types.is_timestamp(exp):
        return  # tz handling is the callers' metadata-only concern
    if arr.type.id != exp.id:
        raise TypeError(
            f"decode_table: column {col!r} decodes to arrow type "
            f"{arr.type} but the declared schema says {exp} — fix the "
            f"schema (evolve.stored_table_schema(chunks) infers the "
            f"stored one)")


def _decode_table_contiguous(chunks: DataFrame, columns: list[str],
                             spark_schema: str) -> DataFrame:
    """Shuffle-free rebuild: accumulate each chunk's contiguous column
    rows within the partition stream (same pattern as the encode
    kernel), emit one original-schema batch per chunk."""
    need = set(columns)

    expected = _expected_arrow_types(spark_schema)

    def fn(batch_iter):
        pending: dict = {}
        pending_cid = None

        def flush(rows):
            arrays = {}
            for col, (payload, logical, validity) in rows.items():
                values, _, dt = B.decode_blob(payload)
                arr = _cast_narrow(
                    values_to_arrow(values, dt, logical, validity))
                if pa.types.is_timestamp(arr.type) and arr.type.tz:
                    # mapInArrow expects naive (metadata-only strip)
                    arr = arr.cast(pa.timestamp("us"))
                _check_decoded_type(col, arr, expected)
                arrays[col] = arr
            return pa.RecordBatch.from_arrays(
                [arrays[c] for c in columns], names=list(columns))

        for batch in batch_iter:
            d = batch.to_pydict()
            for i in range(batch.num_rows):
                cid = d["chunk_id"][i]
                if pending_cid is not None and cid != pending_cid \
                        and pending:
                    yield flush(pending)
                    pending = {}
                pending_cid = cid
                if d["column"][i] in need:
                    pending[d["column"][i]] = (
                        d["payload"][i], d["logical_type"][i],
                        bytes(d["validity"][i] or b""))
        if pending:
            yield flush(pending)

    # row-level pruning BEFORE the Python boundary: only requested
    # columns' payload bytes cross into the kernel (a filter preserves
    # partition order, so chunk adjacency — the contiguous contract —
    # is intact).  Decoding a 6-of-11-column projection previously
    # shipped and then skipped the other 5 payloads.
    return (chunks
            .filter(F.col("column").isin(list(columns)))
            .select("chunk_id", "column", "logical_type", "validity",
                    "payload")
            .mapInArrow(fn, spark_schema))


def push_chunk_filter(chunks: DataFrame, pruned: DataFrame,
                      max_ids: int = 256) -> DataFrame:
    """Convert a pruned chunk set into a *scan-pushable* id predicate.

    The semi-join that prune_chunks* builds cannot reach the file
    scan: Spark reads every chunk's payload bytes and only then drops
    the non-qualifying rows — fine for saved decode, wrong for saved
    I/O.  When pruning was selective (≤ max_ids surviving chunks, the
    point-lookup case), collecting the id list — bounded by
    construction — and re-filtering the base scan with
    `chunk_id IN (...)` gives parquet a PushedFilter, so row-group
    statistics skip the payload bytes on disk too (write stores
    sorted by chunk_id to keep row groups id-clustered).  Falls back
    to the semi-join form when more than max_ids chunks survive.
    """
    ids = [r.chunk_id for r in
           pruned.select("chunk_id").distinct()
           .limit(max_ids + 1).collect()]
    if len(ids) > max_ids:
        return pruned
    return chunks.filter(F.col("chunk_id").isin(ids))


def scan_encoded(chunks: DataFrame, columns: list[str],
                 spark_schema: str, eq: dict | None = None,
                 ranges: dict | None = None,
                 contiguous: bool = False,
                 pushdown_ids: int | None = 256) -> DataFrame:
    """One-call filtered scan over an encoded store: the predicate
    surface a reader actually wants.

    `eq`: {column: value} equality predicates; `ranges`:
    {column: (lo, hi)} inclusive numeric ranges (either bound may be
    None; timestamps compare in epoch-µs).  Each predicate first
    prunes whole chunks from footer stats (prune_chunks_eq / the
    zone maps — O(chunks) JVM metadata work), then re-applies itself
    as an exact residual row filter on the decoded survivors, so the
    result equals a plain decode-then-filter regardless of how
    selective the footer stats were.

    Predicate columns must be in `columns` (the residual filter needs
    them decoded) — raises otherwise.

    `contiguous` defaults to False because the primary use case is a
    store read back from parquet, where file splits break chunk
    adjacency (the repo invariant); pass True only when scanning a
    fresh in-session encode lineage.
    """
    eq = eq or {}
    ranges = ranges or {}
    missing = (set(eq) | set(ranges)) - set(columns)
    if missing:
        raise ValueError(f"scan_encoded: predicate columns "
                         f"{sorted(missing)} must be in `columns` "
                         f"(the residual filter needs them decoded)")
    base = chunks
    # one footer pass for every predicate together (vs one scan +
    # guard + broadcast per predicate when chaining the operators)
    chunks = prune_chunks_multi(chunks, eq=eq, ranges=ranges)
    if (eq or ranges) and pushdown_ids:
        # selective prunes become a scan-pushed IN filter: parquet
        # row-group stats then skip the payload *bytes*, not just the
        # decode (see push_chunk_filter)
        chunks = push_chunk_filter(base, chunks, max_ids=pushdown_ids)
    d = decode_table(chunks, columns, spark_schema,
                     contiguous=contiguous)

    def as_num(col):
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(d.schema[col].dataType,
                      (TimestampType, TimestampNTZType)):
            return F.unix_micros(F.col(col).cast("timestamp"))
        return F.col(col)

    for col, v in eq.items():
        d = d.filter(F.col(col) == F.lit(v))
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            d = d.filter(as_num(col) >= F.lit(lo))
        if hi is not None:
            d = d.filter(as_num(col) <= F.lit(hi))
    return d

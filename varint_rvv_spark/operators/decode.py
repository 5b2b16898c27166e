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
                 "decoded_sha256 string, expected_sha256 string, ok boolean")


def _verify_kernel(batch_iter):
    for batch in batch_iter:
        d = batch.to_pydict()
        out = {"chunk_id": d["chunk_id"], "column": d["column"],
               "n_values": [], "decoded_sha256": [],
               "expected_sha256": d["value_sha256"], "ok": []}
        for payload, expected in zip(d["payload"], d["value_sha256"]):
            values, _, dt = B.decode_blob(payload)
            got = values_sha256(values, dt)
            out["n_values"].append(len(values))
            out["decoded_sha256"].append(got)
            out["ok"].append(got == expected)
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
    """Decode every chunk and compare content hashes (bit-identity)."""
    cols = ["chunk_id", "column", "payload", "value_sha256"]
    return chunks.select(*cols).mapInArrow(_verify_kernel, VERIFY_SCHEMA)


def verify_roundtrip(chunks: DataFrame) -> tuple[int, int]:
    """Returns (n_chunks_checked, n_mismatched)."""
    agg = (verify_chunks(chunks)
           .agg(F.count("*").alias("n"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("bad"))
           .collect()[0])
    return int(agg["n"]), int(agg["bad"] or 0)


def decode_table(chunks: DataFrame, columns: list[str],
                 spark_schema: str) -> DataFrame:
    """Reconstruct the original table from chunk blobs.

    One shuffle (groupBy chunk_id) to co-locate a chunk's column blobs,
    then a vectorized rebuild per chunk via applyInPandas.  Row order
    within a chunk is preserved by every codec, so columns re-align
    positionally.
    """
    import pandas as pd

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        series = {}
        for _, row in pdf.iterrows():
            values, _, dt = B.decode_blob(row["payload"])
            arr = values_to_arrow(values, dt, row["logical_type"],
                                  bytes(row["validity"] or b""))
            series[row["column"]] = arr.to_pandas()
        return pd.DataFrame({c: series[c] for c in columns})

    return (chunks
            .select("chunk_id", "column", "logical_type", "validity",
                    "payload")
            .groupBy("chunk_id")
            .applyInPandas(rebuild, spark_schema))

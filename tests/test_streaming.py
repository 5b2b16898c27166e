"""Structured Streaming incremental-encode test: two file drops, one
checkpoint — second run encodes only the new files, chunks verify."""

from pyspark.sql import functions as F

from varint_rvv_spark.operators.decode import verify_roundtrip
from varint_rvv_spark.sources.pages import PAGES_SCHEMA, pages_df
from varint_rvv_spark.streaming.encode_stream import (
    stream_encode_parquet_dir,
)


def test_stream_encode_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 200, seed=3, partitions=2) \
        .write.mode("append").parquet(inp)
    q = stream_encode_parquet_dir(spark, inp, out, ckpt, PAGES_SCHEMA)
    q.awaitTermination(120)
    first = spark.read.parquet(f"{out}/chunks")
    n1 = first.agg(F.sum("n_values")).collect()[0][0]
    assert n1 == 200 * 5
    # drop more files; only the new ones are processed (checkpointed)
    pages_df(spark, 100, seed=4, partitions=1) \
        .write.mode("append").parquet(inp)
    q2 = stream_encode_parquet_dir(spark, inp, out, ckpt, PAGES_SCHEMA)
    q2.awaitTermination(120)
    allc = spark.read.parquet(f"{out}/chunks")
    n2 = allc.agg(F.sum("n_values")).collect()[0][0]
    assert n2 == (200 + 100) * 5
    n, bad = verify_roundtrip(allc)
    assert bad == 0
    # epoch-namespaced chunk ids never collide
    assert allc.select("chunk_id", "column").distinct().count() == \
        allc.count()

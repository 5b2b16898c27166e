"""Shared column-expression helpers (functions/) — DuckDB-twin parity."""

import duckdb
from pyspark.sql import functions as F

from varint_rvv_spark.functions import (
    cosine,
    md5_bucket,
    md5_long,
    tokens,
    vec_dot,
    vec_norm,
)


def test_md5_long_matches_duckdb(spark):
    df = spark.createDataFrame([("abc",), ("",), ("hello world",)],
                               "s string")
    got = {r.s: r.h for r in
           df.select("s", md5_long("s", 15).alias("h")).collect()}
    for s, h in got.items():
        want = duckdb.sql(
            f"SELECT CAST(('0x' || substr(md5('{s}'), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        assert h == want, s


def test_md5_bucket_range_and_determinism(spark):
    df = spark.range(0, 1000)
    b = df.select(md5_bucket("id", 7).alias("b"))
    vals = [r.b for r in b.collect()]
    assert set(vals) <= set(range(7))
    assert vals == [r.b for r in b.collect()]  # deterministic
    assert len(set(vals)) == 7  # all buckets hit over 1000 ids


def test_vector_helpers(spark):
    df = spark.createDataFrame([([3.0, 4.0], [1.0, 0.0])],
                               "a array<double>, b array<double>")
    row = df.select(vec_norm(F.col("a")).alias("n"),
                    vec_dot(F.col("a"), F.col("b")).alias("d"),
                    F.round(cosine(F.col("a"), F.col("b")), 6)
                    .alias("c")).collect()[0]
    assert row.n == 5.0 and row.d == 3.0 and row.c == 0.6


def test_tokens(spark):
    df = spark.createDataFrame([("  a  b\tc ",)], "t string")
    assert df.select(tokens("t").alias("x")).collect()[0].x \
        == ["a", "b", "c"]

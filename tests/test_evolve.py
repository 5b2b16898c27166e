"""Decode-time schema evolution (operators/evolve.py)."""

import pytest
from pyspark.sql import functions as F

from varint_rvv_spark.operators.encode import encode_chunks
from varint_rvv_spark.operators.evolve import decode_table_evolved


@pytest.fixture(scope="module")
def chunks_v1(spark):
    df = spark.createDataFrame(
        [(i, i * 10, float(i) / 4, f"u{i}") for i in range(100)],
        "id long, score int, ratio float, user string")
    return encode_chunks(df, key_cols=["id"], num_chunks=4).cache()


def test_add_drop_widen_rename(spark, chunks_v1):
    # v2: score widened int→bigint, ratio widened float→double, user
    # renamed to username, text dropped (never requested), region added
    out = decode_table_evolved(
        chunks_v1,
        "id long, score bigint, ratio double, username string, "
        "region string",
        defaults={"region": "emea"},
        renames={"user": "username"})
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "score:bigint", "ratio:double",
        "username:string", "region:string"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 100
    assert rows[7].score == 70 and rows[7].username == "u7"
    assert rows[7].region == "emea"
    assert abs(rows[7].ratio - 1.75) < 1e-12


def test_added_column_defaults_to_null(spark, chunks_v1):
    out = decode_table_evolved(
        chunks_v1, "id long, flag boolean")
    assert out.filter(F.col("flag").isNull()).count() == 100


def test_narrowing_raises(spark, chunks_v1):
    with pytest.raises(ValueError, match="widenings"):
        decode_table_evolved(chunks_v1, "id int, score int")


def test_defaults_for_stored_column_raise(spark, chunks_v1):
    with pytest.raises(ValueError, match="defaults"):
        decode_table_evolved(chunks_v1, "id long",
                             defaults={"id": 0})


def test_evolved_roundtrip_on_real_table(spark):
    """orders_dates-style table: date column widened to timestamp,
    decimal passes through exactly, new column defaulted."""
    df = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .select("o_orderkey", "o_totalprice",
                  F.to_date(F.col("o_orderdate")).alias("o_date"))
          .limit(200))
    chunks = encode_chunks(df, key_cols=["o_orderkey"], num_chunks=4)
    out = decode_table_evolved(
        chunks,
        "o_orderkey long, o_totalprice double, o_date timestamp, "
        "ingest_src string",
        defaults={"ingest_src": "backfill"})
    got = out.agg(F.count("*"), F.min("o_date"),
                  F.count_distinct("ingest_src")).collect()[0]
    assert got[0] == 200 and got[2] == 1
    exp = df.agg(F.min(F.col("o_date").cast("timestamp"))).collect()[0][0]
    assert got[1] == exp


def test_stored_table_schema_inference(spark, chunks_v1):
    from varint_rvv_spark.operators.evolve import stored_table_schema

    assert stored_table_schema(chunks_v1) == (
        "id bigint, ratio float, score int, user string")
    assert stored_table_schema(chunks_v1, ["user", "id"]) == (
        "user string, id bigint")
    with pytest.raises(ValueError, match="no footer rows"):
        stored_table_schema(chunks_v1, ["nope"])


def test_rename_collision_raises(spark, chunks_v1):
    with pytest.raises(ValueError, match="collide"):
        decode_table_evolved(chunks_v1, "score bigint",
                             renames={"user": "score"})


def test_rename_unknown_source_raises(spark, chunks_v1):
    with pytest.raises(ValueError, match="match no stored column"):
        decode_table_evolved(chunks_v1, "username string",
                             renames={"usr": "username"})


def test_stored_table_schema_names_nested_columns(spark):
    """Round-4 self-describing nested logical tags: a store with
    array<struct>, struct, and map columns is schema-inferable from
    the footer alone — and the inferred schema decodes the store."""
    from varint_rvv_spark.operators.decode import decode_table
    from varint_rvv_spark.operators.encode import encode_chunks
    from varint_rvv_spark.operators.evolve import stored_table_schema

    df = spark.sql("""
        SELECT id,
               array(struct(CAST(1 AS INT) AS pos, 'a' AS tok)) AS anns,
               named_struct('uid', id, 'val', CAST(id AS DOUBLE)) AS st,
               map('k', CAST(id AS STRING)) AS props,
               array(CAST(id AS DOUBLE)) AS emb
        FROM range(50) """)
    chunks = encode_chunks(df, key_cols=["id"], num_chunks=2).cache()
    schema = stored_table_schema(
        chunks, ["id", "anns", "st", "props", "emb"])
    assert schema == ("id bigint, "
                      "anns array<struct<pos:int,tok:string>>, "
                      "st struct<uid:bigint,val:double>, "
                      "props map<string,string>, "
                      "emb array<double>")
    dec = decode_table(chunks, ["id", "anns", "st", "props", "emb"],
                       schema, contiguous=True)
    got = dec.orderBy("id").limit(3).collect()
    exp = df.orderBy("id").limit(3).collect()
    assert [r.asDict(True) for r in got] == [r.asDict(True) for r in exp]
    chunks.unpersist()

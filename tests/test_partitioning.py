"""Skew/salting helpers: host-pure clustering with bounded chunk skew
(SURVEY.md §4, north_rule 'explicit salting ... host-level skew')."""

from pyspark.sql import functions as F

from varint_rvv_spark.operators.encode import CHUNK_ID, assign_chunks
from varint_rvv_spark.plans.partitioning import (
    host_of,
    num_chunks_for,
    salted_host_key,
    skew_report,
    with_salted_key,
)
from varint_rvv_spark.sources.pages import pages_df


def test_host_skew_is_real_and_salting_bounds_it(spark):
    pages = pages_df(spark, 4000, seed=42, partitions=4).cache()
    pages.count()
    # the synthetic corpus is Zipf-skewed: top host ≳ 25% of rows
    top = skew_report(pages, host_of("url")).first()["count"]
    assert top > 4000 * 0.2
    n_chunks = 16
    # unsalted host key → one chunk swallows the top host
    by_host = assign_chunks(pages.withColumn("_k", host_of("url")),
                            ["_k"], n_chunks)
    max_unsalted = (by_host.groupBy(CHUNK_ID).count()
                    .agg(F.max("count")).collect()[0][0])
    # salted host key → same-host rows spread over salt buckets
    salted = assign_chunks(with_salted_key(pages, salt_buckets=16),
                           ["_cluster_key"], n_chunks)
    max_salted = (salted.groupBy(CHUNK_ID).count()
                  .agg(F.max("count")).collect()[0][0])
    assert max_unsalted > 4000 * 0.2
    assert max_salted < max_unsalted / 2
    # salted keys remain host-pure (locality for dict/RLE preserved)
    key_hosts = (with_salted_key(pages, salt_buckets=16)
                 .select("_cluster_key", host_of("url").alias("h"))
                 .groupBy("_cluster_key")
                 .agg(F.countDistinct("h").alias("nh"))
                 .agg(F.max("nh")).collect()[0][0])
    assert key_hosts == 1
    pages.unpersist()


def test_num_chunks_for():
    assert num_chunks_for(100 << 40, 32 << 20) == (100 << 40) // (32 << 20)
    assert num_chunks_for(10, 32 << 20) == 1

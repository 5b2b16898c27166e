"""Sequence packing / two-level ordered cumsum (operators/pack.py)."""

import pytest
from pyspark.sql import Window, functions as F

from varint_rvv_spark.operators.pack import ordered_cumsum, pack_sequences

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _reference_cumsum(df, order_col, value_col):
    """The naive single-partition global window — the semantics twin."""
    w = (Window.orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("ref", F.sum(value_col).over(w))


def test_ordered_cumsum_matches_global_window(spark):
    df = spark.createDataFrame(
        [(i * 7 % 997, (i * 13) % 50 + 1) for i in range(400)],
        "id long, v long")
    got = ordered_cumsum(df, "id", "v", out_col="cum", buckets=16)
    ref = _reference_cumsum(df, "id", "v")
    joined = got.join(ref.select("id", "ref"), "id")
    assert joined.filter(F.col("cum") != F.col("ref")).count() == 0
    assert got.count() == 400


def test_ordered_cumsum_sparse_and_tiny(spark):
    # huge id gaps (sparse buckets) and fewer rows than buckets
    df = spark.createDataFrame(
        [(1, 5), (10**9, 7), (10**12, 11), (10**15, 13)], "id long, v long")
    rows = {r.id: r.cum for r in
            ordered_cumsum(df, "id", "v", buckets=1024).collect()}
    assert rows == {1: 5, 10**9: 12, 10**12: 23, 10**15: 36}
    one = spark.createDataFrame([(42, 9)], "id long, v long")
    assert ordered_cumsum(one, "id", "v").collect()[0].cum == 9


def test_pack_sequences_semantics(spark):
    # 3 docs of 300 tokens, max 512: doc0 -> seq0 (start 0),
    # doc1 -> seq0 (start 300), doc2 -> seq1 (start 600)
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300)], "doc_id long, toks long")
    got = {r.doc_id: (r.token_start, r.token_end, r.seq_id)
           for r in pack_sequences(df, "doc_id", "toks", 512).collect()}
    assert got == {0: (0, 300, 0), 1: (300, 600, 0), 2: (600, 900, 1)}
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(df, "doc_id", "toks", 0)


def test_pack_sequences_documents_conservation(spark):
    """Over the real documents table: every token lands in exactly one
    sequence, and every interior sequence starts on a 512 boundary's
    containing document."""
    df = spark.read.parquet(DOCS).select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long").alias("toks"))
    p = pack_sequences(df, "doc_id", "toks", 512).cache()
    total = df.agg(F.sum("toks")).collect()[0][0]
    assert p.agg(F.sum("toks")).collect()[0][0] == total
    # spans tile the stream: max end == total, and in doc order each
    # start equals the previous end (duplicate-safe — zero-token docs
    # produce repeated boundary values, which a join-count would
    # miscount)
    assert p.agg(F.max("token_end")).collect()[0][0] == total
    rows = p.orderBy("doc_id").select("token_start",
                                      "token_end").collect()
    starts = [r.token_start for r in rows]
    ends = [r.token_end for r in rows]
    assert starts == [0] + ends[:-1]
    # seq assignment is the chunk of the first token
    assert p.filter(F.col("seq_id")
                    != F.expr("token_start div 512")).count() == 0
    p.unpersist()


def test_ordered_cumsum_null_order_raises(spark):
    """A NULL order value has no position — it must raise loudly, not
    silently drop the row (the NULL bucket never matches the prefix
    equi-join while its value still shifts other buckets)."""
    df = spark.createDataFrame([(1, 5), (None, 7), (3, 11)],
                               "id long, v long")
    # surfaces as USER_RAISED_EXCEPTION, wrapped differently by
    # executor vs driver evaluation — match the message, not the class
    with pytest.raises(Exception, match="NULL in order"):
        ordered_cumsum(df, "id", "v").collect()


def test_ordered_cumsum_plan_has_no_global_data_window(spark):
    """The scale contract: the data-row window is partitioned by
    bucket; only the <=buckets aggregated rows see an ordered
    single-partition window."""
    df = spark.read.parquet(DOCS).select(
        "doc_id", F.length("text").cast("long").alias("v"))
    out = ordered_cumsum(df, "doc_id", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [ln for ln in plan.split("\n")
                    if "Window [" in ln and "doc_id#" in ln]
    assert data_windows, "expected a doc-level window"
    for ln in data_windows:
        assert "_bkt" in ln, f"data window not partitioned: {ln}"


def test_bucket_by_rank_balanced_on_heavy_tail(spark):
    """The r4 equal-width grid collapsed a heavy-tailed column into
    bucket 0 (one 10^9x outlier stretched the span); rank-uniform
    boundaries keep every bucket within ~2x the mean weight."""
    from varint_rvv_spark.operators.pack import bucket_by_rank

    vals = [(i, i * i) for i in range(1, 1001)] + [(0, 10 ** 15)]
    df = spark.createDataFrame(vals, "id long, v long")
    counts = [r.c for r in bucket_by_rank(df, "v", 16)
              .groupBy("_bkt").agg(F.count(F.lit(1)).alias("c"))
              .collect()]
    mean = sum(counts) / len(counts)
    assert len(counts) >= 8, counts
    assert max(counts) <= 2 * mean, counts


def test_ordered_cumsum_heavy_tail_exact(spark):
    """Exactness is distribution-independent; the heavy tail only
    tests balance plumbing (boundary ties, dedup, sparse buckets)."""
    rows = [((7 ** i) % (10 ** 12) + i, (i % 97) + 1)
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = ordered_cumsum(df, "id", "v", out_col="cum", buckets=32)
    ref = _reference_cumsum(df, "id", "v")
    joined = got.join(ref.select("id", "ref"), "id")
    assert joined.filter(F.col("cum") != F.col("ref")).count() == 0


def test_ordered_cumsum_full_long_span(spark):
    """ids spanning more than the int64 range: the old grid's
    (max - min) span arithmetic raised ANSI overflow; the rank path
    does no arithmetic at all."""
    df = spark.createDataFrame([(-2 ** 62, 3), (0, 5), (2 ** 62, 7)],
                               "id long, v long")
    rows = {r.id: r.cum
            for r in ordered_cumsum(df, "id", "v", buckets=8).collect()}
    assert rows == {-2 ** 62: 3, 0: 8, 2 ** 62: 15}


def test_ordered_cumsum_duplicate_order_raises(spark):
    """Tied order keys have no deterministic running-sum order — the
    guard must raise loudly instead of silently picking one."""
    df = spark.createDataFrame([(1, 5), (2, 7), (2, 11)],
                               "id long, v long")
    with pytest.raises(Exception, match="duplicate"):
        ordered_cumsum(df, "id", "v").collect()


def test_bucket_by_rank_monotone_adversarial_distributions(spark):
    """The ONLY property correctness needs from the scaffold:
    bucket id is non-decreasing in the value, for int64 extremes,
    massive ties, mixed-magnitude floats, and power laws; bucket
    count never exceeds the request; empty frames don't crash."""
    from varint_rvv_spark.operators.pack import bucket_by_rank

    cases = [
        ("long", [-2 ** 63 + 1, -2 ** 62, -1, 0, 1, 2 ** 62,
                  2 ** 63 - 1]),
        ("long", [5] * 50 + [7] * 3 + [9]),
        ("double", [1e-300, 1e300, 0.0, -1e300]
         + [float(i) for i in range(100)]),
        ("long", [10 ** 15] + [i * i for i in range(1, 300)]),
    ]
    for typ, vals in cases:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)],
            f"id long, v {typ}")
        got = bucket_by_rank(df, "v", 16).select("v", "_bkt").collect()
        got.sort(key=lambda r: (r.v, r._bkt))
        bkts = [r._bkt for r in got]
        assert all(a <= b for a, b in zip(bkts, bkts[1:])), (typ, bkts)
        # ties must share one bucket (monotone both directions)
        by_v = {}
        for r in got:
            by_v.setdefault(r.v, set()).add(r._bkt)
        assert all(len(s) == 1 for s in by_v.values()), by_v
        assert len(set(bkts)) <= 16
    empty = spark.createDataFrame([], "id long, v long")
    assert bucket_by_rank(empty, "v", 16).count() == 0

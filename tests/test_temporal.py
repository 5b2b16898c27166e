"""Temporal operators: as-of join + sessionization (temporal.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from varint_rvv_spark.operators.temporal import asof_join, sessionize


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_join_planted(spark):
    probe = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"),
         (2, _ts(7), "d"), (3, _ts(9), "e")],
        "uid long, ts timestamp, tag string")
    build = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(15), 150.0), (2, _ts(8), 80.0)],
        "uid long, ts timestamp, px double")
    out = {r.tag: (r.asof_ts, r.asof_px) for r in
           asof_join(probe, build, "uid", "ts", ["px"]).collect()}
    assert out["a"] == (_ts(5), 50.0)     # equal ts matches (>= semantics)
    assert out["b"] == (_ts(5), 50.0)     # latest at-or-before
    assert out["c"] == (_ts(15), 150.0)
    assert out["d"] == (None, None)       # build row is after the probe
    assert out["e"] == (None, None)       # key with no build rows at all


def test_asof_join_matches_naive_oracle(spark):
    """Window-plan result == the quadratic groupBy-max definition on a
    random-ish grid."""
    rows = [(i % 5, _ts((i * 7) % 59), float(i)) for i in range(80)]
    probe = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    build = spark.createDataFrame(
        [(i % 5, _ts((i * 11) % 59), float(100 + i)) for i in range(40)],
        "uid long, ts timestamp, px double").groupBy("uid", "ts").agg(
        F.max("px").alias("px"))
    got = asof_join(probe, build, "uid", "ts", ["px"])
    naive = (probe.alias("p")
             .join(build.alias("b"),
                   (F.col("p.uid") == F.col("b.uid"))
                   & (F.col("p.ts") >= F.col("b.ts")), "left")
             .groupBy("p.uid", "p.ts", "p.v")
             .agg(F.max(F.struct("b.ts", "b.px")).alias("m"))
             .select(F.col("uid"), F.col("ts"), F.col("v"),
                     F.col("m.ts").alias("asof_ts"),
                     F.col("m.px").alias("asof_px")))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b


def test_sessionize_planted(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(50)),   # gap 40' opens s1
         (1, _ts(55)), (2, _ts(3))],
        "uid long, ts timestamp")
    out = sessionize(df, "uid", "ts", gap="30 minutes")
    got = {(r.uid, r.ts.minute): r.session_id for r in out.collect()}
    assert got == {(1, 0): 0, (1, 10): 0, (1, 50): 1, (1, 55): 1,
                   (2, 3): 0}
    # a gap of exactly `gap` does NOT open a session (strict >)
    df2 = spark.createDataFrame([(1, _ts(0)), (1, _ts(30))],
                                "uid long, ts timestamp")
    vals = {r.ts.minute: r.session_id
            for r in sessionize(df2, "uid", "ts",
                                gap="30 minutes").collect()}
    assert vals == {0: 0, 30: 0}


def test_range_join_planted(spark):
    from varint_rvv_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(30), "b"), (1, _ts(59), "c"),
         (2, _ts(5), "d")],
        "uid long, ts timestamp, tag string")
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(30), "w1"),     # inclusive end catches b
         (1, _ts(25), _ts(58), "w2"),    # overlapping intervals both match
         (2, _ts(6), _ts(10), "w3")],    # starts after the only point
        "uid long, s timestamp, e timestamp, name string")
    out = range_join(pts, iv, "uid", "ts", "s", "e",
                     bucket_us=10 * 60 * 1_000_000)
    got = sorted((r.tag, r.name) for r in out.collect())
    assert got == [("a", "w1"), ("b", "w1"), ("b", "w2")]
    import pytest as _pt
    with _pt.raises(ValueError, match="ambiguous"):
        range_join(pts, pts.withColumnRenamed("uid", "u2"),
                   "tag", "ts", "ts", "ts")


def test_range_join_query_nonempty_and_hash_joined(spark):
    """The contract query actually exercises the join (non-empty at
    sf0.01) and the plan is a hash/sort-merge equi-join, never a
    nested-loop."""
    from varint_rvv_spark.queries import events_range_join_sessions

    df = events_range_join_sessions(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert df.count() > 10


def test_asof_reserved_column_raises(spark):
    import pytest

    probe = spark.createDataFrame([(1, _ts(1), 0)],
                                  "uid long, ts timestamp, _side int")
    build = spark.createDataFrame([(1, _ts(0), 1.0)],
                                  "uid long, ts timestamp, px double")
    with pytest.raises(ValueError, match="internal names"):
        asof_join(probe, build, "uid", "ts", ["px"])


def test_asof_null_build_ts_never_matches(spark):
    """A NULL-ts build row must not leak its payload to early probes
    (review finding: nulls-first ordering made it visible)."""
    probe = spark.createDataFrame([(1, _ts(1), "a")],
                                  "uid long, ts timestamp, tag string")
    build = spark.createDataFrame([(1, None, 99.0), (1, _ts(5), 1.0)],
                                  "uid long, ts timestamp, px double")
    out = asof_join(probe, build, "uid", "ts", ["px"]).collect()[0]
    assert out.asof_px is None and out.asof_ts is None

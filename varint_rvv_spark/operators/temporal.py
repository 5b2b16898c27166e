"""Temporal relational operators: as-of join and sessionization.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas do); the naive
emulations — a range join (quadratic per key) or a groupBy-max
subquery per probe — fall over at scale.  `asof_join` uses the
union + running-window carry-forward pattern instead:

    probe ∪ build  →  one shuffle on the key  →  per-key running
    `last(build_payload, ignorenulls)` over (ts, side) order  →
    filter back to probe rows

Cost: ONE hash exchange of probe+build and a running (streaming)
window frame — no range explosion, no per-probe subquery, bounded
memory per task regardless of key history length.  Ties at equal ts
order build before probe, giving the standard `probe.ts >= build.ts`
(backward) inclusive semantics.

`sessionize` is the classic gap-based session assignment: a lag
window marks gap-opens, a running sum turns marks into session ids —
two window passes over one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(probe: DataFrame, build: DataFrame, key: str,
              ts_col: str, value_cols: list[str],
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: each probe row gains the latest build row (of
    the same `key`) with build.ts <= probe.ts, as columns
    `<prefix><ts_col>` and `<prefix><value_col>` (NULL when no build
    row precedes the probe).

    `build` should be unique per (key, ts) — pre-aggregate if not, or
    which of the tied rows wins is partition-order-dependent.
    """
    reserved = {"_side", "_asof", "_m"} & set(probe.columns)
    if reserved:
        raise ValueError(f"asof_join: probe columns {sorted(reserved)} "
                         f"collide with internal names — rename them")
    bcols = [key, ts_col, *value_cols]
    payload = F.struct(*[F.col(c) for c in [ts_col, *value_cols]])
    # a NULL-ts build row can never satisfy probe.ts >= build.ts, but
    # nulls-first ordering would otherwise make its (non-null) payload
    # struct visible to every early probe row — drop it up front
    b = (build.filter(F.col(ts_col).isNotNull()).select(*bcols)
         .withColumn("_side", F.lit(0))
         .withColumn("_asof", payload))
    extra = [c for c in probe.columns if c not in (key, ts_col)]
    p = (probe
         .withColumn("_side", F.lit(1))
         .withColumn("_asof", F.lit(None).cast(
             b.schema["_asof"].dataType.simpleString())))
    for c in extra:
        b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    b = b.select(p.columns)
    w = (Window.partitionBy(key).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = (p.unionByName(b)
              .withColumn("_m", F.last("_asof", ignorenulls=True).over(w))
              .filter(F.col("_side") == 1))
    out = joined.select(
        *probe.columns,
        F.col(f"_m.{ts_col}").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols])
    return out


def sessionize(df: DataFrame, key: str, ts_col: str,
               gap: str = "30 minutes",
               out_col: str = "session_id") -> DataFrame:
    """Gap-based sessions: a new session opens when the time since the
    key's previous event exceeds `gap` (an INTERVAL literal).  Adds
    `out_col` = 0-based session index per key.  One shuffle on the
    key, two running window passes."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    opens = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    run = (Window.partitionBy(key).orderBy(ts_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_open", opens)
            .withColumn(out_col, F.sum("_open").over(run) - 1)
            .drop("_open"))


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               ts_col: str, start_col: str, end_col: str,
               bucket_us: int = 3_600_000_000) -> DataFrame:
    """Interval containment join: every (point, interval) pair with the
    same `key` and start <= ts <= end (inclusive, multiple matches
    kept).

    Spark's optimizer turns a plain `ts BETWEEN start AND end` join
    into BroadcastNestedLoopJoin (quadratic per key) unless one side
    broadcasts.  This re-expression bucketizes time instead: points
    land in one fixed-width bucket, intervals explode into the buckets
    they cover, and the join becomes a hash equi-join on (key, bucket)
    with a residual containment filter — the standard scale pattern
    (cost ~ points + intervals x avg_span/bucket, never points x
    intervals).  Pick `bucket_us` near the median interval length:
    too small explodes intervals, too large fattens the residual.

    Each (point, interval) pair matches in exactly one bucket (the
    point's), so no post-join dedup is needed.  Column names other
    than `key` must be disjoint between the two inputs.
    """
    if bucket_us <= 0:
        raise ValueError("range_join: bucket_us must be positive")
    overlap = (set(points.columns) & set(intervals.columns)) - {key}
    if overlap:
        raise ValueError(f"range_join: ambiguous columns {sorted(overlap)}"
                         f" — rename one side")
    us = F.lit(int(bucket_us))
    p = points.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                        / us))
    i = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start_col).cast("timestamp"))
                    / us),
            F.floor(F.unix_micros(F.col(end_col).cast("timestamp"))
                    / us))))
    return (p.join(i, [key, "_bin"])
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
            .drop("_bin"))

"""Sequence packing for training-data pipelines.

The standard pretraining data layout (GPT-3 / T5 style, public
recipes): concatenate every document's tokens in a deterministic
order and split the stream into fixed-size sequences of `max_tokens`.
A document's span may straddle a boundary; each document is assigned
to the sequence containing its FIRST token, which makes the
assignment a pure function of the global running token count — no
sequential first-fit recurrence, so it distributes.

The global running count is the scale problem: a naive
`Window.orderBy(id)` moves the whole corpus through ONE task.
`ordered_cumsum` is the two-level factoring (same pattern as
footer_stats.footer_percentile): bucket rows by an order-preserving
equal-width grid on the order column, aggregate one row per bucket,
run the tiny bucket-prefix window over ≤`buckets` aggregated rows,
and add per-bucket partitioned running sums — bit-exact integer
arithmetic, and no exchange ever carries data rows to a single
partition (plan-asserted in tests/test_pack.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ordered_cumsum(df: DataFrame, order_col: str, value_col: str,
                   out_col: str = "cum",
                   buckets: int = 1024) -> DataFrame:
    """Running sum of `value_col` in ascending `order_col` order
    (inclusive of the current row), exact for integer values, with no
    single-partition pass over data rows.

    `order_col` must be numeric with distinct values (ties would make
    the running sum order-dependent); equal-width bucketing only needs
    a monotone row→bucket map, so any value distribution stays
    CORRECT.  Balance does depend on the distribution: a pathological
    order column whose values cluster in a sliver of their range
    collapses most rows into one bucket (one big window partition) —
    use a near-uniform order column (dense ids, row numbers) or
    rescale first.
    """
    bounds = df.agg(F.min(order_col).alias("_gmin"),
                    F.max(order_col).alias("_gmax"))
    span = F.col("_gmax") - F.col("_gmin")
    b = (df.crossJoin(F.broadcast(bounds))
         .withColumn(
             "_bkt",
             F.when(span <= 0, F.lit(0)).otherwise(
                 F.least(F.floor((F.col(order_col) - F.col("_gmin"))
                                 / span * buckets).cast("int"),
                         F.lit(buckets - 1)))))
    bsums = b.groupBy("_bkt").agg(F.sum(value_col).alias("_bw"))
    w_pfx = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prefix = (bsums
              .withColumn("_prev", F.sum("_bw").over(w_pfx) - F.col("_bw"))
              .select("_bkt", "_prev"))
    w_in = (Window.partitionBy("_bkt").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (b.join(F.broadcast(prefix), "_bkt")
            .withColumn(out_col, F.col("_prev")
                        + F.sum(value_col).over(w_in))
            .drop("_bkt", "_gmin", "_gmax", "_prev"))


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   max_tokens: int,
                   buckets: int = 1024) -> DataFrame:
    """Assign each document to its pretraining sequence.

    Adds three columns: `token_start`/`token_end` (the document's
    half-open span in the concatenated token stream, ordered by
    `id_col`) and `seq_id` = token_start div max_tokens (the
    fixed-size chunk holding the document's first token).  Exact
    integer arithmetic end-to-end.
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")
    c = ordered_cumsum(df, id_col, tokens_col, out_col="token_end",
                       buckets=buckets)
    start = F.col("token_end") - F.col(tokens_col)
    return (c.withColumn("token_start", start.cast("long"))
            .withColumn("token_end", F.col("token_end").cast("long"))
            .withColumn("seq_id",
                        F.expr(f"token_start div {int(max_tokens)}")
                        .cast("long")))

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


def bucket_by_span(df: DataFrame, col: str, buckets: int,
                   out_col: str = "_bkt") -> DataFrame:
    """Order-preserving equal-width bucket ids over `col`'s global
    span (one tiny broadcast bounds row — stays in-plan, no driver
    action).  The shared scaffold of every two-level
    no-single-partition pass (ordered_cumsum here,
    footer_stats.footer_percentile): bucketing is monotone in `col`,
    so bucket order = value order and per-bucket work composes with a
    ≤`buckets`-row prefix pass.

    Correct for any value distribution; BALANCE depends on it — a
    pathological column whose values cluster in a sliver of their
    range collapses most rows into one bucket (one big window
    partition).  Use a near-uniform column (dense ids, row numbers)
    or rescale first."""
    bounds = df.agg(F.min(col).alias("_gmin"), F.max(col).alias("_gmax"))
    span = F.col("_gmax") - F.col("_gmin")
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn(
                out_col,
                F.when(span <= 0, F.lit(0)).otherwise(
                    F.least(F.floor((F.col(col) - F.col("_gmin"))
                                    / span * buckets).cast("int"),
                            F.lit(buckets - 1))))
            .drop("_gmin", "_gmax"))


def ordered_cumsum(df: DataFrame, order_col: str, value_col: str,
                   out_col: str = "cum",
                   buckets: int = 1024) -> DataFrame:
    """Running sum of `value_col` in ascending `order_col` order
    (inclusive of the current row), exact for integer values, with no
    single-partition pass over data rows.

    `order_col` must be numeric, NON-NULL, and distinct (ties would
    make the running sum order-dependent; a NULL has no position in
    the order).  NULLs raise at evaluation time rather than silently
    dropping rows — a NULL bucket key would vanish in the prefix
    equi-join while its value still shifted other buckets' prefixes.
    See bucket_by_span for the balance caveat.
    """
    guarded = df.withColumn(order_col, F.when(
        F.col(order_col).isNotNull(), F.col(order_col)).otherwise(
        F.raise_error(F.lit(
            f"ordered_cumsum: NULL in order column {order_col!r} — "
            f"null order values have no position in the running "
            f"order; filter or fill them first"))))
    b = bucket_by_span(guarded, order_col, buckets)
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
            .drop("_bkt", "_prev"))


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

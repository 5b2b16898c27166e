"""Round-6 optimization harness (bench.py stays FROZEN for the driver).

Modes:
  python bench_extra.py time [q1 q2 ...]   min-of-R wall-clock per
      headline query at $SPARK_GRAFT_SF_DIR (same collect() methodology
      as bench.py so numbers are comparable 1:1).
  python bench_extra.py plans [suffix]     write .explain("formatted")
      for every headline query to plans/r06/<q>_<suffix>.txt
      (suffix defaults to "before").
  python bench_extra.py stages <query>     sub-stage decomposition for
      the heavy queries (noop-sink isolation per the optimization
      guide §1.4) — where inside the plan the seconds go.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

HEADLINE = ["tpch_q1", "tpch_q3_shipping", "tpch_q6_revenue",
            "rt_lineitem_q1", "rt_documents_by_lang",
            "dedup_exact_documents", "dedup_minhash_lsh",
            "text_token_counts", "embedding_topk_cosine",
            "window_order_rank", "events_daily",
            "decontaminate_documents", "repetition_stats_documents"]


def _spark():
    from varint_rvv_spark.plans.session import get_spark

    spark = get_spark(app="varint_rvv_spark-bench-extra",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # identical warm-up to bench.py: touch tables + spin python workers
    for t in ["region", "nation", "customer", "orders", "lineitem",
              "documents", "events", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from varint_rvv_spark.operators.encode import encode_chunks_scan
    from varint_rvv_spark.sources.pages import pages_df

    encode_chunks_scan(pages_df(spark, 4 * CPUS, seed=1,
                                partitions=CPUS)).count()
    return spark


def _qs():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def mode_time(names):
    spark = _spark()
    qs = _qs()
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    out = {"sf_dir": SF_DIR, "cpus": CPUS, "reps": REPS,
           "total": round(sum(timings.values()), 3), "queries": timings}
    print(json.dumps(out))
    spark.stop()


def mode_plans(suffix):
    spark = _spark()
    qs = _qs()
    outdir = Path(REPO) / "plans" / "r06"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, build, reps=REPS):
    """min-of-R of build() → noop sink."""
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        _noop(build())
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {best:.3f}s")
    return best


def mode_stages(query):
    from pyspark.sql import functions as F

    spark = _spark()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if query == "decontaminate_documents":
        from varint_rvv_spark.operators.dedup import (
            ngram_decontaminate, word_shingle_array)

        corpus = d.filter(F.col("doc_id") % 17 != 0)
        bench = d.filter(F.col("doc_id") % 17 == 0)
        _timed(spark, "tokens only", lambda: corpus.select(
            F.size(F.split(F.trim("text"), r"\s+")).alias("n")))
        _timed(spark, "gram array (no distinct)", lambda: corpus.select(
            F.size(_gram(5)).alias("n")))
        _timed(spark, "shingle array (distinct)", lambda:
               word_shingle_array(corpus, "doc_id", "text", 5))
        _timed(spark, "shingle explode", lambda:
               word_shingle_array(corpus, "doc_id", "text", 5)
               .select("doc_id", F.explode("shingles").alias("s")))
        _timed(spark, "bench distinct shingles", lambda:
               word_shingle_array(bench.select(
                   F.lit(0).alias("b"), "text"), "b", "text", 5)
               .select(F.explode("shingles").alias("s")).distinct())
        _timed(spark, "full operator", lambda:
               ngram_decontaminate(corpus, bench, "doc_id", "text", k=5))
    elif query == "dedup_minhash_lsh":
        from varint_rvv_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_lsh_pairs,
            minhash_signatures_from_array, word_shingle_array)

        _timed(spark, "shingle array k=3", lambda:
               word_shingle_array(d, "doc_id", "text", 3))
        _timed(spark, "signatures (map-side)", lambda:
               minhash_signatures_from_array(
                   word_shingle_array(d, "doc_id", "text", 3),
                   "doc_id", 16))
        _timed(spark, "full operator", lambda:
               minhash_lsh_pairs(d, "doc_id", "text", k=3,
                                 n_hashes=16, bands=4))
    elif query == "repetition_stats_documents":
        from varint_rvv_spark.operators.dedup import word_gram_expr
        from varint_rvv_spark.operators.text import repetition_stats

        _timed(spark, "gram array k=2", lambda: d.select(
            F.size(word_gram_expr("text", 2)).alias("n")))
        _timed(spark, "gram array sorted", lambda: d.select(
            F.size(F.array_sort(word_gram_expr("text", 2))).alias("n")))
        _timed(spark, "full operator", lambda:
               repetition_stats(d, "doc_id", "text", k=2))
    elif query == "rt_lineitem_q1":
        from varint_rvv_spark.operators.decode import decode_only
        from varint_rvv_spark.operators.encode import encode_chunks
        from varint_rvv_spark.queries import TABLE_SCHEMAS, _roundtrip

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        n = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 8)
        _timed(spark, "scan+shuffle+sort only", lambda:
               li.withColumn("_c", F.pmod(F.xxhash64("l_orderkey"),
                                          F.lit(n)))
               .repartition(n, "_c")
               .sortWithinPartitions("_c", "l_orderkey"))
        _timed(spark, "encode only", lambda:
               encode_chunks(li, key_cols=["l_orderkey"], num_chunks=n))
        enc = encode_chunks(li, key_cols=["l_orderkey"],
                            num_chunks=n).cache()
        enc.count()
        _timed(spark, "decode only (cached chunks)", lambda:
               decode_only(enc))
        enc.unpersist()
        _timed(spark, "full roundtrip+agg", lambda:
               _roundtrip(spark, SF_DIR, "lineitem", "l_orderkey")
               .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
               .groupBy("l_returnflag", "l_linestatus")
               .agg(F.count("*").alias("n")))
    else:
        raise SystemExit(f"no stage decomposition for {query}")
    spark.stop()


def _gram(k):
    from varint_rvv_spark.operators.dedup import word_gram_expr

    return word_gram_expr("text", k)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        mode_time(sys.argv[2:] or HEADLINE)
    elif mode == "plans":
        mode_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif mode == "stages":
        mode_stages(sys.argv[2])
    else:
        raise SystemExit(f"unknown mode {mode}")

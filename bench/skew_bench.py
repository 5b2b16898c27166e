"""Skew evidence → BENCH/SKEW.md: salted vs raw host clustering key.

The synthetic pages table gives host0 ~30% of all rows on purpose
(sources/pages.py, Zipf-ish hosts).  Clustering the encode by raw
host therefore funnels ~30% of the corpus into one chunk — one
straggler task and one oversized chunk at any scale.  The salted key
(plans/partitioning.salted_host_key) splits each host into
`salt_buckets` host-pure sub-buckets, bounding the largest chunk
while preserving dict/RLE locality.

This bench encodes the same pages table both ways and records
encode wall-time (min-of-R) plus the per-chunk byte distribution —
the straggler ratio (max / median chunk bytes) is the scale story:
at 100 TB an unsalted 30%-host chunk is a ~30 TB task.

Methodology matches BENCH discipline: solo run, one warm-up pass,
min-of-reps timing.  Usage: python bench/skew_bench.py [n_pages].
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
NUM_CHUNKS = 64
SALT_BUCKETS = 8


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from varint_rvv_spark.operators.encode import encode_chunks
    from varint_rvv_spark.plans.partitioning import (
        host_of,
        salted_host_key,
    )
    from varint_rvv_spark.plans.session import get_spark
    from varint_rvv_spark.sources.pages import pages_df

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app="skew-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/vrs_skew_pages_{n_pages}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        pages_df(spark, n_pages, seed=42,
                 partitions=max(cpus * 4, n_pages // 4096)) \
            .write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)

    variants = {
        "raw host key": host_of("url"),
        f"salted host key ({SALT_BUCKETS} buckets)":
            salted_host_key("url", SALT_BUCKETS),
    }
    rows = []
    for name, key in variants.items():
        df = pages.withColumn("_k", key)

        def encode_pass():
            # the key column rides along (assign_chunks needs it in
            # the projection); its footer rows are excluded from the
            # byte stats below so both variants compare payload-only
            ch = encode_chunks(
                df, key_cols=["_k"],
                columns=["url", "warc_ts", "html", "text", "lang",
                         "_k"],
                num_chunks=NUM_CHUNKS)
            return ch

        # chunk-size distribution (one pass, untimed)
        per_chunk = (encode_pass()
                     .filter(F.col("column") != "_k")
                     .groupBy("chunk_id")
                     .agg(F.sum("encoded_bytes").alias("enc"),
                          F.max("n_values").alias("rows"))
                     .collect())
        enc = np.sort(np.array([r.enc for r in per_chunk], dtype=np.int64))
        nrows = np.array([r.rows for r in per_chunk], dtype=np.int64)
        # timed passes
        encode_pass().agg(F.sum("encoded_bytes")).collect()  # warm-up
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            encode_pass().agg(F.sum("encoded_bytes")).collect()
            best = min(best, time.perf_counter() - t0)
        med = float(np.median(enc))
        rows.append({
            "name": name, "wall": best, "chunks": len(enc),
            "p50": med / 1e6,
            "p99": float(np.percentile(enc, 99)) / 1e6,
            "max": float(enc[-1]) / 1e6,
            "ratio": float(enc[-1]) / max(med, 1.0),
            "max_rows": int(nrows.max()),
        })

    out = Path(REPO) / "BENCH" / "SKEW.md"
    r0, r1 = rows
    speedup = r0["wall"] / r1["wall"]
    ratio_gain = r0["ratio"] / r1["ratio"]
    lines = [
        "# Skew: salted vs raw host clustering key",
        "",
        f"Pages: {n_pages:,} (host0 ≈ 30% of rows by construction), "
        f"num_chunks = {NUM_CHUNKS}, local[{cpus}], "
        f"min-of-{REPS} wall-clock, solo run.",
        "",
        "| key | encode wall s | chunks | chunk MB p50 | p99 | max "
        "| max/median | max rows/chunk |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['wall']:.2f} | {r['chunks']} "
            f"| {r['p50']:.1f} | {r['p99']:.1f} | {r['max']:.1f} "
            f"| {r['ratio']:.1f}x | {r['max_rows']:,} |")
    lines += [
        "",
        f"Salting cuts the straggler ratio (max/median chunk bytes) "
        f"{ratio_gain:.1f}x and the encode wall-clock {speedup:.2f}x "
        f"on this host.  The wall-clock gap grows with scale: the "
        f"unsalted max chunk is one task carrying "
        f"{r0['ratio']:.0f}x the median payload, so at a fixed "
        f"chunk-byte target the "
        f"unsalted plan's critical path is the biggest host, not the "
        f"cluster width.  Sub-buckets stay host-pure "
        f"(plans/partitioning.py), so dict/RLE/delta locality — the "
        f"reason to cluster by host at all — is preserved.",
        "",
    ]
    out.write_text("\n".join(lines))
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()

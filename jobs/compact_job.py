"""spark-submit entry point: chunk-store compaction maintenance job.

Rolls an encoded chunk store's small chunks (streaming micro-batches,
resume tails) into ~target-size chunks with fresh codec selection and
footer stats, writing a new store root (never in place — swap the
root atomically at the catalog level once verified).

Cluster launch:

    spark-submit --py-files /tmp/engine.zip \
        jobs/compact_job.py --input <store root> --output <new root> \
        [--target-bytes 33554432] [--verify]

Local smoke:

    python jobs/encode_job.py --input /root/testdata/sf0.001 \
        --table events --output /tmp/enc_ev --verify
    python jobs/compact_job.py --input /tmp/enc_ev \
        --output /tmp/enc_ev_c --verify
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="encoded store root")
    ap.add_argument("--output", required=True, help="new store root")
    ap.add_argument("--target-bytes", type=int, default=32 << 20)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from varint_rvv_spark.operators.compact import compact_chunks
    from varint_rvv_spark.operators.decode import verify_roundtrip
    from varint_rvv_spark.plans.session import get_spark
    from varint_rvv_spark.sources.tables import read_chunks, write_encoded

    spark = get_spark(app="varint_rvv_spark-compact", master=args.master)
    chunks = read_chunks(spark, args.input)
    n_before = chunks.select("chunk_id").distinct().count()
    t0 = time.perf_counter()
    compacted = compact_chunks(chunks, target_bytes=args.target_bytes)
    compacted = compacted.cache()
    write_encoded(compacted, args.output, mode="overwrite")
    agg = compacted.agg(F.count("*").alias("n"),
                        F.sum("raw_bytes").alias("raw"),
                        F.sum("encoded_bytes").alias("enc")).collect()[0]
    n_after = compacted.select("chunk_id").distinct().count()
    out = {"chunks_before": n_before, "chunks_after": n_after,
           "chunk_rows": int(agg["n"] or 0),
           "raw_bytes": int(agg["raw"] or 0),
           "encoded_bytes": int(agg["enc"] or 0),
           "sec": round(time.perf_counter() - t0, 3)}
    if args.verify:
        n, bad = verify_roundtrip(compacted)
        out["verified_chunks"] = n
        out["mismatched"] = bad
        if bad:
            print(json.dumps(out))
            raise SystemExit(f"verify failed on {bad}/{n} chunks")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

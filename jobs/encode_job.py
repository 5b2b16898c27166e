"""spark-submit entry point: checkpoint-resumable re-encode job.

Cluster launch (the north_rule shape):

    python -m zipfile -c /tmp/engine.zip varint_rvv_spark
    spark-submit --py-files /tmp/engine.zip \
        --conf spark.sql.adaptive.enabled=true \
        jobs/encode_job.py --input <pages dir/table> --output <root> \
        [--mode scan|hash] [--num-chunks N] [--resume]

Local smoke:

    python jobs/encode_job.py --input /root/testdata/sf0.001 \
        --table documents --output /tmp/enc_docs --verify
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", default=None,
                    help="table name when --input is a testdata dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["scan", "hash"], default="hash")
    ap.add_argument("--key-cols", default=None,
                    help="comma-separated; default first column")
    ap.add_argument("--num-chunks", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from varint_rvv_spark.operators.decode import verify_roundtrip
    from varint_rvv_spark.operators.encode import (
        encode_chunks,
        encode_chunks_scan,
    )
    from varint_rvv_spark.plans.session import get_spark
    from varint_rvv_spark.sources.tables import resume_footer, write_encoded

    spark = get_spark(app="varint_rvv_spark-encode", master=args.master)
    path = args.input
    if args.table:
        path = f"{args.input}/{args.table}.parquet"
    df = spark.read.parquet(path)

    footer = resume_footer(spark, args.output) if args.resume else None
    t0 = time.perf_counter()
    if args.mode == "scan":
        # done_footer also carries the layout fingerprint: resume is
        # refused if the input file set/sizes or split config changed
        chunks = encode_chunks_scan(df, done_footer=footer)
    else:
        keys = (args.key_cols.split(",") if args.key_cols
                else [df.columns[0]])
        chunks = encode_chunks(df, key_cols=keys,
                               num_chunks=args.num_chunks,
                               done_footer=footer)
    chunks = chunks.cache()
    write_encoded(chunks, args.output,
                  mode="append" if args.resume else "overwrite")
    agg = chunks.agg(F.count("*").alias("n"),
                     F.sum("raw_bytes").alias("raw"),
                     F.sum("encoded_bytes").alias("enc")).collect()[0]
    out = {"chunk_rows": int(agg["n"] or 0),
           "raw_bytes": int(agg["raw"] or 0),
           "encoded_bytes": int(agg["enc"] or 0),
           "elapsed_sec": round(time.perf_counter() - t0, 2),
           "resumed": footer is not None}
    if args.verify:
        n, bad = verify_roundtrip(chunks)
        out["verified_chunks"] = n
        out["mismatched_chunks"] = bad
        if bad:
            from varint_rvv_spark.operators.decode import verify_chunks

            out["mismatch_diags"] = [
                {"chunk_id": r["chunk_id"], "column": r["column"],
                 "diag": json.loads(r["diag"] or "{}")}
                for r in (verify_chunks(chunks).filter("NOT ok")
                          .select("chunk_id", "column", "diag")
                          .limit(10).collect())]
    print(json.dumps(out))
    spark.stop()
    if args.verify and out["mismatched_chunks"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

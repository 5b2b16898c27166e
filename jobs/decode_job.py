"""spark-submit entry point: export an encoded chunk store to parquet.

The restore/egress half of jobs/encode_job.py: reads a store root,
infers the table schema from the footer's logical types (or takes
--schema / --columns), decodes every chunk, and writes plain parquet.

Cluster launch:

    spark-submit --py-files /tmp/engine.zip \
        jobs/decode_job.py --input <store root> --output <parquet dir>

Local smoke:

    python jobs/encode_job.py --input /root/testdata/sf0.001 \
        --table events --output /tmp/enc_ev
    python jobs/decode_job.py --input /tmp/enc_ev \
        --output /tmp/dec_ev
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
    ap.add_argument("--output", required=True, help="parquet output dir")
    ap.add_argument("--columns", default=None,
                    help="comma-separated projection + column order "
                         "(default: all stored columns, sorted)")
    ap.add_argument("--schema", default=None,
                    help="explicit Spark schema string (overrides "
                         "footer inference)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from varint_rvv_spark.operators.decode import decode_table
    from varint_rvv_spark.operators.evolve import stored_table_schema
    from varint_rvv_spark.plans.session import get_spark
    from varint_rvv_spark.sources.tables import read_chunks

    spark = get_spark(app="varint_rvv_spark-decode", master=args.master)
    chunks = read_chunks(spark, args.input)
    cols = ([c.strip() for c in args.columns.split(",")]
            if args.columns else None)
    schema = args.schema or stored_table_schema(chunks, cols)
    if cols is None:
        # schema-aware field-name parse (naive comma-split would break
        # on decimal(p,s) / array<...> types)
        from pyspark.sql.types import _parse_datatype_string

        cols = [f.name for f in _parse_datatype_string(schema).fields]
    t0 = time.perf_counter()
    df = decode_table(chunks, cols, schema)
    df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": n, "columns": cols,
                      "sec": round(time.perf_counter() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()

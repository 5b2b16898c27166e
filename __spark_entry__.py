"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship — encode the sf0.001 documents table through the
codec engine and return the per-column footer summary (codec choice,
chunk counts, raw vs encoded bytes).

queries()/oracle_sql(): see varint_rvv_spark/queries.py — engine
round-trips (encode→decode→agg vs direct SQL), relational shell
(TPC-H-style), and training-data ops (dedup, text stats, ANN).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _prep(spark: SparkSession) -> None:
    """Ship the package to executors + pin oracle-stable session conf."""
    from varint_rvv_spark.plans.session import (
        EXCLUDED_OPTIMIZER_RULES,
        ship_package,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # plan-shape only (results are unaffected): stops explode's inferred
    # filter from re-evaluating expensive array builders 2-3x per row —
    # see plans/session.py
    spark.conf.set("spark.sql.optimizer.excludedRules",
                   EXCLUDED_OPTIMIZER_RULES)
    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prep(spark)
    from varint_rvv_spark.queries import codec_footer_documents

    return codec_footer_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from varint_rvv_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from varint_rvv_spark.queries import ORACLES

    return dict(ORACLES)

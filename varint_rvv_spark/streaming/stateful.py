"""Custom stateful streaming operator: cross-batch exact dedup.

`applyInPandasWithState` keeps one tiny state row per content
fingerprint; the first document with a given fingerprint is emitted,
every later duplicate (same micro-batch or any later one) is dropped.
This is the streaming form of operators/dedup.exact_dedup — the
dedup-at-ingest shape of a training-data pipeline, where yesterday's
crawl must suppress today's re-crawls without re-scanning the corpus.

State is per-fingerprint (hash-partitioned by Spark's state store), so
it scales horizontally; at 10^12 docs the state store holds one long
per distinct fingerprint per partition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_seen long"


def streaming_exact_dedup(stream: DataFrame, text_col: str,
                          output_schema: str,
                          out_cols: list[str]) -> DataFrame:
    """Stream → first occurrence per content fingerprint.

    output_schema must list `fingerprint string` plus out_cols.
    """
    keyed = stream.withColumn(
        "fingerprint", F.md5(F.encode(F.col(text_col), "utf-8")))

    def dedup(key, pdf_iter, state: GroupState):
        (fingerprint,) = key
        seen = state.get[0] if state.exists else 0
        total = seen
        best = None
        for pdf in pdf_iter:
            if seen == 0 and len(pdf):
                # deterministic winner within the micro-batch: minimal
                # row by out_cols (arrival order varies by partitioning)
                cand = pdf[out_cols].sort_values(out_cols).iloc[[0]]
                if best is None or (cand.iloc[0].tolist()
                                    < best.iloc[0].tolist()):
                    best = cand.copy()
            total += len(pdf)
        state.update((total,))
        if best is not None:
            best.insert(0, "fingerprint", fingerprint)
            yield best

    return (keyed.groupBy("fingerprint")
            .applyInPandasWithState(dedup, output_schema, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.NoTimeout))

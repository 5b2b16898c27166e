"""Global (cross-chunk) dictionary via broadcast join.

Per-chunk DICT codecs are self-contained; when a low-cardinality
column (lang, event_type, hosts) is shared across 10^12 documents, a
*global* dictionary gives stable codes across every chunk/partition —
useful for downstream joins on codes and for dictionary reuse across
re-encodes.  SURVEY.md §2.3 joins row: "broadcast() for
codec-dictionary joins if a global dict is shared".

Plan shape: one distinct-aggregate (small output) → window row_number
(tiny, single partition of the distinct set) → broadcast hash join —
no shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """Deterministic global dictionary: code = rank in sorted order."""
    w = Window.orderBy(F.col(col))
    return (df.select(col).distinct()
            .withColumn("code", F.row_number().over(w) - 1))


def encode_with_dictionary(df: DataFrame, col: str,
                           dictionary: DataFrame) -> DataFrame:
    """Replace col with its global code (broadcast join, no shuffle)."""
    d = dictionary.withColumnRenamed("code", f"{col}_code")
    return (df.join(F.broadcast(d), col, "left")
            .drop(col))


def decode_with_dictionary(df: DataFrame, col: str,
                           dictionary: DataFrame) -> DataFrame:
    """Inverse mapping: codes → values (broadcast join)."""
    d = (dictionary.withColumnRenamed("code", f"{col}_code"))
    return df.join(F.broadcast(d), f"{col}_code", "left") \
        .drop(f"{col}_code")

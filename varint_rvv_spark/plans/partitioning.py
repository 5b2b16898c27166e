"""Partitioning & skew helpers (SURVEY.md §4 "Spark-side physical
concerns"): host extraction, salted clustering keys, and chunk-count
sizing for target chunk bytes.

Host-level skew is the north_rule's named enemy: url/html sizes follow
the host distribution (Zipf-ish — the synthetic pages table makes
host0 ~30% of rows on purpose).  Clustering chunks by host maximizes
dict/RLE locality for lang and ts-delta locality for warc_ts, but an
unsalted host key overflows chunks under skew; the salt splits each
host into ⌈host_rows / rows_per_chunk⌉-ish sub-buckets while keeping
sub-buckets host-pure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HOST_RE = r"^[a-z]+://([^/]+)"


def host_of(url_col: str = "url") -> Column:
    return F.regexp_extract(F.col(url_col), HOST_RE, 1)


def salted_host_key(url_col: str = "url", salt_buckets: int = 8) -> Column:
    """Host-pure clustering key with bounded skew.

    Same host → ≤ salt_buckets distinct keys; different hosts almost
    never collide within a bucket (xxhash64).  Use as the key_cols
    expression for encode_chunks.
    """
    host = host_of(url_col)
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    return F.concat_ws("#", host, salt.cast("string"))


def with_salted_key(df: DataFrame, url_col: str = "url",
                    salt_buckets: int = 8,
                    out_col: str = "_cluster_key") -> DataFrame:
    return df.withColumn(out_col, salted_host_key(url_col, salt_buckets))


def num_chunks_for(total_bytes: int, target_chunk_bytes: int = 32 << 20,
                   minimum: int = 1) -> int:
    """Chunk count from data volume — the knob that keeps chunks at
    executor-memory-friendly sizes at any scale (100 TB → ~3.3M chunks
    at 32 MB, far beyond any executor count: full parallelism)."""
    return max(minimum, int(total_bytes / max(target_chunk_bytes, 1)))


def skew_report(df: DataFrame, key_col) -> DataFrame:
    """Rows per key, descending — eyeball the skew before choosing
    salt_buckets (an aggregate, safe at any scale)."""
    return (df.groupBy(key_col).count()
            .orderBy(F.desc("count")))

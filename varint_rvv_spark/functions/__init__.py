"""Reusable JVM-side column-expression helpers.

Every helper is a pure Catalyst expression (whole-stage-codegen
friendly, no Python UDFs) with an exact DuckDB twin, so operators
built from them stay oracle-checkable:

* md5-derived integers — Spark ``conv(substring(md5(x),1,n),16,10)``
  ≡ DuckDB ``CAST(('0x' || substr(md5(x),1,n)) AS BIGINT)``;
* array arithmetic — ``aggregate``/``zip_with`` folds ≡ DuckDB
  ``list_dot_product``/``list_sum``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col) -> Column:
    """Whitespace tokens of trimmed text (the shared tokenizer of the
    dedup/simhash/text operators)."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col),
                   r"\s+")


def md5_long(col, hex_chars: int = 15) -> Column:
    """First `hex_chars` hex digits of md5 as a BIGINT (≤15 so the
    value always fits signed 64-bit, which DuckDB's CAST requires)."""
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in 1..15")
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10) \
        .cast("long")


def md5_bucket(col, buckets: int) -> Column:
    """Deterministic, executor-independent bucket in [0, buckets) —
    the reproducible-sampling / salting primitive."""
    return md5_long(F.col(col).cast("string")
                    if isinstance(col, str) else col.cast("string"),
                    8) % buckets


def simhash60_expr(text_col: str) -> Column:
    """60-bit SimHash as a single map-side array expression (no
    explode, no groupBy, no UDF) — the streaming-safe twin of
    operators/dedup.simhash64 (equality asserted in tests).

    Built with F.expr because per-bit extraction needs expression
    arguments (`h div 2^b`) that the pyspark wrappers of
    shiftright/substring only accept as Python ints.  2^b for b ≤ 59
    is exact in a double, so `cast(pow(2, b) as bigint)` is lossless.
    """
    return F.expr(f"""
aggregate(
  zip_with(
    aggregate(
      transform(filter(split(trim({text_col}), '\\\\s+'), t -> t <> ''),
                t -> cast(conv(substring(md5(t), 1, 15), 16, 10)
                          as bigint)),
      array_repeat(0L, 60),
      (acc, h) -> zip_with(
        acc,
        transform(sequence(0, 59),
                  b -> case when (h div cast(pow(2, b) as bigint)) % 2 = 1
                            then 1 else -1 end),
        (a, x) -> a + x)),
    sequence(0, 59),
    (s, b) -> case when s > 0 then cast(pow(2, b) as bigint) else 0L end),
  0L, (a, x) -> a + x)
""".strip())


def vec_dot(a, b) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def vec_norm(col) -> Column:
    """L2 norm of an array<numeric> column."""
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))


def cosine(a, b, a_norm=None, b_norm=None) -> Column:
    """Cosine similarity; pass precomputed norms to reuse them."""
    return vec_dot(a, b) / ((a_norm if a_norm is not None
                             else vec_norm(a))
                            * (b_norm if b_norm is not None
                               else vec_norm(b)))

"""varint_rvv_spark — a from-scratch PySpark-native per-column
lightweight-compression engine (SURVEY.md / BASELINE.json north_rule).

Layers:
* ``codecs``    — numpy/Arrow batch kernels: varint (the reference
  semantics core), delta/FOR, dictionary, RLE, bit-packing, zstd, FSST,
  with per-chunk auto-selection.
* ``sources``   — pages-table synthesis + format abstraction
  (parquet-backed Iceberg-shaped tables).
* ``operators`` — Spark-side encode/decode pipelines (mapInArrow),
  checkpoint-resume, dedup, similarity, text analysis.
* ``plans``     — session builder, partitioning/salting helpers.
"""

__version__ = "0.1.0"

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

# Disable numpy's MADV_HUGEPAGE madvise: on kernels where the THP fault
# path is slow (measured here: first-touch on a 256 MB array 3-10 s vs
# 0.13 s without), every fresh large ndarray allocation stalls.  This
# runs in each process that imports the engine — driver and Spark
# Python workers alike.
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:
    import numpy as _np

    _np.core.multiarray._set_madvise_hugepage(False)
except Exception:  # pragma: no cover - numpy>=2 moved the hook
    pass

"""Encode-pass cost attribution (VERDICT r4 next-round #4).

Where does an encode second go?  Runs the exact per-chunk kernel
(`operators/encode._append_column_row`) single-process over one
60k-row web-pages Arrow batch (the 100 TB column mix: ~80% html
bytes), attributing wall-clock to codec SELECTION (column_stats +
select_codec trial encodes) vs the ACTUAL encode, then cProfile for
the function-level split.  Also A/Bs the zstd level knob
(SPARK_GRAFT_ZSTD_LEVEL) at the engine level.

Usage: python bench/encode_profile.py  → prints the tables that are
recorded in BENCH/ENCODE_PROFILE.md.  Run SOLO (host noise ±10-40%).
"""

from __future__ import annotations

import collections
import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import varint_rvv_spark  # noqa: F401  (THP guard before numpy use)
import numpy as np
import pyarrow as pa

from varint_rvv_spark.codecs import blob as B
from varint_rvv_spark.codecs.select import column_stats, select_codec
from varint_rvv_spark.operators.arrow_bridge import arrow_to_values
from varint_rvv_spark.operators.encode import _append_column_row
from varint_rvv_spark.sources.pages import _pages_arrow_batch

N_ROWS = 60_000
REPS = 3


def selection_split(batch) -> None:
    print("\n## selection vs encode, per column (min of "
          f"{REPS}, {N_ROWS} rows)\n")
    print("| column | codec | MB | stats ms | select ms | encode ms "
          "| sel+stats share |")
    print("|---|---|---|---|---|---|---|")
    tot = collections.Counter()
    for name in batch.schema.names:
        arr = batch.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        out = arrow_to_values(arr)
        vals, dt = out[0], out[1]
        ts = tsel = tenc = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            st = column_stats(vals, dt)
            t1 = time.perf_counter()
            cid = select_codec(vals, dt, st)
            t2 = time.perf_counter()
            B.encode_blob(cid, dt, vals)
            t3 = time.perf_counter()
            ts, tsel, tenc = (min(ts, t1 - t0), min(tsel, t2 - t1),
                              min(tenc, t3 - t2))
        tot.update(stats=ts, select=tsel, encode=tenc)
        nb = vals.nbytes if hasattr(vals, "nbytes") else vals.data.nbytes
        share = 100 * (ts + tsel) / (ts + tsel + tenc)
        print(f"| {name} | {cid} | {nb / 1e6:.1f} | {ts * 1e3:.1f} "
              f"| {tsel * 1e3:.1f} | {tenc * 1e3:.1f} | {share:.1f}% |")
    s = sum(tot.values())
    print(f"\n**TOTAL** stats {tot['stats'] * 1e3:.0f} ms, select "
          f"{tot['select'] * 1e3:.0f} ms, encode "
          f"{tot['encode'] * 1e3:.0f} ms → selection share "
          f"**{100 * (tot['stats'] + tot['select']) / s:.1f}%**")


def kernel_profile(batch) -> None:
    def run():
        rows = collections.defaultdict(list)
        for name in batch.schema.names:
            _append_column_row(rows, 0, name, batch.column(name), {})
        return rows

    run()  # warm
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.runcall(run)
    t1 = time.perf_counter()
    nb = sum(batch.column(n).nbytes for n in batch.schema.names)
    print(f"\n## full kernel profile: {t1 - t0:.2f} s for "
          f"{nb / 1e6:.0f} MB = {nb / 1e9 / (t1 - t0):.3f} GB/s "
          f"single-core\n")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(12)
    print("```")
    print("\n".join(s.getvalue().split("\n")[4:24]))
    print("```")


if __name__ == "__main__":
    ids = np.arange(N_ROWS, dtype=np.uint64)
    batch = _pages_arrow_batch(ids, 42)
    selection_split(batch)
    kernel_profile(batch)

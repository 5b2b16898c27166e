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


def streaming_simhash_neardup(stream: DataFrame, id_col: str,
                              text_col: str, prefix_bits: int = 16,
                              hamming_max: int = 3,
                              max_keep: int = 128) -> DataFrame:
    """Cross-batch *near*-duplicate suppression at ingest.

    Per-doc 60-bit SimHash is computed map-side as a pure array
    expression (functions.simhash60_expr — no explode/groupBy/UDF,
    streaming-safe).  State is keyed by the fingerprint's top
    `prefix_bits` (one state row per prefix bucket, each holding ≤
    `max_keep` kept fingerprints): a new doc is dropped when any kept
    fingerprint in its bucket is within `hamming_max` bits.

    Recall envelope (documented, like one-table multi-probe SimHash):
    near-dups are only compared when they share the prefix — for
    hamming_max=3 over 60 bits, P(all flipped bits avoid a 16-bit
    prefix) ≈ (44/60)^3 ≈ 0.39 worst case, rising steeply for closer
    dups; raise recall by lowering prefix_bits (bigger buckets) or
    running B rotated tables.  Memory is bounded: ≤ 2^prefix_bits ×
    max_keep longs in the state store, hash-partitioned.
    """
    import numpy as np

    from ..functions import simhash60_expr

    keyed = (stream
             .withColumn("simhash", simhash60_expr(text_col))
             .withColumn("bucket",
                         F.shiftright("simhash", 60 - prefix_bits)))
    out_schema = f"bucket long, {id_col} long, simhash long"

    def suppress(key, pdf_iter, state: GroupState):
        (bucket,) = key
        kept = list(state.get[0]) if state.exists else []
        novel_ids, novel_fps = [], []
        # buffer the whole group before sorting: pdf_iter delivers a
        # group as MULTIPLE chunks, so per-chunk sorting would make the
        # survivor depend on chunk boundaries (nondeterministic)
        parts = list(pdf_iter)
        if not parts:
            state.update((kept,))
            return
        whole = pd.concat(parts, ignore_index=True)
        for _, row in whole.sort_values(id_col).iterrows():
            h = int(row["simhash"])
            if any(bin(h ^ int(k)).count("1") <= hamming_max
                   for k in kept):
                continue
            if len(kept) < max_keep:
                kept.append(h)
            novel_ids.append(int(row[id_col]))
            novel_fps.append(h)
        state.update((kept,))
        if novel_ids:
            yield pd.DataFrame({
                "bucket": np.full(len(novel_ids), bucket,
                                  dtype=np.int64),
                id_col: novel_ids, "simhash": novel_fps})

    return (keyed.groupBy("bucket")
            .applyInPandasWithState(suppress, out_schema,
                                    "kept array<long>", "append",
                                    GroupStateTimeout.NoTimeout))


SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def streaming_sessionize(stream: DataFrame, key_col: str, ts_col: str,
                         gap_s: int, output_schema: str) -> DataFrame:
    """Cross-batch gap-based sessionization — the streaming twin of
    operators/temporal.sessionize.

    State per key is one open session (start, last-seen, count).
    Events are folded in event-time order inside each micro-batch; a
    gap greater than `gap_s` CLOSES the open session (emitted
    downstream) and opens a new one.  Sessions therefore emit exactly
    once, when their closing gap is observed — the standard
    at-ingest sessionizer shape; an idle tail session stays open in
    the state store until a later event (or operator teardown) closes
    it, which is the deliberate NoTimeout trade for deterministic
    tests (production would add an event-time timeout + watermark to
    flush idle keys).

    output_schema must be: `<key_col> long, session_start_us long,
    session_end_us long, n_events long`.  State is one tiny row per
    key, hash-partitioned by the state store — scales horizontally.
    """
    gap_us = int(gap_s) * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (k,) = key
        ts_all = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_all.append(pd.to_datetime(pdf[ts_col])
                              .astype("int64") // 1000)
        closed = []
        cur = list(state.get) if state.exists else None
        if ts_all:
            for t in sorted(pd.concat(ts_all).tolist()):
                if cur is None:
                    cur = [t, t, 1]
                elif t > cur[1] + gap_us:
                    closed.append((k, cur[0], cur[1], cur[2]))
                    cur = [t, t, 1]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
        if closed:
            yield pd.DataFrame(closed,
                               columns=[key_col, "session_start_us",
                                        "session_end_us", "n_events"])

    return (stream.groupBy(key_col)
            .applyInPandasWithState(fn, output_schema,
                                    SESSION_STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))

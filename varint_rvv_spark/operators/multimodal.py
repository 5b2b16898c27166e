"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, decoded and feature-extracted in Arrow-batched kernels.

The decode layer is REAL: `..formats` implements byte-level BMP
(24-bit, padded, bottom-up, BGR), mono PCM16 WAV, and a multi-frame
ANIM container in pure numpy.  The synthetic corpus uses closed-form
arithmetic content, so the DuckDB oracle recomputes every feature
(dims, counts, sums, first/last values, byte sizes) from media_id
alone — equality proves the whole generate → container-encode →
Spark-decode loop, including row-flip and channel-swap.

Scale shape: generation and decode are both mapInArrow over the id
range / payload column — zero shuffles, one Arrow crossing, batches
stream.  Swapping in PIL/pyav for real-world files changes only the
decode call inside the kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from .. import formats

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, n_bytes long")

MIME = {"image": "image/bmp", "audio": "audio/wav",
        "video": "video/x-anim-bmp"}

FEATURE_SCHEMA = ("media_id long, kind string, width int, height int, "
                  "n_frames int, n_vals long, sum_vals long, "
                  "first_val int, last_val int, n_bytes long")


def synth_media_df(spark, n: int = 256, partitions: int = 4) -> DataFrame:
    """Deterministic media table with real container payloads,
    generated executor-side (mapInArrow over the id range)."""

    def gen(batch_iter):
        for batch in batch_iter:
            ids = batch.column(0).to_pylist()
            rows = {"media_id": [], "kind": [], "payload": [],
                    "mime": [], "n_bytes": []}
            for mid in ids:
                kind, payload = formats.synth_payload(mid)
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["mime"].append(MIME[kind])
                rows["n_bytes"].append(len(payload))
            yield pa.RecordBatch.from_pydict(rows)

    return spark.range(0, n, numPartitions=partitions) \
        .mapInArrow(gen, MEDIA_SCHEMA)


def _features_of(kind: str, payload: bytes) -> dict:
    """Parse the container (headers, not trust) and aggregate content."""
    if kind == "image":
        px = formats.decode_bmp(payload)
        frames = [px]
    elif kind == "video":
        frames = formats.decode_anim(payload)
    elif kind == "audio":
        samples, _rate = formats.decode_wav(payload)
        s = samples.astype(np.int64)
        return {"width": 0, "height": 0, "n_frames": 0,
                "n_vals": len(s), "sum_vals": int(s.sum()),
                "first_val": int(s[0]), "last_val": int(s[-1])}
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    flat = np.concatenate([f.reshape(-1) for f in frames]).astype(np.int64)
    h, w, _ = frames[0].shape
    return {"width": w, "height": h, "n_frames": len(frames),
            "n_vals": len(flat), "sum_vals": int(flat.sum()),
            "first_val": int(flat[0]), "last_val": int(flat[-1])}


def extract_features(df: DataFrame) -> DataFrame:
    """mapInArrow feature extraction over binary media payloads."""

    def fn(batch_iter):
        for batch in batch_iter:
            d = batch.to_pydict()
            out = {"media_id": d["media_id"], "kind": d["kind"],
                   "width": [], "height": [], "n_frames": [],
                   "n_vals": [], "sum_vals": [], "first_val": [],
                   "last_val": [], "n_bytes": []}
            for kind, payload in zip(d["kind"], d["payload"]):
                m = _features_of(kind, bytes(payload))
                for k, v in m.items():
                    out[k].append(v)
                out["n_bytes"].append(len(payload))
            yield pa.RecordBatch.from_pydict(
                out, schema=pa.schema([
                    ("media_id", pa.int64()), ("kind", pa.string()),
                    ("width", pa.int32()), ("height", pa.int32()),
                    ("n_frames", pa.int32()), ("n_vals", pa.int64()),
                    ("sum_vals", pa.int64()), ("first_val", pa.int32()),
                    ("last_val", pa.int32()), ("n_bytes", pa.int64())]))

    return df.mapInArrow(fn, FEATURE_SCHEMA)


def media_embeddings(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Content-derived embedding per media row: mean of `feat_dim`
    equal slices of the decoded scalar stream (pixels or samples) —
    the stand-in for a real model encoder, with the same batch shape."""

    def fn(batch_iter):
        for batch in batch_iter:
            d = batch.to_pydict()
            feats = []
            for kind, payload in zip(d["kind"], d["payload"]):
                payload = bytes(payload)
                if kind == "audio":
                    vals = formats.decode_wav(payload)[0].astype(np.float64)
                elif kind == "image":
                    vals = formats.decode_bmp(payload).reshape(-1) \
                        .astype(np.float64)
                else:
                    vals = np.concatenate(
                        [f.reshape(-1) for f in
                         formats.decode_anim(payload)]).astype(np.float64)
                chunks = np.array_split(vals, feat_dim)
                feats.append(np.array([c.mean() for c in chunks],
                                      dtype=np.float32))
            yield pa.RecordBatch.from_pydict(
                {"media_id": d["media_id"],
                 "feat": [f.tolist() for f in feats]},
                schema=pa.schema([("media_id", pa.int64()),
                                  ("feat", pa.list_(pa.float32()))]))

    return df.mapInArrow(fn, "media_id long, feat array<float>")


def frame_sample_plan(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) into
    frame tasks (media_id, frame_idx) — the fan-out layer a per-frame
    extractor plugs into."""
    feats = extract_features(df)
    return (feats.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("n_frames") - 1,
                                         F.lit(every_n)))
                    .alias("frame_idx")))

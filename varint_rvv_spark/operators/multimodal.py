"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed in Arrow-batched kernels via mapInPandas.

The decode/feature-extraction inner step is STUBBED (no image/audio
libraries in this container): `decode_image_stub` produces a
deterministic fake decode (dimensions + checksum derived from bytes),
clearly marked.  Everything Spark-side — schema, partitioning, UDF
signature, batch shape — is real and tested; swapping the stub for
PIL/libav is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, n_bytes long")

FEATURE_SCHEMA = ("media_id long, kind string, width int, height int, "
                  "n_frames int, checksum string, feat array<float>")

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def synth_media_df(spark, n: int = 256, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payload + metadata)."""
    base = spark.range(0, n, numPartitions=partitions)
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.col("id") % 3 + 1).cast("int"))
    payload = F.encode(F.concat(F.lit("MEDIA:"), F.col("id").cast("string"),
                                F.lit(":"),
                                F.repeat(F.md5(F.col("id").cast("string")),
                                         8)), "utf-8")
    mime = F.concat(kind, F.lit("/x-synthetic"))
    return base.select(F.col("id").alias("media_id"), kind.alias("kind"),
                       payload.alias("payload"), mime.alias("mime"),
                       F.length(payload).cast("long").alias("n_bytes"))


def decode_image_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake of an image/audio decode.

    Real deployment: replace with PIL.Image.open / soundfile / pyav.
    Raises NotImplementedError if somebody expects real pixels.
    """
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real decode path not wired yet")
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 16,
        "checksum": h.hex()[:16],
    }


def extract_features(df: DataFrame, batch_feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Batch shape is the real thing: one pandas DataFrame per Arrow
    batch, vectorized per-batch numpy for the feature vector, and the
    per-payload decode isolated in `decode_image_stub`.
    """
    def fn(batch_iter):
        for pdf in batch_iter:
            metas = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            meta_df = pd.DataFrame(metas)
            # deterministic fake embedding: first bytes of sha256,
            # scaled — vectorized over the batch
            raw = np.stack([
                np.frombuffer(hashlib.sha256(bytes(p)).digest()
                              [:batch_feat_dim], dtype=np.uint8)
                for p in pdf["payload"]]).astype(np.float32) / 255.0
            out = pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "width": meta_df["width"].astype("int32"),
                "height": meta_df["height"].astype("int32"),
                "n_frames": meta_df["n_frames"].astype("int32"),
                "checksum": meta_df["checksum"],
                "feat": list(raw),
            })
            yield out

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) into
    frame tasks (media_id, frame_idx) without decoding — the shuffle/
    fan-out layer a real frame extractor plugs into."""
    feats = extract_features(df)
    return (feats.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("n_frames") - 1,
                                         F.lit(every_n)))
                    .alias("frame_idx")))

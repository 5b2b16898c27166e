"""Pure-numpy media containers: BMP (24-bit), WAV (PCM16), and a
minimal multi-frame animation wrapper — the honest decode layer under
the multimodal operators.

No image/audio libraries exist in this container, so these are real
byte-level encoders/decoders for formats simple enough to implement
exactly: BMP handles the 4-byte row padding, bottom-up row order and
BGR channel order; WAV is a canonical 44-byte-header PCM16 mono file;
ANIM is a length-prefixed sequence of BMP frames (magic b"ANIM").

The synthetic generators use closed-form arithmetic patterns
(value(i) = (seed + i) % M) so a SQL oracle can recompute decoded
aggregates from the media id alone — equality proves the byte-level
round trip, including row-flip and channel-swap.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------- BMP (24-bit uncompressed, bottom-up, BGR) ----------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB top-down logical array → BMP file bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 \
            or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    rowstride = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, rowstride), dtype=np.uint8)
    # logical RGB top-down → stored BGR bottom-up
    img[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    size = 54 + h * rowstride
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       h * rowstride, 2835, 2835, 0, 0)
    return header + info + img.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file bytes → (h, w, 3) uint8 RGB top-down logical array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    bisize, w, h, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bisize < 40 or planes != 1 or bpp != 24 or comp != 0 or h <= 0:
        raise ValueError(f"unsupported BMP variant "
                         f"(bpp={bpp}, comp={comp}, h={h})")
    rowstride = (w * 3 + 3) // 4 * 4
    need = offset + h * rowstride
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} < {need} bytes")
    img = np.frombuffer(data, dtype=np.uint8, count=h * rowstride,
                        offset=offset).reshape(h, rowstride)
    # stored BGR bottom-up → logical RGB top-down
    return img[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


# ---------- WAV (PCM16 mono) ----------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples → canonical 44-byte-header mono PCM WAV."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects 1-D int16")
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples, sample rate)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", data, 20)
    if fmt != 1 or ch != 1 or bits != 16 or data[36:40] != b"data":
        raise ValueError(f"unsupported WAV variant "
                         f"(fmt={fmt}, ch={ch}, bits={bits})")
    n = struct.unpack_from("<I", data, 40)[0]
    if len(data) < 44 + n:
        raise ValueError(f"truncated WAV: {len(data)} < {44 + n} bytes")
    return np.frombuffer(data, dtype="<i2", count=n // 2, offset=44), rate


# ---------- ANIM (length-prefixed BMP frame sequence) ----------


def encode_anim(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) uint8 frames → magic + count + framed BMPs."""
    out = [struct.pack("<4sH", b"ANIM", len(frames))]
    for f in frames:
        blob = encode_bmp(f)
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def decode_anim(data: bytes) -> list[np.ndarray]:
    if len(data) < 6 or data[:4] != b"ANIM":
        raise ValueError("not an ANIM payload")
    n = struct.unpack_from("<H", data, 4)[0]
    frames, pos = [], 6
    for _ in range(n):
        if len(data) < pos + 4:
            raise ValueError("truncated ANIM frame table")
        ln = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        frames.append(decode_bmp(data[pos:pos + ln]))
        pos += ln
    return frames


# ---------- deterministic synthetic content (SQL-recomputable) ----------
# image:  w = 16 + (id*7) % 33,  h = 16 + (id*11) % 29,
#         pixel(i)   = (id*131 + i) % 256           (logical RGB order)
# video:  n_frames = 1 + id % 4, frame f pixel(i) = (id*131 + f*17 + i) % 256
# audio:  n = 256 + (id*37) % 512, rate 8000,
#         sample(i)  = ((id*131 + 7*i) % 65536) - 32768


def synth_dims(media_id: int) -> tuple[int, int]:
    return 16 + (media_id * 7) % 33, 16 + (media_id * 11) % 29


def synth_image(media_id: int, frame: int = 0) -> np.ndarray:
    w, h = synth_dims(media_id)
    seed = (media_id * 131 + frame * 17) % 256
    vals = (seed + np.arange(h * w * 3, dtype=np.int64)) % 256
    return vals.astype(np.uint8).reshape(h, w, 3)


def synth_audio(media_id: int) -> np.ndarray:
    n = 256 + (media_id * 37) % 512
    vals = (media_id * 131 + 7 * np.arange(n, dtype=np.int64)) % 65536
    return (vals - 32768).astype(np.int16)


def synth_payload(media_id: int) -> tuple[str, bytes]:
    """kind + container bytes for one media id (kind = id % 3)."""
    m = media_id % 3
    if m == 0:
        return "image", encode_bmp(synth_image(media_id))
    if m == 1:
        return "audio", encode_wav(synth_audio(media_id))
    n_frames = 1 + media_id % 4
    return "video", encode_anim(
        [synth_image(media_id, f) for f in range(n_frames)])

"""Byte-level media container tests (formats.py): round trips across
padding widths, malformed-payload probes, and synth closed forms.
No Spark — pure numpy."""

import numpy as np
import pytest

from varint_rvv_spark import formats as fm


@pytest.mark.parametrize("w", [16, 17, 18, 19, 1])
def test_bmp_roundtrip_padding_widths(w):
    rng = np.random.default_rng(w)
    px = rng.integers(0, 256, (13, w, 3)).astype(np.uint8)
    blob = fm.encode_bmp(px)
    rowstride = (w * 3 + 3) // 4 * 4
    assert len(blob) == 54 + 13 * rowstride
    assert (fm.decode_bmp(blob) == px).all()


def test_bmp_row_order_and_channels():
    """Top-left red pixel must survive the bottom-up BGR storage."""
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)  # logical top-left, pure red
    blob = fm.encode_bmp(px)
    # stored: bottom row first, BGR → red byte is last of the stored
    # top-left... simply assert the decode restores it
    back = fm.decode_bmp(blob)
    assert tuple(back[0, 0]) == (255, 0, 0)
    assert back.sum() == 255


def test_wav_roundtrip_and_rate():
    s = np.random.default_rng(3).integers(-32768, 32768, 777) \
        .astype(np.int16)
    dec, rate = fm.decode_wav(fm.encode_wav(s, 44100))
    assert rate == 44100 and (dec == s).all()


def test_anim_roundtrip():
    frames = [fm.synth_image(5, f) for f in range(4)]
    back = fm.decode_anim(fm.encode_anim(frames))
    assert len(back) == 4
    assert all((a == b).all() for a, b in zip(frames, back))


def test_malformed_payloads_raise():
    px = fm.synth_image(0)
    blob = fm.encode_bmp(px)
    with pytest.raises(ValueError, match="truncated BMP"):
        fm.decode_bmp(blob[:-10])
    with pytest.raises(ValueError, match="not a BMP"):
        fm.decode_bmp(b"XX" + blob[2:])
    wav = fm.encode_wav(fm.synth_audio(1))
    with pytest.raises(ValueError, match="truncated WAV"):
        fm.decode_wav(wav[:-2])
    with pytest.raises(ValueError, match="not a WAV"):
        fm.decode_wav(b"JUNK" + wav[4:])
    anim = fm.encode_anim([px])
    with pytest.raises(ValueError, match="not an ANIM"):
        fm.decode_anim(anim[1:])
    # 8-bit BMP rejected, not mis-decoded
    bad = bytearray(blob)
    bad[28] = 8  # biBitCount
    with pytest.raises(ValueError, match="unsupported BMP"):
        fm.decode_bmp(bytes(bad))


def test_synth_closed_forms():
    """The decoded aggregates equal the arithmetic the oracle uses."""
    for mid in range(12):
        kind, payload = fm.synth_payload(mid)
        if kind == "image":
            px = fm.decode_bmp(payload)
            w, h = fm.synth_dims(mid)
            assert px.shape == (h, w, 3)
            n = w * h * 3
            assert px.reshape(-1)[0] == (mid * 131) % 256
            assert int(px.astype(np.int64).sum()) == sum(
                (mid * 131 + i) % 256 for i in range(n))
        elif kind == "audio":
            s, rate = fm.decode_wav(payload)
            assert rate == 8000
            n = 256 + (mid * 37) % 512
            assert len(s) == n
            assert s[-1] == ((mid * 131 + 7 * (n - 1)) % 65536) - 32768
        else:
            frames = fm.decode_anim(payload)
            assert len(frames) == 1 + mid % 4
            assert frames[-1].reshape(-1)[0] == \
                (mid * 131 + (len(frames) - 1) * 17) % 256

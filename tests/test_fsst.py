"""FSST-style symbol-table codec tests (codec 7, SURVEY.md §7 step 7)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_rvv_spark import codecs as C
from varint_rvv_spark.codecs import blob as B
from varint_rvv_spark.codecs.fsst import (
    fsst_compress,
    fsst_decompress,
    train_symbols,
)


def roundtrip(items, dtype_code):
    va = B.VarlenArray.from_pylist(items)
    blob = C.encode_blob(B.FSST, dtype_code, va)
    out = C.decode_values(blob)
    assert out.to_pylist(dtype_code == B.DT_STR) == items
    return len(blob), va.nbytes


def test_urls_compress():
    urls = [f"https://host{i % 50}.example.com/p{i * 7 % 99999}/d{i}"
            for i in range(5000)]
    enc, raw = roundtrip(urls, B.DT_STR)
    assert enc < raw / 2


def test_escape_ambiguity_0xff():
    tricky = [b"\xff" * 10, b"", b"\xff\x00\xff",
              bytes(range(256)) * 3, b"aaaa" * 50] * 20
    roundtrip(tricky, B.DT_BIN)


def test_incompressible_random():
    rng = np.random.default_rng(3)
    rnd = [bytes(rng.integers(0, 256, 100, dtype=np.uint8))
           for _ in range(200)]
    enc, raw = roundtrip(rnd, B.DT_BIN)
    assert enc < raw * 1.2  # bounded expansion


def test_empty_and_single():
    roundtrip([], B.DT_STR)
    roundtrip([""], B.DT_STR)
    roundtrip(["x"], B.DT_STR)


def test_stream_level_roundtrip():
    buf = np.frombuffer(b"abcdabcdabcdabcd" * 100 + b"tail", dtype=np.uint8)
    syms = train_symbols(buf)
    stream = fsst_compress(buf, syms)
    back = fsst_decompress(stream, syms, buf.size)
    np.testing.assert_array_equal(back, buf)
    assert stream.size < buf.size


def test_auto_select_falls_back_when_fsst_loses():
    urls = [f"https://host{i % 50}.example.com/p{i}" for i in range(3000)]
    va = B.VarlenArray.from_pylist(urls)
    codec = C.select_codec(va, B.DT_STR)
    blob, chosen, _ = C.encode_auto(va, B.DT_STR)
    fsst_size = len(C.encode_blob(B.FSST, B.DT_STR, va))
    assert len(blob) <= fsst_size  # winner is never worse than FSST
    assert chosen == codec


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=60))
def test_property_fsst_roundtrip(items):
    roundtrip(items, B.DT_BIN)


def test_select_nonoverlap_matches_sequential_greedy():
    """The vectorized run-parity pruning equals exact sequential greedy
    (the old two-pass version could cascade-drop legal matches)."""
    from varint_rvv_spark.codecs.fsst import _select_nonoverlap

    rng = np.random.default_rng(42)
    for L in (2, 4, 8):
        for _ in range(50):
            n = int(rng.integers(1, 400))
            pos = np.unique(rng.integers(0, 256, n)).astype(np.int64)
            ccum = np.zeros(300 + L, dtype=np.int64)
            got = _select_nonoverlap(pos.copy(), L, ccum)
            # reference: first-per-block, then sequential greedy
            kept, last_block, last_pos = [], None, -10**9
            for p in pos:
                b = p // L
                if b == last_block:
                    continue
                last_block = b
                if p >= last_pos + L:
                    kept.append(p)
                    last_pos = p
            assert got.tolist() == kept
            assert (np.diff(got) >= L).all() if got.size > 1 else True

"""Kernel unit tests for the varint core (SURVEY.md §5 items 1-3).

Re-expresses the reference's round-trip example
(/root/reference/example/example.c:83-186) and edge cases as pytest:
distribution-parameterized random arrays, continuation-boundary values
(thresholds from /root/reference/lib/src/varint_encode.c:11-55),
unaligned tails, and property-based round trips.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_rvv_spark.codecs import (
    varint_byte_lengths,
    varint_decode,
    varint_decode_scalar,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)

# Distributions mirror /root/reference/benchmark/benchmark.cc:191-215.
DISTS = {
    "heavily_skewed": (95, 2, 1, 1, 1),
    "mostly_1byte": (90, 4, 3, 2, 1),
    "mixed": (81, 7, 6, 5, 1),
    "diverse": (72, 13, 9, 5, 1),
    "uniform": (20, 20, 20, 20, 20),
}
# Value range per byte-length, from benchmark.cc:42-46.
RANGES = [(0, 1 << 7), (1 << 7, 1 << 14), (1 << 14, 1 << 21),
          (1 << 21, 1 << 28), (1 << 28, 1 << 32)]
SIZES = [1, 15, 16, 17, 1000, 65536]

BOUNDARIES = np.array(
    [0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
     268435455, 268435456, 2**28, 2**31, 4294967295],
    dtype=np.uint64)


def gen_dist(dist, n, seed=12345):
    """Deterministic generator mirroring benchmark.cc:33-77."""
    rng = np.random.default_rng(seed)
    pcts = np.array(dist, dtype=np.float64)
    lens = rng.choice(5, size=n, p=pcts / pcts.sum())
    lo = np.array([r[0] for r in RANGES], dtype=np.uint64)
    hi = np.array([r[1] for r in RANGES], dtype=np.uint64)
    u = rng.random(n)
    return (lo[lens] + (u * (hi[lens] - lo[lens]).astype(np.float64))
            .astype(np.uint64))


@pytest.mark.parametrize("dist", list(DISTS))
@pytest.mark.parametrize("n", SIZES)
def test_roundtrip_distributions(dist, n):
    vals = gen_dist(DISTS[dist], n)
    enc = varint_encode(vals)
    dec = varint_decode(enc)
    np.testing.assert_array_equal(dec, vals)


@pytest.mark.parametrize("dist", list(DISTS))
def test_vectorized_matches_scalar_oracle(dist):
    vals = gen_dist(DISTS[dist], 1000)
    enc = varint_encode(vals)
    np.testing.assert_array_equal(varint_decode(enc),
                                  varint_decode_scalar(enc))


def test_boundaries_roundtrip_and_lengths():
    enc = varint_encode(BOUNDARIES)
    np.testing.assert_array_equal(varint_decode(enc), BOUNDARIES)
    expected_lens = np.array([1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 5, 5])
    np.testing.assert_array_equal(varint_byte_lengths(BOUNDARIES),
                                  expected_lens)
    np.testing.assert_array_equal(varint_decode_scalar(enc), BOUNDARIES)


def test_golden_bytes():
    """Canonical-encoding goldens: exact byte streams.

    LEB128 admits exactly one minimal encoding per value
    (varint_encode.c:11-55), so these bytes equal the reference
    encoder's output.
    """
    assert varint_encode(np.array([0], dtype=np.uint64)).tobytes() == b"\x00"
    assert varint_encode(np.array([1], dtype=np.uint64)).tobytes() == b"\x01"
    assert varint_encode(np.array([127], dtype=np.uint64)).tobytes() == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)).tobytes() == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)).tobytes() == b"\xac\x02"
    assert (varint_encode(np.array([4294967295], dtype=np.uint64)).tobytes()
            == b"\xff\xff\xff\xff\x0f")  # 4-bit 5th byte, vecshift.c:107
    assert (varint_encode(np.array([1, 128, 16384], dtype=np.uint64)).tobytes()
            == b"\x01\x80\x01\x80\x80\x01")


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)).size == 0
    assert varint_decode(np.empty(0, dtype=np.uint8)).size == 0


def test_fast_path_all_one_byte():
    vals = np.arange(128, dtype=np.uint64) % 128
    enc = varint_encode(vals)
    assert enc.size == vals.size  # all 1-byte
    np.testing.assert_array_equal(varint_decode(enc), vals)


def test_worst_case_all_five_byte():
    vals = np.full(65536, 2**32 - 1, dtype=np.uint64)
    enc = varint_encode(vals)
    assert enc.size == 5 * vals.size
    np.testing.assert_array_equal(varint_decode(enc), vals)


def test_uint64_extension():
    vals = np.array([2**32, 2**42, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    enc = varint_encode(vals)
    np.testing.assert_array_equal(varint_decode(enc), vals)
    np.testing.assert_array_equal(varint_decode_scalar(enc), vals)
    assert varint_byte_lengths(vals).tolist() == [5, 7, 9, 10]


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        varint_decode(np.array([0x80], dtype=np.uint8))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_property_roundtrip(xs):
    vals = np.array(xs, dtype=np.uint64)
    enc = varint_encode(vals)
    assert enc.size == int(varint_byte_lengths(vals).sum()) if xs else enc.size == 0
    np.testing.assert_array_equal(varint_decode(enc), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=300))
def test_property_zigzag(xs):
    vals = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(zigzag_decode(zigzag_encode(vals)), vals)


@pytest.mark.parametrize("dist", list(DISTS))
def test_gather_kernel_matches_active_set(dist):
    """K6 parity kernel (masked-vbyte-style gather expand) is
    bit-identical to the default kernel on every distribution."""
    from varint_rvv_spark.codecs.varint import varint_decode_gather

    vals = gen_dist(DISTS[dist], 65536)
    enc = varint_encode(vals)
    assert (varint_decode_gather(enc) == vals).all()
    assert (varint_decode_gather(enc, np.uint32)
            == vals.astype(np.uint32)).all()


def test_gather_kernel_u64_and_errors():
    from varint_rvv_spark.codecs.varint import varint_decode_gather

    v = np.array([0, 1, 2**63, 2**64 - 1, 127, 128], dtype=np.uint64)
    enc = varint_encode(v)
    assert (varint_decode_gather(enc) == v).all()
    with pytest.raises(ValueError, match="truncated"):
        varint_decode_gather(enc[:-1])
    assert varint_decode_gather(np.empty(0, dtype=np.uint8)).size == 0
    # all-1-byte fast path
    ones = varint_encode(np.arange(100, dtype=np.uint64))
    assert (varint_decode_gather(ones) == np.arange(100)).all()


def test_decode_rejects_u32_overflow_top_byte():
    """A 5-byte varint whose top byte exceeds 0x0F must raise, not wrap
    modulo 2^32 (ADVICE round-2: the u32 accumulator widened the silent
    wrap surface)."""
    import numpy as np
    import pytest

    from varint_rvv_spark.codecs.varint import (
        varint_decode,
        varint_decode_gather,
    )

    # 0x80 0x80 0x80 0x80 0x10 → value 2^32 (needs 33 bits)
    bad = np.array([0x80, 0x80, 0x80, 0x80, 0x10], dtype=np.uint8)
    for fn in (varint_decode, varint_decode_gather):
        with pytest.raises(ValueError, match="overflow"):
            fn(bad, out_dtype=np.uint32)
    # the max legal uint32 still decodes
    good = np.array([0xFF, 0xFF, 0xFF, 0xFF, 0x0F], dtype=np.uint8)
    assert int(varint_decode(good, out_dtype=np.uint32)[0]) == 2**32 - 1
    assert int(varint_decode_gather(good,
                                    out_dtype=np.uint32)[0]) == 2**32 - 1


def test_decode_rejects_u64_overflow_top_byte():
    import numpy as np
    import pytest

    from varint_rvv_spark.codecs.varint import (
        varint_decode,
        varint_decode_gather,
    )

    bad = np.array([0x80] * 9 + [0x02], dtype=np.uint8)  # 2^65
    for fn in (varint_decode, varint_decode_gather):
        with pytest.raises(ValueError, match="overflow"):
            fn(bad, out_dtype=np.uint64)
    good = np.array([0xFF] * 9 + [0x01], dtype=np.uint8)
    assert int(varint_decode(good, out_dtype=np.uint64)[0]) == 2**64 - 1

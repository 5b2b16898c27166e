"""Codec-family round-trip + auto-selection tests (SURVEY.md §2.4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_rvv_spark import codecs as C
from varint_rvv_spark.codecs import VarlenArray, blob as B


def rng():
    return np.random.default_rng(42)


def assert_values_equal(a, b, dtype_code):
    if B.is_varlen(dtype_code):
        np.testing.assert_array_equal(a.offsets, b.offsets)
        np.testing.assert_array_equal(a.data, b.data)
    else:
        np.testing.assert_array_equal(a, b)


NUMERIC_CASES = {
    (B.DT_U32, "small"): np.arange(1000, dtype=np.uint32),
    (B.DT_U32, "max"): np.array([0, 2**32 - 1, 7], dtype=np.uint32),
    (B.DT_U64, "wide"): rng().integers(0, 2**63, 1000).astype(np.uint64),
    (B.DT_I64, "negative"): rng().integers(-(2**40), 2**40, 1000),
    (B.DT_I64, "ts_like"): (1704067200_000_000
                            + np.cumsum(rng().integers(0, 5000, 1000))),
    (B.DT_I64, "extremes"): np.array([-(2**63), 2**63 - 1, 0, -1, 1]),
    (B.DT_I32, "runs"): np.repeat(np.arange(20, dtype=np.int32), 50),
    (B.DT_F64, "floats"): rng().normal(size=500),
    (B.DT_F32, "f32"): rng().normal(size=500).astype(np.float32),
}

INT_CODECS = [B.RAW, B.VARINT, B.DELTA_VARINT, B.BITPACK, B.DICT, B.RLE, B.ZSTD]
FLOAT_CODECS = [B.RAW, B.DICT, B.RLE, B.ZSTD]


@pytest.mark.parametrize("key", list(NUMERIC_CASES))
def test_numeric_roundtrip_all_codecs(key):
    dtype_code, _ = key
    vals = np.ascontiguousarray(NUMERIC_CASES[key], dtype=B.NUMERIC_NP[dtype_code])
    codec_list = (FLOAT_CODECS if B.NUMERIC_NP[dtype_code].kind == "f"
                  else INT_CODECS)
    for codec in codec_list:
        blob = C.encode_blob(codec, dtype_code, vals)
        out, got_codec, got_dt = C.decode_blob(blob)
        assert got_codec == codec and got_dt == dtype_code
        np.testing.assert_array_equal(out, vals, err_msg=B.CODEC_NAMES[codec])
        assert out.dtype == vals.dtype


VARLEN_CASES = {
    "langs": ["en"] * 50 + ["de"] * 20 + ["fr", "es", "zh"] * 10,
    "urls": [f"https://host{i % 7}.example.com/path/{i}" for i in range(200)],
    "empty_strings": ["", "a", "", "bb", ""],
    "binary": [bytes([i % 256, 255 - i % 256]) * (i % 5) for i in range(100)],
    "unicode": ["héllo", "wörld", "日本語", "кириллица"] * 25,
    "single": ["only"],
    "nothing": [],
}


@pytest.mark.parametrize("name", list(VARLEN_CASES))
def test_varlen_roundtrip_all_codecs(name):
    items = VARLEN_CASES[name]
    dtype_code = B.DT_BIN if items and isinstance(items[0], bytes) else B.DT_STR
    va = VarlenArray.from_pylist(items)
    for codec in [B.RAW, B.ZSTD, B.DICT, B.RLE]:
        blob = C.encode_blob(codec, dtype_code, va)
        out = C.decode_values(blob)
        assert_values_equal(out, va, dtype_code)
        assert out.to_pylist(as_str=dtype_code == B.DT_STR) == [
            x if isinstance(x, (str, bytes)) else x for x in items]


def test_varlen_take():
    va = VarlenArray.from_pylist(["aa", "b", "", "cccc", "dd"])
    got = va.take(np.array([4, 0, 0, 2]))
    assert got.to_pylist(as_str=True) == ["dd", "aa", "aa", ""]


def test_dict_compresses_low_cardinality():
    vals = VarlenArray.from_pylist(["en", "de", "en", "en", "fr"] * 2000)
    raw = C.encode_blob(B.RAW, B.DT_STR, vals)
    d = C.encode_blob(B.DICT, B.DT_STR, vals)
    assert len(d) < len(raw) / 10


def test_rle_compresses_runs():
    vals = np.repeat(np.arange(10, dtype=np.int64), 1000)
    rle = C.encode_blob(B.RLE, B.DT_I64, vals)
    raw = C.encode_blob(B.RAW, B.DT_I64, vals)
    assert len(rle) < len(raw) / 100


def test_delta_beats_varint_on_sorted():
    vals = (1704067200_000_000
            + np.cumsum(rng().integers(0, 100, 10000))).astype(np.int64)
    dv = C.encode_blob(B.DELTA_VARINT, B.DT_I64, vals)
    vi = C.encode_blob(B.VARINT, B.DT_I64, vals)
    assert len(dv) < len(vi) / 4


@pytest.mark.parametrize("key", list(NUMERIC_CASES))
def test_auto_select_roundtrip_numeric(key):
    dtype_code, _ = key
    vals = np.ascontiguousarray(NUMERIC_CASES[key], dtype=B.NUMERIC_NP[dtype_code])
    blob, codec_id, stats = C.encode_auto(vals, dtype_code)
    out, got_codec, _ = C.decode_blob(blob)
    assert got_codec == codec_id
    np.testing.assert_array_equal(out, vals)
    # north-rule size bound: never bigger than plain varint (= reference
    # encoder output) for integer columns
    if B.NUMERIC_NP[dtype_code].kind in "iu":
        ref = C.encode_blob(B.VARINT, dtype_code, vals)
        assert len(blob) <= len(ref)


@pytest.mark.parametrize("name", list(VARLEN_CASES))
def test_auto_select_roundtrip_varlen(name):
    items = VARLEN_CASES[name]
    dtype_code = B.DT_BIN if items and isinstance(items[0], bytes) else B.DT_STR
    va = VarlenArray.from_pylist(items)
    blob, codec_id, stats = C.encode_auto(va, dtype_code)
    out = C.decode_values(blob)
    assert_values_equal(out, va, dtype_code)


def test_auto_select_picks_sensible_codecs():
    langs = VarlenArray.from_pylist(["en"] * 5500 + ["de", "fr", "es"] * 1500)
    assert C.select_codec(langs, B.DT_STR) in (B.DICT, B.RLE)
    ts = (1704067200_000_000 + np.cumsum(rng().integers(0, 3000, 50000)))
    assert C.select_codec(ts.astype(np.int64), B.DT_I64) == B.DELTA_VARINT
    small_range = rng().integers(0, 16, 50000)
    assert C.select_codec(small_range, B.DT_I64) == B.BITPACK


def test_float_bit_identity_negzero_and_nan():
    """DICT/RLE on floats must be bit-exact: -0.0 vs +0.0 and distinct
    NaN payloads survive (float == would collapse them)."""
    nan1 = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(),
                         dtype=np.float64)[0]
    nan2 = np.frombuffer(np.uint64(0x7FF8000000000002).tobytes(),
                         dtype=np.float64)[0]
    vals = np.array([0.0, -0.0, 1.5, -0.0, 0.0, nan1, nan2, nan1],
                    dtype=np.float64)
    for codec in [B.DICT, B.RLE, B.RAW, B.ZSTD]:
        out = C.decode_values(C.encode_blob(codec, B.DT_F64, vals))
        np.testing.assert_array_equal(out.view(np.uint64),
                                      vals.view(np.uint64),
                                      err_msg=B.CODEC_NAMES[codec])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=200))
def test_property_auto_int64(xs):
    vals = np.array(xs, dtype=np.int64)
    blob, _, _ = C.encode_auto(vals, B.DT_I64)
    np.testing.assert_array_equal(C.decode_values(blob), vals)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=20), max_size=100))
def test_property_auto_str(xs):
    va = VarlenArray.from_pylist(xs)
    blob, _, _ = C.encode_auto(va, B.DT_STR)
    out = C.decode_values(blob)
    assert out.to_pylist(as_str=True) == xs


# --- SCALED (codec 8): decimals-in-doubles ---

def test_scaled_roundtrip_exponents():
    from varint_rvv_spark.codecs.scaled import scaled_exponent

    rng = np.random.default_rng(9)
    for k in range(5):
        si = rng.integers(-10**6, 10**6, 5000)
        v = si / (10.0 ** k)
        got_k = scaled_exponent(v)
        assert got_k is not None and got_k <= k
        blob = C.encode_blob(B.SCALED, B.DT_F64, v)
        out = np.asarray(C.decode_values(blob))
        assert (out.view(np.int64) == v.view(np.int64)).all()
        assert len(blob) < v.nbytes / 2  # decisively beats raw


def test_scaled_rejects_inexact_and_nonfinite():
    from varint_rvv_spark.codecs.scaled import scaled_exponent

    assert scaled_exponent(np.array([0.1234567])) is None  # needs k>4
    assert scaled_exponent(np.array([np.nan, 1.0])) is None
    assert scaled_exponent(np.array([np.inf])) is None
    assert scaled_exponent(np.array([-0.0])) is None  # sign bit lost
    assert scaled_exponent(np.array([1e300])) is None  # overflow
    assert scaled_exponent(np.empty(0)) == 0
    with pytest.raises(ValueError):
        C.encode_blob(B.SCALED, B.DT_F64, np.array([np.nan]))
    # auto-select falls back cleanly for ineligible float chunks
    v = np.array([np.nan, -0.0, 0.1234567, 1e300] * 100)
    blob, cid, _ = C.encode_auto(v, B.DT_F64)
    assert cid != B.SCALED
    out = np.asarray(C.decode_values(blob))
    assert (out.view(np.int64) == v.view(np.int64)).all()


def test_scaled_autoselected_on_decimal_columns():
    rng = np.random.default_rng(4)
    price = rng.integers(90000, 10000000, 20000) / 100.0
    blob, cid, _ = C.encode_auto(price, B.DT_F64)
    assert cid == B.SCALED
    zstd = len(C.encode_blob(B.ZSTD, B.DT_F64, price))
    assert len(blob) < zstd
    out = np.asarray(C.decode_values(blob))
    assert (out.view(np.int64) == price.view(np.int64)).all()


def test_scaled_malformed_payloads():
    v = np.arange(100) / 10.0
    blob = C.encode_blob(B.SCALED, B.DT_F64, v)
    with pytest.raises((ValueError, KeyError, Exception)):
        C.decode_values(blob[:12])
    bad = bytearray(blob)
    bad[B.HEADER_LEN] = 99  # exponent out of range
    with pytest.raises(ValueError, match="exponent"):
        C.decode_values(bytes(bad))


# --- SPLIT (codec 9): byte-stream split + zstd for true floats ---

def test_split_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    cases = [
        rng.random(5000),                                   # f64
        np.array([np.nan, -0.0, 0.0, np.inf, -np.inf, 1.5]),
        (np.sin(np.arange(5000) / 50) * 10).astype(np.float32),
        rng.integers(-10**9, 10**9, 5000),                  # i64 too
    ]
    for v in cases:
        dt = {np.dtype('f8'): B.DT_F64, np.dtype('f4'): B.DT_F32,
              np.dtype('i8'): B.DT_I64}[v.dtype]
        blob = C.encode_blob(B.SPLIT, dt, v)
        out = np.asarray(C.decode_values(blob))
        assert out.dtype == v.dtype
        assert (out.view(np.uint8) == v.view(np.uint8)).all()


def test_split_beats_plain_zstd_on_smooth_floats():
    rng = np.random.default_rng(3)
    v = np.cumsum(rng.normal(0, 0.01, 50000)) + 100  # not 10^k-scaled
    from varint_rvv_spark.codecs.scaled import scaled_exponent
    assert scaled_exponent(v) is None
    split = len(C.encode_blob(B.SPLIT, B.DT_F64, v))
    plain = len(C.encode_blob(B.ZSTD, B.DT_F64, v))
    assert split < plain
    blob, cid, _ = C.encode_auto(v, B.DT_F64)
    assert cid == B.SPLIT  # auto-selection picks it for true floats
    out = np.asarray(C.decode_values(blob))
    assert (out.view(np.int64) == v.view(np.int64)).all()


def test_split_malformed():
    v = np.arange(100, dtype=np.float64)
    blob = C.encode_blob(B.SPLIT, B.DT_F64, v)
    bad = bytearray(blob)
    bad[B.HEADER_LEN] = 4  # wrong itemsize for f64
    with pytest.raises(ValueError, match="itemsize"):
        C.decode_values(bytes(bad))


# --- LIST codec (array<numeric> columns) + new scalar logical types ---

def _mk_list(lists, child_dtype=B.DT_F32):
    lens = np.array([len(x) for x in lists], dtype=np.int64)
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    child = np.concatenate([np.asarray(x) for x in lists if len(x)]) \
        if lens.sum() else np.empty(0)
    return B.ListValues(
        offsets=offsets,
        child=np.ascontiguousarray(child, dtype=B.NUMERIC_NP[child_dtype]),
        child_dtype=child_dtype)


@pytest.mark.parametrize("child_dt", [B.DT_F32, B.DT_F64, B.DT_I64])
def test_list_roundtrip(child_dt):
    r = rng()
    lists = [r.standard_normal(r.integers(0, 9)) for _ in range(200)]
    if B.NUMERIC_NP[child_dt].kind == "i":
        lists = [(x * 1000).astype(np.int64) for x in lists]
    lv = _mk_list(lists, child_dt)
    blob = B.encode_blob(B.LIST, B.DT_LIST, lv)
    back = B.decode_values(blob)
    np.testing.assert_array_equal(lv.offsets, back.offsets)
    np.testing.assert_array_equal(lv.child, back.child)
    assert back.child_dtype == child_dt


def test_list_empty_arrays_and_empty_chunk():
    lv = _mk_list([[], [], []])
    back = B.decode_values(B.encode_blob(B.LIST, B.DT_LIST, lv))
    assert len(back) == 3 and back.child.size == 0
    lv0 = _mk_list([])
    back0 = B.decode_values(B.encode_blob(B.LIST, B.DT_LIST, lv0))
    assert len(back0) == 0


def test_list_auto_selection_routes_to_list_codec():
    lv = _mk_list([np.arange(64, dtype=np.float64)] * 50, B.DT_F64)
    blob, codec_id, stats = C.encode_auto(lv, B.DT_LIST)
    assert codec_id == B.LIST
    assert stats["avg_len"] == 64.0
    # fixed-dim lengths are pure runs → the lengths stream is tiny
    assert len(blob) < lv.nbytes


def test_list_child_bit_identity_nan_negzero():
    lists = [np.array([np.nan, -0.0, np.inf], dtype=np.float32),
             np.array([1.5], dtype=np.float32)]
    lv = _mk_list(lists, B.DT_F32)
    back = B.decode_values(B.encode_blob(B.LIST, B.DT_LIST, lv))
    np.testing.assert_array_equal(
        lv.child.view(np.uint32), back.child.view(np.uint32))


def test_u8_bool_roundtrip_all_int_codecs():
    v = (rng().integers(0, 2, 3000)).astype(np.uint8)
    for codec in (B.RAW, B.VARINT, B.DELTA_VARINT, B.BITPACK, B.RLE,
                  B.DICT, B.ZSTD):
        back = B.decode_values(B.encode_blob(codec, B.DT_U8, v))
        np.testing.assert_array_equal(v, np.asarray(back, dtype=np.uint8))
    blob, codec_id, _ = C.encode_auto(v, B.DT_U8)
    assert len(blob) <= v.nbytes + B.HEADER_LEN


def test_arrow_bridge_date_bool_decimal_and_list_nulls():
    import decimal as D

    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    cases = [
        pa.array([18000, None, 18010], type=pa.date32()),
        pa.array([True, None, False, True]),
        pa.array([D.Decimal("99.99"), None, D.Decimal("-0.01")],
                 type=pa.decimal128(18, 2)),
        pa.array([[1.0, 2.0], None, []], type=pa.list_(pa.float32())),
        pa.array([[1, 2], [3, 4], None], type=pa.list_(pa.int64(), 2)),
    ]
    for arr in cases:
        v, dt, logical, validity = arrow_to_values(arr)
        blob, _, _ = C.encode_auto(v, dt)
        back_vals = B.decode_values(blob)
        assert values_sha256(back_vals, dt) == values_sha256(v, dt)
        back = values_to_arrow(back_vals, dt, logical, validity)
        assert back.to_pylist() == arr.to_pylist()


def test_wide_decimal_two_limb_roundtrip():
    """decimal(p>18) — unscaled values beyond int64 — encode as two
    int64 limb streams (lo/hi) through the STRUCT container and
    rebuild bit-exactly, including negatives, nulls, and magnitudes
    past 2^64.  (Replaces the round-3 hard TypeError.)"""
    import decimal as D

    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    vals = [D.Decimal("12345678901234567890.123456"),          # > 2^63
            D.Decimal("-99999999999999999999999999999.999999"),
            None,
            D.Decimal("0.000001"),
            D.Decimal("-0.000001")]
    arr = pa.array(vals, type=pa.decimal128(38, 6))
    v, dt, logical, validity = arrow_to_values(arr)
    assert dt == B.DT_STRUCT and logical == "decimal2:38:6"
    blob, _, _ = C.encode_auto(v, dt)
    back_vals = B.decode_values(blob)
    assert values_sha256(back_vals, dt) == values_sha256(v, dt)
    back = values_to_arrow(back_vals, dt, logical, validity)
    assert back.to_pylist() == arr.to_pylist()
    # the hi-limb stream is sign-extension runs → tiny encoded size
    n_big = 4000
    big = pa.array([D.Decimal(10 ** 20 + i) for i in range(n_big)],
                   type=pa.decimal128(38, 0))
    bv, bdt, _, _ = arrow_to_values(big)
    bblob, _, _ = C.encode_auto(bv, bdt)
    assert len(bblob) < n_big * 8  # ≪ the 16 B/value raw decimal128


def test_wide_decimal_inside_struct_and_list_children():
    """decimal(38,s) as a NESTED child: struct<amount:decimal> and
    list<decimal> route the two-limb encoding through the recursive
    child framing and rebuild the exact decimal type."""
    import decimal as D

    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    cases = [
        pa.array([{"id": 1, "amount": D.Decimal("1" * 20 + ".5")},
                  {"id": 2, "amount": None}, None],
                 type=pa.struct([("id", pa.int64()),
                                 ("amount", pa.decimal128(38, 1))])),
        pa.array([[D.Decimal(10**25), None], None, []],
                 type=pa.list_(pa.decimal128(38, 0))),
    ]
    for arr in cases:
        v, dt, logical, validity = arrow_to_values(arr)
        blob, _, _ = C.encode_auto(v, dt)
        back_vals = B.decode_values(blob)
        assert values_sha256(back_vals, dt) == values_sha256(v, dt)
        back = values_to_arrow(back_vals, dt, logical, validity)
        assert back.to_pylist() == arr.to_pylist(), arr.type


def test_list_nested_and_logical_children_roundtrip():
    """list<struct>/list<list>/list<timestamp>/element-null children
    route through the tagged-child framing (codecs/lists.py) and
    round-trip exactly — the token-annotation column shape."""
    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    ann_t = pa.list_(pa.struct([("pos", pa.int32()),
                                ("tok", pa.string()),
                                ("tok_len", pa.int32())]))
    cases = [
        # annotated spans: null rows, empty lists, null struct fields
        pa.array([[{"pos": 1, "tok": "a", "tok_len": 1},
                   {"pos": 2, "tok": None, "tok_len": None}],
                  [], None,
                  [{"pos": 1, "tok": "xyz", "tok_len": 3}]], type=ann_t),
        pa.array([[[1, 2], [3]], [], None, [[], [4, 5, 6]]],
                 type=pa.list_(pa.list_(pa.int64()))),
        pa.array([[1_700_000_000_000_000, 2], [3], None, []],
                 type=pa.list_(pa.timestamp("us"))),
        # element nulls in numeric/string children (previously a hard
        # error) now ride the tagged child's validity bitmap
        pa.array([[1, None, 3], [None], None, [4]],
                 type=pa.list_(pa.int64())),
        pa.array([["a", None], ["b"], None, []],
                 type=pa.list_(pa.string())),
    ]
    for arr in cases:
        v, dt, logical, validity = arrow_to_values(arr)
        assert dt == B.DT_LIST
        blob, codec_id, _ = C.encode_auto(v, dt)
        assert codec_id == B.LIST
        back_vals = B.decode_values(blob)
        assert values_sha256(back_vals, dt) == values_sha256(v, dt)
        back = values_to_arrow(back_vals, dt, logical, validity)
        assert back.to_pylist() == arr.to_pylist(), arr.type
    # plain numeric list payloads keep the pre-nested framing (first
    # byte = bare child dtype, no 0x80 tag) — stored-format stability
    plain = pa.array([[1.5, 2.5], [3.5]], type=pa.list_(pa.float64()))
    v, dt, _, _ = arrow_to_values(plain)
    blob, _, _ = C.encode_auto(v, dt)
    assert blob[B.HEADER_LEN] == B.DT_F64  # untagged child byte


def test_struct_and_map_roundtrip_all_shapes():
    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    cases = [
        pa.array([{"a": i, "b": i * 0.5} for i in range(200)],
                 type=pa.struct([("a", pa.int64()), ("b", pa.float64())])),
        pa.array([{"a": 1, "b": 2.5}, None, {"a": None, "b": 3.0}],
                 type=pa.struct([("a", pa.int64()), ("b", pa.float64())])),
        # struct-of-list + string child (recursive decomposition)
        pa.array([{"v": [1.0, 2.0], "s": "x"}, {"v": [], "s": None}],
                 type=pa.struct([("v", pa.list_(pa.float32())),
                                 ("s", pa.string())])),
        pa.array([{"k": "1"}, None, {}, {"a": "9", "b": "8"}],
                 type=pa.map_(pa.string(), pa.string())),
        pa.array([{"x": 7}, {"y": 8, "z": 9}],
                 type=pa.map_(pa.string(), pa.int64())),
    ]
    for arr in cases:
        v, dt, logical, validity = arrow_to_values(arr)
        blob, codec_id, _ = C.encode_auto(v, dt)
        assert codec_id in (B.STRUCT, B.MAP)
        back_vals = B.decode_values(blob)
        assert values_sha256(back_vals, dt) == values_sha256(v, dt)
        back = values_to_arrow(back_vals, dt, logical, validity)
        assert back.to_pylist() == arr.to_pylist(), arr.type


def test_struct_field_streams_compress_independently():
    """A struct of (sorted ids, constant flag) must compress both
    field streams with their own codecs — not a row-wise blob."""
    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import arrow_to_values

    arr = pa.array([{"id": 1000 + i, "flag": 1} for i in range(5000)],
                   type=pa.struct([("id", pa.int64()),
                                   ("flag", pa.int64())]))
    v, dt, _, _ = arrow_to_values(arr)
    blob, _, _ = C.encode_auto(v, dt)
    assert len(blob) < 5000 * 2  # delta-varint ids + RLE/bitpack flag


def test_nested_malformed_payloads_raise():
    import pyarrow as pa
    import pytest

    from varint_rvv_spark.operators.arrow_bridge import arrow_to_values

    arr = pa.array([{"a": 1}], type=pa.struct([("a", pa.int64())]))
    v, dt, _, _ = arrow_to_values(arr)
    blob = B.encode_blob(B.STRUCT, dt, v)
    with pytest.raises(Exception):
        B.decode_values(blob[:12])  # truncated
    # header n_values lie → field length mismatch
    bad = bytearray(blob)
    B.HEADER.pack_into(bad, 0, B.STRUCT, dt, 7)
    with pytest.raises(ValueError, match="length mismatch"):
        B.decode_values(bytes(bad))


def test_list_varlen_children_roundtrip():
    """list<string> / list<binary> — token/tag lists — through the
    LIST codec, incl. inside struct and map containers."""
    import pyarrow as pa

    from varint_rvv_spark.operators.arrow_bridge import (
        arrow_to_values,
        values_sha256,
        values_to_arrow,
    )

    cases = [
        pa.array([["the", "quick", "fox"], None, [], ["a"]],
                 type=pa.list_(pa.string())),
        pa.array([[b"\x00\xff", b""], [b"x"]],
                 type=pa.list_(pa.binary())),
        pa.array([{"toks": ["a", "b"], "n": 2}, {"toks": [], "n": 0}],
                 type=pa.struct([("toks", pa.list_(pa.string())),
                                 ("n", pa.int64())])),
        pa.array([{"e": [1.0, 2.0]}, {}],
                 type=pa.map_(pa.string(), pa.list_(pa.float32()))),
    ]
    for arr in cases:
        v, dt, logical, validity = arrow_to_values(arr)
        blob, _, _ = C.encode_auto(v, dt)
        back_vals = B.decode_values(blob)
        assert values_sha256(back_vals, dt) == values_sha256(v, dt)
        back = values_to_arrow(back_vals, dt, logical, validity)
        assert back.to_pylist() == arr.to_pylist(), arr.type

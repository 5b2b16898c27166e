"""Property test: ANY supported Arrow column round-trips bit-exactly
through the full bridge (arrow → values → encode_auto → blob →
decode → values → arrow), nulls and all.

This is the generic robustness net over the per-codec unit tests:
hypothesis drives value distributions, null patterns, empties, and
nesting shapes the hand-written cases don't cover.
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from varint_rvv_spark.codecs import blob as B
from varint_rvv_spark.codecs.select import column_stats, encode_auto
from varint_rvv_spark.operators.arrow_bridge import (
    arrow_to_values,
    values_to_arrow,
)


def roundtrip(arr: pa.Array) -> pa.Array:
    values, dt, logical, validity = arrow_to_values(arr)
    stats = column_stats(values, dt)
    payload, _, _ = encode_auto(values, dt, stats)
    out_values, _, out_dt = B.decode_blob(payload)
    assert out_dt == dt
    return values_to_arrow(out_values, dt, logical, validity)


def assert_same(arr: pa.Array, got: pa.Array) -> None:
    if pa.types.is_large_string(got.type):
        got = got.cast(pa.string())
    if pa.types.is_large_binary(got.type):
        got = got.cast(pa.binary())
    assert got.cast(arr.type).equals(arr), (arr, got)


ints = st.lists(st.one_of(st.none(),
                          st.integers(-(2**63), 2**63 - 1)),
                max_size=200)
floats = st.lists(st.one_of(st.none(), st.floats(width=64)),
                  max_size=200)
texts = st.lists(st.one_of(st.none(), st.text(max_size=40)),
                 max_size=120)
blobs = st.lists(st.one_of(st.none(), st.binary(max_size=40)),
                 max_size=120)
float_lists = st.lists(
    st.one_of(st.none(),
              st.lists(st.floats(width=32, allow_nan=False),
                       max_size=12)),
    max_size=80)


@settings(max_examples=60, deadline=None)
@given(ints)
def test_any_int64_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.int64())
    assert_same(arr, roundtrip(arr))


@settings(max_examples=60, deadline=None)
@given(floats)
def test_any_float64_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.float64())
    # NaN != NaN under equals? pyarrow equals is bitwise for buffers,
    # but build via bit-exactness: compare through values_sha-style
    got = roundtrip(arr)
    assert got.is_null().equals(arr.is_null())
    import numpy as np

    a = arr.fill_null(0.0).to_numpy(zero_copy_only=False)
    g = got.fill_null(0.0).to_numpy(zero_copy_only=False)
    assert np.array_equal(a.view("u8"), g.view("u8"))  # bit-exact


@settings(max_examples=60, deadline=None)
@given(texts)
def test_any_string_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.string())
    assert_same(arr, roundtrip(arr))


@settings(max_examples=60, deadline=None)
@given(blobs)
def test_any_binary_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.binary())
    assert_same(arr, roundtrip(arr))


@settings(max_examples=40, deadline=None)
@given(float_lists)
def test_any_float_list_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.list_(pa.float32()))
    got = roundtrip(arr)
    assert got.cast(arr.type).equals(arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=150),
       st.lists(st.one_of(st.none(),
                          st.dates(min_value=__import__("datetime")
                                   .date(1900, 1, 1))),
                max_size=150))
def test_bool_and_date_columns_roundtrip(bs, ds):
    for xs, t in ((bs, pa.bool_()), (ds, pa.date32())):
        arr = pa.array(xs, type=t)
        assert_same(arr, roundtrip(arr))


ann_structs = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.fixed_dictionaries({
            "pos": st.one_of(st.none(),
                             st.integers(-(2**31), 2**31 - 1)),
            "tok": st.one_of(st.none(), st.text(max_size=12)),
        }), max_size=6)),
    max_size=60)


@settings(max_examples=40, deadline=None)
@given(ann_structs)
def test_any_list_of_struct_column_roundtrips(xs):
    """Round-4 nested LIST children: list<struct<int,string>> with
    null rows, empty lists, and null struct fields."""
    t = pa.list_(pa.struct([("pos", pa.int32()), ("tok", pa.string())]))
    arr = pa.array(xs, type=t)
    got = roundtrip(arr)
    assert got.cast(arr.type).equals(arr), (xs,)


nested_int_lists = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.lists(st.integers(-(2**40), 2**40),
                          max_size=5),
                 max_size=5)),
    max_size=50)


@settings(max_examples=40, deadline=None)
@given(nested_int_lists)
def test_any_list_of_list_column_roundtrips(xs):
    arr = pa.array(xs, type=pa.list_(pa.list_(pa.int64())))
    got = roundtrip(arr)
    assert got.cast(arr.type).equals(arr), (xs,)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.one_of(st.none(),
                                             st.integers(-(2**50),
                                                         2**50)),
                                   max_size=8)),
                max_size=60))
def test_any_int_list_with_element_nulls_roundtrips(xs):
    """Element-level nulls in numeric list children (lifted r3 error)."""
    arr = pa.array(xs, type=pa.list_(pa.int64()))
    got = roundtrip(arr)
    assert got.cast(arr.type).equals(arr), (xs,)


wide_decimals = st.lists(
    st.one_of(st.none(),
              st.decimals(min_value=-(10**31), max_value=10**31,
                          places=6, allow_nan=False,
                          allow_infinity=False)),
    max_size=80)


@settings(max_examples=40, deadline=None)
@given(wide_decimals)
def test_any_wide_decimal_column_roundtrips(xs):
    """Round-4 two-limb decimal(38,6): full-domain magnitudes."""
    arr = pa.array(xs, type=pa.decimal128(38, 6))
    got = roundtrip(arr)
    assert got.equals(arr), (xs,)

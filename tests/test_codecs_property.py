"""Property-based codec tests (hypothesis): encode->decode == identity for
arbitrary inputs — stronger than the reference's fixed-fixture strategy
(SURVEY.md §5: reference has no property-based testing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_converter_ray.codecs import decode_array, encode_array
from parquet_converter_ray.codecs import fsst as F


def _eq(a: pa.Array, b: pa.Array) -> bool:
    if a.equals(b):
        return True
    if pa.types.is_floating(a.type):
        x, y = a.to_numpy(zero_copy_only=False), b.to_numpy(zero_copy_only=False)
        return bool(((x == y) | (np.isnan(x) & np.isnan(y))).all())
    return False


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), max_size=300),
    st.sampled_from(["auto", "plain", "for", "delta", "rle", "dict"]),
)
def test_int_roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.int64())
    try:
        out = decode_array(encode_array(arr, codec=codec))
    except ValueError:
        return  # codec legitimately refused (range overflow)
    assert _eq(out, arr)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=200),
    st.sampled_from(["auto", "plain", "dict", "fsst"]),
)
def test_string_roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.string())
    out = decode_array(encode_array(arr, codec=codec))
    assert _eq(out, arr)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=5000))
def test_fsst_bytes_roundtrip(data):
    table = F.train(data)
    payload, slabs = F.compress_slabbed(data, table, slab_size=512)
    assert F.decompress(payload, table.code_syms, slabs=slabs) == data
    assert F.decompress(F.compress(data, table), table.code_syms) == data


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True)), max_size=200))
def test_float_roundtrip(vals):
    arr = pa.array(vals, type=pa.float64())
    out = decode_array(encode_array(arr, codec="auto"))
    assert _eq(out, arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=300))
def test_bool_roundtrip(vals):
    arr = pa.array(vals, type=pa.bool_())
    out = decode_array(encode_array(arr, codec="auto"))
    assert _eq(out, arr)

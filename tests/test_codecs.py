"""Codec unit tests: encode->decode == identity on adversarial arrays (no Ray).

Mirrors the reference's round-trip testing pattern
(/root/reference/parquet_converter/tests/test_converter.py:79-81) at the codec
layer, per the SURVEY.md §5 test plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_converter_ray.codecs import (
    decode_array,
    encode_array,
)
from parquet_converter_ray.codecs import fsst as fsst_mod
from parquet_converter_ray.codecs.util import (
    bitpack,
    bitunpack,
    rle_join,
    rle_split,
    unwrap_buf,
    unzigzag,
    wrap_buf,
    zigzag,
)

rng = np.random.default_rng(7)


def _eq(a: pa.Array, b: pa.Array) -> bool:
    if a.equals(b):
        return True
    if pa.types.is_floating(a.type):
        x, y = a.to_numpy(zero_copy_only=False), b.to_numpy(zero_copy_only=False)
        both_nan = np.isnan(x) & np.isnan(y)
        return bool(((x == y) | both_nan).all())
    return False


CASES = {
    "int_sorted": pa.array(np.arange(5000, dtype=np.int64)),
    "int_descending": pa.array(np.arange(5000, 0, -1, dtype=np.int64)),
    "int_small_card": pa.array(rng.integers(0, 50, 5000), type=pa.int32()),
    "int_runs": pa.array(np.repeat(rng.integers(0, 5, 50), 100), type=pa.int64()),
    "int_constant": pa.array(np.full(1000, 7), type=pa.int64()),
    "int_nulls": pa.array([1, None, 3, None, 5] * 100, type=pa.int64()),
    "int_wide_range": pa.array(rng.integers(-(10**15), 10**15, 2000), type=pa.int64()),
    "int64_extremes": pa.array([-(2**63), 2**63 - 1, 0, -1, 1], type=pa.int64()),
    "uint8": pa.array(rng.integers(0, 255, 1000), type=pa.uint8()),
    "float": pa.array(rng.normal(0, 1, 2000)),
    "float_nan_inf": pa.array([np.nan, np.inf, -np.inf, 0.0, -0.0] * 50),
    "float32": pa.array(rng.normal(0, 1, 1000).astype(np.float32), type=pa.float32()),
    "bool": pa.array(rng.random(2000) < 0.5),
    "bool_nulls": pa.array([True, None, False, None] * 100),
    "ts_us": pa.array(np.cumsum(rng.integers(1, 10**6, 2000)), type=pa.timestamp("us")),
    "ts_tz": pa.array(np.arange(100), type=pa.timestamp("us", tz="UTC")),
    "date32": pa.array(rng.integers(0, 20000, 500), type=pa.int32()).cast(pa.date32()),
    "str_low_card": pa.array(rng.choice(["user", "assistant", "system", "tool"], 3000)),
    "str_empty_and_null": pa.array(["", None, "abc", "", None, "x" * 500] * 40),
    "str_all_null": pa.array([None] * 10, type=pa.string()),
    "str_all_empty": pa.array([""] * 10, type=pa.string()),
    "str_unicode": pa.array(["héllo wörld", "日本語テキスト", "emoji 🎉🎊", ""] * 50),
    "str_single_char_runs": pa.array(list("a" * 100 + "b" * 100)),
    "binary_opaque": pa.array([bytes(rng.integers(0, 256, 30).astype(np.uint8)) for _ in range(200)], type=pa.binary()),
    "empty_int": pa.array([], type=pa.int64()),
    "empty_str": pa.array([], type=pa.string()),
    "single_int": pa.array([42], type=pa.int64()),
    "single_str": pa.array(["only"], type=pa.string()),
}


@pytest.mark.parametrize("name", list(CASES))
def test_auto_roundtrip(name):
    arr = CASES[name]
    blob = encode_array(arr, codec="auto")
    out = decode_array(blob)
    assert _eq(out, arr), f"{name} via {blob.codec}"


NUM_CODECS = ["plain", "for", "delta", "rle", "dict", "shuffle"]
STR_CODECS = ["plain", "dict", "fsst"]


@pytest.mark.parametrize("codec", NUM_CODECS)
def test_numeric_codec_roundtrip(codec):
    for name in ["int_sorted", "int_small_card", "int_runs", "int_nulls", "ts_us"]:
        arr = CASES[name]
        try:
            out = decode_array(encode_array(arr, codec=codec))
        except ValueError:
            continue  # codec legitimately refuses (e.g. range overflow)
        assert _eq(out, arr), f"{name} via {codec}"


@pytest.mark.parametrize("codec", STR_CODECS)
def test_string_codec_roundtrip(codec):
    for name in ["str_low_card", "str_empty_and_null", "str_unicode", "str_all_null"]:
        arr = CASES[name]
        out = decode_array(encode_array(arr, codec=codec))
        assert _eq(out, arr), f"{name} via {codec}"


def test_empty_string_vs_null_distinct():
    arr = pa.array(["", None, "", None, "x"])
    out = decode_array(encode_array(arr, codec="auto"))
    assert out.null_count == 2
    assert out.to_pylist() == ["", None, "", None, "x"]


def test_bitpack_primitives():
    for width in [0, 1, 3, 7, 8, 13, 31, 33, 63]:
        n = 257
        vals = rng.integers(0, 2**width if width else 1, n).astype(np.uint64)
        assert (bitunpack(bitpack(vals, width), width, n) == vals).all()


def test_rle_primitives():
    a = np.repeat([5, 5, 9, 1], [3, 2, 4, 1])
    v, l = rle_split(a)
    assert (rle_join(v, l) == a).all()


def test_zigzag():
    a = np.array([0, -1, 1, -2, 2, 2**62, -(2**62)], dtype=np.int64)
    assert (unzigzag(zigzag(a)) == a).all()


def test_transport_wrap():
    for payload in [b"", b"x", b"abc" * 1000, bytes(rng.integers(0, 256, 5000).astype(np.uint8))]:
        assert unwrap_buf(wrap_buf(payload)) == payload


def test_fsst_corpus_roundtrip():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "",
        "\xff\xfe binary-ish \x00 bytes",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "unique-" + "".join(chr(65 + (i % 26)) for i in range(200)),
    ] * 50
    data = "".join(texts).encode()
    table = fsst_mod.train(data)
    enc = fsst_mod.compress(data, table)
    assert fsst_mod.decompress(enc, table.code_syms) == data


def test_fsst_compresses_repetitive_text():
    words = rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"], 20000)
    data = (" ".join(words)).encode()
    table = fsst_mod.train(data)
    enc = fsst_mod.compress(data, table)
    assert len(enc) < len(data) * 0.5
    assert fsst_mod.decompress(enc, table.code_syms) == data


def test_fsst_escape_run_parity():
    # adversarial: input full of 0xFF-adjacent patterns so escapes cluster
    data = bytes([255, 255, 255, 65, 255, 66, 255, 255]) * 200
    table = fsst_mod.train(data)
    enc = fsst_mod.compress(data, table)
    assert fsst_mod.decompress(enc, table.code_syms) == data


def test_auto_picks_sensible_codecs():
    assert encode_array(CASES["int_runs"], codec="auto").codec in ("rle", "dict")
    assert encode_array(CASES["str_low_card"], codec="auto").codec == "dict"
    assert encode_array(CASES["int_sorted"], codec="auto").codec == "delta"


def test_compression_beats_arrow_on_structured_data():
    for name in ["int_sorted", "int_runs", "str_low_card", "ts_us"]:
        arr = CASES[name]
        blob = encode_array(arr, codec="auto")
        assert blob.nbytes < arr.nbytes / 3, name

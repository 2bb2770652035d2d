"""Selective-row decode (late materialization): codec layer + scan integration.

``decode_array_rows(blob, sel)`` must equal ``decode_array(blob).take(sel)``
bit-identically for every codec, null pattern, and selection shape; the scan
path must produce identical results whether late materialization is forced on,
forced off, or left at the default threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from parquet_converter_ray.codecs import decode_array, decode_array_rows, encode_array
from parquet_converter_ray.codecs import fsst as fsst_mod
from parquet_converter_ray.codecs.util import bitpack, bitunpack, bitunpack_at, gather_slices

N = 5000
_rng = np.random.default_rng(7)


def _sels(n: int) -> list[np.ndarray]:
    return [
        np.array([], dtype=np.int64),
        np.arange(n, dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([n - 1], dtype=np.int64),
        np.sort(_rng.choice(n, min(37, n), replace=False)).astype(np.int64),
    ]


def _with_nulls(arr: pa.Array) -> pa.Array:
    m = _rng.random(len(arr)) < 0.1
    return pa.array(
        [None if mm else v for v, mm in zip(arr.to_pylist(), m)], type=arr.type
    )


_NUM_CASES = {
    "for": pa.array(_rng.integers(-1000, 1000, N), type=pa.int64()),
    "bitpack": pa.array(_rng.integers(0, 1000, N), type=pa.int32()),
    "delta": pa.array(np.cumsum(_rng.integers(-3, 10, N)), type=pa.int64()),
    "rle": pa.array(np.repeat(_rng.integers(0, 5, N // 50), 50), type=pa.int64()),
    "dict": pa.array(_rng.choice([1.5, 2.5, -3.0], N)),
    "shuffle": pa.array(_rng.normal(size=N)),
    "plain": pa.array(_rng.normal(size=N)),
}

_TEXT = pa.array(
    ["".join(_rng.choice(list("abcdef theqkbrwn "), _rng.integers(0, 60))) for _ in range(N)]
)
_STR_CASES = {
    "plain": _TEXT,
    "dict": pa.array(_rng.choice(["x", "yy", "zzz", ""], N)),
    "fsst": _TEXT,
}


@pytest.mark.parametrize("codec", list(_NUM_CASES))
def test_rows_decode_numeric(codec):
    for arr in (_NUM_CASES[codec], _with_nulls(_NUM_CASES[codec])):
        blob = encode_array(arr, codec=codec)
        full = decode_array(blob)
        for sel in _sels(N):
            assert decode_array_rows(blob, sel).equals(full.take(pa.array(sel)))


@pytest.mark.parametrize("codec", list(_STR_CASES))
def test_rows_decode_strings(codec):
    for arr in (_STR_CASES[codec], _with_nulls(_STR_CASES[codec])):
        blob = encode_array(arr, codec=codec)
        full = decode_array(blob)
        for sel in _sels(N):
            assert decode_array_rows(blob, sel).equals(full.take(pa.array(sel)))


@pytest.mark.parametrize("codec", ["plain", "dict", "fsst"])
def test_rows_decode_binary(codec):
    arr = pa.array(
        [bytes(_rng.integers(0, 256, _rng.integers(0, 40)).astype(np.uint8)) for _ in range(N)],
        type=pa.binary(),
    )
    blob = encode_array(arr, codec=codec)
    full = decode_array(blob)
    for sel in _sels(N):
        assert decode_array_rows(blob, sel).equals(full.take(pa.array(sel)))


def test_rows_decode_bool_timestamp_date():
    cases = [
        pa.array(_rng.random(N) < 0.5),
        pa.array(_rng.integers(0, 10**15, N), type=pa.timestamp("us")),
        pa.array(_rng.integers(0, 20000, N).astype(np.int32), type=pa.date32()),
    ]
    for arr in cases:
        blob = encode_array(_with_nulls(arr), codec="auto")
        full = decode_array(blob)
        for sel in _sels(N):
            assert decode_array_rows(blob, sel).equals(full.take(pa.array(sel)))


def test_bitunpack_at_matches_full():
    for w in (1, 3, 7, 8, 13, 31, 33, 63):
        vals = _rng.integers(0, 2**min(w, 62), 997).astype(np.uint64)
        buf = bitpack(vals, w)
        full = bitunpack(buf, w, len(vals))
        idx = np.sort(_rng.choice(len(vals), 53, replace=False))
        assert np.array_equal(bitunpack_at(buf, w, idx), full[idx])
    assert len(bitunpack_at(b"", 0, np.array([1, 2]))) == 2  # width-0 stream


def test_gather_slices_zero_len_entries():
    data = np.frombuffer(b"abcdefghij", dtype=np.uint8)
    starts = np.array([8, 0, 3, 5], dtype=np.int64)
    lens = np.array([2, 0, 2, 0], dtype=np.int64)
    assert gather_slices(data, starts, lens) == b"ijde"
    assert gather_slices(data, starts[:0], lens[:0]) == b""


def test_fsst_rows_skips_untouched_slabs(monkeypatch):
    big = pa.array([f"the quick brown fox {i} " * int(_rng.integers(5, 50)) for i in range(40000)])
    blob = encode_array(big, codec="fsst")
    n_slabs = len(blob.meta["slabs"])
    assert n_slabs > 20  # multi-slab payload, else the test proves nothing
    calls = []
    orig = fsst_mod._decompress_one
    monkeypatch.setattr(fsst_mod, "_decompress_one", lambda *a: calls.append(1) or orig(*a))
    sel = np.array([17, 20003, 39999], dtype=np.int64)
    got = decode_array_rows(blob, sel)
    assert len(calls) <= 8 < n_slabs  # only the touched slabs decompressed
    assert got.equals(decode_array(blob).take(pa.array(sel)))


# --- scan integration ----------------------------------------------------------


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from parquet_converter_ray.encode import encode_dataset
    from parquet_converter_ray.synth import make_transcripts

    t = make_transcripts(12_000, seed=23)
    out = str(tmp_path_factory.mktemp("latemat") / "store")
    encode_dataset(ray.data.from_arrow(t), out, n_parts=6)
    return out, t


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else pa.table({})


def test_scan_late_materialization_paths_identical(store, monkeypatch):
    from parquet_converter_ray.zonemap import scan_store

    out, t = store
    cid = t["conv_id"][77].as_py()
    preds = [
        [("conv_id", "==", cid)],
        [("turn_idx", "between", (2, 4)), ("role", "==", "assistant")],
        [("turn_idx", "<", -1)],  # zero matches everywhere
    ]
    key = [(c, "ascending") for c in t.column_names]
    for pred in preds:
        results = {}
        for frac in ("1", "0"):
            monkeypatch.setenv("PCR_LATE_MAT_FRAC", frac)
            results[frac] = _collect(scan_store(out, pred, dict_probe=False))
        monkeypatch.delenv("PCR_LATE_MAT_FRAC")
        results["default"] = _collect(scan_store(out, pred, dict_probe=False))
        base = results["1"]
        if base.num_rows:
            base = base.sort_by(key)
        for name in ("0", "default"):
            other = results[name]
            if other.num_rows:
                other = other.sort_by(key)
            assert other.equals(base), (pred, name)
        # cross-check against a plain filter of the raw input
        from parquet_converter_ray.zonemap import apply_predicate, _normalize

        expect = apply_predicate(t.combine_chunks(), _normalize(pred))
        assert base.num_rows == expect.num_rows


def test_scan_column_pruning_with_late_mat(store, monkeypatch):
    from parquet_converter_ray.zonemap import scan_store

    out, t = store
    monkeypatch.setenv("PCR_LATE_MAT_FRAC", "1")
    cid = t["conv_id"][5].as_py()
    got = _collect(scan_store(out, [("conv_id", "==", cid)], columns=["text", "turn_idx"]))
    assert got.column_names == ["text", "turn_idx"]
    expect = t.filter(pc.equal(t["conv_id"], cid)).select(["text", "turn_idx"])
    assert got.sort_by("turn_idx").equals(expect.sort_by("turn_idx").combine_chunks())

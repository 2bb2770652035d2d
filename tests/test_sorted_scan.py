"""Sorted-scan pushdown: binary-search row ranges on a container's leading
sort column (zonemap.sorted_lead_range / _ScanDecoder range path) and the
reusable selective-decode handle (codecs.make_row_reader)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from parquet_converter_ray.codecs import decode_array, encode_array, make_row_reader
from parquet_converter_ray.container import decode_table, encode_table, pack_container
from parquet_converter_ray.zonemap import (
    _ScanDecoder,
    apply_predicate,
    sorted_lead_range,
)


def _container(table: pa.Table, sort_key=("v",), codec="auto") -> bytes:
    """Pack a container the way encode_one does: sorted by sort_key asc,
    footer records the applied sort_key."""
    cols = [c for c in sort_key if c in table.column_names]
    if cols:
        table = table.sort_by([(c, "ascending") for c in cols])
    blobs = encode_table(table, codec=codec)
    return pack_container(
        blobs, extra={"part_id": 0, "rows": table.num_rows, "sort_key": cols}
    )


def _unpack(data):
    from parquet_converter_ray.container import unpack_container

    return unpack_container(data)


@pytest.fixture(scope="module")
def num_container():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 10_000, 50_000)
    t = pa.table(
        {
            "v": pa.array(v, pa.int64()),
            "w": pa.array(rng.integers(0, 5, 50_000), pa.int32()),
            "s": pa.array([f"row-{x:06d}" for x in rng.integers(0, 99, 50_000)]),
        }
    )
    return _container(t), t.sort_by([("v", "ascending")]).combine_chunks()


def test_make_row_reader_matches_take_across_codecs():
    rng = np.random.default_rng(7)
    arrays = {
        "for": pa.array(np.sort(rng.integers(1000, 2000, 5000)), pa.int64()),
        "delta": pa.array(np.arange(5000) * 3 + 17, pa.int64()),
        "rle": pa.array(np.repeat(np.arange(50), 100), pa.int64()),
        "dict": pa.array(rng.integers(0, 8, 5000), pa.int64()),
        "plain": pa.array(rng.standard_normal(5000)),
    }
    sel_sets = [np.array([], np.int64), np.array([0]), np.array([4999]),
                np.sort(rng.choice(5000, 300, replace=False))]
    for codec, arr in arrays.items():
        blob = encode_array(arr, codec=codec)
        read = make_row_reader(blob)
        for sel in sel_sets:  # REPEATED calls on one handle
            assert read(sel).equals(decode_array(blob).take(pa.array(sel)))
    # nulls survive the handle
    withnull = pa.array([1, None, 3, None, 5], pa.int64())
    read = make_row_reader(encode_array(withnull, codec="plain"))
    assert read(np.array([1, 3, 4])).to_pylist() == [None, None, 5]


def test_sorted_lead_range_exact(num_container):
    data, t = num_container
    footer, blobs = _unpack(data)
    v = t["v"].to_numpy()
    for clauses, lo_exp, hi_exp in [
        ([("v", "between", (2000, 2500))], np.searchsorted(v, 2000, "left"), np.searchsorted(v, 2500, "right")),
        ([("v", "==", 5000)], np.searchsorted(v, 5000, "left"), np.searchsorted(v, 5000, "right")),
        ([("v", ">=", 9990)], np.searchsorted(v, 9990, "left"), len(v)),
        ([("v", "<", 10)], 0, np.searchsorted(v, 10, "right")),
        ([("v", "in", [100, 105, 103])], np.searchsorted(v, 100, "left"), np.searchsorted(v, 105, "right")),
        # conjuncts tighten each other; secondary columns don't widen
        ([("v", ">=", 4000), ("v", "<=", 4100), ("w", "==", 2)],
         np.searchsorted(v, 4000, "left"), np.searchsorted(v, 4100, "right")),
    ]:
        rng_ = sorted_lead_range(footer, blobs, clauses)
        assert rng_ == (lo_exp, hi_exp), clauses
    # no conjunct on the lead column -> no range
    assert sorted_lead_range(footer, blobs, [("w", "==", 1)]) is None
    # un-coercible literal -> no range (never unsound)
    assert sorted_lead_range(footer, blobs, [("v", ">=", "not-a-number")]) is None
    # empty result range collapses
    r = sorted_lead_range(footer, blobs, [("v", "between", (10_001, 10_002))])
    assert r is not None and r[0] == r[1] == len(v)


def test_sorted_lead_range_nulls_at_tail():
    rng = np.random.default_rng(11)
    vals = np.sort(rng.integers(0, 100, 2000)).astype(object)
    t = pa.table({"v": pa.array(list(vals[:1800]) + [None] * 200, pa.int64()),
                  "x": pa.array(np.arange(2000), pa.int64())})
    data = _container(t)
    footer, blobs = _unpack(data)
    r = sorted_lead_range(footer, blobs, [("v", ">=", 95)])
    assert r is not None
    # matches end before the null tail
    assert r[1] <= 1800
    dec = _ScanDecoder(None, None, [("v", ">=", 95)])
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), [("v", ">=", 95)])
    assert got.sort_by("x").equals(exp.sort_by("x").combine_chunks())
    assert dec.range_hits == 1


@pytest.mark.parametrize(
    "clauses",
    [
        [("v", "between", (2000, 2100))],
        [("v", "==", 5000)],
        [("v", "in", [4242, 4250, 4245])],
        [("v", ">=", 9900), ("w", "!=", 0)],
        [("v", "<=", 50), ("s", "==", "row-000042")],
        [("v", "between", (10_001, 20_000))],  # provably empty
        [("v", ">", 7000), ("v", "<", 7010)],  # strict ops widen, mask trims
    ],
)
def test_scan_decoder_range_path_bit_exact(num_container, clauses):
    data, t = num_container
    dec = _ScanDecoder(None, None, clauses)
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), clauses)
    key = [(c, "ascending") for c in t.column_names]
    assert got.sort_by(key).equals(exp.sort_by(key).combine_chunks())
    assert dec.range_hits == 1, "narrow range predicate must engage the fast path"
    assert got.schema.equals(exp.schema)


def test_scan_decoder_wide_range_falls_back(num_container):
    data, t = num_container
    dec = _ScanDecoder(None, None, [("v", ">=", 100)])  # ~99% of rows
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), [("v", ">=", 100)])
    key = [(c, "ascending") for c in t.column_names]
    assert got.sort_by(key).equals(exp.sort_by(key).combine_chunks())
    assert dec.range_hits == 0, "wide ranges must keep the classic path"


def test_scan_decoder_string_lead():
    convs = [f"conv-{i:05d}" for i in np.repeat(np.arange(300), 10)]
    t = pa.table(
        {
            "conv_id": pa.array(convs),
            "turn_idx": pa.array(list(np.tile(np.arange(10), 300)), pa.int32()),
            "text": pa.array([f"t{i}" for i in range(3000)]),
        }
    )
    data = _container(t, sort_key=("conv_id", "turn_idx"))
    clauses = [("conv_id", "==", "conv-00123")]
    dec = _ScanDecoder(None, ["conv_id", "turn_idx"], clauses)
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), clauses).select(["conv_id", "turn_idx"])
    assert got.sort_by("turn_idx").equals(exp.sort_by("turn_idx").combine_chunks())
    assert got.num_rows == 10
    assert dec.range_hits == 1


def test_scan_decoder_timestamp_lead():
    ts = pa.array(
        np.arange(0, 10_000) * 60_000_000, pa.timestamp("us")
    )  # one-minute grid
    t = pa.table({"ts": ts, "v": pa.array(np.arange(10_000) % 7, pa.int64())})
    data = _container(t, sort_key=("ts",))
    clauses = [("ts", "between", ("1970-01-02 00:00:00", "1970-01-02 01:00:00"))]
    dec = _ScanDecoder(None, None, clauses)
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), clauses)
    assert got.equals(exp)
    assert got.num_rows == 61
    assert dec.range_hits == 1

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
    footer records the applied sort_key + page stats."""
    from parquet_converter_ray.zonemap import page_stats

    cols = [c for c in sort_key if c in table.column_names]
    if cols:
        table = table.sort_by([(c, "ascending") for c in cols])
    blobs = encode_table(table, codec=codec)
    pages = page_stats(table)
    return pack_container(
        blobs,
        extra={"part_id": 0, "rows": table.num_rows, "sort_key": cols,
               **({"pages": pages} if pages else {})},
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


# --- page-level zone maps ---------------------------------------------------------


def _pages_container(n=300_000, seed=9):
    """Container sorted by ts (lead) with a secondary numeric column whose
    values are page-clustered (each 64k page covers a narrow band) plus a
    float column with NaNs and a nullable int column (both page-stat edge
    cases). Rows are built ALREADY in ts order so the band structure holds
    in the packed container."""
    rng = np.random.default_rng(seed)
    ts = np.cumsum(rng.integers(1, 100, n)).astype(np.int64)  # strictly increasing
    band = (np.arange(n) // 65_536) * 1000  # page p holds values [1000p, 1000p+100)
    sec = band + rng.integers(0, 100, n)
    f = rng.standard_normal(n)
    # NaNs confined to page 0: that page degrades to "no info" while the
    # others keep real bounds (a spread of NaNs would poison every page)
    f[rng.choice(65_536, 50, replace=False)] = np.nan
    nullable = pa.array(
        [None if i % 97 == 0 else int(i) for i in range(n)], pa.int64()
    )
    t = pa.table(
        {
            "ts": pa.array(ts, pa.int64()),
            "sec": pa.array(sec, pa.int64()),
            "f": pa.array(f),
            "nullable": nullable,
            "text": pa.array([f"doc-{i % 1000}" for i in range(n)]),
        }
    )
    return _container(t, sort_key=("ts",)), t


def _nan_safe(t: pa.Table) -> pa.Table:
    """NaN -> sentinel so Table.equals (NaN != NaN) can compare results."""
    cols = {}
    for c in t.column_names:
        col = t[c]
        if pa.types.is_floating(col.type):
            col = pc.if_else(pc.is_nan(col), pa.scalar(-1.25e300), col)
        cols[c] = col
    return pa.table(cols)


@pytest.fixture(scope="module")
def pages_container():
    return _pages_container()


def test_page_stats_shape_and_nulls():
    from parquet_converter_ray.zonemap import PAGE_ROWS, page_stats

    data, t = _pages_container(n=140_000)
    ps = page_stats(t.sort_by([("ts", "ascending")]))
    assert ps is not None and ps["rows_per_page"] == PAGE_ROWS
    npages = (t.num_rows + PAGE_ROWS - 1) // PAGE_ROWS
    assert len(ps["cols"]["ts"]["min"]) == npages
    assert "nullable" not in ps["cols"], "nullable columns skip page stats"
    assert "text" not in ps["cols"], "string columns skip page stats"
    # NaN-poisoned float pages degrade to None, clean pages keep bounds
    fmin = ps["cols"]["f"]["min"]
    assert any(m is None for m in fmin) or all(m is not None for m in fmin)
    # small tables record no page stats
    assert page_stats(t.slice(0, 1000)) is None


def test_page_candidate_mask_exact():
    from parquet_converter_ray.zonemap import page_candidate_mask

    pages = {
        "rows_per_page": 10,
        "cols": {"x": {"t": "int64", "min": [0, 100, 200], "max": [9, 109, 209]}},
    }
    for clauses, exp in [
        ([("x", "==", 105)], [False, True, False]),
        ([("x", "between", (5, 101))], [True, True, False]),
        ([("x", ">", 109)], [False, False, True]),
        ([("x", "<=", 0)], [True, False, False]),
        ([("x", "in", [3, 205])], [True, False, True]),
        ([("x", "!=", 5)], None),  # != can't prune
        ([("y", "==", 1)], None),  # no stats on clause column
    ]:
        m = page_candidate_mask(pages, 25, clauses)
        if exp is None:
            assert m is None, clauses
        else:
            assert m is not None and m.tolist() == exp, clauses


@pytest.mark.parametrize(
    "clauses",
    [
        [("sec", "between", (2000, 2080))],  # secondary col: page pruning only
        [("sec", "==", 3042)],
        [("sec", "between", (900, 1010))],  # straddles a page boundary
        [("sec", "==", 550)],  # provably empty (gap between bands)
        [("f", ">", 5.5)],  # float col, near-empty result
    ],
)
def test_page_pruned_scan_bit_exact(pages_container, clauses):
    data, t = pages_container
    dec = _ScanDecoder(None, None, clauses)
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), clauses)
    key = [(c, "ascending") for c in t.column_names]
    assert _nan_safe(got).sort_by(key).equals(
        _nan_safe(exp).sort_by(key).combine_chunks()
    )
    assert dec.page_hits == 1, "page stats must engage"


def test_page_pruning_intersects_sorted_lead(pages_container):
    """A lead-column range AND a secondary-column page predicate intersect:
    both mechanisms engage and the result stays exact."""
    data, t = pages_container
    ts_cut = int(t["ts"][200_000].as_py())  # inside page 3
    clauses = [("ts", ">=", ts_cut), ("sec", "<", 3100)]  # pages 0-3 by sec
    dec = _ScanDecoder(None, None, clauses)
    got = dec._one(data)
    exp = apply_predicate(decode_table(data), clauses)
    key = [(c, "ascending") for c in t.column_names]
    assert _nan_safe(got).sort_by(key).equals(
        _nan_safe(exp).sort_by(key).combine_chunks()
    )
    assert exp.num_rows > 0
    assert dec.range_hits == 1 and dec.page_hits == 1


def test_page_pruning_decodes_fewer_rows(pages_container):
    """The page path must touch only candidate pages: a one-band secondary
    predicate over a 300k-row/5-page container selects ~1 page."""
    from parquet_converter_ray import zonemap as zm

    data, t = pages_container
    counted = {"rows": 0}
    orig = zm.predicate_mask

    def spy(table, clauses):
        counted["rows"] += table.num_rows
        return orig(table, clauses)

    zm.predicate_mask, token = spy, None
    try:
        dec = _ScanDecoder(None, None, [("sec", "between", (2000, 2080))])
        dec._one(data)
    finally:
        zm.predicate_mask = orig
    assert counted["rows"] <= 66_000, counted  # ~1 page, not 300k

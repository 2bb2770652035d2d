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


# --- round-2 kernels ---------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=80), st.integers(min_value=64, max_value=4096))
def test_hash_byte_rows_slab_invariant(rows, slab):
    """Per-row hashes are a pure function of row content — independent of the
    internal slab size, equal rows hash equal, and empty != 1-byte rows."""
    import numpy as np

    from parquet_converter_ray.partition import hash_byte_rows

    lens = np.array([len(r) for r in rows], dtype=np.int64)
    flat = np.frombuffer(b"".join(rows), dtype=np.uint8)
    h1 = hash_byte_rows(flat, lens, slab_bytes=slab)
    h2 = hash_byte_rows(flat, lens, slab_bytes=1 << 22)
    assert (h1 == h2).all()
    for i, r1 in enumerate(rows):
        for j, r2 in enumerate(rows):
            if r1 == r2:
                assert h1[i] == h1[j]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(alphabet=st.characters(max_codepoint=0x2FFF), max_size=80), max_size=30),
    st.integers(min_value=1, max_value=6),
)
def test_flat_grams_match_per_doc(texts, k):
    """Batch shingle kernel == per-doc rolling_gram_hashes + np.unique."""
    import numpy as np
    import pandas as pd

    from parquet_converter_ray.pipelines.text import (
        batch_token_shingles,
        hash_tokens,
        rolling_gram_hashes,
    )

    s = pd.Series(texts, dtype=object)
    g, o = batch_token_shingles(s, k)
    for i, t in enumerate(texts):
        ht = hash_tokens(t.lower().split())
        ref = np.zeros(1, dtype=np.uint64) if len(ht) == 0 else np.unique(rolling_gram_hashes(ht, k))
        assert np.array_equal(ref, g[o[i] : o[i + 1]]), (i, t)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000), st.integers(-5, 5)), min_size=1, max_size=500),
       st.integers(min_value=1, max_value=12), st.booleans())
def test_ordered_topk_matches_sort(ray_session, pairs, k, desc):
    """Per-batch top-k partial merge == full sort + slice."""
    import pyarrow as pa

    from parquet_converter_ray.pipelines.relational import ordered_topk

    t = pa.table({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    order = [("a", "descending" if desc else "ascending"), ("b", "descending" if desc else "ascending")]
    expect = t.sort_by(order).slice(0, k)

    import ray.data

    ds = ray.data.from_arrow(t)
    got = ordered_topk(ds, ["a", "b"], k, descending=desc)
    assert got.equals(expect.combine_chunks())


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=400),
    cuts=st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=15, unique=True),
)
def test_range_assignment_monotone_and_bounded(vals, cuts):
    """Range partition assignment: monotone in the cluster value, bucket ids
    within [0, len(cuts)], equal values always share a bucket, and the
    assignment is a pure function (two calls identical)."""
    from parquet_converter_ray.partition import assign_part_id_range

    cuts = sorted(cuts)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    a = assign_part_id_range(t, cuts, "v")["part_id"].to_numpy()
    b = assign_part_id_range(t, cuts, "v")["part_id"].to_numpy()
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() <= len(cuts)
    order = np.argsort(np.asarray(vals), kind="stable")
    assert np.all(np.diff(a[order]) >= 0)  # monotone in value
    for v, p in zip(vals, a):  # equal value -> equal bucket
        assert p == a[vals.index(v)]


@settings(max_examples=40, deadline=None)
@given(
    rows=st.integers(1, 200),
    seed=st.integers(0, 2**31 - 1),
    k=st.integers(2, 3),
)
def test_zorder_keys_locality_and_determinism(rows, seed, k):
    """Z-order keys: deterministic, within int64, min corner maps to 0, and
    the max corner maps to the all-ones key for the bit budget."""
    from parquet_converter_ray.partition import zorder_keys

    rng = np.random.default_rng(seed)
    cols = [rng.integers(-1000, 1000, rows).astype(np.int64) for _ in range(k)]
    norm = [(float(c.min()), float(c.max())) for c in cols]
    z1 = zorder_keys(cols, norm)
    z2 = zorder_keys(cols, norm)
    assert np.array_equal(z1, z2)
    assert z1.dtype == np.int64 and z1.min() >= 0
    bits = 63 // k
    corner_lo = [np.array([lo], np.int64) for lo, _ in norm]
    corner_hi = [np.array([hi], np.int64) for _, hi in norm]
    assert zorder_keys(corner_lo, norm)[0] == 0
    full = zorder_keys(corner_hi, norm)[0]
    spans = [hi > lo for lo, hi in norm]
    expect = sum(
        sum(1 << (b * k + c) for b in range(bits))
        for c, s in enumerate(spans)
        if s
    )
    assert full == expect

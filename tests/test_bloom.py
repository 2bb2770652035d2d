"""Per-container Bloom filters: build/probe units, container round-trip,
scan_store pruning, append/compact carry-through."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from parquet_converter_ray import manifest as mf
from parquet_converter_ray.bloom import (
    bloom_may_contain,
    bloom_probe_footer,
    build_bloom,
    value_hashes,
)
from parquet_converter_ray.container import read_footer_file
from parquet_converter_ray.encode import append_dataset, encode_dataset
from parquet_converter_ray.synth import make_transcripts
from parquet_converter_ray.zonemap import scan_store

N = 12_000


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


# --- unit: filter semantics ------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        pa.array(np.arange(0, 50_000, 7, dtype=np.int64)),
        pa.array([f"conv-{i:06d}" for i in range(0, 30_000, 4)]),
        pa.array([f"k{i}".encode() for i in range(5_000)], type=pa.binary()),
    ],
    ids=["int64", "string", "binary"],
)
def test_no_false_negatives_and_low_fpr(arr):
    bits, meta = build_bloom(arr)
    present = value_hashes(arr.to_pylist())
    assert bloom_may_contain(bits, meta, present).all()  # NEVER a false negative
    if pa.types.is_integer(arr.type):
        absent = value_hashes([int(v) + 1 for v in arr.to_pylist()[:2000]])
    elif pa.types.is_binary(arr.type):
        absent = value_hashes([bytes(v) + b"?" for v in arr.to_pylist()[:2000]])
    else:
        absent = value_hashes([str(v) + "?" for v in arr.to_pylist()[:2000]])
    fpr = float(bloom_may_contain(bits, meta, absent).mean())
    assert fpr < 0.05  # 10 bits/value targets ~1%


def test_nulls_and_unsupported():
    bits, meta = build_bloom(pa.array([1, None, 3], type=pa.int64()))
    assert bloom_may_contain(bits, meta, value_hashes([1, 3])).all()
    assert build_bloom(pa.array([None, None], type=pa.int64())) is None
    assert build_bloom(pa.array([1.5, 2.5])) is None  # floats unsupported
    # unknown algo version degrades to all-True (sound, unpruned)
    assert bloom_may_contain(bits, {**meta, "algo": "future-v9"},
                             value_hashes([999])).all()


# --- store-level ------------------------------------------------------------------


@pytest.fixture(scope="module")
def transcripts():
    return make_transcripts(N, seed=23)


@pytest.fixture(scope="module")
def bloom_store(ray_session, transcripts, tmp_path_factory):
    """Range-clustered on ts so conv_id is NOT hash-routable — exactly the
    layout where a conv_id point lookup has only the Bloom filter to prune
    with (every container spans the full conv_id domain)."""
    out = str(tmp_path_factory.mktemp("bloom") / "store")
    encode_dataset(
        ray.data.from_arrow(transcripts),
        out,
        n_parts=8,
        salt_rows=0,
        cluster_by="ts",
        bloom_cols=["conv_id"],
        # force the non-dict codec the column would get at real cardinality:
        # at 12k rows the cost model may dict-encode conv_id, and the dict
        # probe would then shadow exactly the path this module tests
        codec={"conv_id": "fsst"},
    )
    return out


def test_footer_records_blooms(bloom_store):
    path = sorted(glob.glob(os.path.join(bloom_store, "part-*.pcc")))[0]
    footer = read_footer_file(path)
    ent = footer["blooms"]["conv_id"]
    assert ent["m"] % 8 == 0 and ent["len"] == ent["m"] // 8
    assert ent["k"] >= 1 and ent["nd"] >= 1 and "crc32" in ent
    # probe soundness straight off the footer
    assert bloom_probe_footer(path, footer, [("conv_id", "==", "no-such-conv")],
                              verify_crc=True) in (True, False)


def test_scan_prunes_on_bloom_and_matches_exact(bloom_store, transcripts):
    convs = pc.unique(transcripts["conv_id"]).to_pylist()
    want = sorted(convs)[len(convs) // 2]
    ds, plan = scan_store(bloom_store, [("conv_id", "==", want)],
                          columns=["conv_id", "turn_idx", "role"], return_plan=True)
    got = _collect(ds).sort_by("turn_idx")
    exp = (
        transcripts.filter(pc.equal(transcripts["conv_id"], want))
        .select(["conv_id", "turn_idx", "role"])
        .sort_by("turn_idx")
    )
    assert got.equals(exp)
    # ts-clustered layout: the conversation's turns live in few containers,
    # everything else must be bloom-pruned (fpr makes this probabilistic but
    # 8 containers x ~1% leaves enormous slack)
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]


def test_store_agg_prunes_on_bloom(bloom_store, transcripts):
    """store_agg gets the footer-probe level: a point aggregate on a
    bloom'd key over a ts-clustered store (zone maps useless for conv_id)
    decodes only the containers the Bloom filter can't rule out."""
    from parquet_converter_ray.storeagg import store_agg

    convs = pc.unique(transcripts["conv_id"]).to_pylist()
    want = sorted(convs)[len(convs) // 2]
    res, plan = store_agg(bloom_store, ["count", "max:turn_idx"],
                          [("conv_id", "==", want)], return_plan=True)
    mask = pc.equal(transcripts["conv_id"], want)
    assert res["count"] == pc.sum(pc.cast(mask, pa.int64())).as_py()
    assert res["max_turn_idx"] == pc.max(
        pc.filter(transcripts["turn_idx"], mask)).as_py()
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]
    # absent key: zero scan, zero count
    res, plan = store_agg(bloom_store, ["count"],
                          [("conv_id", "==", "conv-that-never-was")],
                          return_plan=True)
    assert res["count"] == 0 and plan["scanned"] == 0


def test_scan_absent_key_prunes_everything(bloom_store):
    ds, plan = scan_store(bloom_store, [("conv_id", "==", "conv-that-never-was")],
                          columns=["turn_idx"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["pruned_bloom"] + plan["pruned_stats"] == plan["parts_total"]


def test_append_carries_bloom_cols(bloom_store, tmp_path):
    import shutil

    out = str(tmp_path / "store")
    shutil.copytree(bloom_store, out)
    extra = make_transcripts(2_000, seed=91, conv_offset=10_000_000)
    append_dataset(ray.data.from_arrow(extra), out)
    gen_paths = sorted(glob.glob(os.path.join(out, "part-*-g*.pcc")))
    assert gen_paths, "append wrote no generation containers"
    assert all("conv_id" in (read_footer_file(p).get("blooms") or {}) for p in gen_paths)
    # and the probe prunes across generations too
    uniq = pc.unique(extra["conv_id"]).to_pylist()
    ds, plan = scan_store(out, [("conv_id", "==", uniq[0])],
                          columns=["conv_id", "turn_idx"], return_plan=True)
    got = _collect(ds)
    exp_rows = int(pc.sum(pc.cast(pc.equal(extra["conv_id"], uniq[0]), pa.int64())).as_py())
    assert got.num_rows == exp_rows
    assert plan["pruned_bloom"] >= 1


def test_pre_bloom_store_unaffected(ray_session, transcripts, tmp_path):
    out = str(tmp_path / "plain")
    encode_dataset(ray.data.from_arrow(transcripts), out, n_parts=4, salt_rows=0,
                   cluster_by="ts")
    path = sorted(glob.glob(os.path.join(out, "part-*.pcc")))[0]
    assert "blooms" not in read_footer_file(path)
    convs = pc.unique(transcripts["conv_id"]).to_pylist()
    ds, plan = scan_store(out, [("conv_id", "==", convs[0])],
                          columns=["turn_idx"], return_plan=True)
    _collect(ds)
    assert plan["pruned_bloom"] == 0  # nothing to prune with, nothing breaks


def test_lineitem_bloom_scan_query_prunes(ray_session):
    """The driver-gated query's store: ts-clustered lineitem where l_orderkey
    spans every container — only the Bloom filter can prune the point lookup."""
    from parquet_converter_ray.pipelines.transcripts import (
        _lineitem_range_store,
        lineitem_bloom_scan,
    )
    from parquet_converter_ray.storeagg import store_agg

    sf = "/root/testdata/sf0.001"
    tbl = lineitem_bloom_scan(sf)
    assert tbl.num_rows >= 1
    assert len(set(tbl["l_orderkey"].to_pylist())) == 1
    store = _lineitem_range_store(sf)
    key = int(tbl["l_orderkey"][0].as_py())
    _, plan = scan_store(store, [("l_orderkey", "==", key)],
                         columns=["l_orderkey"], return_plan=True)
    # mid-domain key: zone-map stats can't prune (full-domain spans); bloom must
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]
    # and the key-pick aggregates answer from metadata without opening files
    _, aplan = store_agg(store, ["min:l_orderkey", "max:l_orderkey"], return_plan=True)
    assert aplan["scanned"] == 0


def test_bloom_cols_validation(ray_session, transcripts, tmp_path):
    with pytest.raises(ValueError, match="not in schema"):
        encode_dataset(ray.data.from_arrow(transcripts), str(tmp_path / "a"),
                       n_parts=2, salt_rows=0, bloom_cols=["nope"])
    with pytest.raises(ValueError, match="not integer/string"):
        encode_dataset(ray.data.from_arrow(transcripts), str(tmp_path / "b"),
                       n_parts=2, salt_rows=0, bloom_cols=["ts"])


# --- typed probe: literal coerced to the COLUMN's hashing domain -------------------


def test_typed_value_hashes_coercion():
    """ADVICE r4 (medium): probe literals must hash in the column's domain,
    not the literal's Python type — a mismatch silently pruned live rows."""
    from parquet_converter_ray.bloom import typed_value_hashes
    from parquet_converter_ray.partition import stable_hash_ints, stable_hash_strings

    # int column: "5" / 5.0 / np.int32(5) all coerce to the int-hash of 5
    want = stable_hash_ints(pa.array([5], pa.int64()))
    for lit in ["5", 5.0, np.int32(5)]:
        got = typed_value_hashes([lit], "int64")
        assert got is not None and (got == want).all(), lit
    # non-integral / bool / junk literals refuse (None -> probe skips, no prune)
    assert typed_value_hashes([5.5], "int64") is None
    assert typed_value_hashes([True], "int64") is None
    assert typed_value_hashes(["abc"], "int64") is None
    # string column: str and bytes hash identically; int literal refuses
    ws = stable_hash_strings(pa.array([b"conv-1"], pa.binary()))
    assert (typed_value_hashes(["conv-1"], "string") == ws).all()
    assert (typed_value_hashes([b"conv-1"], "large_string") == ws).all()
    assert typed_value_hashes([12345], "string") is None
    # unknown/unsupported column types never hash
    assert typed_value_hashes([1], "double") is None
    assert typed_value_hashes([1], "not-a-type") is None


def test_cross_type_probe_never_prunes_string_column(bloom_store):
    """An int literal on a string bloom column must pass through (the exact
    filter decides), never falsely prune the container."""
    for path in sorted(glob.glob(os.path.join(bloom_store, "part-*.pcc"))):
        footer = read_footer_file(path)
        assert bloom_probe_footer(path, footer, [("conv_id", "==", 12345)])
        assert bloom_probe_footer(path, footer, [("conv_id", "in", [1, 2])])


def test_numeric_string_probe_matches_int_column(ray_session, tmp_path):
    """A numeric-string literal on an int bloom column coerces (mirroring the
    exact filter) instead of hashing in the string domain and pruning."""
    tbl = pa.table({
        "k": pa.array(np.arange(4_000, dtype=np.int64)),
        "conv_id": pa.array(np.arange(4_000, dtype=np.int64) % 50),
        "turn_idx": pa.array(np.arange(4_000, dtype=np.int64)),
        "ts": pa.array(np.arange(4_000).astype("datetime64[us]")),
    })
    out = str(tmp_path / "intbloom")
    encode_dataset(ray.data.from_arrow(tbl), out, n_parts=3, salt_rows=0,
                   cluster_by="ts", bloom_cols=["k"])
    present, absent_hits = 0, 0
    for path in sorted(glob.glob(os.path.join(out, "part-*.pcc"))):
        footer = read_footer_file(path)
        # every container holds SOME k; probe one of its own values as a string
        from parquet_converter_ray.container import decode_table

        with open(path, "rb") as f:
            ks = decode_table(f.read(), columns=["k"])["k"].to_pylist()
        assert bloom_probe_footer(path, footer, [("k", "==", str(ks[0]))])
        present += 1
        absent_hits += int(bloom_probe_footer(path, footer, [("k", "==", "999999")]))
    assert present >= 2
    assert absent_hits <= 1  # absent key still prunes (fpr slack)


def test_delete_rewrite_keeps_blooms(bloom_store, tmp_path):
    """A delete's partition rewrite must re-emit the store's Bloom sidecars:
    before the fix the rewrite dropped bloom_cols, so a single delete
    silently degraded every later point lookup on the touched partitions."""
    import shutil

    from parquet_converter_ray.container import decode_table
    from parquet_converter_ray.encode import delete_conversations

    out = str(tmp_path / "store")
    shutil.copytree(bloom_store, out)
    victims = []
    for p in sorted(glob.glob(os.path.join(out, "part-*.pcc")))[:2]:
        with open(p, "rb") as f:
            victims.append(decode_table(f.read(), columns=["conv_id"])["conv_id"][0].as_py())
    s = delete_conversations(out, victims)
    assert s["parts_rewritten"] >= 1
    for p in sorted(glob.glob(os.path.join(out, "part-*.pcc"))):
        assert "conv_id" in (read_footer_file(p).get("blooms") or {}), p
    # and an absent-key scan still bloom-prunes everything post-rewrite
    ds, plan = scan_store(out, [("conv_id", "==", "conv-does-not-exist")],
                          columns=["conv_id"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["scanned"] == 0

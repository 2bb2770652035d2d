"""upsert_dataset (key-level MERGE) + snapshot_store/restore_snapshot.

Upsert: delivery rows replace stored rows with the same (conv, order) key,
new keys insert, one fused rewrite per touched partition that folds appended
generations (same crash contract as delete). Snapshot: hard-link
point-in-time copies that survive in-place rewrites (delete/upsert write new
inodes via atomic rename), restore rolls back and forward losslessly.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet_converter_ray import manifest as mf
from parquet_converter_ray.decode import decode_dataset
from parquet_converter_ray.encode import (
    append_dataset,
    delete_conversations,
    encode_dataset,
    upsert_dataset,
)
from parquet_converter_ray.fsck import fsck_store
from parquet_converter_ray.snapshot import (
    drop_snapshot,
    list_snapshots,
    restore_snapshot,
    snapshot_store,
)
from parquet_converter_ray.synth import make_transcripts

SORT = [(c, "ascending") for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")]


def _decode_all(enc: str) -> pa.Table:
    return pa.concat_tables(
        list(decode_dataset(enc).iter_batches(batch_format="pyarrow"))
    )


def _eq(got: pa.Table, want: pa.Table) -> bool:
    return (
        got.sort_by(SORT).select(want.column_names).combine_chunks()
        .equals(want.sort_by(SORT).combine_chunks())
    )


def _mk_store(tmp_path, n=4000, seed=21, salt_rows=300):
    t = make_transcripts(n, seed=seed)
    inp = tmp_path / "in"
    inp.mkdir(exist_ok=True)
    pq.write_table(t, inp / "t.parquet")
    enc = str(tmp_path / "enc")
    encode_dataset(str(inp), enc, n_parts=4, salt_rows=salt_rows)
    return enc, t


def _delivery_from(t: pa.Table, conv: str, new_conv: str) -> pa.Table:
    """All turns of one existing conversation with edited text (updates) plus
    a brand-new conversation (inserts)."""
    old = t.filter(pc.equal(t["conv_id"], conv))
    upd = old.set_column(
        old.column_names.index("text"),
        "text",
        pa.array([f"edited-{i}" for i in range(old.num_rows)]),
    )
    ins = pa.table(
        {
            "conv_id": pa.array([new_conv] * 3),
            "turn_idx": pa.array([0, 1, 2], type=t["turn_idx"].type),
            "role": pa.array(["user", "assistant", "user"]),
            "text": pa.array(["i0", "i1", "i2"]),
            "tool": pa.array([None, "bash", None], type=t["tool"].type),
            "ts": pa.array([None] * 3, type=t["ts"].type),
        }
    )
    return pa.concat_tables([upd.select(ins.column_names), ins])


def _merge_expect(t: pa.Table, delivery: pa.Table) -> pa.Table:
    dk = pc.binary_join_element_wise(
        pc.cast(delivery["conv_id"], pa.string()),
        pc.cast(delivery["turn_idx"], pa.string()),
        "\x1f",
    )
    tk = pc.binary_join_element_wise(
        pc.cast(t["conv_id"], pa.string()), pc.cast(t["turn_idx"], pa.string()), "\x1f"
    )
    keep = t.filter(pc.invert(pc.is_in(tk, value_set=dk.combine_chunks())))
    return pa.concat_tables([keep.select(delivery.column_names), delivery])


def test_upsert_updates_and_inserts(ray_session, tmp_path):
    enc, t = _mk_store(tmp_path)
    conv = t["conv_id"][0].as_py()
    delivery = _delivery_from(t, conv, "conv-upsert-new")
    pq.write_table(delivery, tmp_path / "d.parquet")
    s = upsert_dataset(str(tmp_path / "d.parquet"), enc)
    n_old = t.filter(pc.equal(t["conv_id"], conv)).num_rows
    assert s["rows_updated"] == n_old
    assert s["rows_inserted"] == 3
    assert _eq(_decode_all(enc), _merge_expect(t, delivery))
    assert fsck_store(enc)["ok"]
    # idempotent: the same delivery again is all updates, zero inserts
    s2 = upsert_dataset(str(tmp_path / "d.parquet"), enc)
    assert s2["rows_updated"] == delivery.num_rows and s2["rows_inserted"] == 0
    assert _eq(_decode_all(enc), _merge_expect(t, delivery))


def test_upsert_folds_appended_generations(ray_session, tmp_path):
    """An upsert that touches a partition with appended generations folds
    them into the fresh base (gen files and records gone, rows kept)."""
    enc, t = _mk_store(tmp_path, n=3000)
    d2 = make_transcripts(900, seed=77, conv_offset=50_000)
    pq.write_table(d2, tmp_path / "d2.parquet")
    append_dataset(str(tmp_path / "d2.parquet"), enc)
    full = pa.concat_tables([t, d2])
    # one delivery row per partition guarantees every partition rewrites
    sample = full.group_by("conv_id").aggregate([("turn_idx", "min")])
    conv_ids, turns = [], []
    for cv, tn in zip(
        sample["conv_id"].to_pylist(), sample["turn_idx_min"].to_pylist()
    ):
        conv_ids.append(cv)
        turns.append(tn)
    delivery = pa.table(
        {
            "conv_id": pa.array(conv_ids),
            "turn_idx": pa.array(turns, type=full["turn_idx"].type),
            "role": pa.array(["system"] * len(conv_ids)),
            "text": pa.array(["rewritten"] * len(conv_ids)),
            "tool": pa.array([None] * len(conv_ids), type=full["tool"].type),
            "ts": pa.array([None] * len(conv_ids), type=full["ts"].type),
        }
    )
    pq.write_table(delivery, tmp_path / "d3.parquet")
    s = upsert_dataset(str(tmp_path / "d3.parquet"), enc)
    assert s["rows_updated"] == len(conv_ids) and s["rows_inserted"] == 0
    import glob

    assert not glob.glob(os.path.join(enc, "part-*-g*.pcc")), "generations must fold"
    assert _eq(_decode_all(enc), _merge_expect(full, delivery))
    assert fsck_store(enc)["ok"]
    # folding generations stamps the snapshot watermark like delete does
    assert int((mf.load_run_record(enc) or {}).get("snapshot_watermark") or 0) >= 1


def test_upsert_duplicate_delivery_keys_raise(ray_session, tmp_path):
    enc, t = _mk_store(tmp_path, n=1500)
    conv = t["conv_id"][0].as_py()
    row = t.filter(pc.equal(t["conv_id"], conv)).slice(0, 1)
    dup = pa.concat_tables([row, row])
    pq.write_table(dup, tmp_path / "dup.parquet")
    with pytest.raises(Exception, match="duplicate"):
        upsert_dataset(str(tmp_path / "dup.parquet"), enc)


def test_upsert_refuses_range_clustered_store(ray_session, tmp_path):
    t = make_transcripts(1200, seed=5)
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(t, inp / "t.parquet")
    enc = str(tmp_path / "enc-range")
    encode_dataset(
        str(inp), enc, n_parts=3, salt_rows=0, cluster_by="ts", sort_key=("ts",)
    )
    pq.write_table(t.slice(0, 5), tmp_path / "d.parquet")
    with pytest.raises(ValueError, match="range"):
        upsert_dataset(str(tmp_path / "d.parquet"), enc)


def test_snapshot_survives_delete_and_restores(ray_session, tmp_path):
    enc, t = _mk_store(tmp_path, n=3500, seed=31)
    orig = _decode_all(enc)
    s = snapshot_store(enc)  # auto-named s0001
    assert s["rows"] == t.num_rows

    victims = sorted(set(t["conv_id"].to_pylist()))[:4]
    delete_conversations(enc, victims)
    live = _decode_all(enc)
    assert live.num_rows < orig.num_rows

    # the snapshot still decodes the pre-delete bytes, bit-identical
    snap_dir = s["path"]
    assert _eq(_decode_all(snap_dir), orig)
    assert fsck_store(snap_dir)["ok"]

    # roll back, then forward again
    snapshot_store(enc, name="post-delete")
    r = restore_snapshot(enc, s["name"])
    assert r["restored_containers"] == s["containers"]
    assert _eq(_decode_all(enc), orig)
    assert fsck_store(enc)["ok"]
    restore_snapshot(enc, "post-delete")
    assert _decode_all(enc).num_rows == live.num_rows
    assert fsck_store(enc)["ok"]

    names = [x["name"] for x in list_snapshots(enc)]
    assert names == ["post-delete", s["name"]]
    drop_snapshot(enc, "post-delete")
    assert [x["name"] for x in list_snapshots(enc)] == [s["name"]]
    # shared inodes survive the drop
    assert _decode_all(enc).num_rows == live.num_rows


def test_restore_removes_post_snapshot_appends(ray_session, tmp_path):
    enc, t = _mk_store(tmp_path, n=2000, seed=41)
    s = snapshot_store(enc, name="before-append")
    d2 = make_transcripts(600, seed=42, conv_offset=90_000)
    pq.write_table(d2, tmp_path / "d2.parquet")
    append_dataset(str(tmp_path / "d2.parquet"), enc)
    assert _decode_all(enc).num_rows == t.num_rows + 600
    r = restore_snapshot(enc, "before-append")
    assert r["removed_containers"] > 0  # the appended generation files
    assert _eq(_decode_all(enc), t)
    assert fsck_store(enc)["ok"]


def test_snapshot_cli_roundtrip(ray_session, tmp_path, capsys):
    import json

    from parquet_converter_ray.cli import main

    enc, t = _mk_store(tmp_path, n=1000, seed=51)
    assert main(["snapshot", enc, "--name", "cli-snap"]) == 0
    assert main(["snapshots", enc]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    listed = json.loads(out[-1])
    assert [x["name"] for x in listed] == ["cli-snap"]
    victims = sorted(set(t["conv_id"].to_pylist()))[:2]
    delete_conversations(enc, victims)
    assert main(["restore", enc, "cli-snap"]) == 0
    assert _eq(_decode_all(enc), t)


def test_upsert_cli(ray_session, tmp_path, capsys):
    import json

    from parquet_converter_ray.cli import main

    enc, t = _mk_store(tmp_path, n=1000, seed=61)
    conv = t["conv_id"][0].as_py()
    delivery = _delivery_from(t, conv, "conv-cli-new")
    pq.write_table(delivery, tmp_path / "d.parquet")
    assert main(["upsert", str(tmp_path / "d.parquet"), enc]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_inserted"] == 3
    assert _eq(_decode_all(enc), _merge_expect(t, delivery))

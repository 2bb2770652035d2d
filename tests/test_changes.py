"""Row-level CDC between two store states (``decode.store_changes``):
exact change sets vs hand-built expectations, metadata-only partition
skipping, duplicate-key folding, layout refusals, and the CLI surface."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

import ray

from parquet_converter_ray.decode import store_changes
from parquet_converter_ray.encode import (
    append_dataset,
    delete_conversations,
    encode_dataset,
    upsert_dataset,
)
from parquet_converter_ray.snapshot import snapshot_path, snapshot_store


def _collect(ds) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not batches:
        s = ds.schema()
        return pa.table({n: pa.array([], type=t) for n, t in zip(s.names, s.types)})
    return pa.concat_tables(batches)


def _base_table(n_convs=1000, turns=4) -> pa.Table:
    n = n_convs * turns
    return pa.table(
        {
            "conv_id": pa.array([f"c{i // turns}" for i in range(n)]),
            "turn_idx": pa.array([i % turns for i in range(n)], pa.int64()),
            "text": pa.array([f"row {i}" for i in range(n)]),
        }
    )


@pytest.fixture()
def store(ray_session, tmp_path):
    out = str(tmp_path / "store")
    encode_dataset(
        ray.data.from_arrow(_base_table()), out, n_parts=8,
        conv_col="conv_id", order_col="turn_idx",
        sort_key=("conv_id", "turn_idx"), salt_rows=0,
    )
    return out


def test_changes_exact_and_partition_skip(store):
    snapshot_store(store, name="base")
    up = pa.table(
        {
            "conv_id": pa.array(["c1", "cNEW"]),
            "turn_idx": pa.array([2, 0], pa.int64()),
            "text": pa.array(["EDITED", "NEWROW"]),
        }
    )
    upsert_dataset(ray.data.from_arrow(up), store)
    delete_conversations(store, ["c5"])

    ds, plan = store_changes(snapshot_path(store, "base"), store, return_plan=True)
    t = _collect(ds).sort_by(
        [("change", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert t.to_pydict() == {
        "conv_id": ["c5", "c5", "c5", "c5", "cNEW", "c1"],
        "turn_idx": [0, 1, 2, 3, 0, 2],
        "change": ["delete", "delete", "delete", "delete", "insert", "update"],
    }
    # at most 3 partitions were touched (c1, c5, cNEW); the rest skip from
    # manifest metadata alone — the 100 TB lever
    assert plan["parts_total"] == 8
    assert plan["parts_compared"] <= 3
    assert plan["parts_skipped"] >= 5
    # key column types match the store schema, not pandas widening
    assert t["turn_idx"].type == pa.int64()
    assert t["change"].type == pa.string()


def test_changes_identical_states_all_skip(store):
    snapshot_store(store, name="base")
    ds, plan = store_changes(snapshot_path(store, "base"), store, return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["parts_skipped"] == plan["parts_total"] > 0
    assert plan["parts_compared"] == 0


def test_changes_sees_appends_as_inserts(store):
    snapshot_store(store, name="base")
    extra = pa.table(
        {
            "conv_id": pa.array(["cA", "cA"]),
            "turn_idx": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x", "y"]),
        }
    )
    append_dataset(ray.data.from_arrow(extra), store)
    t = _collect(store_changes(snapshot_path(store, "base"), store))
    assert t.num_rows == 2
    assert set(t["change"].to_pylist()) == {"insert"}
    assert set(t["conv_id"].to_pylist()) == {"cA"}


def test_changes_duplicate_keys_fold(ray_session, tmp_path):
    """Without an order column the conv key alone identifies rows; duplicate
    keys fold via (count, hash-sum) — adding one more row under an existing
    key reports 'update' for that key, not a spurious insert+delete."""
    old_dir, new_dir = str(tmp_path / "old"), str(tmp_path / "new")
    base = pa.table(
        {"conv_id": pa.array(["a", "a", "b"]), "text": pa.array(["1", "2", "3"])}
    )
    grown = pa.table(
        {"conv_id": pa.array(["a", "a", "a", "b"]),
         "text": pa.array(["1", "2", "extra", "3"])}
    )
    for d, t in ((old_dir, base), (new_dir, grown)):
        encode_dataset(ray.data.from_arrow(t), d, n_parts=4, conv_col="conv_id",
                       order_col=None, sort_key=("conv_id",), salt_rows=0)
    t = _collect(store_changes(old_dir, new_dir))
    assert t.to_pydict() == {"conv_id": ["a"], "change": ["update"]}


def test_changes_refuses_layout_mismatch(ray_session, tmp_path):
    a, b, r = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "r")
    t = _base_table(100)
    encode_dataset(ray.data.from_arrow(t), a, n_parts=4, conv_col="conv_id",
                   order_col="turn_idx", sort_key=("conv_id", "turn_idx"), salt_rows=0)
    encode_dataset(ray.data.from_arrow(t), b, n_parts=8, conv_col="conv_id",
                   order_col="turn_idx", sort_key=("conv_id", "turn_idx"), salt_rows=0)
    with pytest.raises(ValueError, match="n_parts"):
        store_changes(a, b)
    encode_dataset(ray.data.from_arrow(t), r, n_parts=4, conv_col="conv_id",
                   order_col="turn_idx", sort_key=("conv_id", "turn_idx"), salt_rows=0,
                   cluster_by="turn_idx")
    with pytest.raises(ValueError, match="range-clustered"):
        store_changes(a, r)


def test_cli_changes(store, capsys):
    from parquet_converter_ray.cli import main

    snapshot_store(store, name="base")
    up = pa.table(
        {
            "conv_id": pa.array(["c2"]),
            "turn_idx": pa.array([1], pa.int64()),
            "text": pa.array(["EDITED"]),
        }
    )
    upsert_dataset(ray.data.from_arrow(up), store)
    rc = main(["changes", snapshot_path(store, "base"), store, "--limit", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["by_change"] == {"update": 1}
    assert out["plan"]["parts_skipped"] >= 7
    assert out["sample"][0]["conv_id"] == "c2"

"""``vacuum_store``: tmp-debris sweep, crash-leftover recovery via the
repair fold, stray refusal/force, snapshot retention, dry-run."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pytest

import ray

from parquet_converter_ray.decode import decode_dataset
from parquet_converter_ray.encode import append_dataset, encode_dataset
from parquet_converter_ray.snapshot import list_snapshots, snapshot_store
from parquet_converter_ray.vacuum import vacuum_store


def _table(n=2000):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i // 4}" for i in range(n)]),
            "turn_idx": pa.array([i % 4 for i in range(n)], pa.int64()),
            "text": pa.array([f"row {i}" for i in range(n)]),
        }
    )


@pytest.fixture()
def store(ray_session, tmp_path):
    out = str(tmp_path / "store")
    encode_dataset(ray.data.from_arrow(_table()), out, n_parts=4,
                   conv_col="conv_id", order_col="turn_idx",
                   sort_key=("conv_id", "turn_idx"), salt_rows=0)
    return out


def test_vacuum_sweeps_tmp_and_is_noop_on_healthy(store):
    tmp = os.path.join(store, "part-00000.pcc.tmp")
    with open(tmp, "wb") as f:
        f.write(b"x" * 1234)
    rep = vacuum_store(store)
    assert rep["tmp_removed"] == 1
    assert rep["bytes_reclaimed"] >= 1234
    assert not os.path.exists(tmp)
    assert rep["strays"] == [] and rep["snapshots_dropped"] == []
    assert decode_dataset(store).count() == 2000


def test_vacuum_recovers_crash_leftover_rows(store):
    """A generation container whose record was dropped (delete/upsert crash
    between contract steps 2 and 3) holds rows that exist nowhere else —
    vacuum's repair fold must merge them back, never delete them."""
    extra = pa.table(
        {
            "conv_id": pa.array(["zz", "zz"]),
            "turn_idx": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a", "b"]),
        }
    )
    append_dataset(ray.data.from_arrow(extra), store)
    gen = glob.glob(os.path.join(store, "part-*-g*.pcc"))
    assert gen
    # simulate the crash: generation records gone, container files remain
    from parquet_converter_ray import manifest as mf

    for r in mf.load_records(store):
        if int(r.get("generation", 0)):
            os.remove(mf.record_path(store, int(r["part_id"]), int(r["generation"])))
    with pytest.raises(ValueError, match="not in the\n?.*manifest|manifest"):
        decode_dataset(store).count()
    rep = vacuum_store(store)
    assert rep["repair"] is not None
    assert rep["strays"] == []
    assert not glob.glob(os.path.join(store, "part-*-g*.pcc"))
    assert decode_dataset(store).count() == 2002  # appended rows recovered


def test_vacuum_strays_refused_then_forced(store):
    foreign = os.path.join(store, "part-99990.pcc")
    shutil.copyfile(os.path.join(store, "part-00000.pcc"), foreign)
    with pytest.raises(ValueError, match="manifest"):
        decode_dataset(store).count()
    rep = vacuum_store(store)
    assert rep["strays"] == ["part-99990.pcc"]
    assert rep["strays_removed"] == 0
    assert os.path.exists(foreign)  # refused by default
    rep = vacuum_store(store, force_strays=True)
    assert rep["strays_removed"] == 1
    assert not os.path.exists(foreign)
    assert decode_dataset(store).count() == 2000


def test_vacuum_snapshot_retention(store):
    import time

    for name in ("s1", "s2", "s3"):
        snapshot_store(store, name=name)
        time.sleep(0.02)  # distinct publish mtimes
    rep = vacuum_store(store, keep_snapshots=1, dry_run=True)
    assert rep["snapshots_dropped"] == ["s1", "s2"]
    assert len(list_snapshots(store)) == 3  # dry run removed nothing
    rep = vacuum_store(store, keep_snapshots=1)
    assert rep["snapshots_dropped"] == ["s1", "s2"]
    left = list_snapshots(store)
    assert [s["name"] for s in left] == ["s3"]
    # surviving snapshot still reads as a full store
    assert decode_dataset(left[0]["path"]).count() == 2000
    with pytest.raises(ValueError, match=">= 0"):
        vacuum_store(store, keep_snapshots=-1)


def test_cli_vacuum(store, capsys):
    from parquet_converter_ray.cli import main

    with open(os.path.join(store, "part-00001.pcc.tmp"), "wb") as f:
        f.write(b"y" * 10)
    snapshot_store(store, name="old")
    snapshot_store(store, name="new")
    rc = main(["vacuum", store, "--keep-snapshots", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tmp_removed"] == 1
    assert out["snapshots_dropped"] == ["old"]

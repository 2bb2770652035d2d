"""Range-clustered store layout: zone maps must actually prune range scans
(a hash layout never can — every partition spans the full domain), while the
store lifecycle (decode fidelity, append with recorded cuts, delete via
probe-everything, resume without resampling) stays correct."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _sorted(t: pa.Table) -> pa.Table:
    # (l_orderkey, l_linenumber) is NOT unique in the synth lineitem (1401
    # duplicate pairs), so the order-insensitive compare sorts on ALL columns
    return t.sort_by([(c, "ascending") for c in sorted(t.column_names)])


@pytest.fixture(scope="module")
def stores(ray_session, tmp_path_factory):
    from parquet_converter_ray.encode import encode_dataset

    src = f"{SF_DIR}/lineitem.parquet"
    base = tmp_path_factory.mktemp("range_cluster")
    cols = ["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_returnflag"]
    tbl = pq.read_table(src, columns=cols)
    inp = str(base / "lineitem.parquet")
    pq.write_table(tbl, inp)

    hash_dir, range_dir = str(base / "hash"), str(base / "range")
    common = dict(
        n_parts=8,
        conv_col="l_orderkey",
        order_col="l_linenumber",
        sort_key=("l_orderkey", "l_linenumber"),
        salt_rows=0,
    )
    encode_dataset(inp, hash_dir, **common)
    encode_dataset(inp, range_dir, cluster_by="l_shipdate", **common)
    return {"input": tbl, "inp": inp, "hash": hash_dir, "range": range_dir}


def test_range_store_decodes_bit_identical(stores):
    from parquet_converter_ray.decode import decode_dataset

    got = _sorted(
        pa.concat_tables(
            list(decode_dataset(stores["range"]).iter_batches(batch_format="pyarrow"))
        )
    )
    want = _sorted(stores["input"])
    assert got.select(want.column_names).equals(want)


def test_range_scan_prunes_hash_scan_cannot(stores):
    """A ship-date band must prune range-store containers via zone maps; the
    hash store scans everything. Both return identical rows, equal to DuckDB."""
    from parquet_converter_ray.zonemap import scan_store

    pred = [("l_shipdate", "between", ("1996-01-01", "1996-03-31"))]
    r_ds, r_plan = scan_store(stores["range"], pred, return_plan=True)
    h_ds, h_plan = scan_store(stores["hash"], pred, return_plan=True)
    r = _sorted(pa.concat_tables(list(r_ds.iter_batches(batch_format="pyarrow"))))
    h = _sorted(pa.concat_tables(list(h_ds.iter_batches(batch_format="pyarrow"))))
    assert r.equals(h)
    assert r_plan["pruned_stats"] > 0, r_plan
    assert h_plan["pruned_stats"] == 0, h_plan
    assert r_plan["scanned"] < r_plan["parts_total"]

    con = duckdb.connect()
    want = con.sql(
        f"SELECT count(*) FROM '{stores['inp']}' WHERE l_shipdate "
        f"BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'"
    ).fetchone()[0]
    assert r.num_rows == want > 0


def test_range_store_lookup_falls_back_to_pruned_scan(stores):
    """Point access on a range-clustered store has no hash route; lookup must
    degrade to the predicate-pushdown scan and return the same rows a
    hash-store lookup returns."""
    from parquet_converter_ray.decode import lookup_conversation

    key = int(stores["input"]["l_orderkey"][0].as_py())
    got = lookup_conversation(stores["range"], key)
    want = lookup_conversation(stores["hash"], key)
    assert got.num_rows == want.num_rows > 0
    assert _sorted(got.select(want.column_names)).equals(_sorted(want))
    missing = lookup_conversation(stores["range"], 987_654_321)
    assert missing.num_rows == 0


def test_range_store_append_uses_recorded_cuts_and_delete_works(
    ray_session, stores, tmp_path
):
    """Appended rows must land in the bucket the recorded cuts dictate (scan
    still prunes and finds them); delete removes a key entirely via the
    probe-everything candidate set and the store stays fsck-clean."""
    import shutil

    from parquet_converter_ray.decode import decode_dataset
    from parquet_converter_ray.encode import append_dataset, delete_conversations
    from parquet_converter_ray.zonemap import scan_store

    store = str(tmp_path / "range_copy")
    shutil.copytree(stores["range"], store)

    extra = pa.table(
        {
            "l_orderkey": pa.array([999_999_001, 999_999_001], pa.int64()),
            "l_linenumber": pa.array([1, 2], pa.int32()),
            "l_shipdate": pa.array(
                np.array(["1996-02-15", "1998-11-01"], dtype="datetime64[us]")
            ),
            "l_quantity": pa.array([1.0, 2.0], pa.float64()),
            "l_returnflag": pa.array(["N", "N"]),
        }
    )
    delivery = str(tmp_path / "delivery.parquet")
    sch = pq.read_schema(stores["inp"])
    pq.write_table(extra.cast(pa.schema([sch.field(c) for c in extra.column_names])), delivery)
    summary = append_dataset(delivery, store)
    assert summary["rows_appended"] == 2

    got, plan = scan_store(
        store, [("l_orderkey", "==", 999_999_001)], return_plan=True
    )
    rows = pa.concat_tables(list(got.iter_batches(batch_format="pyarrow")))
    assert rows.num_rows == 2

    # the two appended rows have ship dates in different cut buckets: a
    # date-band scan for just one of them must not scan the other's bucket
    one, plan1 = scan_store(
        store,
        [("l_shipdate", "between", ("1998-10-01", "1998-12-31")),
         ("l_orderkey", "==", 999_999_001)],
        return_plan=True,
    )
    t1 = pa.concat_tables(list(one.iter_batches(batch_format="pyarrow")))
    assert t1.num_rows == 1 and plan1["pruned_stats"] > 0

    res = delete_conversations(store, [999_999_001])
    assert res["convs_found"] == 1
    after = pa.concat_tables(
        list(decode_dataset(store).iter_batches(batch_format="pyarrow"))
    )
    assert (
        pc.sum(pc.cast(pc.equal(after["l_orderkey"], 999_999_001), pa.int64())).as_py()
        or 0
    ) == 0
    assert after.num_rows == stores["input"].num_rows


def test_range_resume_reuses_cuts_and_mismatch_guard(ray_session, stores, tmp_path):
    """resume=True on a completed range store is a no-op that keeps the
    recorded cuts; re-encoding with different clustering params under
    resume raises the mismatch guard."""
    import json
    import os
    import shutil

    from parquet_converter_ray.encode import encode_dataset

    store = str(tmp_path / "resume_copy")
    shutil.copytree(stores["range"], store)
    with open(os.path.join(store, "_run.json")) as f:
        before = json.load(f)
    assert before["partition_mode"] == "range" and before["range_cuts"]

    encode_dataset(
        stores["inp"], store, resume=True, cluster_by="l_shipdate",
        n_parts=8, conv_col="l_orderkey", order_col="l_linenumber",
        sort_key=("l_orderkey", "l_linenumber"), salt_rows=0,
    )
    with open(os.path.join(store, "_run.json")) as f:
        after = json.load(f)
    assert after["range_cuts"] == before["range_cuts"]

    with pytest.raises(ValueError, match="partitioning parameters differ"):
        encode_dataset(
            stores["inp"], store, resume=True, cluster_by="l_quantity",
            n_parts=8, conv_col="l_orderkey", order_col="l_linenumber",
            sort_key=("l_orderkey", "l_linenumber"), salt_rows=0,
        )


def test_zorder_multi_column_clustering_prunes_both_columns(
    ray_session, stores, tmp_path
):
    """Z-order clustering on (l_shipdate, l_quantity): zone maps must prune
    containers for a band predicate on EITHER column alone (single-column
    range clustering only ever prunes its own column), results identical to
    the hash-store scan."""
    from parquet_converter_ray.encode import encode_dataset
    from parquet_converter_ray.zonemap import scan_store

    zdir = str(tmp_path / "zorder")
    encode_dataset(
        stores["inp"], zdir, n_parts=16, conv_col="l_orderkey",
        order_col="l_linenumber", sort_key=("l_orderkey", "l_linenumber"),
        salt_rows=0, cluster_by=["l_shipdate", "l_quantity"],
    )

    for pred in (
        [("l_shipdate", "between", ("1996-01-01", "1996-06-30"))],
        [("l_quantity", "between", (1, 10))],
    ):
        z_ds, z_plan = scan_store(zdir, pred, return_plan=True)
        h_ds, h_plan = scan_store(stores["hash"], pred, return_plan=True)
        z = _sorted(pa.concat_tables(list(z_ds.iter_batches(batch_format="pyarrow"))))
        h = _sorted(pa.concat_tables(list(h_ds.iter_batches(batch_format="pyarrow"))))
        assert z.equals(h), pred
        assert z.num_rows > 0
        assert z_plan["pruned_stats"] > 0, (pred, z_plan)
        assert h_plan["pruned_stats"] == 0, (pred, h_plan)

    # full-table decode still bit-identical
    from parquet_converter_ray.decode import decode_dataset

    got = _sorted(
        pa.concat_tables(
            list(decode_dataset(zdir).iter_batches(batch_format="pyarrow"))
        )
    )
    want = _sorted(stores["input"])
    assert got.select(want.column_names).equals(want)


def test_compact_preserves_range_clustering(ray_session, stores, tmp_path):
    """Compacting a range-clustered store re-encodes with the SAME clustering
    column (cuts resampled for the new n_parts): the result is still
    partition_mode=range and still prunes date-band scans."""
    import json
    import os

    from parquet_converter_ray.encode import compact_dataset
    from parquet_converter_ray.zonemap import scan_store

    out = str(tmp_path / "compacted")
    compact_dataset(stores["range"], out, n_parts=4)
    with open(os.path.join(out, "_run.json")) as f:
        params = json.load(f)
    assert params["partition_mode"] == "range"
    assert params["cluster_by"] == ["l_shipdate"]

    pred = [("l_shipdate", "between", ("1996-01-01", "1996-03-31"))]
    ds, plan = scan_store(out, pred, return_plan=True)
    got = _sorted(pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))))
    ref_ds = scan_store(stores["hash"], pred)
    ref = _sorted(pa.concat_tables(list(ref_ds.iter_batches(batch_format="pyarrow"))))
    assert got.equals(ref)
    assert plan["pruned_stats"] > 0, plan

"""Training-shard export: seeded global shuffle + sharded parquet write.

The final stage of a training-data pipeline — after curation/dedup the corpus
is globally shuffled (so shards are i.i.d.) and written as N parquet shards a
data loader can stream independently. The shuffle is Ray Data's distributed
``random_shuffle`` (an all-to-all exchange — inherent to i.i.d. sharding);
the write is one file per block so a failed export resumes per shard.

Verification never trusts the writer: the shards are READ BACK and content
invariants (row count, id sum, id sum-of-squares — together they detect any
loss/duplication mix) are reduced per batch and merged on the driver, which
is how an operator at 100 TB would self-check without materializing anything.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd  # noqa: F401
import pyarrow as pa

import ray.data

from ._util import read_parquet_clean


def export_shards(
    sf_dir: str,
    out_dir: str | None = None,
    n_shards: int = 8,
    seed: int = 42,
    keep_output: bool = False,
) -> pa.Table:
    """Shuffle the documents corpus with a fixed seed, write ``n_shards``
    parquet shards, read them back, and return the content invariants
    (total_rows, sum_doc_id, sum_doc_id_sq) computed from the READ-BACK data.

    Oracle = the same invariants straight off the source table, so the whole
    shuffle→write→read loop is checked to be loss- and duplication-free."""
    cleanup = False
    if out_dir is None:
        out_dir = f"/tmp/pcr_export_{uuid.uuid4().hex[:12]}"
        cleanup = not keep_output
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet")
    docs.random_shuffle(seed=seed).repartition(n_shards).write_parquet(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "total_rows": pa.array([len(ids)], pa.int64()),
                "sum_doc_id": pa.array([int(ids.sum())], pa.int64()),
                "sum_doc_id_sq": pa.array([int((ids * ids).sum())], pa.int64()),
            }
        )

    try:
        back = read_parquet_clean(out_dir, columns=["doc_id"])
        parts = pa.concat_tables(
            list(
                back.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return pa.table(
        {
            "total_rows": pa.array([int(sum(parts["total_rows"].to_pylist()))], pa.int64()),
            "sum_doc_id": pa.array([int(sum(parts["sum_doc_id"].to_pylist()))], pa.int64()),
            "sum_doc_id_sq": pa.array(
                [int(sum(parts["sum_doc_id_sq"].to_pylist()))], pa.int64()
            ),
        }
    )


def shard_file_stats(out_dir: str) -> dict:
    """Shard layout facts for tests/manifests: file count and per-file rows."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    rows = [pq.read_metadata(f).num_rows for f in files]
    return {"n_files": len(files), "rows_per_file": rows}

"""Encode pipeline: Dataset -> hash-partition -> per-partition sort -> codec -> containers.

Ray-Data-first shape (SURVEY.md §7.2 step 5-7):

    read_parquet(input)
      -> map_batches(assign_part_id)            # vectorized, stable crc32 hash + salt
      -> [resume filter]                        # broadcast done-set, vectorized is_in
      -> groupby("part_id").map_groups(encode)  # THE one all-to-all shuffle;
                                                #   each partition encoded atomically:
                                                #   sort by (conv_id, turn_idx),
                                                #   per-column sampled cost model,
                                                #   per-partition FSST tables/dicts,
                                                #   atomic container write + lineage
      -> tiny lineage dataset -> manifest.jsonl

The group step holds per-partition encoder state (FSST symbol table, dictionary)
for exactly one partition at a time, which is the memory-bounded alternative to
fighting batch->actor affinity (SURVEY.md §7.5). Partition size is bounded by
``salt_rows`` chunking of mega-conversations, so the 10^12-turn scale story is:
more partitions, same per-partition working set.
"""

from __future__ import annotations

import os
import time
import zlib
from typing import Callable, Sequence

import pyarrow as pa

import ray.data

from . import manifest as mf
from .container import encode_table, pack_container, write_container_atomic
from .partition import assign_part_id

TARGET_PART_BYTES = 64 << 20  # in-memory arrow bytes per partition


class EncodePartition:
    """Per-partition encoder: sort, pick codecs (sampled cost model), write container.

    Called by ``groupby("part_id").map_groups`` with the full partition as one
    Arrow table. Returns a one-row lineage table.
    """

    def __init__(
        self,
        out_dir: str,
        codec: str | dict = "auto",
        sort_key: Sequence[str] = ("conv_id", "turn_idx"),
        fault_hook: Callable[[int], None] | None = None,
    ):
        self.out_dir = out_dir
        self.codec = codec
        self.sort_key = list(sort_key)
        self.fault_hook = fault_hook

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        part_id = int(group["part_id"][0].as_py())
        if self.fault_hook is not None:
            self.fault_hook(part_id)
        table = group.drop_columns(["part_id"])
        sort_cols = [c for c in self.sort_key if c in table.column_names]
        if sort_cols:
            table = table.sort_by([(c, "ascending") for c in sort_cols])
        blobs = encode_table(table, codec=self.codec)
        payload = pack_container(
            blobs,
            extra={"part_id": part_id, "rows": table.num_rows, "sort_key": sort_cols},
        )
        path = os.path.join(self.out_dir, f"part-{part_id:05d}.pcc")
        write_container_atomic(path, payload)
        rec = mf.LineageRecord(
            part_id=part_id,
            rows=table.num_rows,
            bytes_in=table.nbytes,
            bytes_out=len(payload),
            codecs={name: blob.codec for name, blob in blobs.items()},
            crc32=zlib.crc32(payload) & 0xFFFFFFFF,
            wall_s=time.monotonic() - t0,
            path=path,
        )
        mf.write_record(self.out_dir, rec)
        import json

        return pa.table(
            {
                "part_id": pa.array([rec.part_id], type=pa.int32()),
                "rows": pa.array([rec.rows], type=pa.int64()),
                "bytes_in": pa.array([rec.bytes_in], type=pa.int64()),
                "bytes_out": pa.array([rec.bytes_out], type=pa.int64()),
                "codecs": pa.array([json.dumps(rec.codecs)], type=pa.string()),
                "wall_s": pa.array([rec.wall_s], type=pa.float64()),
            }
        )


def encode_dataset(
    source: "ray.data.Dataset | str | list[str]",
    out_dir: str,
    *,
    n_parts: int | None = None,
    codec: str | dict = "auto",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    sort_key: Sequence[str] = ("conv_id", "turn_idx"),
    salt_rows: int = 100_000,
    resume: bool = False,
    fault_hook: Callable[[int], None] | None = None,
) -> dict:
    """Run the encode pipeline; returns the consolidated manifest summary.

    ``resume=True`` skips partitions already recorded in ``out_dir/_manifest``
    (partition assignment is a pure function of row content, so a resumed run
    reproduces the remaining partitions byte-for-byte).
    """
    ds = source
    if isinstance(source, (str, list)):
        ds = ray.data.read_parquet(source)
    os.makedirs(out_dir, exist_ok=True)

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if n_parts is None:
        # partitions bound the per-encoder working set (bytes-driven at scale)
        # and must at least cover the CPUs so no encoder slot starves
        est = ds.size_bytes() or (64 << 20)
        n_parts = max(cpus, int(est * 3 // TARGET_PART_BYTES))
    # the sort-shuffle's map-side parallelism follows the upstream block
    # count; coarse input files would serialize the exchange (measured 8x
    # slower at 64 vs 6 blocks on 200 MB), so split blocks first
    ds = ds.repartition(max(2 * cpus, n_parts))

    def _assign(batch: pa.Table) -> pa.Table:
        return assign_part_id(
            batch, n_parts, conv_col=conv_col, order_col=order_col, salt_rows=salt_rows
        )

    ds = ds.map_batches(_assign, batch_format="pyarrow")

    if resume:
        done = mf.completed_parts(out_dir)
        if done:
            done_arr = pa.array(sorted(done), type=pa.int32())

            def _skip_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(
                    pc.invert(pc.is_in(batch["part_id"], value_set=done_arr))
                )

            ds = ds.map_batches(_skip_done, batch_format="pyarrow")

    encoder = EncodePartition(out_dir, codec=codec, sort_key=sort_key, fault_hook=fault_hook)

    def encode_partition(group: pa.Table) -> pa.Table:
        return encoder(group)

    lineage = ds.groupby("part_id").map_groups(encode_partition, batch_format="pyarrow")
    lineage.take_all()  # trigger execution; one tiny row per partition
    summary = mf.consolidate(out_dir)
    summary["n_parts"] = n_parts
    return summary

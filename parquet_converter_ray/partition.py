"""Conversation-aware partitioning: stable hash + salted-key splitting.

``part_id = mix(crc32(conv_id), turn_idx // salt_rows) % n_parts``

 - crc32 is process/version-stable (unlike Python's salted ``hash``), so a
   resumed run in a fresh process assigns every row to the same partition —
   a hard requirement for checkpoint/resume.
 - The salt term splits mega-conversations into chunks of ``salt_rows`` turns
   across different partitions (skew handling per SURVEY.md §7.4/§7.5); within
   a chunk, order is restored by the within-partition sort on
   (conv_id, turn_idx), and across chunks by the global sort key at read time —
   the north rule's invariant is per-turn equality UNDER stable turn ordering,
   which a (conv_id, turn_idx) sort re-establishes regardless of chunking.
 - Hashing is vectorized over the *unique* conv_ids of each batch (Python
   crc32 only touches each distinct conversation once), then scattered back
   with ``pc.index_in`` — no per-row Python in the hot path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def stable_hash_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row stable uint64 hash of a string column.

    Fast path: polars ``hash`` (vectorized Rust, zero-copy from Arrow,
    seed-stable across processes within a polars version — sufficient for
    resume in one environment). Fallback: crc32 over the column's uniques
    scattered back with ``index_in`` (version-independent, slower)."""
    try:
        import polars as pl

        s = pl.from_arrow(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
        return s.hash(seed=0).to_numpy().astype(np.uint64)
    except ImportError:
        uniq = pc.unique(arr)
        hashes = np.array(
            [zlib.crc32(u.encode() if isinstance(u, str) else u) for u in uniq.to_pylist()],
            dtype=np.uint64,
        )
        idx = pc.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
        return hashes[idx]


def stable_hash_ints(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row stable uint64 hash of an integer column (splitmix64 finalizer)."""
    v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def assign_part_id(
    batch: pa.Table,
    n_parts: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    salt_rows: int = 100_000,
) -> pa.Table:
    """Append a ``part_id`` column. Pure function of row content — resume-stable."""
    key = batch[conv_col]
    if pa.types.is_integer(key.type if not isinstance(key, pa.ChunkedArray) else key.type):
        h = stable_hash_ints(key)
    else:
        h = stable_hash_strings(key)
    if salt_rows and order_col in batch.column_names:
        salt = (
            batch[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
            // np.uint64(salt_rows)
        )
        h = (h ^ (salt * GOLDEN)) + salt  # mix so chunk k of a mega-conv moves
    part = (h % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("part_id", pa.array(part, type=pa.int32()))

"""Shared helpers for oracle-checked pipelines."""

from __future__ import annotations

import numpy as np


def read_parquet_clean(path: str | list[str], columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with the pandas metadata stripped from the
    schema. Parquet files written via pandas carry a metadata dict that makes
    ``hash(schema)`` fail, which triggers a per-task "Failed to hash the
    schemas (for deduplication)" warning inside Ray workers and defeats Ray's
    schema-dedup fast path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    import os

    first = path[0] if isinstance(path, list) else path
    if os.path.isdir(first):  # schema from the first file inside (sorted —
        # deterministic; all files in a dir share one schema or Ray errors)
        cand = sorted(
            f for f in os.listdir(first)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if cand:
            first = os.path.join(first, cand[0])
    try:
        sch = pq.read_schema(first)
        names = list(columns) if columns is not None else list(sch.names)
        clean = pa.schema([sch.field(c).remove_metadata() for c in names])
    except (OSError, pa.ArrowInvalid, KeyError):  # non-local / mixed: let Ray infer
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, schema=clean, **kwargs)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element bit count of a uint64 array (any shape), via a 256-entry
    byte LUT — numpy<2 has no ``bitwise_count``. ~8 gathers + 1 sum per
    element; used for Hamming distance in the SimHash/pHash verify steps."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8).reshape(x.shape + (8,))].sum(axis=-1, dtype=np.int64)


def sql_round(x, d: int = 4):
    """Round half AWAY FROM ZERO — DuckDB/SQL ROUND semantics.

    Python's round()/numpy round half-to-even, which diverges from the oracle
    whenever an aggregate lands exactly on a .5 boundary (it happens: the mean
    of sf0.01 l_quantity is exactly 25.40225)."""
    scale = 10.0**d
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out


# Remote args for small deterministic actor-pool stages: suppress actor
# restarts (the stage re-runs at job level anyway). Ray Data actor pools
# default to max_restarts=-1, which with ctor args in the object store logs a
# loud core_worker warning per actor (ray#53727).
ACTOR_POOL_ARGS = {"max_restarts": 0, "max_task_retries": 0}


def join_num_partitions(n_rows: int, rows_per_partition: int = 2000, lo: int = 2) -> int:
    """Partition count for Dataset.join sized to the DATA, capped at the
    cluster CPUs. Ray's hash join crashes on empty partitions (Acero gets an
    empty schema-less block: "No match ... for key field on left side"), so
    tiny inputs must use few partitions."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(cpus, -(-n_rows // rows_per_partition)))


def salted_join(
    left,
    right,
    on: str,
    right_on: str,
    salt: int = 8,
    num_partitions: int | None = None,
):
    """Skew-resistant inner hash join: a hot key on ``left`` would pin one
    reducer in a plain hash join (every matching row lands in one partition).
    Salting splits each left key across ``salt`` sub-keys (cyclic assignment —
    any spread works, the inner-join result is invariant to it) and replicates
    each RIGHT row once per salt value, so the hot key's probe work fans out
    over ``salt`` reducers at the cost of a ``salt``x blow-up of the right
    side — use when right is the smaller-but-not-broadcastable side and left
    is skewed. Output equals the unsalted join (asserted in tests).
    """
    import pyarrow as pa

    import ray

    def add_salt(batch: "pa.Table") -> "pa.Table":
        s = (np.arange(batch.num_rows, dtype=np.int64) % salt).astype(np.int32)
        return batch.append_column("__salt", pa.array(s, pa.int32()))

    def replicate(batch: "pa.Table") -> "pa.Table":
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), salt)
        rep = batch.take(pa.array(idx))
        s = np.tile(np.arange(salt, dtype=np.int32), batch.num_rows)
        return rep.append_column("__salt", pa.array(s, pa.int32()))

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, cpus)
    joined = left.map_batches(add_salt, batch_format="pyarrow").join(
        right.map_batches(replicate, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(right_on, "__salt"),
    )
    return joined.drop_columns(["__salt"])


def finish_on_driver(ds, keys: list[str], sums: list[str]):
    """Final aggregate for BOUNDED group spaces: stream the per-batch partials
    to the driver and finish with one in-memory groupby — the combiner-tree
    root. On this host the groupby exchange has a fixed ~0.5-5 s cost
    regardless of partial count; when the distinct-group space is bounded
    (dozens .. ~1e6 rows: segments, hours x types, months, priorities) the
    driver merge is strictly cheaper AND removes the only all-to-all from the
    query. For DATA-SIZED key spaces (per-order, per-doc) keep the Ray
    groupby — those partials don't fit one node."""
    import pandas as pd  # noqa: F401 (driver-side only)

    parts = ds.to_pandas()
    return parts.groupby(keys, as_index=False).agg(**{c: (c, "sum") for c in sums})

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

    first = path[0] if isinstance(path, list) else path
    try:
        sch = pq.read_schema(first)
        names = list(columns) if columns is not None else list(sch.names)
        clean = pa.schema([sch.field(c).remove_metadata() for c in names])
    except (OSError, pa.ArrowInvalid):  # directories / non-local: let Ray infer
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, schema=clean, **kwargs)


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

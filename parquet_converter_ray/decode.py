"""Decode pipeline: container files -> ray.data.Dataset of Arrow batches.

Containers are independently decodable, so the read is embarrassingly parallel:
``read_binary_files`` (one row per container) -> ``map_batches(Decoder)``.
``Decoder`` is a callable class so it runs as an actor pool when
``concurrency`` is given (codec registry + column projection held per actor);
with ``concurrency=None`` it runs as stateless tasks.

Column pruning works at the container level: the footer records per-buffer
offsets, so decoding 2 of 6 columns touches only those buffers.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data

from .container import decode_table


def container_files(out_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out_dir, "part-*.pcc")))


class Decoder:
    def __init__(self, columns: list[str] | None = None, verify_crc: bool = False):
        self.columns = columns
        self.verify_crc = verify_crc

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        tables = []
        for blob in batch["bytes"]:
            tables.append(
                decode_table(blob.as_py(), columns=self.columns, verify_crc=self.verify_crc)
            )
        return pa.concat_tables(tables)


def decode_dataset(
    out_dir: str,
    *,
    columns: list[str] | None = None,
    concurrency: int | tuple | None = None,
    verify_crc: bool = False,
) -> "ray.data.Dataset":
    files = container_files(out_dir)
    if not files:
        raise FileNotFoundError(f"no container files under {out_dir}")
    ds = ray.data.read_binary_files(files)
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": 1}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(Decoder, fn_constructor_kwargs={"columns": columns, "verify_crc": verify_crc}, **kwargs)
    dec = Decoder(columns=columns, verify_crc=verify_crc)
    return ds.map_batches(dec, **kwargs)


def roundtrip_table(
    original: pa.Table,
    out_dir: str,
    sort_key: list[str] = ["conv_id", "turn_idx"],
) -> tuple[bool, str]:
    """Small-scale (test) verification: decode everything, sort both sides by
    the stable order key, compare column-by-column bit-identically.

    The north-rule invariant: per-turn text equality under stable turn
    ordering (BASELINE.json input_hint).
    """
    decoded = decode_dataset(out_dir)
    dec_tbl = pa.concat_tables(list(decoded.iter_batches(batch_format="pyarrow")))
    key = [(c, "ascending") for c in sort_key]
    a = original.sort_by(key).combine_chunks()
    b = dec_tbl.select(original.column_names).sort_by(key).combine_chunks()
    if a.num_rows != b.num_rows:
        return False, f"row count {a.num_rows} != {b.num_rows}"
    for name in a.column_names:
        ca, cb = a.column(name), b.column(name)
        if not _col_equal(ca, cb):
            return False, f"column {name} mismatch"
    return True, "ok"


def _col_equal(ca: pa.ChunkedArray, cb: pa.ChunkedArray) -> bool:
    ca, cb = ca.combine_chunks(), cb.combine_chunks()
    if ca.equals(cb):
        return True
    # NaN-aware fallback for float columns (Arrow equals treats NaN != NaN)
    if pa.types.is_floating(ca.type):
        import numpy as np

        a, b = ca.to_numpy(zero_copy_only=False), cb.to_numpy(zero_copy_only=False)
        return ((a == b) | (np.isnan(a) & np.isnan(b))).all()
    return False

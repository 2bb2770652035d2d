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
from .pipelines._util import read_parquet_clean


def resolve_container_path(out_dir: str, rec: dict) -> str:
    """Resolve a lineage record's container file, preferring the LOCAL copy.

    Records carry the absolute path written at encode time; a store that was
    copied/moved (another host, another mount, a snapshot) still has the
    container next to its manifest, so the basename under ``out_dir`` wins
    whenever it exists with the recorded size — otherwise the recorded path.
    This is what makes a relocated store decode/lookup/append cleanly while
    the stray-file guard still fires on files the manifest doesn't know."""
    local = os.path.join(out_dir, os.path.basename(rec["path"]))
    try:
        if os.path.getsize(local) == rec["bytes_out"]:
            return local
    except OSError:
        pass
    if os.path.isfile(rec["path"]):
        return rec["path"]
    if os.path.isfile(local):  # size mismatch but present: surface the real file
        return local
    raise FileNotFoundError(
        f"manifest records partition {rec['part_id']} at {rec['path']} "
        "but the container file is missing"
    )


def container_files(out_dir: str, max_generation: int | None = None) -> list[str]:
    """Container files to decode — manifest-driven when a manifest exists.

    The per-partition lineage records are the source of truth: a re-encode of
    a smaller dataset into a reused out_dir (or a crashed run) can leave stale
    ``part-*.pcc`` files that a bare glob would silently mix into the result.
    Falls back to the glob only when no manifest was written at all.

    ``max_generation`` selects a SNAPSHOT: only containers with
    generation <= g, i.e. the store as it stood before later appended
    deliveries (generations are monotone per ``append_dataset`` call; 0 =
    base encode only). Snapshots see through appends, NOT through in-place
    rewrites (delete/repair fold generations into a fresh base) — readers
    needing delete-proof history should snapshot-copy the store first. A
    rewrite that folded generations > g stamps ``snapshot_watermark`` in the
    run record; requesting max_generation < watermark would return a MIXED
    state that never existed (rewritten partitions include their folded
    later-generation rows at g=0, untouched partitions exclude theirs), so it
    raises instead."""
    from . import manifest as mf

    recs = mf.load_records(out_dir)
    if recs:
        if max_generation is not None:
            params = mf.load_run_record(out_dir) or {}
            wm = int(params.get("snapshot_watermark") or 0)
            if max_generation < wm:
                raise ValueError(
                    f"snapshot at generation {max_generation} is unavailable: an "
                    f"in-place delete/repair folded generations up to {wm} into "
                    "rewritten base containers, so earlier snapshots would mix "
                    "pre- and post-fold partition states; snapshot-copy the store "
                    "before deleting if point-in-time history is needed"
                )
        all_files = [resolve_container_path(out_dir, r) for r in recs]
        if max_generation is not None:
            recs = [r for r in recs if int(r.get("generation", 0)) <= max_generation]
        files = []
        for r in sorted(recs, key=lambda r: r["part_id"]):
            files.append(resolve_container_path(out_dir, r))
        stray = set(glob.glob(os.path.join(out_dir, "part-*.pcc"))) - set(all_files)
        if stray:
            raise ValueError(
                f"{len(stray)} container file(s) in {out_dir} are not in the "
                f"manifest (stale leftovers from a previous run?): "
                f"{sorted(stray)[:3]}... — re-encode with resume=False to clean"
            )
        return files
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
    max_generation: int | None = None,
) -> "ray.data.Dataset":
    files = container_files(out_dir, max_generation=max_generation)
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
    sort_key: list[str] | None = None,
) -> tuple[bool, str]:
    """Small-scale (test) verification: decode everything, sort both sides by
    the stable order key, compare column-by-column bit-identically.

    The north-rule invariant: per-turn text equality under stable turn
    ordering (BASELINE.json input_hint). ``sort_key`` defaults to the key
    RECORDED in the store's ``_run.json`` (falling back to the transcript
    key), so verifying a store keyed on other columns — e.g. a lineitem or
    range-clustered store — needs no extra flags. When the recorded key does
    not identify rows uniquely, ALL columns are appended as tie-breakers
    (an order-insensitive whole-row compare — duplicate keys would otherwise
    shuffle payload columns between tied rows on the two sides)."""
    from . import manifest as mf

    if sort_key is None:
        params = mf.load_run_record(out_dir) or {}
        sort_key = list(params.get("sort_key") or ["conv_id", "turn_idx"])
    decoded = decode_dataset(out_dir)
    dec_tbl = pa.concat_tables(list(decoded.iter_batches(batch_format="pyarrow")))
    tie = [c for c in original.column_names if c not in sort_key]
    key = [(c, "ascending") for c in list(sort_key) + tie]
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


# --- distributed verification (no driver materialization) --------------------


def _row_hashes(batch: pa.Table, columns: list[str]) -> "np.ndarray":
    import numpy as np

    from .partition import stable_hash_ints, stable_hash_strings

    h = np.full(batch.num_rows, 0x243F6A8885A308D3, dtype=np.uint64)
    P = np.uint64(0x100000001B3)
    NULLC = np.uint64(0x9E3779B97F4A7C15)
    for name in columns:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        nulls = None
        if col.null_count:
            nulls = ~col.is_valid().to_numpy(zero_copy_only=False)
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        ):
            ch = stable_hash_strings(col)
        elif pa.types.is_floating(t):
            import pyarrow.compute as pc

            v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
            ch = v.astype(np.float64).view(np.uint64).copy()
        elif pa.types.is_boolean(t):
            import pyarrow.compute as pc

            ch = pc.fill_null(col, False).to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            import pyarrow.compute as pc

            filled = pc.fill_null(col, pa.scalar(0, type=t)) if col.null_count else col
            ch = stable_hash_ints(filled)
        if nulls is not None:
            ch = np.where(nulls, NULLC, ch)
        h = (h * P) ^ ch
    return h


def dataset_fingerprint(ds: "ray.data.Dataset", columns: list[str] | None = None) -> dict:
    """Order-insensitive content fingerprint: commutative sum/xor fold of
    per-row stable hashes, computed as mergeable per-batch partials — verifies
    a decode against its source WITHOUT a global sort or driver
    materialization (the at-scale counterpart of ``roundtrip_table``)."""
    import numpy as np

    cols = columns or ds.schema().names

    def partial(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch, cols)
        return pa.table(
            {
                "n": pa.array([len(h)], type=pa.int64()),
                "hsum": pa.array([int(h.sum(dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF))], type=pa.int64()),
                "hxor": pa.array([int(np.bitwise_xor.reduce(h) if len(h) else 0) & 0x7FFFFFFFFFFFFFFF], type=pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    hsum = 0
    hxor = 0
    for r in rows:
        hsum = (hsum + r["hsum"]) & 0x7FFFFFFFFFFFFFFF
        hxor ^= r["hxor"]
    return {"rows": n, "hsum": hsum, "hxor": hxor, "columns": list(cols)}


def store_diff(
    a_dir: "str | list[str]",
    b_dir: "str | list[str]",
    columns: list[str] | None = None,
) -> dict:
    """Content-compare two encoded stores WITHOUT sorting or materializing
    either: shared-column order-insensitive fingerprints (per-batch hash
    folds, driver merges two scalars). The migration-validation tool —
    after a compact / relocation / schema evolution, ``equal: true`` means
    byte-equivalent content on the compared columns regardless of how rows
    were repartitioned. Columns default to the INTERSECTION of the two
    schemas (reported, so a dropped column is visible, not silent).

    Either side may be a LIST of stores (a delivery family): the
    fingerprint fold is commutative, so a family's fingerprint is the fold
    over all members' batches — which is exactly how ``compact_family``
    output is proven equal to the family it conformed, without decoding
    anything twice or moving a row."""
    from .zonemap import _store_schema

    from . import manifest as mf

    a_dirs = [a_dir] if isinstance(a_dir, str) else list(a_dir)
    b_dirs = [b_dir] if isinstance(b_dir, str) else list(b_dir)
    if not a_dirs or not b_dirs:
        raise ValueError("store_diff needs at least one store on each side")

    def _side_schema(dirs: list[str]) -> dict:
        # intersection of member schemas by name: a column must exist in
        # every member to be comparable for that side
        per = [dict(_store_schema(d, mf.load_records(d))) for d in dirs]
        names = set(per[0])
        for s in per[1:]:
            names &= set(s)
        return {n: per[0][n] for n in per[0] if n in names}

    sa = _side_schema(a_dirs)
    sb = _side_schema(b_dirs)
    shared = [c for c in sa if c in sb] if columns is None else list(columns)
    missing = [c for c in shared if c not in sa or c not in sb]
    if missing:
        raise ValueError(f"columns {missing} not in both stores")
    if not shared:
        raise ValueError(
            f"stores share no columns (a: {sorted(sa)}, b: {sorted(sb)}) — nothing to compare"
        )

    def _side_ds(dirs: list[str]):
        ds = decode_dataset(dirs[0], columns=shared)
        for d in dirs[1:]:
            ds = ds.union(decode_dataset(d, columns=shared))
        return ds

    fa = dataset_fingerprint(_side_ds(a_dirs), columns=shared)
    fb = dataset_fingerprint(_side_ds(b_dirs), columns=shared)
    return {
        "equal": fa == fb,
        "columns": shared,
        "only_a": sorted(set(sa) - set(sb)),
        "only_b": sorted(set(sb) - set(sa)),
        "a": {k: fa[k] for k in ("rows", "hsum", "hxor")},
        "b": {k: fb[k] for k in ("rows", "hsum", "hxor")},
    }


class _ChangeScanner:
    """Decode one part_id's containers from BOTH stores and emit the
    row-level change set keyed by the store key. Plain callable in a task
    pool; state is column lists only."""

    def __init__(self, key_fields: "list[tuple[str, pa.DataType]]", value_cols: list[str]):
        self.key_cols = [n for n, _ in key_fields]
        self.value_cols = value_cols
        self.out_schema = pa.schema(list(key_fields) + [("change", pa.string())])

    def _side(self, paths) -> "pa.Table | None":
        cols = list(dict.fromkeys(self.key_cols + self.value_cols))
        tables = [decode_table(open(p, "rb").read(), columns=cols) for p in paths]
        return pa.concat_tables(tables) if tables else None

    def _fold(self, t: "pa.Table | None"):
        """(pandas frame keyed by key_cols with n + wrapped hash-sum) or None."""
        import numpy as np
        import pandas as pd

        if t is None or t.num_rows == 0:
            return None
        if self.value_cols:
            h = _row_hashes(t, self.value_cols).view(np.int64)
        else:
            h = np.zeros(t.num_rows, dtype=np.int64)
        df = t.select(self.key_cols).to_pandas()
        df["_h"] = h
        g = df.groupby(self.key_cols, sort=False, dropna=False)["_h"]
        out = g.agg(n="size", hs="sum")  # int64 sum wraps (numpy), fine for hashing
        return out.reset_index()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        frames = []
        for row in batch.to_pylist():
            old = self._fold(self._side(row["old_paths"]))
            new = self._fold(self._side(row["new_paths"]))
            if old is None and new is None:
                continue
            if old is None:
                new["change"] = "insert"
                frames.append(new[self.key_cols + ["change"]])
                continue
            if new is None:
                old["change"] = "delete"
                frames.append(old[self.key_cols + ["change"]])
                continue
            m = old.merge(new, on=self.key_cols, how="outer",
                          suffixes=("_o", "_n"), indicator=True)
            change = pd.Series("update", index=m.index)
            change[m["_merge"] == "left_only"] = "delete"
            change[m["_merge"] == "right_only"] = "insert"
            same = (m["_merge"] == "both") & (m["n_o"] == m["n_n"]) & (m["hs_o"] == m["hs_n"])
            m = m[~same]
            m["change"] = change[~same]
            frames.append(m[self.key_cols + ["change"]])
        if not frames:
            return self.out_schema.empty_table()
        out = pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                   preserve_index=False)
        # pin key-column types to the store schema (pandas may widen)
        return out.select(self.out_schema.names).cast(self.out_schema)


def store_changes(
    old_dir: str,
    new_dir: str,
    *,
    return_plan: bool = False,
) -> "ray.data.Dataset":
    """Row-level CDC between two states of a store — typically a hard-link
    SNAPSHOT (``snapshot.snapshot_store``; the snapshot dir is itself a
    valid store) and the live store after appends/upserts/deletes. Emits
    one row per changed store key: the key columns plus ``change`` in
    {'insert', 'delete', 'update'}; unchanged keys are never emitted.

    Scale shape: both stores must share the hash-routing layout (same
    ``hash_version`` / ``n_parts`` / key columns / ``salt_rows`` — refused
    loudly otherwise; ``rebucket`` repairs a mismatch), so the diff is
    PARTITION-LOCAL — no exchange. Partitions whose recorded container sets
    are identical (same generation/crc32/rows multiset — and a snapshot
    hard-links the very same inodes for untouched partitions) are skipped
    from metadata alone; only touched partitions decode, and each decodes
    once per side inside one task. Duplicate keys fold per key via
    (count, wrapped hash-sum), so the compare never needs key uniqueness.
    Content equality is judged on the SHARED value columns (schema drift is
    ``store_diff``'s job and is not flagged here).

    Iceberg/Delta expose the same thing as incremental scans / CDF reads;
    here it costs metadata + the touched partitions only."""
    from . import manifest as mf
    from .partition import HASH_VERSION
    from .zonemap import _store_schema

    po, pn = mf.load_run_record(old_dir), mf.load_run_record(new_dir)
    for d, p in ((old_dir, po), (new_dir, pn)):
        if not p:
            raise ValueError(f"{d}: no _run.json — cannot prove layouts comparable")
        if p.get("hash_version") != HASH_VERSION:
            raise ValueError(f"{d}: hash_version {p.get('hash_version')!r} != current {HASH_VERSION!r}")
        if (p.get("partition_mode") or "hash") != "hash":
            raise ValueError(
                f"{d}: partition_mode {p.get('partition_mode')!r} — range-clustered "
                "partition boundaries are data-dependent, so partition-local CDC "
                "is unsound; rebucket both states first"
            )
    for field in ("n_parts", "conv_col", "order_col", "salt_rows"):
        if po.get(field) != pn.get(field):
            raise ValueError(
                f"layout mismatch on {field!r}: {po.get(field)!r} vs {pn.get(field)!r} "
                "— the same row would route to different partitions; rebucket first"
            )

    key_cols = [po["conv_col"]] + ([po["order_col"]] if po.get("order_col") else [])

    recs_o, recs_n = mf.load_records(old_dir), mf.load_records(new_dir)
    container_files(old_dir)  # stray-container guards
    container_files(new_dir)

    def _by_part(recs):
        out: dict[int, list] = {}
        for r in recs:
            out.setdefault(int(r["part_id"]), []).append(r)
        return out

    bo, bn = _by_part(recs_o), _by_part(recs_n)

    def _sig(recs_p) -> tuple:
        return tuple(sorted(
            (int(r.get("generation", 0)), int(r.get("crc32", -1)), int(r.get("rows", -1)))
            for r in recs_p
        ))

    all_parts = sorted(set(bo) | set(bn))
    plan = {"parts_total": len(all_parts), "parts_skipped": 0, "parts_compared": 0}
    spec_rows = []
    for pid in all_parts:
        ro, rn = bo.get(pid, []), bn.get(pid, [])
        if _sig(ro) == _sig(rn):
            plan["parts_skipped"] += 1
            continue
        plan["parts_compared"] += 1
        spec_rows.append({
            "part_id": pid,
            "old_paths": [resolve_container_path(old_dir, r) for r in ro],
            "new_paths": [resolve_container_path(new_dir, r) for r in rn],
        })

    schema_o = dict(_store_schema(old_dir, recs_o)) if recs_o else {}
    schema_n = dict(_store_schema(new_dir, recs_n)) if recs_n else {}
    value_cols = sorted((set(schema_o) & set(schema_n)) - set(key_cols))
    key_fields = [(c, schema_n.get(c) or schema_o.get(c) or pa.string())
                  for c in key_cols]

    if not spec_rows:
        empty = pa.schema(key_fields + [("change", pa.string())]).empty_table()
        ds = ray.data.from_arrow(empty)
        return (ds, plan) if return_plan else ds

    spec = pa.table(
        {
            "part_id": pa.array([s["part_id"] for s in spec_rows], pa.int32()),
            "old_paths": pa.array([s["old_paths"] for s in spec_rows],
                                  pa.list_(pa.string())),
            "new_paths": pa.array([s["new_paths"] for s in spec_rows],
                                  pa.list_(pa.string())),
        }
    )
    ds = (
        ray.data.from_arrow(spec)
        .repartition(len(spec_rows))
        .map_batches(_ChangeScanner(key_fields, value_cols), batch_format="pyarrow")
    )
    return (ds, plan) if return_plan else ds


def verify_distributed(source: "ray.data.Dataset | str", out_dir: str) -> tuple[bool, dict]:
    """Compare source vs decoded containers via order-insensitive
    fingerprints (streaming, fully distributed)."""
    if isinstance(source, (str, list)):
        source = read_parquet_clean(source)
    cols = source.schema().names
    a = dataset_fingerprint(source, cols)
    b = dataset_fingerprint(decode_dataset(out_dir, columns=cols), cols)
    return a == b, {"source": a, "decoded": b}


# --- O(1) point lookup: fetch one conversation from an encoded dataset --------


def _part_for(h: "np.uint64", k: int, n_parts: int) -> int:
    """Partition id for hash ``h`` and salt chunk ``k`` — the exact mix used
    by ``partition.assign_part_id`` (kept in lockstep; HASH_VERSION guards)."""
    import numpy as np

    from .partition import GOLDEN

    arr = np.array([h], dtype=np.uint64)  # array ops: silent mod-2^64 wrap
    if k:
        kk = np.array([k], dtype=np.uint64)
        arr = (arr ^ (kk * GOLDEN)) + kk
    return int(arr[0] % np.uint64(n_parts))


def lookup_conversation(
    out_dir: str, conv_value, columns: list[str] | None = None
) -> pa.Table:
    """Fetch ONE conversation from an encoded dataset by key — decoding only
    the container(s) its rows can live in, never scanning the dataset.

    This is the point-access path a 100 TB store needs: ``part_id`` is a pure
    function of (conv_value, salt chunk), recorded in ``_run.json``, so the
    lookup probes the candidate partition for each salt chunk k = 0..k_max,
    where k_max is bounded by the ORDER column's zone-map max across the
    store's lineage records (chunk k exists only if some row has
    order >= k*salt_rows). No density assumption on turn indices — sparse
    appended turn ranges are still found. Cost: at most
    min(k_max+1, n_parts) DISTINCT partition decodes (decoded partitions are
    cached across chunks) with container-level column pruning. Only when
    records predate zone maps does the walk fall back to the legacy
    dense-turn escalation (stop at the first partial chunk).

    ``conv_value``'s Python type selects the hash (int -> integer-column
    hash, str/bytes -> byte hash), matching how the column was hashed at
    encode time."""
    import numpy as np
    import pyarrow.compute as pc

    from . import manifest as mf
    from .partition import stable_hash_ints, stable_hash_strings

    params = mf.load_run_record(out_dir)
    if params is None:
        raise ValueError(
            f"no run record in {out_dir} — lookup needs the partitioning "
            "parameters written by encode_dataset (_run.json)"
        )
    if (params.get("partition_mode") or "hash") != "hash":
        # range-clustered layout: conversation keys have no hash route, so
        # point access degrades to the predicate-pushdown scan — zone maps
        # and the dictionary probe prune it instead of the partition
        # arithmetic (slower than O(1) routing, still never a full decode
        # when the key column is dict-encoded or zone-mapped)
        from .zonemap import scan_store

        conv_col = params["conv_col"]
        order_col = params.get("order_col")
        ds = scan_store(out_dir, [(conv_col, "==", conv_value)], columns=columns)
        batches = list(ds.iter_batches(batch_format="pyarrow"))
        if batches:
            out = pa.concat_tables(batches)
        else:
            s = ds.schema()
            out = pa.table({n: pa.array([], type=t) for n, t in zip(s.names, s.types)})
        if out.num_rows and order_col and order_col in out.column_names:
            out = out.sort_by([(conv_col, "ascending"), (order_col, "ascending")])
        return out.combine_chunks()
    n_parts = int(params["n_parts"])
    salt_rows = int(params.get("salt_rows") or 0)
    conv_col = params["conv_col"]
    order_col = params.get("order_col")

    files = container_files(out_dir)  # validates manifest/glob consistency
    recs = mf.load_records(out_dir)
    by_part: dict[int, list[str]] = {}
    for r in recs:  # (part, generation) order — appends included
        by_part.setdefault(int(r["part_id"]), []).append(resolve_container_path(out_dir, r))
    if not by_part:  # glob-only layout (no manifest): part-<id>[...].pcc names
        for f in files:
            pid = int(os.path.basename(f).split("-")[1].split(".")[0])
            by_part.setdefault(pid, []).append(f)

    if isinstance(conv_value, (int, np.integer)):
        h = stable_hash_ints(pa.array([int(conv_value)], pa.int64()))[0]
    else:
        h = stable_hash_strings(pa.array([conv_value]))[0]

    salted = bool(salt_rows) and order_col is not None
    k_max = mf.order_chunk_bound(recs, order_col, salt_rows) if salted else 0
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys([conv_col] + ([order_col] if salted and order_col else []) + columns))

    decoded: dict[int, pa.Table] = {}
    chunks: list[pa.Table] = []
    k = 0
    while True:
        part = _part_for(np.uint64(h), k if salted else 0, n_parts)
        if part not in decoded:
            if part not in by_part:
                raise FileNotFoundError(f"partition {part} missing from {out_dir}")
            parts = []
            for path in by_part[part]:  # base container + any appended deliveries
                with open(path, "rb") as f:
                    parts.append(decode_table(f.read(), columns=read_cols))
            decoded[part] = pa.concat_tables(parts)
        tbl = decoded[part]
        sel = tbl.filter(pc.equal(tbl[conv_col], conv_value))
        if salted:
            order = pc.fill_null(sel[order_col], 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
            sel = sel.filter(pa.array(order // salt_rows == k))
        chunks.append(sel)
        if not salted:
            break
        if k_max is not None:
            if k >= k_max:
                break
        elif sel.num_rows < salt_rows:
            # pre-zonemap records: chunk bound unknowable — legacy dense-turn
            # escalation (a partial chunk is assumed to be the last one)
            break
        k += 1

    out = pa.concat_tables(chunks)
    if salted and out.num_rows:
        out = out.sort_by([(conv_col, "ascending"), (order_col, "ascending")])
    if columns is not None:
        out = out.select(columns)
    return out.combine_chunks()


def lookup_conversation_multi(
    dirs: "list[str]", conv_value, columns: list[str] | None = None
) -> pa.Table:
    """Point lookup across a FAMILY of delivery stores: a conversation's
    rows may span deliveries (later turns arrive in later stores), so this
    runs each member's O(min(k_max+1, n_parts))-container lookup and concats
    — total cost stays a handful of container decodes per member, never a
    scan. Output re-sorts by (conv_col, order_col) of the first member's
    run record when those columns are emitted, so turns read in order even
    when deliveries interleaved them."""
    from . import manifest as mf

    if not dirs:
        raise ValueError("lookup_conversation_multi needs at least one store")
    parts = [lookup_conversation(d, conv_value, columns=columns) for d in dirs]
    nonempty = [p for p in parts if p.num_rows] or parts[:1]
    out = pa.concat_tables(nonempty, promote_options="none")
    params = mf.load_run_record(dirs[0]) or {}
    conv_col, order_col = params.get("conv_col"), params.get("order_col")
    if (
        out.num_rows
        and conv_col in out.column_names
        and order_col and order_col in out.column_names
    ):
        out = out.sort_by([(conv_col, "ascending"), (order_col, "ascending")])
    return out.combine_chunks()


def decode_family(
    dirs: "list[str]",
    columns: list[str] | None = None,
    max_generation: int | None = None,
):
    """Decode a FAMILY of delivery stores as one streaming Dataset (the
    export path: ``decode DIR... OUT`` writes the whole family to parquet).
    Members union metadata-only; emitted schemas must agree on (name, type)
    — refused loudly, conform via ``compact_family`` first."""
    from . import manifest as mf
    from .zonemap import _store_schema

    if not dirs:
        raise ValueError("decode_family needs at least one store directory")
    schemas = []
    for d in dirs:
        full = _store_schema(d, mf.load_records(d))
        schemas.append(
            [(n, t) for n, t in full if columns is None or n in columns]
        )
    if any(s != schemas[0] for s in schemas[1:]):
        detail = "; ".join(
            f"{d}: {[(n, str(t)) for n, t in s]}" for d, s in zip(dirs, schemas)
        )
        raise ValueError(
            "store family schemas differ on the emitted columns — conform "
            f"them via compact_family first: {detail}"
        )
    ds = decode_dataset(dirs[0], columns=columns, max_generation=max_generation)
    for d in dirs[1:]:
        ds = ds.union(
            decode_dataset(d, columns=columns, max_generation=max_generation)
        )
    return ds

"""Deterministic (hash-ordered) sampling pushdown over encoded stores.

``store_sample`` draws the n rows whose ``md5(str(key) + ':' + seed)`` hex
digest sorts lowest — a content-stable, engine-independent sample: the same
rows come back on every run, machine, and engine, and the SAME selection is
expressible in ANSI SQL (``ORDER BY md5(key::VARCHAR || ':' || seed), key
LIMIT n``), which makes a random-looking sample oracle-checkable. Changing
``seed`` redraws the sample; hash-ordering makes it uniform over keys.

Two passes, both through the ordinary scan stack:

1. **Key pass** — decode ONLY the key column (plus predicate columns) of
   candidate containers; each block keeps its n lowest (digest, key) pairs,
   and the driver fold keeps the global n. Partial volume is ≤ n × blocks,
   guarded by ``MAX_N``.
2. **Row pass** — the n winning keys become a ``key in (...)`` predicate
   over the SAME store(s): the existing pruning levels (hash route on
   key-routed layouts, zone maps, dictionary/Bloom footer probes, page
   masks, late materialization) fetch only the winners' rows; the exact
   (digest, key) order is then re-ranked so boundary ties resolve
   identically to the SQL.

The key must be UNIQUE (duplicate keys share a digest, making the row set
at the LIMIT boundary engine-dependent) and int- or string-typed (so
``str(key)`` and ``CAST(key AS VARCHAR)`` agree). Per-row md5 is the same
C-loop cost this repo already accepts for content-stable assignment
(``export.split_assign``) and fingerprints — and it runs over ONE slim
column here, never the payload.

The reference engine samples by reading whole tables into pandas
(reference analyzer.py sample paths); this answers a 1000-row sample from
a store of any size with one key-column pass plus point lookups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .storeagg import _probe_scan_paths
from .zonemap import (
    _is_strlike,
    _normalize_dnf,
    _ScanDecoder,
    _store_schema,
    record_may_match,
)

MAX_N = 100_000


def _digests(keys: pa.Array, seed: str) -> np.ndarray:
    """Hex md5 of ``str(key) + ':' + seed`` per row (null keys refuse)."""
    if keys.null_count:
        raise ValueError("sample key column must not contain nulls")
    suffix = (":" + seed).encode()
    return np.array(
        [hashlib.md5(str(k).encode() + suffix).hexdigest()
         for k in keys.to_pylist()],
        dtype=object,
    )


class _BottomNPartial:
    """Per-block bottom-n (digest, key) pairs over the decoder's output."""

    def __init__(self, key: str, n: int, seed: str, key_type: pa.DataType):
        self.key = key
        self.n = n
        self.seed = seed
        self.key_type = key_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = _digests(keys, self.seed)
        tbl = pa.table(
            {"h": pa.array(h, type=pa.string()), "k": keys.cast(self.key_type)}
        )
        if tbl.num_rows > self.n:
            idx = pc.sort_indices(
                tbl, sort_keys=[("h", "ascending"), ("k", "ascending")]
            )
            tbl = tbl.take(idx.slice(0, self.n))
        return tbl


def store_sample(
    out_dir: str,
    key: str,
    n: int,
    *,
    seed: str = "",
    predicate=None,
    columns: "list[str] | None" = None,
    verify_crc: bool = False,
    return_plan: bool = False,
):
    """Deterministic n-row sample of one store (see module docstring)."""
    return store_sample_multi(
        [out_dir],
        key,
        n,
        seed=seed,
        predicate=predicate,
        columns=columns,
        verify_crc=verify_crc,
        return_plan=return_plan,
    )


def store_sample_multi(
    dirs,
    key: str,
    n: int,
    *,
    seed: str = "",
    predicate=None,
    columns: "list[str] | None" = None,
    verify_crc: bool = False,
    return_plan: bool = False,
):
    """Deterministic n-row sample over a FAMILY of stores as one logical
    table (key uniqueness must hold across members)."""
    import ray.data

    from . import manifest as mf
    from .decode import container_files, resolve_container_path
    from .zonemap import scan_store_multi

    if not dirs:
        raise ValueError("store_sample_multi needs at least one store directory")
    if not (1 <= n <= MAX_N):
        raise ValueError(
            f"n={n} outside [1, {MAX_N}] — larger samples exceed the driver-fold "
            "contract; sample via decode_dataset(...).random_sample() instead"
        )
    dnf = _normalize_dnf(predicate) if predicate else []
    clauses = [cl for br in dnf for cl in br]

    member_recs = []
    types0: dict = {}
    for d in dirs:
        recs = mf.load_records(d)
        if not recs:
            raise FileNotFoundError(f"no manifest records under {d}")
        container_files(d)
        schema = dict(_store_schema(d, recs))
        if not types0:
            types0 = schema
        for c in {key, *(c for c, _, _ in clauses), *(columns or [])}:
            if c not in schema:
                raise ValueError(f"column {c!r} not in store schema {sorted(schema)}")
        if schema[key] != types0[key]:
            raise ValueError(
                f"family members disagree on {key!r}'s type — conform them "
                f"via compact_family first"
            )
        member_recs.append(recs)
    kt = types0[key]
    if not (pa.types.is_integer(kt) or _is_strlike(kt)):
        raise ValueError(
            f"sample key must be an int or string column (str(key) must match "
            f"SQL CAST AS VARCHAR); {key!r} is {kt}"
        )

    # --- pass 1: key-only bottom-n by digest -------------------------------
    plan = {"parts_total": 0, "pruned_stats": 0, "pruned_dict": 0,
            "pruned_bloom": 0, "scanned": 0}
    paths: list[str] = []
    for d, recs in zip(dirs, member_recs):
        plan["parts_total"] += len(recs)
        for r in recs:
            st = r.get("stats") or {}
            rows = int(r.get("rows", 0))
            if dnf and st and not any(record_may_match(st, rows, br) for br in dnf):
                plan["pruned_stats"] += 1
                continue
            paths.append(resolve_container_path(d, r))
    paths = _probe_scan_paths(paths, dnf, plan)
    plan["scanned"] = len(paths)

    read_cols = list(dict.fromkeys([key] + [c for c, _, _ in clauses]))
    partials: list[pa.Table] = []
    if paths:
        ds = ray.data.read_binary_files(paths)
        ds = ds.map_batches(
            _ScanDecoder(read_cols, [key], dnf, verify_crc),
            batch_format="pyarrow",
            batch_size=1,
        ).map_batches(
            _BottomNPartial(key, n, seed, kt),
            batch_format="pyarrow",
            batch_size=None,
        )
        partials = [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not partials:
        out_cols = list(columns) if columns is not None else list(types0)
        empty = pa.table({c: pa.array([], type=types0[c]) for c in out_cols})
        return (empty, plan) if return_plan else empty

    merged = pa.concat_tables(partials).combine_chunks()
    idx = pc.sort_indices(merged, sort_keys=[("h", "ascending"), ("k", "ascending")])
    winners = merged.take(idx.slice(0, n))
    wk = winners["k"].to_pylist()
    if len(set(wk)) != len(wk):
        raise ValueError(
            f"sample key {key!r} is not unique — duplicate keys make the "
            "LIMIT-boundary row set engine-dependent; sample on a unique key"
        )

    # --- pass 2: point-lookup scan for the winners' rows --------------------
    in_cl = (key, "in", wk)
    pred2 = ("or", [br + [in_cl] for br in dnf]) if dnf else [in_cl]
    out_cols = list(columns) if columns is not None else list(types0)
    fetch_cols = list(dict.fromkeys(out_cols + [key]))
    if len(dirs) == 1:
        from .zonemap import scan_store

        ds2, plan2 = scan_store(dirs[0], pred2, columns=fetch_cols,
                                verify_crc=verify_crc, return_plan=True)
    else:
        ds2, plan2 = scan_store_multi(dirs, pred2, columns=fetch_cols,
                                      verify_crc=verify_crc, return_plan=True)
    batches = [b for b in ds2.iter_batches(batch_format="pyarrow") if b.num_rows]
    plan["row_pass"] = {k: v for k, v in plan2.items() if k != "stores"}
    tbl = pa.concat_tables(batches).combine_chunks() if batches else pa.table(
        {c: pa.array([], type=types0[c]) for c in fetch_cols}
    )

    # exact re-rank so boundary ties resolve identically to the SQL
    keys2 = tbl[key]
    if isinstance(keys2, pa.ChunkedArray):
        keys2 = keys2.combine_chunks()
    h2 = pa.array(_digests(keys2, seed), type=pa.string())
    tbl = tbl.append_column("__h", h2)
    idx = pc.sort_indices(
        tbl, sort_keys=[("__h", "ascending"), (key, "ascending")]
    )
    tbl = tbl.take(idx.slice(0, n)).drop_columns(["__h"]).select(out_cols)
    return (tbl, plan) if return_plan else tbl


class _GroupBottomNPartial:
    """Per-block per-group bottom-n (digest, key) pairs: one multi-key sort
    (group, digest, key) + the vectorized rank-within-run filter."""

    def __init__(self, key, group_by, n, seed, key_type, group_types):
        self.key = key
        self.group_by = list(group_by)
        self.n = n
        self.seed = seed
        self.key_type = key_type
        self.group_types = group_types

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .storetopk import _group_run_starts

        keys = batch[self.key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = _digests(keys, self.seed)
        cols = {f"g_{c}": batch[c] for c in self.group_by}
        cols["h"] = pa.array(h, type=pa.string())
        cols["k"] = keys.cast(self.key_type)
        tbl = pa.table(cols)
        sort_keys = [(f"g_{c}", "ascending") for c in self.group_by] + [
            ("h", "ascending"), ("k", "ascending")
        ]
        idx = pc.sort_indices(tbl, sort_keys=sort_keys, null_placement="at_end")
        tbl = tbl.take(idx)
        starts = _group_run_starts(tbl, [f"g_{c}" for c in self.group_by])
        pos = np.arange(tbl.num_rows, dtype=np.int64)
        rank = pos - starts[np.searchsorted(starts, pos, side="right") - 1]
        return tbl.filter(pa.array(rank < self.n))


def store_sample_stratified(
    dirs,
    key: str,
    group_by,
    n: int,
    *,
    seed: str = "",
    predicate=None,
    columns: "list[str] | None" = None,
    verify_crc: bool = False,
    return_plan: bool = False,
    max_partial_rows: int = 2_000_000,
):
    """STRATIFIED deterministic sample: the n rows per group whose
    ``md5(str(key) + ':' + seed)`` digests sort lowest WITHIN the group —
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5(...), key) <= n``
    in SQL, so the per-stratum draw is oracle-checkable like the global
    one. The training-data shape: "n documents per language / source /
    quality band", content-stable across runs and engines.

    Pass 1 decodes only the key + group columns with per-block per-group
    bottom-n partials (≤ groups-per-block × n × blocks rows, the
    rollup-grade driver contract, guarded by ``max_partial_rows``); pass 2
    fetches winners through the point-lookup scan stack and re-ranks
    exactly. ``dirs`` may be one store (str) or a family (list)."""
    import ray.data

    from . import manifest as mf
    from .decode import container_files, resolve_container_path
    from .storetopk import _group_run_starts
    from .zonemap import scan_store, scan_store_multi

    if isinstance(dirs, str):
        dirs = [dirs]
    if not dirs:
        raise ValueError("store_sample_stratified needs at least one store")
    if not (1 <= n <= MAX_N):
        raise ValueError(f"n={n} outside [1, {MAX_N}] (per-group sample size)")
    group_by = list(group_by)
    if not group_by:
        raise ValueError("store_sample_stratified needs at least one group column")
    dnf = _normalize_dnf(predicate) if predicate else []
    clauses = [cl for br in dnf for cl in br]

    member_recs = []
    types0: dict = {}
    for d in dirs:
        recs = mf.load_records(d)
        if not recs:
            raise FileNotFoundError(f"no manifest records under {d}")
        container_files(d)
        schema = dict(_store_schema(d, recs))
        if not types0:
            types0 = schema
        for c in {key, *group_by, *(c for c, _, _ in clauses), *(columns or [])}:
            if c not in schema:
                raise ValueError(f"column {c!r} not in store schema {sorted(schema)}")
        for c in [key, *group_by]:
            if schema[c] != types0[c]:
                raise ValueError(
                    f"family members disagree on {c!r}'s type — conform them "
                    "via compact_family first"
                )
        member_recs.append(recs)
    kt = types0[key]
    if not (pa.types.is_integer(kt) or _is_strlike(kt)):
        raise ValueError(
            f"sample key must be an int or string column; {key!r} is {kt}"
        )

    plan = {"parts_total": 0, "pruned_stats": 0, "pruned_dict": 0,
            "pruned_bloom": 0, "scanned": 0}
    paths: list[str] = []
    for d, recs in zip(dirs, member_recs):
        plan["parts_total"] += len(recs)
        for r in recs:
            st = r.get("stats") or {}
            rows = int(r.get("rows", 0))
            if dnf and st and not any(record_may_match(st, rows, br) for br in dnf):
                plan["pruned_stats"] += 1
                continue
            paths.append(resolve_container_path(d, r))
    paths = _probe_scan_paths(paths, dnf, plan)
    plan["scanned"] = len(paths)

    read_cols = list(dict.fromkeys([key] + group_by + [c for c, _, _ in clauses]))
    partials: list[pa.Table] = []
    if paths:
        ds = ray.data.read_binary_files(paths)
        ds = ds.map_batches(
            _ScanDecoder(read_cols, list(dict.fromkeys([key] + group_by)), dnf,
                         verify_crc),
            batch_format="pyarrow",
            batch_size=1,
        ).map_batches(
            _GroupBottomNPartial(key, group_by, n, seed, kt,
                                 {c: types0[c] for c in group_by}),
            batch_format="pyarrow",
            batch_size=None,
        )
        rows_seen = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            rows_seen += b.num_rows
            if rows_seen > max_partial_rows:
                raise ValueError(
                    f"stratified-sample partials exceed max_partial_rows="
                    f"{max_partial_rows} — group cardinality × n is beyond "
                    "the driver-fold contract; lower n or sample per group "
                    "via decode_dataset(...).groupby"
                )
            partials.append(b)
    out_cols = list(columns) if columns is not None else list(
        dict.fromkeys(group_by + [key])
    )
    if not partials:
        empty = pa.table({c: pa.array([], type=types0[c]) for c in out_cols})
        return (empty, plan) if return_plan else empty

    merged = pa.concat_tables(partials).combine_chunks()
    gnames = [f"g_{c}" for c in group_by]
    sort_keys = [(g, "ascending") for g in gnames] + [("h", "ascending"),
                                                      ("k", "ascending")]
    idx = pc.sort_indices(merged, sort_keys=sort_keys, null_placement="at_end")
    merged = merged.take(idx)
    starts = _group_run_starts(merged, gnames)
    pos = np.arange(merged.num_rows, dtype=np.int64)
    rank = pos - starts[np.searchsorted(starts, pos, side="right") - 1]
    winners = merged.filter(pa.array(rank < n))
    wk = winners["k"].to_pylist()
    if len(set(wk)) != len(wk):
        raise ValueError(
            f"sample key {key!r} is not unique — duplicate keys make the "
            "per-group boundary row set engine-dependent"
        )

    in_cl = (key, "in", wk)
    pred2 = ("or", [br + [in_cl] for br in dnf]) if dnf else [in_cl]
    fetch_cols = list(dict.fromkeys(out_cols + [key] + group_by))
    if len(dirs) == 1:
        ds2 = scan_store(dirs[0], pred2, columns=fetch_cols, verify_crc=verify_crc)
    else:
        ds2 = scan_store_multi(dirs, pred2, columns=fetch_cols, verify_crc=verify_crc)
    batches = [b for b in ds2.iter_batches(batch_format="pyarrow") if b.num_rows]
    tbl = pa.concat_tables(batches).combine_chunks() if batches else pa.table(
        {c: pa.array([], type=types0[c]) for c in fetch_cols}
    )
    keys2 = tbl[key]
    if isinstance(keys2, pa.ChunkedArray):
        keys2 = keys2.combine_chunks()
    tbl = tbl.append_column("__h", pa.array(_digests(keys2, seed), type=pa.string()))
    sort_keys = [(c, "ascending") for c in group_by] + [("__h", "ascending"),
                                                        (key, "ascending")]
    idx = pc.sort_indices(tbl, sort_keys=sort_keys, null_placement="at_end")
    tbl = tbl.take(idx).drop_columns(["__h"]).select(out_cols)
    return (tbl, plan) if return_plan else tbl

"""Co-partitioned (bucketed) join between two encoded stores — no shuffle.

Two stores whose rows were hash-routed at ENCODE time with the same
``(hash_version, n_parts)`` on their respective partition columns co-locate
equal keys in equal ``part_id``s: ``part = stable_hash(key) % n_parts`` is a
pure function of the value, independent of which table it came from. A join
on those columns therefore needs ZERO exchange — each part_id's containers
from both stores decode together in one task and join locally, the Hive /
Spark bucketed-join idea (bucket metadata checked at plan time, map-side
join per bucket) applied to this engine's container layout.

Partitioning assumptions enforced (refused loudly, never silently wrong):

* both stores carry a ``_run.json`` with the CURRENT hash version — the
  part routing must be the same arithmetic on both sides;
* both are ``partition_mode="hash"`` (a range-clustered store routes by
  value range, not key hash — its keys don't co-locate);
* equal ``n_parts``;
* ``salt_rows == 0`` on both — salting splits one key's rows across salt
  chunks by ORDER ranges, and the two tables' order domains differ, so a
  salted layout only co-locates chunk 0;
* the join columns ARE the stores' recorded partition columns (joining on
  anything else has no co-location guarantee).

At 100 TB this is the pattern for repeated fact-to-fact joins: pay the
partition exchange once at ingest (both stores routed on the join key),
then every subsequent join is map-only over matched buckets.

``store_join_dim`` covers the OTHER join shape — fact-to-dimension over a
SALTED fact store (the flagship transcript layout): dimension rows are
replicated to their key's reachable salt-chunk partitions and co-grouped
with the containers, so only the small side moves; ``dims=[...]`` chains
several dimensions through one exchange (star schema).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from . import manifest as mf
from .decode import container_files, decode_table, resolve_container_path
from .partition import HASH_VERSION


def _layout(out_dir: str) -> dict:
    params = mf.load_run_record(out_dir)
    if not params:
        raise ValueError(f"{out_dir}: no _run.json — cannot prove co-partitioning")
    return params


def _check_bucketed(left_dir: str, right_dir: str, left_on: str, right_on: str):
    lp, rp = _layout(left_dir), _layout(right_dir)
    for d, p in ((left_dir, lp), (right_dir, rp)):
        if p.get("hash_version") != HASH_VERSION:
            raise ValueError(f"{d}: hash_version {p.get('hash_version')!r} != current {HASH_VERSION!r}")
        if (p.get("partition_mode") or "hash") != "hash":
            raise ValueError(f"{d}: partition_mode {p.get('partition_mode')!r} — range-clustered stores don't co-locate keys")
        if int(p.get("salt_rows") or 0) != 0:
            raise ValueError(f"{d}: salt_rows={p.get('salt_rows')} — salted stores split keys across chunk partitions")
    if int(lp["n_parts"]) != int(rp["n_parts"]):
        raise ValueError(f"n_parts mismatch: {lp['n_parts']} vs {rp['n_parts']}")
    if lp.get("conv_col") != left_on:
        raise ValueError(f"{left_dir} is partitioned on {lp.get('conv_col')!r}, not the join column {left_on!r}")
    if rp.get("conv_col") != right_on:
        raise ValueError(f"{right_dir} is partitioned on {rp.get('conv_col')!r}, not the join column {right_on!r}")
    return int(lp["n_parts"])


def _paths_by_part(out_dir: str) -> dict[int, list[str]]:
    recs = mf.load_records(out_dir)
    container_files(out_dir)  # stray-container guard
    out: dict[int, list[str]] = {}
    for r in recs:
        out.setdefault(int(r["part_id"]), []).append(resolve_container_path(out_dir, r))
    return out


class _BucketJoiner:
    """Decode one part_id's containers from both stores and join locally.
    Works as a plain callable in a task pool (state is a few strings)."""

    def __init__(self, left_on, right_on, left_cols, right_cols, how, right_schema):
        self.left_on = left_on
        self.right_on = right_on
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.how = how
        self.right_schema = right_schema  # [(name, type)] for empty right sides

    def _side(self, paths, cols) -> pa.Table | None:
        tables = [decode_table(open(p, "rb").read(), columns=cols) for p in paths]
        return pa.concat_tables(tables) if tables else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        out = []
        for row in batch.to_pylist():
            left = self._side(row["left_paths"], self.left_cols)
            if left is None:
                continue
            right = self._side(row["right_paths"], self.right_cols)
            if right is None:
                if self.how == "inner":
                    continue
                right = pa.table(
                    {n: pa.array([], type=t) for n, t in self.right_schema if n in self.right_cols}
                )
            out.append(
                left.join(
                    right,
                    keys=[self.left_on],
                    right_keys=[self.right_on],
                    join_type="inner" if self.how == "inner" else "left outer",
                )
            )
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="default")


# Dynamic-partition-pruning thresholds: a dim side with at most this many
# rows is collected driver-side (it is about to be replicated through an
# exchange anyway, so holding one copy on the driver is strictly cheaper);
# its distinct keys then prune fact containers BEFORE any decode. Key lists
# up to the stats cap run the per-record zone-map check (a Python loop per
# record, so bounded); up to the probe cap they run the batched dictionary
# + Bloom footer probe (vectorized hashing, one Ray job).
_DPP_MAX_DIM_ROWS = 100_000
_DPP_STATS_MAX_KEYS = 1_024
_DPP_PROBE_MAX_KEYS = 65_536


def _collect_dim_table(ds_i, cols_full: list[str], cap: int) -> "pa.Table | None":
    """Materialize a dim-side Dataset driver-side when it is small (<= cap
    rows). Returns None — and stops iterating — the moment the cap is
    exceeded, so a mis-declared huge 'dimension' costs one extra batch, not
    a driver OOM."""
    batches, total = [], 0
    for b in ds_i.iter_batches(batch_format="pyarrow", batch_size=8192):
        total += b.num_rows
        if total > cap:
            return None
        batches.append(b)
    if not batches:
        return None
    return pa.concat_tables(batches).select(cols_full)


def _dpp_route_parts(keys: list, n_parts: int, k_max: int) -> "set[int] | None":
    """Partitions reachable by ANY of ``keys`` under the store's hash+salt
    routing — the same vectorized arithmetic ``_route_for`` replicates dim
    rows with, so the pruned container set and the dim exchange stay in
    lockstep by construction. None when the key type doesn't hash."""
    import numpy as np

    from .partition import GOLDEN, hash_conv_values

    h = hash_conv_values(keys)
    if h is None or len(h) == 0:
        return None
    ks = np.arange(k_max + 1, dtype=np.uint64)
    mixed = (h[:, None] ^ (ks[None, :] * GOLDEN)) + ks[None, :]
    return set((mixed % np.uint64(n_parts)).astype(np.int64).ravel().tolist())


def store_join_dim(
    fact_dir: str,
    dim=None,
    *,
    dim_on: str | None = None,
    fact_columns: list[str] | None = None,
    dim_columns: list[str] | None = None,
    dims: "list[tuple] | None" = None,
    how: str = "inner",
    dpp: bool = True,
    return_plan: bool = False,
) -> "ray.data.Dataset":
    """Join a hash-routed fact store — SALTED layouts included — with a
    dimension TABLE (parquet path or Dataset), shuffling only the dim side.

    The fact store's partition for a key is pure arithmetic
    (``part = mix(hash(key), salt_chunk) % n_parts`` recorded in _run.json),
    so each dim row is REPLICATED to the partitions its key's salt chunks
     0..k_max can occupy (k_max bounded by the order column's zone-map max —
    the same bound lookup/delete use) and co-grouped with that partition's
    containers. One exchange of dim_rows x (k_max + 1) small rows; the fact
    containers never move. This is how a salted 10^12-turn transcript store
    joins per-conversation metadata: the transcript side is the one that
    cannot afford a shuffle.

    ``how``: "inner" or "left" (left keeps fact rows with null dim columns).
    Output carries the fact store's key column; non-key dim column names
    must not collide with fact columns. ``dims=[(source, on, columns), ...]``
    joins SEVERAL dimensions against the same fact key in ONE co-grouped
    pass (the star-schema shape) — each dim is routed independently, the
    group joins them in order.

    ``dpp=True`` (default) adds dynamic partition pruning for INNER joins —
    the semijoin-pushdown trick Spark applies to star joins: a dim side
    small enough to hold driver-side (<= ``_DPP_MAX_DIM_ROWS``, checked by
    streaming its batches with an early abort) is collected ONCE, reused
    for the routing exchange, and its distinct keys prune fact containers
    before any decode — first by hash route (only partitions some key can
    reach survive; the intersection across dims, since an inner-join row
    must match every dim), then per-container zone maps, then the batched
    dictionary/Bloom footer probe. A dim over the cap streams exactly as
    before (no pruning from that dim). ``return_plan=True`` also returns
    ``{parts_total, pruned_route, pruned_stats, pruned_probe, scanned,
    dpp_dims}``."""
    import numpy as np

    from .partition import GOLDEN, stable_hash_ints, stable_hash_strings
    from .zonemap import _store_schema

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    fp = _layout(fact_dir)
    if fp.get("hash_version") != HASH_VERSION:
        raise ValueError(f"{fact_dir}: hash_version {fp.get('hash_version')!r} != current {HASH_VERSION!r}")
    if (fp.get("partition_mode") or "hash") != "hash":
        raise ValueError(f"{fact_dir}: partition_mode {fp.get('partition_mode')!r} — range-clustered stores don't hash-route keys")
    n_parts = int(fp["n_parts"])
    fact_on = fp["conv_col"]
    salt_rows = int(fp.get("salt_rows") or 0)
    recs = mf.load_records(fact_dir)
    container_files(fact_dir)  # stray-container guard
    if salt_rows:
        k_max = mf.order_chunk_bound(recs, fp.get("order_col"), salt_rows)
        if k_max is None:
            raise ValueError(
                f"{fact_dir}: salted store predates zone maps — salt-chunk bound unknowable"
            )
    else:
        k_max = 0

    f_schema = _store_schema(fact_dir, recs)
    f_names = [n for n, _ in f_schema]
    fact_cols = list(dict.fromkeys([fact_on] + (fact_columns if fact_columns is not None else f_names)))
    missing = [c for c in fact_cols if c not in f_names]
    if missing:
        raise ValueError(f"columns {missing} not in fact store schema")

    if dims is None:
        if dim is None or dim_on is None:
            raise ValueError("pass dim + dim_on, or dims=[(source, on, columns), ...]")
        dims = [(dim, dim_on, dim_columns)]
    elif dim is not None:
        raise ValueError("pass either dim or dims, not both")

    dim_specs = []  # (tag, on, cols, fields)
    taken = set(fact_cols) - {fact_on}
    for i, (src_i, on_i, cols_i) in enumerate(dims):
        if isinstance(src_i, str):
            from .pipelines._util import read_parquet_clean

            ds_i = read_parquet_clean(
                src_i,
                columns=None if cols_i is None else list(dict.fromkeys([on_i] + list(cols_i))),
            )
        else:
            ds_i = src_i
        sch = ds_i.schema()
        names_i = list(sch.names)
        if on_i not in names_i:
            raise ValueError(f"dim_on {on_i!r} not in dimension columns {names_i}")
        # the dim key must hash EXACTLY like the fact's partition column —
        # a type-family mismatch would route rows to the wrong partitions
        # and silently drop matches, so refuse it loudly
        fact_t = dict(f_schema)[fact_on]
        dim_t = dict(zip(sch.names, sch.types))[on_i]
        fam = lambda t: "int" if pa.types.is_integer(t) else "str"
        if fam(fact_t) != fam(dim_t):
            raise ValueError(
                f"dim key {on_i!r} ({dim_t}) and fact partition column "
                f"{fact_on!r} ({fact_t}) are different type families — "
                "their hashes cannot co-route"
            )
        cols_full = list(dict.fromkeys([on_i] + (list(cols_i) if cols_i is not None else names_i)))
        overlap = taken & (set(cols_full) - {on_i})
        if overlap:
            raise ValueError(f"non-key columns {sorted(overlap)} appear on multiple sides — prune one")
        taken |= set(cols_full) - {on_i}
        types_i = {n: t for n, t in zip(sch.names, sch.types)}
        dim_specs.append((f"dim{i}", on_i, cols_full, [(c, types_i[c]) for c in cols_full], ds_i))

    plan = {"parts_total": len(recs), "pruned_route": 0, "pruned_stats": 0,
            "pruned_probe": 0, "scanned": 0, "dpp_dims": 0}
    if dpp and how == "inner" and recs:
        key_sets: list[list] = []
        collected_specs = []
        for tag, on_i, cols_full, fields, ds_i in dim_specs:
            t_i = _collect_dim_table(ds_i, cols_full, _DPP_MAX_DIM_ROWS)
            if t_i is None:
                collected_specs.append((tag, on_i, cols_full, fields, ds_i))
                continue
            plan["dpp_dims"] += 1
            keys_i = t_i[on_i].combine_chunks().drop_null().unique().to_pylist()
            key_sets.append(keys_i)
            # reuse the collected copy for the routing exchange: the dim
            # pipeline executes once, not once for keys + once for routing
            collected_specs.append((tag, on_i, cols_full, fields,
                                    ray.data.from_arrow(t_i)))
        dim_specs = collected_specs
        parts_sets = [s for s in (_dpp_route_parts(k, n_parts, k_max)
                                  for k in key_sets) if s is not None]
        if parts_sets:
            keep_parts = set.intersection(*parts_sets)
            before = len(recs)
            recs = [r for r in recs if int(r["part_id"]) in keep_parts]
            plan["pruned_route"] = before - len(recs)
        usable = [k for k in key_sets if k]
        if usable and recs:
            # ANY single dim's key set is a sound semijoin filter for an
            # inner join; the smallest prunes hardest and probes cheapest
            smallest = min(usable, key=len)
            clause = [(fact_on, "in", smallest)]
            if len(smallest) <= _DPP_STATS_MAX_KEYS:
                from .zonemap import record_may_match

                before = len(recs)
                recs = [r for r in recs
                        if record_may_match(r.get("stats") or {},
                                            int(r.get("rows", 0)), clause)]
                plan["pruned_stats"] = before - len(recs)
            if len(smallest) <= _DPP_PROBE_MAX_KEYS and recs:
                from .zonemap import probe_verdicts

                paths = [resolve_container_path(fact_dir, r) for r in recs]
                verdicts = probe_verdicts(paths, [clause])
                before = len(recs)
                recs = [r for r, p in zip(recs, paths)
                        if verdicts.get(p) == "keep"]
                plan["pruned_probe"] = before - len(recs)
    plan["scanned"] = len(recs)

    def _route_for(tag: str, on_col: str, cols_full: list):
        def route(batch: pa.Table) -> pa.Table:
            """Replicate each dim row to its key's k_max+1 possible partitions."""
            # strip pandas metadata: it makes hash(schema) fail inside Ray's
            # schema-dedup fast path (same reason as _util.read_parquet_clean)
            batch = batch.select(cols_full).replace_schema_metadata(None)
            key = batch[on_col]
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            t = key.type
            if pa.types.is_integer(t):
                h = stable_hash_ints(key.cast(pa.int64()))
            else:
                h = stable_hash_strings(key)
            ks = np.arange(k_max + 1, dtype=np.uint64)
            mixed = (h[:, None] ^ (ks[None, :] * GOLDEN)) + ks[None, :]
            parts = (mixed % np.uint64(n_parts)).astype(np.int32)
            idx = np.repeat(np.arange(len(h), dtype=np.int64), k_max + 1)
            out = batch.take(pa.array(idx))
            out = out.append_column("part_id", pa.array(parts.ravel()))
            # distinct (row, part): two chunks of one key may share a partition
            if k_max:
                mask = np.ones(len(idx), dtype=bool)
                flat = parts.reshape(len(h), k_max + 1)
                for j in range(1, k_max + 1):
                    dup = (flat[:, j][:, None] == flat[:, :j]).any(axis=1)
                    mask[j::(k_max + 1)] = ~dup
                out = out.filter(pa.array(mask))
            return out.append_column("side", pa.array([tag] * out.num_rows, pa.string()))

        return route

    routed = [
        ds_i.map_batches(_route_for(tag, on_i, cols_full), batch_format="pyarrow")
        for tag, on_i, cols_full, _, ds_i in dim_specs
    ]

    file_rows = pa.table(
        {
            "part_id": pa.array([int(r["part_id"]) for r in recs], pa.int32()),
            "path": pa.array([resolve_container_path(fact_dir, r) for r in recs], pa.string()),
            "side": pa.array(["file"] * len(recs), pa.string()),
        }
    )

    specs_for_join = [(tag, on_i, fields) for tag, on_i, _, fields, _ in dim_specs]

    def _join_group(g: pa.Table) -> pa.Table:
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        side = g["side"].to_pylist()
        paths = [
            p
            for p, s in zip(
                g.column("path").to_pylist() if "path" in g.column_names else [None] * len(side),
                side,
            )
            if s == "file" and p
        ]
        if not paths:
            return pa.table({})
        # inner join: a group missing ANY dim side joins to nothing —
        # decide that before paying for the fact-container decode
        if how == "inner":
            present = set(side)
            if any(tag not in present for tag, _, _ in specs_for_join):
                return pa.table({})
        out = pa.concat_tables(
            [decode_table(open(p, "rb").read(), columns=fact_cols) for p in paths]
        )
        for tag, on_i, fields in specs_for_join:
            keep = pa.array([s == tag for s in side])
            dim_t = g.filter(keep)
            dim_t = (
                pa.table({c: dim_t[c] for c, _ in fields})
                if dim_t.num_rows
                else pa.table({c: pa.array([], type=t) for c, t in fields})
            )
            if dim_t.num_rows == 0 and how == "inner":
                return pa.table({})
            out = out.join(
                dim_t,
                keys=[fact_on],
                right_keys=[on_i],
                join_type="inner" if how == "inner" else "left outer",
            )
        return out

    # union co-groups every side; missing columns null-fill across schemas
    unioned = ray.data.from_arrow(file_rows)
    for r in routed:
        unioned = unioned.union(r)
    ds = unioned.groupby("part_id").map_groups(_join_group, batch_format="pyarrow")
    return (ds, plan) if return_plan else ds


class _MultiBucketJoiner:
    """Decode one part_id's containers from ALL stores and chain local joins.
    Plain callable in a task pool; state is column lists + schemas only."""

    def __init__(self, ons, col_lists, how, schemas):
        self.ons = ons            # join column per store
        self.col_lists = col_lists  # pruned columns per store
        self.how = how
        self.schemas = schemas    # [(name, type)] per store, for empty sides

    def _side(self, paths, cols) -> pa.Table | None:
        tables = [decode_table(open(p, "rb").read(), columns=cols) for p in paths]
        return pa.concat_tables(tables) if tables else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        out = []
        for row in batch.to_pylist():
            acc = self._side(row["paths"][0], self.col_lists[0])
            if acc is None:
                continue
            for i in range(1, len(self.ons)):
                side = self._side(row["paths"][i], self.col_lists[i])
                if side is None:
                    if self.how == "inner":
                        acc = None
                        break
                    side = pa.table(
                        {n: pa.array([], type=t) for n, t in self.schemas[i]
                         if n in self.col_lists[i]}
                    )
                acc = acc.join(
                    side,
                    keys=[self.ons[0]],
                    right_keys=[self.ons[i]],
                    join_type="inner" if self.how == "inner" else "left outer",
                )
                if self.how == "inner" and acc.num_rows == 0:
                    acc = None
                    break
            if acc is not None:
                out.append(acc)
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="default")


def store_join_multi(
    dirs: list[str],
    *,
    ons: list[str] | None = None,
    columns: list[list[str] | None] | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """N-way co-bucketed join over ONE shared key — zero exchange.

    Every store was hash-routed at encode time on its join column with the
    same ``(hash_version, n_parts)``, so equal keys across ALL N stores live
    in equal ``part_id``s; each part_id's containers from every store decode
    together in ONE task and join locally in chain order (store 0 is the
    left/probe side). The star shape where N fact/dim tables share one
    entity key (user/customer/conversation) pays the partition exchange once
    at ingest, then every N-way join is map-only over matched buckets.

    Same layout preconditions as ``store_join`` (hash mode, current hash
    version, equal n_parts, unsalted, join columns ARE the partition
    columns), checked pairwise against store 0 and refused loudly.
    ``how``: "inner", or "left" (left-outer chain anchored on store 0).
    Non-key output columns must be disjoint across stores."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if len(dirs) < 2:
        raise ValueError("store_join_multi needs at least 2 stores")
    layouts = [_layout(d) for d in dirs]
    ons = list(ons) if ons is not None else [p.get("conv_col") for p in layouts]
    if len(ons) != len(dirs):
        raise ValueError(f"{len(dirs)} stores but {len(ons)} join columns")
    for i in range(1, len(dirs)):
        _check_bucketed(dirs[0], dirs[i], ons[0], ons[i])

    from .zonemap import _store_schema

    schemas = [_store_schema(d, mf.load_records(d)) for d in dirs]
    col_lists: list[list[str]] = []
    taken: set[str] = set()
    for i, d in enumerate(dirs):
        names = [n for n, _ in schemas[i]]
        want = columns[i] if columns is not None and columns[i] is not None else names
        cols = list(dict.fromkeys([ons[i]] + list(want)))
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(f"columns {missing} not in {d} schema")
        overlap = taken & (set(cols) - {ons[i]})
        if overlap:
            raise ValueError(f"non-key columns {sorted(overlap)} appear on multiple sides — prune one")
        taken |= set(cols) - {ons[i]}
        col_lists.append(cols)

    by_part = [_paths_by_part(d) for d in dirs]
    pids = set(by_part[0])
    if how == "inner":
        for m in by_part[1:]:
            pids &= set(m)
    items = [
        {"part_id": p, "paths": [m.get(p, []) for m in by_part]}
        for p in sorted(pids)
        if by_part[0].get(p)
    ]
    if not items:
        empty_cols: dict[str, pa.Array] = {}
        for i, sch in enumerate(schemas):
            t = dict(sch)
            for c in col_lists[i]:
                if i == 0 or c != ons[i]:
                    empty_cols[c] = pa.array([], type=t[c])
        return ray.data.from_arrow(pa.table(empty_cols))
    joiner = _MultiBucketJoiner(ons, col_lists, how, schemas)
    return ray.data.from_items(items).map_batches(joiner, batch_format="pyarrow", batch_size=1)


def store_join(
    left_dir: str,
    right_dir: str,
    *,
    left_on: str | None = None,
    right_on: str | None = None,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join two co-partitioned stores on their partition columns -> streaming
    Dataset. ``left_on``/``right_on`` default to each store's recorded
    partition column. Output carries ``left_on`` (the right key is folded
    into it) plus the pruned column selections; non-key column names must be
    disjoint between the sides."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lp, rp = _layout(left_dir), _layout(right_dir)
    left_on = left_on or lp.get("conv_col")
    right_on = right_on or rp.get("conv_col")
    _check_bucketed(left_dir, right_dir, left_on, right_on)

    from .zonemap import _store_schema

    l_schema = _store_schema(left_dir, mf.load_records(left_dir))
    r_schema = _store_schema(right_dir, mf.load_records(right_dir))
    l_names = [n for n, _ in l_schema]
    r_names = [n for n, _ in r_schema]
    left_cols = list(dict.fromkeys([left_on] + (left_columns if left_columns is not None else l_names)))
    right_cols = list(dict.fromkeys([right_on] + (right_columns if right_columns is not None else r_names)))
    missing = [c for c in left_cols if c not in l_names] + [c for c in right_cols if c not in r_names]
    if missing:
        raise ValueError(f"columns {missing} not in store schemas")
    overlap = (set(left_cols) - {left_on}) & (set(right_cols) - {right_on})
    if overlap:
        raise ValueError(f"non-key columns {sorted(overlap)} appear on both sides — prune one")

    lparts, rparts = _paths_by_part(left_dir), _paths_by_part(right_dir)
    pids = sorted(set(lparts) | (set(rparts) if how == "left" else set(rparts) & set(lparts)))
    items = [
        {
            "part_id": p,
            "left_paths": lparts.get(p, []),
            "right_paths": rparts.get(p, []),
        }
        for p in pids
        if lparts.get(p)
    ]
    if not items:
        lt = dict(l_schema)
        rt = dict(r_schema)
        empty = pa.table(
            {c: pa.array([], type=lt[c]) for c in left_cols}
            | {c: pa.array([], type=rt[c]) for c in right_cols if c != right_on}
        )
        return ray.data.from_arrow(empty)
    joiner = _BucketJoiner(left_on, right_on, left_cols, right_cols, how, r_schema)
    return ray.data.from_items(items).map_batches(joiner, batch_format="pyarrow", batch_size=1)

"""GROUP BY aggregate pushdown over encoded stores.

``store_agg_group`` answers ``SELECT group_cols, count/nn/min/max/sum ...
FROM store [WHERE pred] GROUP BY group_cols`` with the same three-class
container plan ``storeagg.store_agg`` uses for scalar aggregates:

* **pruned** — no DNF branch may match (zone maps): skipped.
* **metadata-answered** — every row provably matches the predicate AND every
  group column is provably SINGLE-VALUED in the container (zone-map
  ``min == max`` with zero nulls and exact bounds, or all-null → the SQL
  NULL group): the container contributes ONE partial row — built from its
  recorded rows / null counts / min / max / exact sum — without being
  opened. On a store range-clustered by the grouping column (the common
  rollup layout: one tenant / one day / one source per container), a whole
  GROUP BY answers from manifest JSON alone.
* **scanned** — everything else runs the membership footer probe
  (dictionary + Bloom, one Ray job) and then ONE distributed job: pruned,
  late-materialized decode of only the group + aggregate + predicate
  columns, then a vectorized Arrow ``group_by`` partial per block.

Partials live in a fixed physical domain so metadata rows and scan rows
combine exactly: group keys and min/max as int64 for int / timestamp /
date / bool columns (the zone maps' own domain), float64 for floats,
utf8 for strings; integer sums as ``decimal128(38, 0)`` — Arrow's grouped
sum is exact there far past int64, matching the encode-time exact sums —
and float sums as float64. The final fold is one driver-side Arrow
``group_by`` over the concatenated partials (no Python loop over groups).

Driver-fold contract (same shape as ``pipelines._util.finish_on_driver``):
the concatenated partials hold at most (distinct groups per block) × blocks
rows. That is the right shape for rollup-grade group cardinalities (flags,
tenants, days, languages — the GROUP BY columns a store is organized by);
``max_partial_rows`` guards the contract LOUDLY (default 2M rows) and the
error names the exchange alternative (``decode_dataset(...).groupby``)
instead of silently collecting an unbounded driver table.

SQL semantics: NULL group keys form their own group; NaN float keys refuse
the metadata path (scan decides; Arrow and DuckDB both group NaNs
together); min/max/sum skip NULLs and an all-NULL group yields NULL, count
counts rows, nn counts non-nulls.

The reference engine re-reads whole tables for every grouped question
(reference analyzer.py value_counts); Parquet engines push scalar
aggregates to row-group stats — extending that to GROUP BY via
single-valued zone maps is the same public idea applied per group.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .storeagg import _expand_avg, _meta_answer, _normalize_aggs, record_all_match
from .zonemap import (
    _int_physical,
    _is_strlike,
    _normalize_dnf,
    _probe_applies,
    _ScanDecoder,
    _store_schema,
    probe_verdicts,
    record_may_match,
)

_SUM_DEC = pa.decimal128(38, 0)


def _group_physical(t: pa.DataType) -> pa.DataType:
    """Physical partial-domain type for a group column (the zone maps' own
    domain, so metadata keys and scanned keys compare equal)."""
    if _int_physical(t) is not None:
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    if _is_strlike(t):
        return pa.string()
    raise ValueError(f"cannot GROUP BY column of type {t}")


def _minmax_physical(t: pa.DataType) -> pa.DataType:
    if _int_physical(t) is not None:
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    return pa.string()


def _partial_schema(group_by, aggs, schema) -> pa.Schema:
    """Fixed schema every partial block (scan or metadata) conforms to."""
    fields = [pa.field(f"g_{c}", _group_physical(schema[c])) for c in group_by]
    fields.append(pa.field("_rows", pa.int64()))
    for fn, col in aggs:
        if fn == "count":
            continue
        if fn == "nn":
            fields.append(pa.field(f"nn_{col}", pa.int64()))
        elif fn in ("min", "max"):
            fields.append(pa.field(f"{fn}_{col}", _minmax_physical(schema[col])))
        else:  # sum
            st = _SUM_DEC if pa.types.is_integer(schema[col]) else pa.float64()
            fields.append(pa.field(f"sum_{col}", st))
    return pa.schema(fields)


def _to_physical(arr: pa.ChunkedArray | pa.Array, t: pa.DataType, target: pa.DataType):
    """Cast a decoded column into its partial physical domain."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == target:
        return arr
    it = _int_physical(t)
    if it is not None and target == pa.int64():
        return arr.cast(it).cast(pa.int64())
    return arr.cast(target)


class _GroupPartial:
    """Per-block grouped partials over the decoder's filtered output — one
    row per (block, group), all columns in the fixed partial domain. The
    group_by + aggregate run as ONE vectorized Arrow hash aggregation; input
    columns are staged under collision-free ``__i_*`` names so ``min(x)
    GROUP BY x`` and duplicate (fn, col) pairs never alias."""

    def __init__(self, group_by, aggs, types: dict[str, pa.DataType]):
        self.group_by = list(group_by)
        self.aggs = aggs
        self.types = types
        self.schema = _partial_schema(group_by, aggs, types)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for c in self.group_by:
            cols[f"g_{c}"] = _to_physical(
                batch[c], self.types[c], _group_physical(self.types[c])
            )
        specs: list[tuple] = [([], "count_all")]
        renames = {"count_all": "_rows"}
        for fn, col in self.aggs:
            if fn == "count":
                continue
            key = f"{fn}_{col}"
            iname = f"__i_{key}"
            arr = batch[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            t = self.types[col]
            if fn == "nn":
                specs.append((iname, "count"))
                renames[f"{iname}_count"] = key
            elif fn in ("min", "max"):
                arr = _to_physical(arr, t, _minmax_physical(t))
                specs.append((iname, fn))
                renames[f"{iname}_{fn}"] = key
            else:  # sum — decimal128(38,0) for ints (exact), float64 for floats
                arr = arr.cast(_SUM_DEC if pa.types.is_integer(t) else pa.float64())
                specs.append((iname, "sum"))
                renames[f"{iname}_sum"] = key
            cols[iname] = arr
        tbl = pa.table(cols)
        res = tbl.group_by([f"g_{c}" for c in self.group_by]).aggregate(specs)
        res = res.rename_columns([renames.get(n, n) for n in res.column_names])
        return res.select(self.schema.names).cast(self.schema)


def _meta_group_row(rec: dict, group_by, aggs, schema) -> dict | None:
    """One partial row from a fully-matching container's recorded stats, or
    None when the metadata can't answer (multi-valued / approximate /
    NaN-bearing group column, or an aggregate ``storeagg._meta_answer``
    would refuse). Values land in the partial physical domain."""
    st = rec.get("stats") or {}
    rows = int(rec.get("rows", 0))
    if rows == 0:
        return None  # nothing to contribute; skip (empty containers are rare)
    row: dict = {}
    for c in group_by:
        ent = st.get(c)
        if ent is None:
            return None
        nulls = int(ent.get("nulls", 0))
        if nulls == rows:
            row[f"g_{c}"] = None  # the SQL NULL group
            continue
        if nulls != 0 or ent.get("approx"):
            return None
        if pa.types.is_floating(schema[c]) and ent.get("nan"):
            return None  # NaN keys: let the scan path group them
        mn, mx = ent.get("min"), ent.get("max")
        if mn is None or mn != mx:
            return None
        row[f"g_{c}"] = mn
    # aggregates: reuse the scalar metadata fold on a fresh accumulator —
    # identical soundness rules (exact bounds, NaN refusal, exact sums)
    acc: dict = {}
    if not _meta_answer(rec, aggs, acc):
        return None
    row["_rows"] = rows
    for fn, col in aggs:
        if fn == "count":
            continue
        row[f"{fn}_{col}"] = acc.get(f"{fn}_{col}")
    return row


def _scan_group_partials(
    scan_paths, group_by, aggs, schema, dnf, clauses, verify_crc, max_partial_rows
):
    """ONE distributed job: pruned decode of undecidable containers + a
    vectorized grouped partial per block, streamed back as Arrow tables.
    Store-agnostic (family callers batch every member's paths)."""
    import ray.data

    agg_cols = [c for _, c in aggs if c is not None]
    pred_cols = [c for c, _, _ in clauses]
    out_cols = list(dict.fromkeys(list(group_by) + agg_cols))
    read_cols = list(dict.fromkeys(out_cols + pred_cols))
    ds = ray.data.read_binary_files(scan_paths)
    ds = ds.map_batches(
        _ScanDecoder(read_cols, out_cols, dnf, verify_crc),
        batch_format="pyarrow",
        batch_size=1,
    ).map_batches(
        _GroupPartial(group_by, aggs, schema), batch_format="pyarrow", batch_size=None
    )
    partials: list[pa.Table] = []
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
        if n > max_partial_rows:
            raise ValueError(
                f"grouped partials exceed max_partial_rows={max_partial_rows} — "
                "the GROUP BY key cardinality is beyond the driver-fold "
                "contract; aggregate via decode_dataset(...).groupby(...) "
                "(distributed exchange) or raise max_partial_rows"
            )
        partials.append(b)
    return partials


def _finalize_group(merged: pa.Table, group_by, aggs, schema) -> pa.Table:
    """Leave the physical partial domain: group keys and min/max cast back
    to their logical column types, counts to int64, exact decimal sums to
    int64 (raising loudly if a sum ever exceeds int64 — at which point the
    caller wants a decimal column, not a silent wrap)."""
    cols: dict[str, pa.Array] = {}
    for c in group_by:
        arr = merged[f"g_{c}"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = schema[c]
        it = _int_physical(t)
        if it is not None:
            arr = arr.cast(it).cast(t)
        elif arr.type != t:
            arr = arr.cast(t)
        cols[c] = arr
    for fn, col in aggs:
        key = fn if col is None else f"{fn}_{col}"
        src = "_rows" if fn == "count" else key
        arr = merged[src]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if fn in ("count", "nn"):
            arr = arr.cast(pa.int64())
        elif fn in ("min", "max"):
            t = schema[col]
            it = _int_physical(t)
            if it is not None:
                arr = arr.cast(it).cast(t)
        elif fn == "sum" and pa.types.is_decimal(arr.type):
            arr = arr.cast(pa.int64())  # raises on overflow — never wraps
        cols[key] = arr
    return pa.table(cols)


def _merge_group_partials(partials: list[pa.Table], group_by, aggs) -> pa.Table:
    """Final driver fold: ONE Arrow group_by over the concatenated partials.
    count/nn/sum re-sum (decimal sums stay exact), min/max re-min/max."""
    all_p = pa.concat_tables(partials)
    specs: list[tuple] = [("_rows", "sum")]
    renames = {"_rows_sum": "_rows"}
    for fn, col in aggs:
        if fn == "count":
            continue
        key = f"{fn}_{col}"
        afn = {"nn": "sum", "sum": "sum", "min": "min", "max": "max"}[fn]
        specs.append((key, afn))
        renames[f"{key}_{afn}"] = key
    res = all_p.group_by([f"g_{c}" for c in group_by]).aggregate(specs)
    return res.rename_columns([renames.get(n, n) for n in res.column_names])


def _validate(group_by, aggs, clauses, schema):
    if not group_by:
        raise ValueError("store_agg_group needs at least one group column")
    for c in group_by:
        if c not in schema:
            raise ValueError(f"group column {c!r} not in store schema {sorted(schema)}")
        _group_physical(schema[c])  # raises on ungroupable types
    for _, col in aggs:
        if col is not None and col not in schema:
            raise ValueError(f"aggregate column {col!r} not in store schema {sorted(schema)}")
    for col, _, _ in clauses:
        if col not in schema:
            raise ValueError(f"predicate column {col!r} not in store schema {sorted(schema)}")
    for fn, col in aggs:
        if fn == "sum" and not (
            pa.types.is_integer(schema[col]) or pa.types.is_floating(schema[col])
        ):
            raise ValueError(f"sum over non-numeric column {col!r} ({schema[col]})")


def _plan_group_meta(out_dir, recs, group_by, aggs, dnf, schema, meta_rows, plan):
    """Driver-side three-class split for one store (manifest JSON only):
    pruned / metadata-answered (one partial row appended) / to-scan paths."""
    from .decode import resolve_container_path

    scan_paths: list[str] = []
    for r in recs:
        st = r.get("stats") or {}
        rows = int(r.get("rows", 0))
        if dnf and st and not any(record_may_match(st, rows, br) for br in dnf):
            plan["pruned"] += 1
            continue
        full = (not dnf) or (st and any(record_all_match(st, rows, br) for br in dnf))
        row = _meta_group_row(r, group_by, aggs, schema) if full else None
        if row is not None:
            meta_rows.append(row)
            plan["meta_answered"] += 1
        else:
            scan_paths.append(resolve_container_path(out_dir, r))
    plan["scanned"] = len(scan_paths)
    return scan_paths


def _probe_group_paths(scan_paths, dnf, plan):
    if not scan_paths or not dnf or not _probe_applies(dnf):
        return scan_paths
    verdicts = probe_verdicts(scan_paths, dnf)
    plan["pruned_dict"] = sum(1 for v in verdicts.values() if v == "dict")
    plan["pruned_bloom"] = sum(1 for v in verdicts.values() if v == "bloom")
    kept = [p for p in scan_paths if verdicts.get(p) == "keep"]
    plan["scanned"] = len(kept)
    return kept


def _attach_group_avgs(tbl: pa.Table, group_by, requested) -> pa.Table:
    """Output columns in the REQUESTED order with ``avg_{col} = sum/nn``
    (NULL over zero non-null rows); synthetic sum/nn columns the caller did
    not ask for are dropped."""
    cols: dict[str, pa.Array] = {c: tbl[c] for c in group_by}
    for fn, col in requested:
        key = fn if col is None else f"{fn}_{col}"
        if fn == "avg":
            s = tbl[f"sum_{col}"]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            nn = tbl[f"nn_{col}"]
            if isinstance(nn, pa.ChunkedArray):
                nn = nn.combine_chunks()
            avg = pc.divide(s.cast(pa.float64()), nn.cast(pa.float64()))
            cols[key] = pc.if_else(pc.equal(nn, 0), pa.scalar(None, pa.float64()), avg)
        else:
            cols[key] = tbl[key]
    return pa.table(cols)


def store_agg_group(
    out_dir: str,
    group_by,
    aggs,
    predicate=None,
    *,
    verify_crc: bool = False,
    return_plan: bool = False,
    max_partial_rows: int = 2_000_000,
) -> pa.Table | tuple[pa.Table, dict]:
    """GROUP BY aggregate over an encoded store (module docstring has the
    plan semantics). Returns a pyarrow Table with the group columns (logical
    types) plus one column per aggregate, named ``count`` / ``{fn}_{col}``;
    group order is unspecified (sort on the result if you need one)."""
    from . import manifest as mf
    from .decode import container_files

    group_by = list(group_by)
    requested = list(dict.fromkeys(_normalize_aggs(aggs)))
    aggs, _ = _expand_avg(requested)
    dnf = _normalize_dnf(predicate) if predicate else []
    clauses = [cl for br in dnf for cl in br]
    recs = mf.load_records(out_dir)
    if not recs:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    container_files(out_dir)  # stray-container guard (same as scan_store)
    schema = dict(_store_schema(out_dir, recs))
    _validate(group_by, aggs, clauses, schema)

    plan = {"parts_total": len(recs), "pruned": 0, "meta_answered": 0, "scanned": 0}
    meta_rows: list[dict] = []
    scan_paths = _plan_group_meta(out_dir, recs, group_by, aggs, dnf, schema, meta_rows, plan)
    scan_paths = _probe_group_paths(scan_paths, dnf, plan)

    pschema = _partial_schema(group_by, aggs, schema)
    partials: list[pa.Table] = []
    if meta_rows:
        partials.append(
            pa.Table.from_pylist(meta_rows, schema=pschema)
        )
    if scan_paths:
        partials.extend(
            _scan_group_partials(
                scan_paths, group_by, aggs, schema, dnf, clauses, verify_crc,
                max_partial_rows,
            )
        )
    if not partials:
        partials = [pschema.empty_table()]
    merged = _merge_group_partials(partials, group_by, aggs)
    result = _attach_group_avgs(
        _finalize_group(merged, group_by, aggs, schema), group_by, requested
    )
    return (result, plan) if return_plan else result


def store_agg_group_multi(
    dirs,
    group_by,
    aggs,
    predicate=None,
    *,
    verify_crc: bool = False,
    return_plan: bool = False,
    max_partial_rows: int = 2_000_000,
) -> pa.Table | tuple[pa.Table, dict]:
    """GROUP BY aggregate over a store FAMILY: grouped partials are additive
    across members exactly like the scalar folds, so the family answer is
    one shared partial pool — per-member driver-side three-class splits, ONE
    batched footer-probe job, ONE scan job over every member's remainder,
    one driver fold. Group / aggregate / predicate columns must carry the
    same type in every member (refused loudly with per-store detail —
    ``compact_family`` conforms)."""
    from . import manifest as mf
    from .decode import container_files

    if not dirs:
        raise ValueError("store_agg_group_multi needs at least one store directory")
    group_by = list(group_by)
    requested = list(dict.fromkeys(_normalize_aggs(aggs)))
    aggs, _ = _expand_avg(requested)
    dnf = _normalize_dnf(predicate) if predicate else []
    clauses = [cl for br in dnf for cl in br]
    need = sorted(
        set(group_by)
        | {c for _, c in aggs if c is not None}
        | {c for br in dnf for c, _, _ in br}
    )
    member_recs = []
    typed = []
    schema0: dict = {}
    for d in dirs:
        recs = mf.load_records(d)
        if not recs:
            raise FileNotFoundError(f"no manifest records under {d}")
        container_files(d)
        schema = dict(_store_schema(d, recs))
        if not schema0:
            schema0 = schema
        member_recs.append(recs)
        typed.append({c: schema.get(c) for c in need})
    if any(t != typed[0] for t in typed[1:]):
        detail = "; ".join(
            f"{d}: {{{', '.join(f'{c}: {t}' for c, t in tt.items())}}}"
            for d, tt in zip(dirs, typed)
        )
        raise ValueError(
            "family members disagree on group/aggregate/predicate column "
            f"types — conform them via compact_family first: {detail}"
        )
    if any(t is None for t in typed[0].values()):
        missing = [c for c, t in typed[0].items() if t is None]
        raise ValueError(f"columns {missing} not in store schema {sorted(schema0)}")
    _validate(group_by, aggs, clauses, schema0)

    merged_plan = {
        "parts_total": 0, "pruned": 0, "meta_answered": 0, "scanned": 0, "stores": {},
    }
    meta_rows: list[dict] = []
    all_paths: list[str] = []
    for d, recs in zip(dirs, member_recs):
        plan = {"parts_total": len(recs), "pruned": 0, "meta_answered": 0, "scanned": 0}
        all_paths.extend(
            _plan_group_meta(d, recs, group_by, aggs, dnf, schema0, meta_rows, plan)
        )
        for k in ("parts_total", "pruned", "meta_answered", "scanned"):
            merged_plan[k] += plan[k]
        merged_plan["stores"][d] = plan
    all_paths = _probe_group_paths(all_paths, dnf, merged_plan)

    pschema = _partial_schema(group_by, aggs, schema0)
    partials: list[pa.Table] = []
    if meta_rows:
        partials.append(pa.Table.from_pylist(meta_rows, schema=pschema))
    if all_paths:
        partials.extend(
            _scan_group_partials(
                all_paths, group_by, aggs, schema0, dnf, clauses, verify_crc,
                max_partial_rows,
            )
        )
    if not partials:
        partials = [pschema.empty_table()]
    merged = _merge_group_partials(partials, group_by, aggs)
    result = _attach_group_avgs(
        _finalize_group(merged, group_by, aggs, schema0), group_by, requested
    )
    return (result, merged_plan) if return_plan else result

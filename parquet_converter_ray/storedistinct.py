"""DISTINCT pushdown over encoded stores.

``store_distinct`` answers ``SELECT DISTINCT col FROM store [WHERE pred]``
with a four-class container plan — the dictionary codec makes most of a
low-cardinality DISTINCT a metadata question:

* **pruned** — no DNF branch may match (zone maps): skipped.
* **metadata-answered** — manifest JSON alone: an all-null column
  contributes ``{NULL}``; a provably single-valued column (zone-map
  ``min == max``, exact bounds, no NaN) contributes ``{min}`` (plus NULL
  when nulls > 0). Requires every row to provably match the predicate
  (``record_all_match`` — rows failing the predicate must not donate their
  value).
* **footer-answered** — the column is dict-encoded with zero nulls in a
  fully-matching container: its dictionary values ARE the exact distinct
  set (string dicts via ``pc.dictionary_encode`` hold exactly the observed
  values; numeric dicts are ``np.unique`` over the data). One Ray job of
  KB-ranged footer + dictionary-buffer reads over all such containers —
  code/data buffers are never touched. Containers WITH nulls refuse this
  class: encode fills nulls with a type default before building the
  dictionary, so the default's membership in the real data is unknowable
  from the dictionary alone (``codecs.encode_array``).
* **scanned** — everything else (free-text codecs, null-bearing dict
  containers, partially-matching containers) runs the membership footer
  probe (``storeagg._probe_scan_paths``) and then ONE distributed job of
  pruned, late-materialized decode of only the target + predicate columns
  with a per-block ``pc.unique`` partial.

Values travel in the zone maps' physical domain (int64 for int/timestamp/
date/bool, float64 for floats, utf8 for strings) so metadata singles,
dictionary buffers and scan partials fold identically; the driver fold is
one ``pc.unique`` over the concatenated partials (floats fold through
numpy with explicit NaN unification — SQL DISTINCT treats all NaNs as one
value). ``max_values`` guards the driver-fold contract LOUDLY (DISTINCT
over a unique key belongs in a distributed exchange, not here).

The reference engine re-reads whole tables for ``n_unique`` / uniqueness
questions (reference analyzer.py); Parquet engines answer DISTINCT from
dictionary pages when row groups are fully dictionary-encoded — this is
that public idea over this container format's footers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .storeagg import _probe_scan_paths, record_all_match
from .storegroup import _group_physical, _to_physical
from .zonemap import (
    _int_physical,
    _normalize_dnf,
    _ScanDecoder,
    _store_schema,
    container_dict_values,
    record_may_match,
)

DEFAULT_MAX_VALUES = 2_000_000


class _DistinctPartial:
    """Per-block distinct partial: one ``pc.unique`` over the decoder's
    filtered output, in the fixed physical domain. Nulls survive as a null
    row (Arrow ``unique`` keeps one); float NaNs are dropped here and
    re-added as ONE row so no partial ever carries more than one NaN."""

    def __init__(self, col: str, t: pa.DataType, physical: pa.DataType):
        self.col = col
        self.t = t
        self.physical = physical

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = _to_physical(batch[self.col], self.t, self.physical)
        u = pc.unique(arr)
        if pa.types.is_floating(self.physical):
            had_null = u.null_count > 0
            v = u.drop_null().to_numpy(zero_copy_only=False)
            vals = v[~np.isnan(v)]
            if len(vals) != len(v):  # one NaN row stands for all NaNs
                vals = np.append(vals, np.nan)
            u = pa.array(vals, type=self.physical)
            if had_null:
                u = pa.concat_arrays([u, pa.array([None], type=self.physical)])
        return pa.table({"v": u.cast(self.physical)})


def _meta_distinct(rec: dict, col: str, t: pa.DataType) -> "list | None":
    """Distinct contribution of one fully-matching container from manifest
    stats alone, or None when the metadata can't prove the exact set.
    Values in the physical domain; Python ``None`` stands for SQL NULL."""
    st = (rec.get("stats") or {}).get(col)
    rows = int(rec.get("rows", 0))
    if rows == 0:
        return []
    if st is None:
        return None
    nulls = int(st.get("nulls", 0))
    if nulls == rows:
        return [None]
    if st.get("approx"):
        return None  # truncated string bounds: min==max proves nothing
    if pa.types.is_floating(t):
        if st.get("nan") or "nan" not in st:
            return None  # NaN rows live beyond the bounds (or unknowably so)
    mn, mx = st.get("min"), st.get("max")
    if mn is None or mn != mx:
        return None
    return [mn, None] if nulls else [mn]


def _footer_distinct_job(paths: "list[str]", col: str, physical: pa.DataType):
    """ONE Ray job: ranged dictionary-value reads for ``col`` over every
    footer-class container (family callers batch all members). Returns
    ``{path: list-of-physical-values | None}`` — None when the footer
    disagrees with the manifest plan (codec drift, unexpected nulls) and
    the container must scan instead."""
    import ray.data

    from .container import read_footer_file

    def _one(batch: pa.Table) -> pa.Table:
        out_p, out_v = [], []
        for p in batch["path"].to_pylist():
            footer = read_footer_file(p)
            ent = next((c for c in footer["columns"] if c["name"] == col), None)
            vals = None
            if ent is not None and ent["codec"] == "dict" and not ent["null_count"]:
                dv = container_dict_values(p, ent)
                if dv is not None:
                    if isinstance(dv, np.ndarray):
                        if pa.types.is_floating(physical):
                            vals = pa.array(
                                dv.astype(np.float64, copy=False), type=physical
                            )
                        else:
                            vals = pa.array(
                                dv.astype(np.int64, copy=False), type=physical
                            )
                    else:
                        vals = dv.cast(physical) if dv.type != physical else dv
            out_p.append(p)
            out_v.append(vals.to_pylist() if vals is not None else None)
        return pa.table(
            {
                "path": pa.array(out_p, type=pa.string()),
                "vals": pa.array(out_v, type=pa.list_(physical)),
            }
        )

    pds = ray.data.from_items([{"path": p} for p in paths])
    out: dict = {}
    for r in pds.map_batches(_one, batch_format="pyarrow").take_all():
        out[r["path"]] = r["vals"]
    return out


def _scan_distinct_partials(scan_paths, col, t, physical, dnf, clauses, verify_crc):
    """ONE distributed job: pruned decode + per-block unique partials.
    Store-agnostic, so the family variant batches every member's paths."""
    import ray.data

    pred_cols = [c for c, _, _ in clauses]
    read_cols = list(dict.fromkeys([col] + pred_cols))
    ds = ray.data.read_binary_files(scan_paths)
    ds = ds.map_batches(
        _ScanDecoder(read_cols, [col], dnf, verify_crc),
        batch_format="pyarrow",
        batch_size=1,
    ).map_batches(
        _DistinctPartial(col, t, physical), batch_format="pyarrow", batch_size=None
    )
    return [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]


def _fold_distinct(
    chunks: "list[pa.Array]", singles: "list", physical: pa.DataType, max_values: int
) -> "tuple[pa.Array, bool]":
    """Driver fold: ONE unique over every partial source. Returns the
    distinct non-null physical values plus a null-present flag."""
    had_null = any(v is None for v in singles)
    arrs = list(chunks)
    sv = [v for v in singles if v is not None]
    if sv:
        arrs.append(pa.array(sv, type=physical))
    total = sum(len(a) for a in arrs)
    if total > max_values:
        raise ValueError(
            f"distinct partials hold {total} values > max_values={max_values} — "
            "this column's cardinality is beyond the driver-fold contract; "
            "use decode_dataset(...).unique(col) (distributed exchange) or "
            "raise max_values"
        )
    if not arrs:
        return pa.array([], type=physical), had_null
    cat = pa.chunked_array(arrs, type=physical).combine_chunks()
    had_null = had_null or cat.null_count > 0
    u = pc.unique(cat.drop_null())
    if pa.types.is_floating(physical):
        v = u.to_numpy(zero_copy_only=False)
        nan = bool(np.isnan(v).any())
        vals = np.unique(v[~np.isnan(v)])
        if nan:
            vals = np.append(vals, np.nan)
        u = pa.array(vals, type=physical)
    return u, had_null


def _finalize_distinct(
    u: pa.Array, had_null: bool, col: str, t: pa.DataType
) -> pa.Table:
    """Leave the physical domain: cast back to the logical column type,
    sort ascending with NULL (if present) last."""
    it = _int_physical(t)
    if it is not None and u.type == pa.int64():
        u = u.cast(it).cast(t)
    elif u.type != t:
        u = u.cast(t)
    u = u.take(pc.sort_indices(u))
    if had_null:
        u = pa.concat_arrays([u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u,
                              pa.array([None], type=t)])
    return pa.table({col: u})


def _plan_distinct(out_dir, recs, col, t, dnf):
    """Driver-side four-class split of one store's containers from manifest
    JSON: pruned / metadata-answered (values returned) / footer-class paths
    / scan-class paths."""
    from .decode import resolve_container_path

    plan = {"parts_total": len(recs), "pruned": 0, "meta_answered": 0,
            "footer_answered": 0, "scanned": 0}
    singles: list = []
    footer_paths: list[str] = []
    scan_paths: list[str] = []
    for r in recs:
        st = r.get("stats") or {}
        rows = int(r.get("rows", 0))
        if dnf and st and not any(record_may_match(st, rows, br) for br in dnf):
            plan["pruned"] += 1
            continue
        full = (not dnf) or (st and any(record_all_match(st, rows, br) for br in dnf))
        if full:
            mv = _meta_distinct(r, col, t)
            if mv is not None:
                singles.extend(mv)
                plan["meta_answered"] += 1
                continue
            ent = st.get(col) or {}
            if (r.get("codecs") or {}).get(col) == "dict" and not int(ent.get("nulls", 1) or 0):
                footer_paths.append(resolve_container_path(out_dir, r))
                continue  # counted once the footer job confirms
        scan_paths.append(resolve_container_path(out_dir, r))
    return plan, singles, footer_paths, scan_paths


def store_distinct(
    out_dir: str,
    col: str,
    predicate=None,
    *,
    verify_crc: bool = False,
    return_plan: bool = False,
    max_values: int = DEFAULT_MAX_VALUES,
):
    """DISTINCT values of one store column, answered from manifest stats and
    dictionary footers wherever sound and scanning only the remainder.
    Returns a one-column ``pa.Table`` (logical type, sorted, NULL last);
    ``return_plan=True`` also returns the container-class counters."""
    return store_distinct_multi(
        [out_dir],
        col,
        predicate,
        verify_crc=verify_crc,
        return_plan=return_plan,
        max_values=max_values,
    )


def store_distinct_multi(
    dirs,
    col: str,
    predicate=None,
    *,
    verify_crc: bool = False,
    return_plan: bool = False,
    max_values: int = DEFAULT_MAX_VALUES,
):
    """DISTINCT over a FAMILY of stores as one logical table. Distinct is a
    set union, so per-member partials fold exactly; the column must carry
    the SAME type in every member (refused loudly). Scale shape: the class
    split is driver-side manifest JSON per member; the footer job and the
    scan job each batch EVERY member's containers into one Ray job."""
    from . import manifest as mf
    from .decode import container_files

    if not dirs:
        raise ValueError("store_distinct_multi needs at least one store directory")
    dnf = _normalize_dnf(predicate) if predicate else []
    clauses = [cl for br in dnf for cl in br]
    member_recs = []
    types = []
    schema0: dict = {}
    for d in dirs:
        recs = mf.load_records(d)
        if not recs:
            raise FileNotFoundError(f"no manifest records under {d}")
        container_files(d)  # stray-container guard (same as scan_store)
        schema = dict(_store_schema(d, recs))
        if not schema0:
            schema0 = schema
        if col not in schema:
            raise ValueError(f"column {col!r} not in store schema {sorted(schema)}")
        for c, _, _ in clauses:
            if c not in schema:
                raise ValueError(f"predicate column {c!r} not in store schema {sorted(schema)}")
        member_recs.append(recs)
        types.append(schema[col])
    if any(t != types[0] for t in types[1:]):
        detail = "; ".join(f"{d}: {t}" for d, t in zip(dirs, types))
        raise ValueError(
            f"family members disagree on {col!r}'s type — conform them via "
            f"compact_family first: {detail}"
        )
    t = types[0]
    physical = _group_physical(t)  # raises for unsupported (binary) columns

    merged = {"parts_total": 0, "pruned": 0, "meta_answered": 0,
              "footer_answered": 0, "scanned": 0, "stores": {}}
    singles: list = []
    footer_paths: list[str] = []
    scan_paths: list[str] = []
    plans = []
    for d, recs in zip(dirs, member_recs):
        plan, sv, fp, sp = _plan_distinct(d, recs, col, t, dnf)
        singles.extend(sv)
        footer_paths.extend(fp)
        scan_paths.extend(sp)
        plans.append((d, plan, fp))
        for k in ("parts_total", "pruned", "meta_answered"):
            merged[k] += plan[k]

    # ONE footer job over every member's dict-class containers
    chunks: list[pa.Array] = []
    if footer_paths:
        fv = _footer_distinct_job(footer_paths, col, physical)
        for p in footer_paths:
            vals = fv.get(p)
            if vals is None:
                scan_paths.append(p)  # codec drift: fall through to the scan
            else:
                chunks.append(pa.array(vals, type=physical))
        merged["footer_answered"] = sum(1 for p in footer_paths if fv.get(p) is not None)
        for d, plan, fp in plans:
            plan["footer_answered"] = sum(1 for p in fp if fv.get(p) is not None)
            plan["scanned"] = plan["parts_total"] - plan["pruned"] - \
                plan["meta_answered"] - plan["footer_answered"]
    else:
        for d, plan, fp in plans:
            plan["scanned"] = plan["parts_total"] - plan["pruned"] - plan["meta_answered"]
    for d, plan, _ in plans:
        merged["stores"][d] = plan

    # footer probe (dict + Bloom membership pruning) then ONE scan job
    scan_paths = _probe_scan_paths(scan_paths, dnf, merged)
    merged["scanned"] = len(scan_paths)
    if scan_paths:
        partials = _scan_distinct_partials(
            scan_paths, col, t, physical, dnf, clauses, verify_crc
        )
        for p in partials:
            arr = p["v"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            chunks.append(arr.cast(physical))

    u, had_null = _fold_distinct(chunks, singles, physical, max_values)
    out = _finalize_distinct(u, had_null, col, t)
    merged["n_values"] = out.num_rows
    return (out, merged) if return_plan else out


def store_approx_distinct(
    dirs,
    col: str,
    predicate=None,
    *,
    verify_crc: bool = False,
    return_plan: bool = False,
):
    """APPROXIMATE distinct count over an encoded store (or a family passed
    as a list) — the at-scale dual of ``store_distinct``'s driver-bounded
    exact fold: the zone-map/footer-probe pruned scan feeds
    ``profile.approx_distinct``'s HyperLogLog partials (one fixed 4 KB
    register array per block, elementwise-max merge — driver state never
    grows with cardinality, so a unique-key column over any store size is
    fine here and loudly refused in the exact path). ~1% typical error
    (accuracy pytest-pinned in tests/test_profile.py for the sketch)."""
    from .profile import approx_distinct
    from .zonemap import scan_store, scan_store_multi

    if isinstance(dirs, str):
        dirs = [dirs]
    if len(dirs) == 1:
        ds, plan = scan_store(dirs[0], predicate or [], columns=[col],
                              verify_crc=verify_crc, return_plan=True)
    else:
        ds, plan = scan_store_multi(dirs, predicate or [], columns=[col],
                                    verify_crc=verify_crc, return_plan=True)
    n = approx_distinct(ds, col)
    return (n, plan) if return_plan else n

"""Zone maps: per-column min/max/null statistics captured at encode time.

Every partition's container footer and lineage record gain a ``stats`` map
(``column -> {min, max, nulls, t[, approx]}``), computed once on the sorted
partition table right before packing. They power two at-scale features:

* ``store_profile`` — profile a store from MANIFEST METADATA ONLY: global
  per-column bounds, null counts, codec mix, rows/bytes/ratio. Kilobytes of
  JSON reads regardless of store size (the 100 TB answer to "what is in
  here?" — no container is opened).
* ``scan_store`` — predicate-pushdown reads. Containers whose zone map
  proves no row can match are never opened; for ``==`` / ``in`` predicates
  on dict-encoded columns a second-level probe reads ONLY the dictionary
  buffers (footer tail seek + ranged reads, a few KB) and drops containers
  whose dictionary lacks the value — all before a single data buffer is
  decoded. Survivors stream through the normal pruned decode with the exact
  filter applied batch-wise — and with LATE MATERIALIZATION: predicate
  columns decode first, and when few rows match, the remaining columns are
  decoded at the matching rows only (``codecs.decode_array_rows`` — selective
  bit-field extraction, RLE run probes, dict code gathers, FSST slab
  skipping per the FSST paper's random-access design).

The design follows Parquet's row-group statistics (public format spec) at
container granularity; string bounds use the standard truncate-and-increment
trick so they stay conservative. The reference engine has no analogue — it
always rewrites and rereads whole files (reference converter.py, analyzer.py
read full tables for every question).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import str_to_type, type_to_str
from .codecs.strings import dec_plain_s
from .codecs.util import unwrap_buf

STR_BOUND_LEN = 64  # string zone-map bounds are truncated to this many chars

_OPS = ("==", "!=", "<", "<=", ">", ">=", "in", "between", "prefix", "hastok",
        "hasphrase", "hasany")


# --- bound helpers -----------------------------------------------------------


def _trunc_min(s: str) -> tuple[str, bool]:
    """Lower bound for a string: a prefix is always <= the full string."""
    if len(s) <= STR_BOUND_LEN:
        return s, False
    return s[:STR_BOUND_LEN], True


def _trunc_max(s: str) -> tuple[str | None, bool]:
    """Upper bound for a truncated string: increment the last code point of
    the prefix (skipping the surrogate gap). Returns (None, True) in the
    degenerate all-U+10FFFF case — an unbounded maximum."""
    if len(s) <= STR_BOUND_LEN:
        return s, False
    p = s[:STR_BOUND_LEN]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            nc = c + 1
            if 0xD800 <= nc <= 0xDFFF:
                nc = 0xE000
            return p[:i] + chr(nc), True
    return None, True


def _prefix_upper(p: str) -> "str | None":
    """Exclusive upper bound of the string interval with prefix ``p``:
    increment the last incrementable code point (skipping the surrogate
    gap); None in the degenerate all-U+10FFFF case (unbounded above)."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            nc = c + 1
            if 0xD800 <= nc <= 0xDFFF:
                nc = 0xE000
            return p[:i] + chr(nc)
    return None


def _is_strlike(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _int_physical(t: pa.DataType) -> pa.DataType | None:
    """Integer view type for ordered non-float scalars (None = not integral)."""
    if pa.types.is_boolean(t) or pa.types.is_date32(t):
        return pa.int32()
    if pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date64(t):
        return pa.int64()
    return None


def exact_int_sum(col: "pa.Array | pa.ChunkedArray") -> int:
    """Exact (arbitrary-precision) sum of a null-free int64 array.

    ``pc.sum``/``np.sum`` wrap silently past int64; splitting each value into
    its high/low 32-bit halves (two's-complement identity
    ``v == (v >> 32) << 32 | (v & 0xFFFFFFFF)``) keeps every partial sum
    within int64 for up to 2^31 rows per slice, and slicing bounds it for
    any length. Python ints carry the recombination exactly."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False)
    total = 0
    step = 1 << 30
    for i in range(0, v.size, step):
        s = v[i : i + step]
        hi = int((s >> 32).sum(dtype=np.int64))
        lo = int((s & 0xFFFFFFFF).sum(dtype=np.int64))
        total += (hi << 32) + lo
    return total


def column_stats(
    table: pa.Table,
    codecs: dict[str, str] | None = None,
    bound_cols: "set[str] | frozenset[str] | None" = None,
) -> dict[str, dict]:
    """Per-column zone-map entries for one partition table.

    Numeric / timestamp / date / bool columns always get bounds (SIMD
    ``min_max``, integer domain stored for exact JSON round-trips; floats via
    ``nanmin`` so NaN rows — which never satisfy a comparison — don't poison
    the bounds). String columns get bounds only when dict-encoded: free text
    (fsst/plain) has useless bounds at real scale and ``min_max`` over it
    would rescan the heaviest payload. ``bound_cols`` overrides that gate —
    a range-cluster string column is range-bounded per partition BY LAYOUT,
    so its bounds are the whole point and get recorded whatever its codec.
    Binary columns record nulls only.
    """
    bound_cols = bound_cols or frozenset()
    out: dict[str, dict] = {}
    for name in table.column_names:
        col = table.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        ent: dict = {"nulls": int(col.null_count), "t": type_to_str(t)}
        mn = mx = None
        if len(col) > col.null_count:
            it = _int_physical(t)
            if it is not None:
                mm = pc.min_max(col.cast(it))
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                if pa.types.is_integer(t):
                    # exact container SUM (hi/lo-split accumulation, never
                    # overflows): metadata-only sum aggregates (storeagg.py)
                    ent["sum"] = exact_int_sum(col.drop_null().cast(pa.int64()))
            elif pa.types.is_floating(t):
                # nulls surface as NaN in the numpy view, so real NaNs are
                # the isnan excess over null_count. NaN is a VALUE, not a
                # null: it fails every comparison predicate and poisons sums
                # — record its presence so the metadata layer (storeagg.py)
                # knows when bounds don't cover all rows
                v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                ent["nan"] = int(np.isnan(v).sum()) - int(col.null_count)
                with np.errstate(invalid="ignore"):
                    lo, hi = np.nanmin(v), np.nanmax(v)
                if not np.isnan(lo):
                    mn, mx = float(lo), float(hi)
                if ent["nan"] == 0:
                    s = float(np.nansum(v))  # nansum skips nulls-as-NaN
                    if np.isfinite(s):
                        ent["sum"] = s
            elif _is_strlike(t) and (codecs is None or codecs.get(name) == "dict" or name in bound_cols):
                mm = pc.min_max(col)
                mn, lo_approx = _trunc_min(mm["min"].as_py())
                mx, hi_approx = _trunc_max(mm["max"].as_py())
                if lo_approx or hi_approx:
                    ent["approx"] = True
        ent["min"], ent["max"] = mn, mx
        out[name] = ent
    return out


PAGE_ROWS = 65_536  # page-stat granularity inside one container


def page_stats(table: pa.Table, rows_per_page: int = PAGE_ROWS) -> dict | None:
    """Per-PAGE min/max for numeric / temporal / bool columns of one sorted
    partition table — the container-footer analogue of Parquet's page index
    (public format spec). ``scan_store`` uses them to prune ROW RANGES inside
    a candidate container on predicates over NON-lead columns, where the
    sorted-lead binary search can't help.

    Values live in the same physical domain the partition zone maps use
    (ints for int/bool/timestamp/date via ``_int_physical``, float64 for
    floats) so the same ``_coerce`` applies. Columns with nulls are skipped
    (a page's nulls would poison its bounds; skipping only costs pruning);
    all-NaN float pages record None (= may match anything). Strings/binary
    are skipped — per-page ``min_max`` over the heaviest payload at encode
    time is the wrong trade. Returns None when the table fits in one page."""
    n = table.num_rows
    if n <= rows_per_page:
        return None
    starts = np.arange(0, n, rows_per_page, dtype=np.int64)
    cols: dict[str, dict] = {}
    for name in table.column_names:
        col = table.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            continue
        t = col.type
        it = _int_physical(t)
        if it is not None:
            v = col.cast(it).to_numpy(zero_copy_only=False)
            mins = np.minimum.reduceat(v, starts)
            maxs = np.maximum.reduceat(v, starts)
            cols[name] = {
                "t": type_to_str(t),
                "min": [int(x) for x in mins],
                "max": [int(x) for x in maxs],
            }
        elif pa.types.is_floating(t):
            v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            with np.errstate(invalid="ignore"):
                mins = np.minimum.reduceat(v, starts)
                maxs = np.maximum.reduceat(v, starts)
                # NaN sorts into pages arbitrarily and poisons reduceat; a
                # page containing any NaN degrades to "no info"
                bad = np.isnan(mins) | np.isnan(maxs)
            cols[name] = {
                "t": type_to_str(t),
                "min": [None if b else float(x) for b, x in zip(bad, mins)],
                "max": [None if b else float(x) for b, x in zip(bad, maxs)],
            }
    if not cols:
        return None
    return {"rows_per_page": int(rows_per_page), "cols": cols}


def page_candidate_mask(pages: dict, n: int, clauses) -> "np.ndarray | None":
    """Boolean may-match mask over a container's pages for the conjunction —
    False ONLY for pages provably free of matches. None when no clause column
    has page stats (nothing to prune on)."""
    info = pages.get("cols") or {}
    B = int(pages["rows_per_page"])
    npages = (n + B - 1) // B
    mask = np.ones(npages, dtype=bool)
    used = False
    for col, op, val in clauses:
        st = info.get(col)
        if st is None or len(st["min"]) != npages:
            continue
        isf = "float" in st["t"] or "double" in st["t"] or "halffloat" in st["t"]
        lo_fill, hi_fill = (-np.inf, np.inf) if isf else (-(2**63), 2**63 - 1)
        mins = np.array([lo_fill if m is None else m for m in st["min"]],
                        dtype=np.float64 if isf else np.int64)
        maxs = np.array([hi_fill if m is None else m for m in st["max"]],
                        dtype=np.float64 if isf else np.int64)
        try:
            if op == "in":
                vs = [_coerce(v, st["t"]) for v in val]
            elif op == "between":
                vs = [_coerce(val[0], st["t"]), _coerce(val[1], st["t"])]
            else:
                vs = [_coerce(val, st["t"])]
        except (TypeError, ValueError, pa.ArrowInvalid, pa.ArrowTypeError):
            continue
        if op == "==":
            m = (mins <= vs[0]) & (maxs >= vs[0])
        elif op == "<":
            m = mins < vs[0]
        elif op == "<=":
            m = mins <= vs[0]
        elif op == ">":
            m = maxs > vs[0]
        elif op == ">=":
            m = maxs >= vs[0]
        elif op == "between":
            m = (mins <= vs[1]) & (maxs >= vs[0])
        elif op == "in":
            m = np.zeros(npages, dtype=bool)
            for v in vs:
                m |= (mins <= v) & (maxs >= v)
        else:  # "!=" can't prune a page
            continue
        mask &= m
        used = True
    return mask if used else None


# --- predicates ---------------------------------------------------------------


def _hash_route_parts(out_dir: str, recs: list[dict], clauses) -> "set[int] | None":
    """Pruning level 0: ``==`` / ``in`` on the PARTITION column routes by
    hash, not by statistics — ``part_id`` is a pure function of (conv hash,
    salt chunk) recorded in ``_run.json``, the same arithmetic
    ``lookup_conversation`` uses. For salted stores the reachable salt-chunk
    range is bounded driver-side by the ORDER column's zone-map maximum
    (chunk k only exists if some row has order >= k*salt_rows); if any
    record predates zone maps, routing degrades to None (scan everything) —
    never unsound. Returns the candidate part_id set, or None when the
    predicate doesn't constrain the partition column."""
    import numpy as np

    from . import manifest as mf
    from .partition import HASH_VERSION, hash_conv_values

    params = mf.load_run_record(out_dir)
    if not params or params.get("hash_version") != HASH_VERSION:
        return None
    if (params.get("partition_mode") or "hash") != "hash":
        # range-clustered store: part_id is not a hash of the conv key; the
        # zone maps (level 1) carry the pruning instead
        return None
    conv_col = params.get("conv_col")
    vals = None
    for col, op, val in clauses:
        if col == conv_col and op in ("==", "in"):
            vals = val if op == "in" else [val]
            break
    if vals is None:
        return None
    n_parts = int(params["n_parts"])
    salt_rows = int(params.get("salt_rows") or 0)
    order_col = params.get("order_col")
    salted = bool(salt_rows) and order_col is not None
    if salted:
        k_max = mf.order_chunk_bound(recs, order_col, salt_rows)
        if k_max is None:
            return None  # pre-zonemap container: chunk bound unknowable
    else:
        k_max = 0

    # per-type dispatch mirrors encode-time hashing (str(b'x') would hash the
    # repr, not the payload, and prune the CORRECT partitions — unsound)
    hashes = hash_conv_values(list(vals))
    if hashes is None:
        return None  # unexpected key type: degrade to a full scan, never unsound
    from .decode import _part_for

    return {
        _part_for(np.uint64(h), k if salted else 0, n_parts)
        for h in hashes
        for k in range(k_max + 1)
    }


def _normalize_dnf(predicate) -> list[list[tuple[str, str, object]]]:
    """Normalize a predicate into DNF: a list of OR-branches, each branch a
    conjunct list. Accepted forms: a plain conjunct list (one branch — the
    classic AND form every caller uses), or ``("or", [branch, ...])`` /
    ``{"or": [branch, ...]}`` where each branch is a conjunct list. A
    disjunction prunes a container only when EVERY branch proves no-match —
    exactly how Parquet/Iceberg expression pruning treats OR."""
    branches = None
    if isinstance(predicate, dict) and set(predicate) == {"or"}:
        branches = predicate["or"]
    elif (
        isinstance(predicate, tuple)
        and len(predicate) == 2
        and predicate[0] == "or"
    ):
        branches = predicate[1]
    if branches is None:
        return [_normalize(predicate)]
    out = [_normalize(b) for b in branches]
    if not out or any(not b for b in out):
        raise ValueError("'or' predicate needs at least one non-empty branch")
    return out


def _as_dnf(clauses) -> list[list[tuple[str, str, object]]]:
    """Internal: clause input that may already be normalized — either a flat
    conjunct list or a DNF list-of-branches — to the DNF form."""
    if not clauses:
        return []
    return clauses if isinstance(clauses[0], list) else [clauses]


def dnf_mask(table: pa.Table, dnf):
    """Boolean match mask for a DNF clause set (OR of AND-branches)."""
    mask = None
    for branch in _as_dnf(dnf):
        m = predicate_mask(table, branch)
        if m is None:  # a branch with no conjuncts matches everything
            return None
        mask = m if mask is None else pc.or_(mask, m)
    return mask


def _normalize(predicate) -> list[tuple[str, str, object]]:
    """Predicate = iterable of (column, op, value) conjuncts.

    ``in`` takes a list/tuple/set of values, ``between`` an inclusive
    (lo, hi) pair; everything is ANDed. Disjunctions go through
    ``_normalize_dnf``.
    """
    clauses = []
    for cl in predicate:
        col, op, val = cl
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}; one of {_OPS}")
        if op == "in":
            val = list(val)
            if not val:
                raise ValueError(f"empty 'in' list for column {col!r}")
        if op == "between":
            lo, hi = val
            val = (lo, hi)
        if op == "prefix" and not isinstance(val, str):
            raise ValueError(f"prefix predicate needs a str value, got {type(val)}")
        if op in ("hastok", "hasphrase", "hasany"):
            from .bloom import query_tokens

            if not isinstance(val, str):
                raise ValueError(f"{op} predicate needs a str value, got {type(val)}")
            if not query_tokens(val):
                raise ValueError(
                    f"{op} value {val!r} tokenizes to nothing "
                    "(tokens are [a-z0-9]+ runs after lowercasing)"
                )
        clauses.append((str(col), op, val))
    return clauses


def _coerce(value, type_str: str):
    """Coerce a predicate value into the zone-map's stored domain for one
    column: int for int/bool/timestamp/date (timestamps accept datetime or
    ISO strings), float for floats, str for strings."""
    t = str_to_type(type_str)
    if _is_strlike(t):
        if not isinstance(value, str):
            raise TypeError(f"string column predicate needs str, got {type(value)}")
        return value
    try:
        s = pa.scalar(value, type=t)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        s = pa.scalar(value).cast(t)
    if pa.types.is_floating(t):
        return float(s.as_py())
    it = _int_physical(t)
    if it is not None:
        return s.cast(it).as_py()
    return s.as_py()


def record_may_match(stats: dict, rows: int, clauses) -> bool:
    """Conservative zone-map check: False ONLY when no row in the partition
    can satisfy the conjunction (SQL semantics — NULL matches nothing)."""
    for col, op, val in clauses:
        st = stats.get(col)
        if st is None:
            continue  # column has no recorded stats -> cannot prune on it
        if rows and st.get("nulls", 0) >= rows:
            return False  # all-null column: no comparison predicate matches
        mn, mx = st.get("min"), st.get("max")
        if mn is None and mx is None:
            continue
        try:
            if op == "in":
                vs = [_coerce(v, st["t"]) for v in val]
            elif op == "between":
                vs = [_coerce(val[0], st["t"]), _coerce(val[1], st["t"])]
            else:
                vs = [_coerce(val, st["t"])]
        except (TypeError, ValueError, pa.ArrowInvalid, pa.ArrowTypeError):
            continue  # un-coercible value: don't prune, let the exact filter decide
        lo = mn if mn is not None else None
        hi = mx  # may be None (unbounded truncated max)
        if op == "==" and _outside(vs[0], lo, hi):
            return False
        if op == "!=" and lo is not None and hi is not None and lo == hi == vs[0]:
            if st.get("nulls", 0) == 0 and not st.get("approx"):
                return False
        if op == "<" and lo is not None and lo >= vs[0]:
            return False
        if op == "<=" and lo is not None and lo > vs[0]:
            return False
        if op == ">" and hi is not None and hi <= vs[0]:
            return False
        if op == ">=" and hi is not None and hi < vs[0]:
            return False
        if op == "in" and all(_outside(v, lo, hi) for v in vs):
            return False
        if op == "between":
            blo, bhi = vs
            if (hi is not None and blo > hi) or (lo is not None and bhi < lo):
                return False
        if op == "prefix" and isinstance(vs[0], str):
            # rows with prefix p live in [p, upper); truncated bounds stay
            # sound: recorded min <= true min and recorded max >= true max
            up = _prefix_upper(vs[0])
            if hi is not None and isinstance(hi, str) and hi < vs[0]:
                return False
            if lo is not None and isinstance(lo, str) and up is not None and lo >= up:
                return False
    return True


def _outside(v, lo, hi) -> bool:
    if lo is not None and v < lo:
        return True
    if hi is not None and v > hi:
        return True
    return False


def _pa_scalar(value, t: pa.DataType) -> pa.Scalar:
    try:
        return pa.scalar(value, type=t)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return pa.scalar(value).cast(t)


def predicate_mask(table: pa.Table, clauses):
    """Boolean match mask for the clause list over ``table``'s columns (AND of
    conjuncts, null-safe: nulls come back False). None when no clauses."""
    mask = None
    for col, op, val in clauses:
        c = table[col]
        t = c.type if not isinstance(c, pa.ChunkedArray) else c.type
        if op == "prefix":
            m = pc.starts_with(c, pattern=val)
        elif op == "hastok":
            from .bloom import hastok_mask

            m = hastok_mask(c, val)
        elif op == "hasphrase":
            from .bloom import hasphrase_mask

            m = hasphrase_mask(c, val)
        elif op == "hasany":
            from .bloom import hasany_mask

            m = hasany_mask(c, val)
        elif op == "in":
            m = pc.is_in(c, value_set=pa.array([_pa_scalar(v, t).as_py() for v in val], type=t))
        elif op == "between":
            m = pc.and_kleene(
                pc.greater_equal(c, _pa_scalar(val[0], t)),
                pc.less_equal(c, _pa_scalar(val[1], t)),
            )
        else:
            fn = {
                "==": pc.equal,
                "!=": pc.not_equal,
                "<": pc.less,
                "<=": pc.less_equal,
                ">": pc.greater,
                ">=": pc.greater_equal,
            }[op]
            m = fn(c, _pa_scalar(val, t))
        mask = m if mask is None else pc.and_kleene(mask, m)
    if mask is None:
        return None
    return pc.fill_null(mask, False)


def apply_predicate(table: pa.Table, clauses) -> pa.Table:
    """Exact batch-wise filter for the same clause list (AND of conjuncts,
    nulls never match)."""
    mask = predicate_mask(table, clauses)
    return table if mask is None else table.filter(mask)


# --- dictionary probe (ranged reads, no data decode) ---------------------------


def _buf_ranges(col_entry: dict) -> list[tuple[int, int]]:
    """(offset, length) of every buffer of one column inside the container."""
    off = int(col_entry["offset"])
    out = []
    for blen in col_entry["buf_lens"]:
        out.append((off, int(blen)))
        off += int(blen)
    return out


def container_dict_values(path: str, col_entry: dict):
    """Read ONLY the dictionary-values buffers of a dict-encoded column from
    a container file (ranged reads; code/data buffers are never touched).
    Returns a pa.Array (string/binary dicts) or np.ndarray (numeric dicts);
    None when the column isn't dict-encoded."""
    if col_entry["codec"] != "dict":
        return None
    ranges = _buf_ranges(col_entry)
    if col_entry.get("has_validity"):
        ranges = ranges[1:]
    meta = col_entry["meta"]
    t = str_to_type(col_entry["type"])
    with open(path, "rb") as f:
        if _is_strlike(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
            vr = ranges[-2:]  # dict codec layout: [*code_bufs, len_buf, payload_buf]
            bufs = []
            for off, ln in vr:
                f.seek(off)
                bufs.append(unwrap_buf(f.read(ln)))
            vals = dec_plain_s(meta["vmeta"], bufs, meta["card"])
            return vals.cast(t) if vals.type != t else vals
        off, ln = ranges[0]  # numeric dict layout: [uniq_buf, *code_bufs]
        f.seek(off)
        return np.frombuffer(unwrap_buf(f.read(ln)), dtype=np.dtype(meta["dtype"]))


def dict_probe_path(path: str, clauses, footer: dict | None = None) -> bool:
    """True when the container at ``path`` may contain matches: for every
    ==/in conjunct whose column is dict-encoded in this container, at least
    one wanted value must appear in the dictionary."""
    from .container import read_footer_file

    eq = [(c, op, v) for c, op, v in clauses
          if op in ("==", "in", "prefix", "hastok", "hasphrase", "hasany")]
    if not eq:
        return True
    if footer is None:
        footer = read_footer_file(path)
    cols = {c["name"]: c for c in footer["columns"]}
    for col, op, val in eq:
        ent = cols.get(col)
        if ent is None or ent["codec"] != "dict":
            continue
        wanted = [val] if op in ("==", "prefix", "hastok", "hasphrase", "hasany") else list(val)
        dv = container_dict_values(path, ent)
        if dv is None:
            continue
        if op == "prefix":
            if isinstance(dv, np.ndarray):
                continue  # numeric dictionary: prefix can't prune
            if not pc.any(pc.starts_with(dv, pattern=val)).as_py():
                return False
            continue
        if op in ("hastok", "hasphrase", "hasany"):
            if isinstance(dv, np.ndarray) or not (
                pa.types.is_string(dv.type) or pa.types.is_large_string(dv.type)
            ):
                continue  # non-text dictionary: no tokens
            # one value per row, so the container may match iff SOME
            # dictionary value satisfies the text predicate — an EXACT
            # check over distinct values, stronger than the token bloom
            from .bloom import hasany_mask, hasphrase_mask, hastok_mask

            m = {"hastok": hastok_mask, "hasphrase": hasphrase_mask,
                 "hasany": hasany_mask}[op](dv, val)
            if m is not None and not pc.any(pc.fill_null(m, False)).as_py():
                return False
            continue
        if isinstance(dv, np.ndarray):
            if len(dv) == 0:
                return False
            try:
                w = np.array([_coerce(v, ent["type"]) for v in wanted])
            except (TypeError, ValueError, pa.ArrowInvalid, pa.ArrowTypeError):
                continue
            # uniq buffer is sorted (np.unique at encode) -> searchsorted probe;
            # astype to the physical dtype is safe for pruning: a value outside
            # the column's dtype domain matches no row either way
            w = w.astype(dv.dtype, copy=False)
            pos = np.searchsorted(dv, w)
            hit = (pos < len(dv)) & (dv[np.minimum(pos, len(dv) - 1)] == w)
            if not bool(hit.any()):
                return False
        else:
            vs = pa.array([v for v in wanted], type=dv.type)
            if not pc.any(pc.is_in(dv, value_set=vs)).as_py():
                return False
    return True


# --- store scan (predicate pushdown) -------------------------------------------


_LATE_MAT_FRAC = 0.05  # late-materialize when <= this fraction of rows match


def _late_mat_frac() -> float:
    return float(os.environ.get("PCR_LATE_MAT_FRAC", _LATE_MAT_FRAC))


_SORTED_RANGE_FRAC = 0.5  # binary-search row range engages below this fraction


def _clause_bounds(clauses, lead: str, t: pa.DataType):
    """(lo, hi) comparable bound values implied by the conjuncts on ``lead``
    (inclusive on both sides — strict ops are widened by their ties, which the
    exact mask removes). None per side when unbounded; (None, None) when no
    conjunct constrains ``lead`` at all."""
    los, his = [], []
    for col, op, val in clauses:
        if col != lead:
            continue
        try:
            if op == "==":
                v = _pa_scalar(val, t).as_py()
                los.append(v)
                his.append(v)
            elif op in (">", ">="):
                los.append(_pa_scalar(val, t).as_py())
            elif op in ("<", "<="):
                his.append(_pa_scalar(val, t).as_py())
            elif op == "between":
                los.append(_pa_scalar(val[0], t).as_py())
                his.append(_pa_scalar(val[1], t).as_py())
            elif op == "in":
                vs = [_pa_scalar(v, t).as_py() for v in val]
                if any(v is None for v in vs):
                    continue  # NULL literals match nothing; mask handles them
                los.append(min(vs))
                his.append(max(vs))
            elif op == "prefix" and _is_strlike(t):
                los.append(val)
                up = _prefix_upper(val)
                if up is not None:
                    his.append(up)  # exclusive, but the bisect treats bounds
                    # inclusively -> superset range; the exact mask narrows
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError, TypeError):
            return None, None  # un-coercible literal: no sound range
    lo = max(los) if los else None
    hi = min(his) if his else None
    return lo, hi


def sorted_lead_range(
    footer: dict, blobs: dict, clauses, readers: "dict | None" = None
) -> "tuple[int, int] | None":
    """Matching-row superset range [lo_row, hi_row) for a container whose
    footer records a sort key, via binary search on the LEADING sort column
    with O(log n) single-row decodes (``make_row_reader`` un-zstds the
    column's buffers once; each probe then decodes one row).

    Sound because ``encode_one`` sorts every container by its recorded
    ``sort_key`` ascending with nulls last: all non-null lead values are
    ordered in [0, n - null_count) and comparison predicates never match
    NULL. Returns None when no conjunct bounds the lead column, the lead
    blob wasn't read, or a literal fails to coerce. The exact predicate
    mask still runs on the range — strict/`in`/secondary conjuncts narrow
    it further.

    ``readers`` (optional dict) caches ``make_row_reader`` handles by
    column name across the search AND the caller's subsequent range
    decode: building a handle pays the column's transport unwrap (zstd of
    the whole buffer), which for cheap-structural codecs IS most of a full
    decode — paying it twice would erase the win."""
    sk = footer.get("sort_key") or []
    if not sk:
        return None
    lead = sk[0]
    blob = blobs.get(lead)
    if blob is None:
        return None
    t = str_to_type(blob.type_str)
    lo_val, hi_val = _clause_bounds(clauses, lead, t)
    if lo_val is None and hi_val is None:
        return None
    from .codecs import make_row_reader

    read = readers.get(lead) if readers is not None else None
    if read is None:
        read = make_row_reader(blob)
        if readers is not None:
            readers[lead] = read
    nn = blob.n - blob.null_count  # nulls sort to the tail

    def bisect(target, right: bool) -> int:
        lo, hi = 0, nn
        while lo < hi:
            mid = (lo + hi) // 2
            v = read(np.array([mid], dtype=np.int64))[0].as_py()
            if v < target or (right and v == target):
                lo = mid + 1
            else:
                hi = mid
        return lo

    try:
        lo_row = bisect(lo_val, right=False) if lo_val is not None else 0
        hi_row = bisect(hi_val, right=True) if hi_val is not None else nn
    except TypeError:  # cross-type comparison (e.g. str literal vs bytes col)
        return None
    return lo_row, max(hi_row, lo_row)


class _ScanDecoder:
    """Decode surviving containers with column pruning, exact filter, and
    LATE MATERIALIZATION: the predicate columns decode first; when at most
    ``PCR_LATE_MAT_FRAC`` of a container's rows match, every other column is
    decoded at the matching rows ONLY (``decode_array_rows`` — selective bit
    extraction / RLE run probes / dict code gathers / FSST slab skipping).
    A selective scan over a store with heavy text columns thus never expands
    the text it is about to throw away; above the threshold the classic
    full-decode + filter path is cheaper and is kept.

    SORTED-SCAN PUSHDOWN: when a conjunct bounds the container's leading
    sort column (``==`` / range / ``in`` extremes), a binary search with
    O(log n) single-row decodes finds the matching row range first
    (``sorted_lead_range``); if it covers under ``_SORTED_RANGE_FRAC`` of
    the container, even the PREDICATE columns decode only that range — a
    narrow range scan of a big sorted container never expands any column
    fully. PAGE PRUNING: footer page stats (``page_stats``) additionally
    drop 64k-row pages that provably contain no match — the lever for
    predicates on NON-lead columns — and intersect with the sorted-lead
    range. ``range_hits`` / ``page_hits`` count engagements (driver-visible
    only when the decoder runs un-pooled)."""

    def __init__(self, read_cols, out_cols, clauses, verify_crc=False):
        self.read_cols = read_cols
        self.out_cols = out_cols
        self.clauses = clauses
        self.dnf = _as_dnf(clauses)  # OR-branches; the common AND case is one branch
        self.verify_crc = verify_crc
        self.frac = _late_mat_frac()
        self.range_hits = 0
        self.page_hits = 0

    def _one(self, data: bytes) -> pa.Table:
        from .codecs import decode_array, decode_array_rows
        from .container import unpack_container

        footer, blobs = unpack_container(data, columns=self.read_cols, verify_crc=self.verify_crc)
        names = [c["name"] for c in footer["columns"] if self.read_cols is None or c["name"] in self.read_cols]
        if not self.dnf:
            t = pa.table({nm: decode_array(blobs[nm]) for nm in names})
            return t.select(self.out_cols) if self.out_cols is not None else t
        pred_cols = list(dict.fromkeys(c for br in self.dnf for c, _, _ in br))
        if not pred_cols:
            # an empty branch matches everything (same convention as
            # ``dnf_mask``): an empty predicate normalizes to [[]], which is
            # a full decode, not an error
            t = pa.table({nm: decode_array(blobs[nm]) for nm in names})
            return t.select(self.out_cols) if self.out_cols is not None else t
        n = blobs[pred_cols[0]].n  # rows in container
        out_names = self.out_cols if self.out_cols is not None else names
        readers: dict = {}
        # per-branch pushdown, OR-combined: the sorted-lead range is the
        # bounding hull of branch ranges (None if any branch is unbounded on
        # the lead column); the page mask is the union of branch masks (None
        # if any branch has no page-stats column)
        rngs: "list[tuple[int, int]] | None" = []
        for br in self.dnf:
            r = sorted_lead_range(footer, blobs, br, readers)
            if r is None:
                rngs = None
                break
            rngs.append(r)
        rng = (min(r[0] for r in rngs), max(r[1] for r in rngs)) if rngs else None
        pages = footer.get("pages")
        pm = None
        if pages:
            pms: "list[np.ndarray] | None" = []
            for br in self.dnf:
                m = page_candidate_mask(pages, n, br)
                if m is None:
                    pms = None
                    break
                pms.append(m)
            if pms:
                pm = np.logical_or.reduce(pms)
        if rng is not None or pm is not None:
            lo, hi = rng if rng is not None else (0, n)
            ranges: list[tuple[int, int]] = []
            if pm is not None:
                B = int(pages["rows_per_page"])
                for p in np.nonzero(pm)[0]:
                    s, e = max(int(p) * B, lo), min((int(p) + 1) * B, hi)
                    if e > s:
                        if ranges and ranges[-1][1] == s:  # merge adjacent pages
                            ranges[-1] = (ranges[-1][0], e)
                        else:
                            ranges.append((s, e))
            elif hi > lo:
                ranges.append((lo, hi))
            total = sum(e - s for s, e in ranges)
            if total <= _SORTED_RANGE_FRAC * n:
                from .codecs import make_row_reader

                if rng is not None:
                    self.range_hits += 1
                if pm is not None:
                    self.page_hits += 1
                types = {c["name"]: str_to_type(c["type"]) for c in footer["columns"]}
                if not ranges:
                    return pa.table({nm: pa.array([], type=types[nm]) for nm in out_names})

                def rd(nm):  # one transport unwrap per column, shared with the search
                    r = readers.get(nm)
                    if r is None:
                        r = readers[nm] = make_row_reader(blobs[nm])
                    return r

                rsel = np.concatenate([np.arange(s, e, dtype=np.int64) for s, e in ranges])
                pred = {nm: rd(nm)(rsel) for nm in pred_cols}
                mask = dnf_mask(pa.table(pred), self.dnf)
                if isinstance(mask, pa.ChunkedArray):
                    mask = mask.combine_chunks()
                local = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
                loc_arr = pa.array(local)
                cols = {
                    nm: (pc.take(pred[nm], loc_arr) if nm in pred else rd(nm)(rsel[local]))
                    for nm in out_names
                }
                return pa.table(cols)
        pred = {nm: decode_array(blobs[nm]) for nm in pred_cols}
        mask = dnf_mask(pa.table(pred), self.dnf)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        k = int(pc.sum(mask).as_py() or 0)
        if k <= self.frac * n:
            sel = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
            sel_arr = pa.array(sel)
            cols = {
                nm: (pc.take(pred[nm], sel_arr) if nm in pred else decode_array_rows(blobs[nm], sel))
                for nm in out_names
            }
            return pa.table(cols)
        t = pa.table({nm: pred[nm] if nm in pred else decode_array(blobs[nm]) for nm in out_names})
        return t.filter(mask)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)
        return pa.concat_tables([self._one(blob.as_py()) for blob in batch["bytes"]])


def _store_schema(out_dir: str, recs: list[dict]) -> list[tuple[str, pa.DataType]]:
    from .container import read_footer_file
    from .decode import resolve_container_path

    footer = read_footer_file(resolve_container_path(out_dir, recs[0]))
    return [(c["name"], str_to_type(c["type"])) for c in footer["columns"]]


def _candidate_paths(out_dir: str, dnf, plan: dict) -> "tuple[list[str], list]":
    """Driver-side pruning levels of a store scan — manifest zone maps and
    hash routing, all from JSON already on hand (no file opens, no Ray
    tasks). Mutates ``plan`` counters; returns surviving container paths and
    the store schema. Shared by ``scan_store`` and ``scan_store_multi``."""
    from . import manifest as mf
    from .decode import container_files, resolve_container_path

    recs = mf.load_records(out_dir)
    if recs:
        container_files(out_dir)  # stray-container guard
        # hash routing over a disjunction: a container is reachable if ANY
        # branch routes to it; one unroutable branch forfeits the level
        hash_pids: "set[int] | None" = set()
        for br in dnf:
            pids = _hash_route_parts(out_dir, recs, br)
            if pids is None:
                hash_pids = None
                break
            hash_pids |= pids
        paths = []
        for r in recs:
            plan["parts_total"] += 1
            if hash_pids is not None and int(r["part_id"]) not in hash_pids:
                plan["pruned_hash"] += 1
                continue
            st = r.get("stats") or {}
            if st and not any(
                record_may_match(st, int(r.get("rows", 0)), br) for br in dnf
            ):
                plan["pruned_stats"] += 1
                continue
            paths.append(resolve_container_path(out_dir, r))
        schema = _store_schema(out_dir, recs)
    else:
        paths = container_files(out_dir)
        if not paths:
            raise FileNotFoundError(f"no container files under {out_dir}")
        from .container import read_footer_file

        plan["parts_total"] = len(paths)
        schema = [(c["name"], str_to_type(c["type"])) for c in read_footer_file(paths[0])["columns"]]
    return paths, schema


def _probe_applies(dnf) -> bool:
    """The footer probe can only rule a container out on membership-style
    ops; every branch needs one or the probe proves nothing."""
    return all(
        any(op in ("==", "in", "prefix", "hastok", "hasphrase", "hasany") for _, op, _ in br)
        for br in dnf
    )


def probe_verdicts(paths: "list[str]", dnf) -> "dict[str, str]":
    """Distributed footer probe over container paths: tiny ranged reads per
    path, never on the driver. One footer read serves both checks — the
    dictionary probe (low-card dict-encoded columns) and the Bloom probe
    (high-card int/string columns encoded with bloom_cols). Per-path and
    predicate-only, so candidates from MANY stores batch into one job
    (``scan_store_multi`` relies on this — one probe job per family, not
    per member). Returns ``{path: "keep" | "dict" | "bloom"}``."""
    import ray.data

    from .bloom import bloom_probe_footer
    from .container import read_footer_file

    pds = ray.data.from_items([{"path": p} for p in paths])

    def _probe(batch: pa.Table) -> pa.Table:
        out_p, out_v = [], []
        for p in batch["path"].to_pylist():
            footer = read_footer_file(p)
            # a container survives if ANY branch passes both probes;
            # pruned counts attribute to the deepest level any branch hit
            v = "dict"
            for br in dnf:
                if not dict_probe_path(p, br, footer):
                    continue
                if not bloom_probe_footer(p, footer, br):
                    v = "bloom"
                    continue
                v = "keep"
                break
            out_p.append(p)
            out_v.append(v)
        return pa.table({"path": pa.array(out_p, type=pa.string()),
                         "verdict": pa.array(out_v, type=pa.string())})

    return {r["path"]: r["verdict"]
            for r in pds.map_batches(_probe, batch_format="pyarrow").take_all()}


def scan_store(
    out_dir: str,
    predicate,
    columns: list[str] | None = None,
    *,
    dict_probe: bool = True,
    verify_crc: bool = False,
    concurrency=None,
    return_plan: bool = False,
):
    """Predicate-pushdown scan of an encoded store -> streaming Dataset.

    Three pruning levels before any data buffer is decoded:

    1. **Manifest zone maps** — lineage-record ``stats`` rule out containers
       driver-side from JSON already on hand (no file opens at all).
    2. **Dictionary probe** (``==``/``in`` on dict-encoded columns) — a Ray
       stage over candidate paths tail-reads each footer and ranged-reads
       only the dictionary buffers (KB per container on any store size).
    3. **Column pruning** — survivors decode only predicate + requested
       columns; the exact filter runs batch-wise in the same stage.

    Containers written before zone maps existed have no ``stats`` and are
    conservatively scanned. ``return_plan=True`` also returns
    ``{parts_total, pruned_stats, pruned_dict, scanned}``.

    ``predicate`` is a conjunct list (AND), or a disjunction of
    conjunctions — ``("or", [branch, ...])`` / ``{"or": [branch, ...]}`` —
    in which case every pruning level keeps a container when ANY branch may
    match it (Parquet/Iceberg OR-expression pruning semantics) and the
    exact filter is the OR of branch masks.
    """
    import ray.data

    dnf = _normalize_dnf(predicate)
    clauses = [cl for br in dnf for cl in br]  # flat view: column collection
    plan = {"parts_total": 0, "pruned_stats": 0, "pruned_hash": 0, "pruned_dict": 0,
            "pruned_bloom": 0, "scanned": 0}
    paths, schema = _candidate_paths(out_dir, dnf, plan)

    names = [n for n, _ in schema]
    types = dict(schema)
    for col, op, _ in clauses:
        if col not in names:
            raise ValueError(f"predicate column {col!r} not in store schema {names}")
        if op == "prefix" and not _is_strlike(types[col]):
            raise ValueError(f"prefix predicate needs a string column; {col!r} is {types[col]}")
        if op in ("hastok", "hasphrase", "hasany") and not (
            pa.types.is_string(types[col]) or pa.types.is_large_string(types[col])
        ):
            raise ValueError(f"{op} predicate needs a text column; {col!r} is {types[col]}")
    out_cols = None
    read_cols = None
    if columns is not None:
        missing = [c for c in columns if c not in names]
        if missing:
            raise ValueError(f"columns {missing} not in store schema {names}")
        out_cols = list(columns)
        read_cols = list(dict.fromkeys(list(columns) + [c for c, _, _ in clauses]))

    if paths and dict_probe and _probe_applies(dnf):
        verdicts = probe_verdicts(paths, dnf)
        plan["pruned_dict"] = sum(1 for v in verdicts.values() if v == "dict")
        plan["pruned_bloom"] = sum(1 for v in verdicts.values() if v == "bloom")
        paths = [p for p in paths if verdicts.get(p) == "keep"]  # preserve order

    plan["scanned"] = len(paths)
    ds = _build_scan_ds(paths, schema, dnf, out_cols, read_cols, verify_crc,
                        concurrency)
    return (ds, plan) if return_plan else ds


def _build_scan_ds(paths, schema, dnf, out_cols, read_cols, verify_crc,
                   concurrency=None):
    """Decoder stage over surviving container paths (or a typed empty
    dataset when everything pruned). Shared by single-store and family
    scans."""
    import ray.data

    if not paths:
        empty = pa.table({n: pa.array([], type=t) for n, t in schema if out_cols is None or n in out_cols})
        if out_cols is not None:
            empty = empty.select(out_cols)
        return ray.data.from_arrow(empty)

    ds = ray.data.read_binary_files(paths)
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": 1}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        ds = ds.map_batches(
            _ScanDecoder,
            fn_constructor_kwargs={
                "read_cols": read_cols,
                "out_cols": out_cols,
                "clauses": dnf,
                "verify_crc": verify_crc,
            },
            **kwargs,
        )
    else:
        dec = _ScanDecoder(read_cols, out_cols, dnf, verify_crc)
        ds = ds.map_batches(dec, **kwargs)
    return ds


def scan_store_multi(
    dirs: "list[str]",
    predicate,
    columns: list[str] | None = None,
    *,
    dict_probe: bool = True,
    verify_crc: bool = False,
    return_plan: bool = False,
):
    """Predicate-pushdown scan over a FAMILY of stores with one merged plan.

    The lifecycle that produces store families: incremental deliveries each
    encoded into their own store (cheapest ingest — no rewrite of history),
    compacted only when container sizing demands it. A query should not care
    how many deliveries exist, so this runs ``scan_store``'s full pruning
    stack (manifest zone maps, hash route, dictionary/Bloom probes, sorted
    ranges, page masks, late materialization) PER STORE — pruning state is
    per-manifest, so nothing merges there — and unions the survivors.
    ``Dataset.union`` is metadata-only in Ray Data (the streaming executor
    interleaves the members' blocks), so the union itself moves zero rows.

    Output schemas must agree across stores on (name, type) for the emitted
    columns — refused loudly, never coerced (schema evolution goes through
    ``compact_family``'s drop/add path, which is where a family gets
    conformed). The merged plan sums each pruning counter and keeps the
    per-store breakdown under ``"stores"``.

    Scale shape: the manifest/hash/stats levels are driver-side JSON per
    member (microseconds each), and the distributed footer probe — the only
    Ray job in planning — batches every member's candidate paths into ONE
    job, so planning cost does not grow a per-member Ray-job latency with
    family size. The data stage is per-member decoder datasets unioned
    metadata-only.
    """
    from . import manifest as mf

    if not dirs:
        raise ValueError("scan_store_multi needs at least one store directory")
    schemas = []
    for d in dirs:
        recs = mf.load_records(d)
        if not recs:
            raise FileNotFoundError(f"no manifest records under {d}")
        full = _store_schema(d, recs)
        emitted = [(n, t) for n, t in full if columns is None or n in columns]
        schemas.append(emitted)
    if any(s != schemas[0] for s in schemas[1:]):
        detail = "; ".join(
            f"{d}: {[(n, str(t)) for n, t in s]}" for d, s in zip(dirs, schemas)
        )
        raise ValueError(
            "store family schemas differ on the emitted columns — conform them "
            f"via compact_family (drop/add columns) first: {detail}"
        )

    dnf = _normalize_dnf(predicate)
    clauses = [cl for br in dnf for cl in br]
    merged = {"parts_total": 0, "pruned_stats": 0, "pruned_hash": 0,
              "pruned_dict": 0, "pruned_bloom": 0, "scanned": 0, "stores": {}}

    # driver-side levels per member (manifest JSON only — no Ray tasks)
    members = []  # (dir, paths, schema, plan, out_cols, read_cols)
    for d in dirs:
        plan = {"parts_total": 0, "pruned_stats": 0, "pruned_hash": 0,
                "pruned_dict": 0, "pruned_bloom": 0, "scanned": 0}
        paths, schema = _candidate_paths(d, dnf, plan)
        names = [n for n, _ in schema]
        types = dict(schema)
        for col, op, _ in clauses:
            if col not in names:
                raise ValueError(f"predicate column {col!r} not in store schema {names}")
            if op == "prefix" and not _is_strlike(types[col]):
                raise ValueError(f"prefix predicate needs a string column; {col!r} is {types[col]}")
        out_cols = read_cols = None
        if columns is not None:
            missing = [c for c in columns if c not in names]
            if missing:
                raise ValueError(f"columns {missing} not in store schema {names}")
            out_cols = list(columns)
            read_cols = list(dict.fromkeys(list(columns) + [c for c, _, _ in clauses]))
        members.append((d, paths, schema, plan, out_cols, read_cols))

    # ONE distributed footer probe over every member's candidates
    all_paths = [p for _, paths, _, _, _, _ in members for p in paths]
    if all_paths and dict_probe and _probe_applies(dnf):
        verdicts = probe_verdicts(all_paths, dnf)
        members = [
            (d,
             [p for p in paths if verdicts.get(p) == "keep"],
             schema,
             dict(plan,
                  pruned_dict=sum(1 for p in paths if verdicts.get(p) == "dict"),
                  pruned_bloom=sum(1 for p in paths if verdicts.get(p) == "bloom")),
             out_cols, read_cols)
            for d, paths, schema, plan, out_cols, read_cols in members
        ]

    union_ds = None
    for d, paths, schema, plan, out_cols, read_cols in members:
        plan["scanned"] = len(paths)
        ds = _build_scan_ds(paths, schema, dnf, out_cols, read_cols, verify_crc)
        for k, v in plan.items():
            merged[k] += v
        merged["stores"][d] = plan
        union_ds = ds if union_ds is None else union_ds.union(ds)
    return (union_ds, merged) if return_plan else union_ds


# --- metadata-only profile ------------------------------------------------------


def store_profile(out_dir: str) -> dict:
    """Profile an encoded store from manifest metadata alone — per-column
    global bounds / null counts / codec mix plus store totals. Opens ZERO
    container files; cost is the manifest JSON, independent of data size."""
    from . import manifest as mf

    recs = mf.load_records(out_dir)
    if not recs:
        raise FileNotFoundError(f"no manifest records under {out_dir}")
    cols: dict[str, dict] = {}
    with_stats = 0
    rows = bytes_in = bytes_out = 0
    generations = set()
    for r in recs:
        rows += int(r.get("rows", 0))
        bytes_in += int(r.get("bytes_in", 0))
        bytes_out += int(r.get("bytes_out", 0))
        generations.add(int(r.get("generation", 0)))
        for name, codec in (r.get("codecs") or {}).items():
            c = cols.setdefault(
                name,
                {"codecs": {}, "nulls": 0, "min": None, "max": None, "t": None,
                 "approx": False, "stats_parts": 0},
            )
            c["codecs"][codec] = c["codecs"].get(codec, 0) + 1
        st = r.get("stats") or {}
        if st:
            with_stats += 1
        for name, ent in st.items():
            c = cols.setdefault(
                name,
                {"codecs": {}, "nulls": 0, "min": None, "max": None, "t": None,
                 "approx": False, "stats_parts": 0},
            )
            c["stats_parts"] += 1
            c["nulls"] += int(ent.get("nulls", 0))
            c["t"] = c["t"] or ent.get("t")
            c["approx"] = c["approx"] or bool(ent.get("approx"))
            mn, mx = ent.get("min"), ent.get("max")
            if mn is not None and (c["min"] is None or mn < c["min"]):
                c["min"] = mn
            if mx is None and ent.get("approx"):
                c["approx"] = True
            if mx is not None and (c["max"] is None or mx > c["max"]):
                c["max"] = mx
    return {
        "partitions": len(recs),
        "generations": len(generations),
        "rows": rows,
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "ratio": bytes_out / max(bytes_in, 1),
        "stats_coverage": with_stats / len(recs),
        "columns": cols,
    }


def store_profile_multi(dirs: "list[str]") -> dict:
    """Profile a FAMILY of stores from manifest metadata alone — per-member
    profiles fold into family totals (partitions/rows/bytes sum, per-column
    nulls and codec counts sum, bounds combine when the member types agree;
    a type conflict nulls the folded bounds and flags ``t: "mixed"`` rather
    than comparing across domains). Opens ZERO container files."""
    if not dirs:
        raise ValueError("store_profile_multi needs at least one store directory")
    per = {d: store_profile(d) for d in dirs}
    cols: dict[str, dict] = {}
    for p in per.values():
        for name, c in p["columns"].items():
            f = cols.setdefault(
                name,
                {"codecs": {}, "nulls": 0, "min": None, "max": None, "t": None,
                 "approx": False, "stats_parts": 0},
            )
            for codec, n in c["codecs"].items():
                f["codecs"][codec] = f["codecs"].get(codec, 0) + n
            f["nulls"] += c["nulls"]
            f["stats_parts"] += c["stats_parts"]
            f["approx"] = f["approx"] or c["approx"]
            if c["t"] is not None:
                if f["t"] is None:
                    f["t"] = c["t"]
                elif f["t"] != c["t"] and f["t"] != "mixed":
                    f["t"] = "mixed"
            if f["t"] == "mixed":
                f["min"] = f["max"] = None
                f["approx"] = True
                continue
            if c["min"] is not None and (f["min"] is None or c["min"] < f["min"]):
                f["min"] = c["min"]
            if c["max"] is not None and (f["max"] is None or c["max"] > f["max"]):
                f["max"] = c["max"]
    parts = sum(p["partitions"] for p in per.values())
    rows = sum(p["rows"] for p in per.values())
    b_in = sum(p["bytes_in"] for p in per.values())
    b_out = sum(p["bytes_out"] for p in per.values())
    return {
        "partitions": parts,
        "rows": rows,
        "bytes_in": b_in,
        "bytes_out": b_out,
        "ratio": b_out / max(b_in, 1),
        "stats_coverage": sum(
            p["stats_coverage"] * p["partitions"] for p in per.values()
        ) / max(parts, 1),
        "columns": cols,
        "stores": per,
    }

"""Dataset profiling (reference analyzer parity, SURVEY.md §2.5 A1-A5 / §3.3).

Reference behavior: eager per-file ``pl.read_parquet`` + full-frame stats
(reference analyzer.py:284-355). Here the stats are computed as mergeable
per-batch partials inside ``map_batches`` (no full materialisation, no shuffle
for the common case) and combined on the driver — the partial+final pattern
that also powers the codec cost-model stats pass.

Per column: null_count, n_unique (exact: batch-level unique sets merged while
small; distributed groupby fallback when a column's cardinality overflows the
track limit), min/max/mean/std for numerics, top-k value frequencies for
low-cardinality columns (reference analyzer.py:265-275 computes top-5 for
columns with <=20 uniques).

Exact median uses a distributed sort + split_at_indices pick — the only
profiling operation that shuffles (reference uses polars' in-memory median,
analyzer.py:191-197).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_UNIQUE_CAP = 100_000  # per-column distinct cap before falling back to groupby


def _batch_partial(batch: pa.Table, columns: list[str]) -> dict:
    out: dict = {}
    for name in columns:
        col = batch[name]
        t = col.type
        p: dict = {"n": len(col), "nulls": col.null_count}
        if pa.types.is_floating(t) or pa.types.is_integer(t):
            nn = col.drop_null()
            if len(nn):
                v = nn.to_numpy(zero_copy_only=False).astype(np.float64)
                p["min"] = float(np.min(v))
                p["max"] = float(np.max(v))
                p["sum"] = float(np.sum(v))
                p["sumsq"] = float(np.sum(v * v))
                p["cnt"] = int(len(v))
        elif pa.types.is_timestamp(t) or pa.types.is_date(t):
            nn = col.drop_null()
            if len(nn):
                p["min_ts"] = pc.min(nn).as_py().isoformat()
                p["max_ts"] = pc.max(nn).as_py().isoformat()
        # value counts, capped — feeds both n_unique and top-k
        try:
            vc = pc.value_counts(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
            if len(vc) <= _UNIQUE_CAP:
                p["vc"] = {
                    (v.as_py() if v.is_valid else None): c.as_py()
                    for v, c in zip(vc.field("values"), vc.field("counts"))
                }
            else:
                p["vc_overflow"] = True
        except pa.ArrowNotImplementedError:
            p["vc_overflow"] = True
        out[name] = p
    return out


def profile_dataset(
    ds: "ray.data.Dataset",
    column_limit: int = 25,
    top_k: int = 5,
    top_k_max_card: int = 20,
) -> dict:
    """Profile a Dataset; returns {"n_rows", "columns": {name: {...}}}."""
    schema = ds.schema()
    columns = list(schema.names)[:column_limit]
    types = dict(zip(schema.names, schema.types))

    def partials(batch: pa.Table) -> pa.Table:
        blob = pickle.dumps(_batch_partial(batch, columns))
        return pa.table({"partial": pa.array([blob], type=pa.binary())})

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    merged: dict[str, dict] = {c: {"n": 0, "nulls": 0, "vc": {}, "overflow": False} for c in columns}
    for row in rows:
        part = pickle.loads(row["partial"])
        for name, p in part.items():
            m = merged[name]
            m["n"] += p["n"]
            m["nulls"] += p["nulls"]
            for k in ("min", "max"):
                if k in p:
                    m[k] = p[k] if k not in m else (min, max)[k == "max"](m[k], p[k])
            for k in ("min_ts", "max_ts"):
                if k in p:
                    m[k] = p[k] if k not in m else (min, max)[k == "max_ts"](m[k], p[k])
            for k in ("sum", "sumsq", "cnt"):
                if k in p:
                    m[k] = m.get(k, 0) + p[k]
            if p.get("vc_overflow"):
                m["overflow"] = True
            elif not m["overflow"]:
                for v, c in p["vc"].items():
                    m["vc"][v] = m["vc"].get(v, 0) + c
                if len(m["vc"]) > _UNIQUE_CAP:
                    m["overflow"] = True
                    m["vc"] = {}

    result: dict = {"n_rows": merged[columns[0]]["n"] if columns else ds.count()}
    cols_out: dict = {}
    for name in columns:
        m = merged[name]
        c: dict = {"dtype": str(types[name]), "null_count": m["nulls"]}
        if m["overflow"]:
            # distributed exact distinct: groupby(col).count() then count rows
            c["n_unique"] = ds.groupby(name).count().count()
        else:
            c["n_unique"] = len(m["vc"])
        if "cnt" in m and m["cnt"]:
            n = m["cnt"]
            mean = m["sum"] / n
            var = max(m["sumsq"] / n - mean * mean, 0.0)
            c.update(
                min=m["min"],
                max=m["max"],
                mean=mean,
                std=float(np.sqrt(var * n / (n - 1))) if n > 1 else 0.0,  # sample std, ddof=1
            )
        if "min_ts" in m:
            c["min"], c["max"] = m["min_ts"], m["max_ts"]
        if not m["overflow"] and 0 < c["n_unique"] <= top_k_max_card:
            top = sorted(m["vc"].items(), key=lambda kv: (-kv[1], str(kv[0])))[:top_k]
            c["top_values"] = [
                {"value": v, "count": cnt, "pct": round(cnt / max(m["n"], 1) * 100, 2)}
                for v, cnt in top
            ]
        cols_out[name] = c
    result["columns"] = cols_out
    return result


def exact_median(ds: "ray.data.Dataset", col: str) -> float:
    """Exact distributed median: sort (the shuffle) + positional pick.

    Matches DuckDB/polars semantics: average of the two middle values for even
    row counts (reference analyzer.py:191-197 uses polars ``median``).
    """
    vals = ds.select_columns([col]).filter(lambda r: r[col] is not None)
    n = vals.count()
    if n == 0:
        return float("nan")
    s = vals.sort(col)
    if n % 2:
        frag = s.split_at_indices([n // 2, n // 2 + 1])[1]
        return float(frag.take_all()[0][col])
    frag = s.split_at_indices([n // 2 - 1, n // 2 + 1])[1]
    rows = frag.take_all()
    return (float(rows[0][col]) + float(rows[1][col])) / 2.0


def head_rows(ds: "ray.data.Dataset", n: int = 10) -> pa.Table:
    """Preview head (reference verify_rows, converter.py:689)."""
    return pa.Table.from_pylist(ds.take(n))


def analyze_files(paths: list[str], column_limit: int = 25) -> list[dict]:
    """Per-file profiles (reference analyze_directory, analyzer.py:516-564).

    One Ray Data pipeline per file keeps reference per-file report semantics;
    pipelines run back-to-back but parallelise internally across blocks.
    """
    import os

    out = []
    for p in paths:
        ds = ray.data.read_parquet(p)
        prof = profile_dataset(ds, column_limit=column_limit)
        st = os.stat(p) if os.path.isfile(p) else None
        out.append(
            {
                "file": p,
                "size_bytes": st.st_size if st else None,
                "n_rows": prof["n_rows"],
                "n_cols": len(prof["columns"]),
                "columns": prof["columns"],
            }
        )
    return out


def format_report(results: list[dict]) -> str:
    """Plain-text analysis report (reference analyzer.py:358-513)."""
    lines = ["PARQUET ANALYSIS REPORT", "=" * 60]
    for r in results:
        lines.append(f"\nFile: {r['file']}")
        lines.append(f"  rows={r['n_rows']} cols={r['n_cols']} size={r['size_bytes']}")
        for name, c in r["columns"].items():
            desc = f"  - {name} [{c['dtype']}] nulls={c['null_count']} unique={c['n_unique']}"
            if "mean" in c:
                desc += f" min={c['min']:.4g} max={c['max']:.4g} mean={c['mean']:.4g} std={c['std']:.4g}"
            lines.append(desc)
            for tv in c.get("top_values", []):
                lines.append(f"      {tv['value']!r}: {tv['count']} ({tv['pct']}%)")
    return "\n".join(lines)

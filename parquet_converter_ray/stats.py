"""Codec cost-model stats pass: a stateful actor-pool stage over the dataset.

North-star component (BASELINE.json): "cardinality / run-length / entropy
stats collected in a first actor-pool pass". ``StatsCollector`` is a callable
class — permutation seeds and accumulators are built ONCE per actor
(``__init__``), each batch contributes a mergeable partial row; partials
combine on the driver (they are tiny: one row per batch).

``plan_codecs`` turns merged stats into a per-column codec *plan preview* —
the per-partition encoder still makes the final sampled decision (stats can
shift per partition), but the preview is what `cli.py analyze --plan` shows
and what a scheduler at 10^12 scale would use to pre-size dictionaries.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


class StatsCollector:
    """Actor-pool stage: per-batch mergeable codec statistics per column."""

    def __init__(self, columns: list[str] | None = None, entropy_sample: int = 4096):
        self.columns = columns
        self.entropy_sample = entropy_sample
        from .encode import pin_arrow_threads

        pin_arrow_threads(1)

    def _col_stats(self, col: pa.ChunkedArray | pa.Array) -> dict:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        p: dict = {"n": n, "nulls": col.null_count, "bytes": col.nbytes}
        t = col.type
        # cardinality (capped distinct per batch — mergeable as sets of hashes)
        try:
            uniq = pc.unique(col)
            p["distinct"] = len(uniq)
        except pa.ArrowNotImplementedError:
            p["distinct"] = n
        # run structure
        if n > 1:
            try:
                vals = col.drop_null()
                if len(vals) > 1:
                    eq = pc.equal(vals.slice(1), vals.slice(0, len(vals) - 1))
                    runs = len(vals) - pc.sum(eq).as_py() if pc.sum(eq).is_valid else len(vals)
                    p["n_runs"] = max(int(runs), 1)
            except pa.ArrowNotImplementedError:
                pass
        # numeric range (for FOR/bitpack width estimates)
        if pa.types.is_integer(t) or pa.types.is_timestamp(t):
            nn = col.drop_null()
            if len(nn):
                iv = nn.cast(pa.int64())
                p["min"] = pc.min(iv).as_py()
                p["max"] = pc.max(iv).as_py()
                d = np.diff(iv.to_numpy(zero_copy_only=False))
                if len(d):
                    p["sortedness"] = float((d >= 0).mean())
        # byte-entropy sample (strings): upper-bounds general-purpose codecs
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            nn = col.drop_null()
            if len(nn):
                sample = nn.slice(0, min(len(nn), self.entropy_sample))
                from .codecs.strings import str_parts

                _, data = str_parts(sample)
                if data:
                    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
                    freq = counts[counts > 0] / len(data)
                    p["byte_entropy"] = float(-(freq * np.log2(freq)).sum())
                    p["avg_len"] = len(data) / len(sample)
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        partial = {c: self._col_stats(batch[c]) for c in cols if c in batch.column_names}
        return pa.table({"partial": pa.array([pickle.dumps(partial)], type=pa.binary())})


def collect_column_stats(
    ds: "ray.data.Dataset", columns: list[str] | None = None, concurrency: int | tuple = 2
) -> dict[str, dict]:
    """Run the actor-pool stats pass and merge partials driver-side."""
    rows = ds.map_batches(
        StatsCollector,
        fn_constructor_kwargs={"columns": columns},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    merged: dict[str, dict] = {}
    for row in rows:
        for name, p in pickle.loads(row["partial"]).items():
            m = merged.setdefault(
                name, {"n": 0, "nulls": 0, "bytes": 0, "distinct_sum": 0, "n_runs": 0}
            )
            m["n"] += p["n"]
            m["nulls"] += p["nulls"]
            m["bytes"] += p["bytes"]
            m["distinct_sum"] += p.get("distinct", 0)
            m["n_runs"] += p.get("n_runs", p["n"])
            for k in ("min",):
                if k in p:
                    m[k] = min(m.get(k, p[k]), p[k])
            for k in ("max",):
                if k in p:
                    m[k] = max(m.get(k, p[k]), p[k])
            for k in ("sortedness", "byte_entropy", "avg_len"):
                if k in p:
                    m.setdefault(k + "_acc", []).append(p[k])
    for m in merged.values():
        for k in ("sortedness", "byte_entropy", "avg_len"):
            acc = m.pop(k + "_acc", None)
            if acc:
                m[k] = float(np.mean(acc))
        if m["n"]:
            m["distinct_ratio"] = min(m["distinct_sum"] / m["n"], 1.0)
            m["avg_run_len"] = m["n"] / max(m["n_runs"], 1)
    return merged


def plan_codecs(stats: dict[str, dict], schema: pa.Schema) -> dict[str, str]:
    """Heuristic codec plan from merged stats (preview; the sampled per-
    partition cost model makes the binding choice)."""
    plan: dict[str, str] = {}
    for field in schema:
        m = stats.get(field.name)
        if not m or not m["n"]:
            plan[field.name] = "plain"
            continue
        t = field.type
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            if m.get("distinct_ratio", 1) < 0.1:
                plan[field.name] = "dict"
            elif m.get("byte_entropy", 8.0) < 6.5:
                plan[field.name] = "fsst"
            else:
                plan[field.name] = "plain"
        elif pa.types.is_integer(t) or pa.types.is_timestamp(t):
            if m.get("avg_run_len", 1) > 4:
                plan[field.name] = "rle"
            elif m.get("sortedness", 0) > 0.9:
                plan[field.name] = "delta"
            elif m.get("distinct_ratio", 1) < 0.05:
                plan[field.name] = "dict"
            else:
                plan[field.name] = "for"
        elif pa.types.is_floating(t):
            plan[field.name] = "dict" if m.get("distinct_ratio", 1) < 0.05 else "shuffle"
        elif pa.types.is_boolean(t):
            plan[field.name] = "rle" if m.get("avg_run_len", 1) > 4 else "for"
        else:
            plan[field.name] = "plain"
    return plan

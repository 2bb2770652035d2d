"""Profiling parity tests (reference tests/test_analyzer.py model: F4 fixture)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from parquet_converter_ray.profile import (
    analyze_files,
    exact_median,
    format_report,
    profile_dataset,
)


@pytest.fixture
def f4_dataset(ray_session):
    import ray.data

    # FIXTURES.md F4: value [1, 2, null], label ["a", "b", "b"]
    return ray.data.from_arrow(
        pa.table({"value": pa.array([1, 2, None], type=pa.int64()), "label": ["a", "b", "b"]})
    )


def test_f4_stats(f4_dataset):
    prof = profile_dataset(f4_dataset)
    assert prof["n_rows"] == 3
    v = prof["columns"]["value"]
    assert v["null_count"] == 1
    assert v["n_unique"] == 3  # nulls count as a distinct value (polars n_unique semantics)
    assert v["min"] == 1.0 and v["max"] == 2.0
    lbl = prof["columns"]["label"]
    assert lbl["n_unique"] == 2
    top = lbl["top_values"]
    assert top[0] == {"value": "b", "count": 2, "pct": 66.67}


def test_column_limit(ray_session):
    import ray.data

    tbl = pa.table({f"c{i}": [1] for i in range(30)})
    prof = profile_dataset(ray.data.from_arrow(tbl), column_limit=25)
    assert len(prof["columns"]) == 25


def test_exact_median_odd_even(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": [5.0, 1.0, 3.0]}))
    assert exact_median(ds, "x") == 3.0
    ds = ray.data.from_arrow(pa.table({"x": [4.0, 1.0, 3.0, 2.0]}))
    assert exact_median(ds, "x") == 2.5


def test_analyze_files_report(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"value": [1, 2, None], "label": ["a", "b", "b"]}), p)
    results = analyze_files([p])
    assert results[0]["n_rows"] == 3
    report = format_report(results)
    assert "t.parquet" in report and "label" in report


def test_report_parity_fields(ray_session, tmp_path):
    """Reference analyzer parity: humanized size, mtime, per-column median,
    null_pct, head/tail/sample rows (analyzer.py:109-161,191-197,324-348)."""
    import duckdb
    import pyarrow.parquet as pq

    from parquet_converter_ray.profile import (
        discover_parquet_files,
        file_modification_time,
        humanize_size,
    )

    src = "/root/testdata/sf0.001/orders.parquet"
    results = analyze_files([src])
    r = results[0]
    assert r["file_size"].endswith(("Bytes", "kB", "MB"))
    assert len(r["file_mod_time"]) == 19 and r["file_mod_time"].count(":") == 2
    assert len(r["first_rows"]) == 3
    assert len(r["last_rows"]) == 3
    assert len(r["sample_rows"]) == 10
    # first/last rows match the file order
    t = pq.read_table(src)
    assert r["first_rows"][0] == tuple(col[0].as_py() for col in t.columns)
    assert r["last_rows"][-1] == tuple(col[-1].as_py() for col in t.columns)
    # medians match DuckDB exactly
    for col in ("o_orderkey", "o_custkey", "o_totalprice"):
        exp = duckdb.sql(f"SELECT median({col}) FROM '{src}'").fetchone()[0]
        assert r["columns"][col]["median"] == pytest.approx(float(exp)), col
    report = format_report(results)
    assert "median=" in report and "Sample rows:" in report and "modified=" in report
    # humanize + discovery helpers
    assert humanize_size(4) == "4 Bytes" and humanize_size(1200) == "1.2 kB"
    assert file_modification_time(src) == r["file_mod_time"]
    nested = tmp_path / "a" / "b"
    nested.mkdir(parents=True)
    pq.write_table(pa.table({"x": [1]}), str(nested / "deep.parquet"))
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "top.parquet"))
    assert len(discover_parquet_files(str(tmp_path))) == 1
    assert len(discover_parquet_files(str(tmp_path), recursive=True)) == 2


def test_median_from_counts_overflow_consistency(ray_session):
    """The value-counts median and the sort-based median must agree."""
    import numpy as np
    import ray.data

    from parquet_converter_ray.profile import profile_dataset

    rng = np.random.default_rng(3)
    vals = rng.normal(0, 100, 5001)
    ds = ray.data.from_arrow(pa.table({"x": vals}))
    prof = profile_dataset(ds)
    assert prof["columns"]["x"]["median"] == pytest.approx(float(np.median(vals)))

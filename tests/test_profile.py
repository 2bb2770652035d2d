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

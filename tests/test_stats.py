"""Stats pass + codec plan preview tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_converter_ray.stats import StatsCollector, collect_column_stats, plan_codecs


@pytest.fixture
def mixed_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "sorted_id": pa.array(np.arange(5000), type=pa.int64()),
            "runs": pa.array(np.repeat(rng.integers(0, 4, 50), 100), type=pa.int64()),
            "lowcard": pa.array(rng.choice(["a", "b", "c"], 5000)),
            "text": pa.array([" ".join(rng.choice(["foo", "bar", "baz", "qux"], 20)) for _ in range(5000)]),
            "noise": pa.array(rng.normal(0, 1, 5000)),
        }
    )
    return ray.data.from_arrow(t), t.schema


def test_collect_and_plan(mixed_ds):
    ds, schema = mixed_ds
    stats = collect_column_stats(ds)
    assert stats["sorted_id"]["sortedness"] == 1.0
    assert stats["sorted_id"]["distinct_ratio"] == 1.0
    assert stats["runs"]["avg_run_len"] > 50
    assert stats["lowcard"]["distinct_ratio"] < 0.01
    plan = plan_codecs(stats, schema)
    assert plan["sorted_id"] == "delta"
    assert plan["runs"] == "rle"
    assert plan["lowcard"] == "dict"
    assert plan["text"] == "fsst"  # low byte entropy, repeated words
    assert plan["noise"] in ("shuffle", "plain")


def test_stats_collector_direct():
    sc = StatsCollector()
    out = sc(pa.table({"x": pa.array([1, 1, 2, None], type=pa.int64())}))
    import pickle

    p = pickle.loads(out["partial"][0].as_py())["x"]
    assert p["n"] == 4 and p["nulls"] == 1 and p["distinct"] == 3

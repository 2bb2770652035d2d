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


def test_term_postings_within_doc_dup_counts_once(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_converter_ray.pipelines.text import term_postings

    docs = pd.DataFrame(
        {
            "doc_id": [7, 3, 9],
            "text": ["cat cat dog", "Cat   mouse", None],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [11, 11, 0],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), f"{tmp_path}/documents.parquet")
    got = term_postings(str(tmp_path), k=10).to_pandas()
    by = got.set_index("term")
    # 'cat' appears twice in doc 7 and once in doc 3 -> df=2, sorted postings
    assert by.loc["cat", "df"] == 2 and by.loc["cat", "postings"] == "3,7"
    assert by.loc["dog", "df"] == 1 and by.loc["mouse", "postings"] == "3"
    # df-desc, term-asc ordering
    assert list(got["term"]) == ["cat", "dog", "mouse"]

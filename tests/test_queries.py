"""Oracle-checked query tests: every SQL-checkable queries() entry must match
DuckDB on sf0.001 (the driver repeats this at sf0.01 -> CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _queries():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


SQL_CHECKED = [
    "count_lineitem",
    "null_unique_profile",
    "distinct_parts",
    "numeric_stats_lineitem",
    "median_totalprice",
    "top5_orderpriority",
    "value_counts_returnflag",
    "head_lineitem",
    "tail_lineitem",
    "ts_range_orders",
    "pricing_summary",
    "orders_by_month",
    "events_hourly_window",
    "segment_revenue",
    "customers_without_orders",
    "events_sessionize",
    "events_json_mean",
    "user_event_sequence",
    "order_lineitem_join",
    "lineitem_codec_roundtrip",
    "token_counts",
    "char_stats",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_embedding",
    "knn_bruteforce",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, oracle_con, name):
    qs, oracles = _queries()
    res = qs[name](SF_DIR)
    got = _normalize(res.to_pandas() if hasattr(res, "to_pandas") else res)
    exp = _normalize(oracle_con.sql(oracles[name]).df())
    pd.testing.assert_frame_equal(got, exp)


def test_all_queries_have_oracle_or_are_documented(ray_session):
    qs, oracles = _queries()
    rows_only = set(qs) - set(oracles)
    # rows-only queries are the genuinely non-SQL-expressible ones
    assert rows_only == {
        "lang_quality",
        "winnow_fingerprints",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_lsh",
        "knn_lsh",
        "transcript_roundtrip",
        "transcript_codec_plan",
        "convert_csv_roundtrip",
        "multimodal_features",
    }
    assert set(oracles) <= set(qs)


def test_rows_only_queries_run_and_are_deterministic(ray_session):
    qs, _ = _queries()
    for name in ["lang_quality", "dedup_simhash", "knn_lsh", "multimodal_features"]:
        a = qs[name](SF_DIR)
        b = qs[name](SF_DIR)
        assert a.num_rows == b.num_rows, name
        assert a.equals(b), f"{name} not deterministic"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    n = out.num_rows if hasattr(out, "num_rows") else len(out)
    assert n > 0

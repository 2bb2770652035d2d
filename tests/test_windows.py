"""Edge-case tests for the ordered/windowed operator family
(pipelines/windows.py) and the histogram-selection quantile primitive
(profile.exact_quantiles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ds(values, n_blocks=4):
    """Dataset over float64 ``values`` split across several blocks (so the
    per-batch partial merging is actually exercised)."""
    import ray.data

    chunks = np.array_split(np.asarray(values, dtype=np.float64), n_blocks)
    tables = [pa.table({"x": pa.array(c, pa.float64())}) for c in chunks if len(c)]
    return ray.data.from_arrow(tables)


QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def test_exact_quantiles_matches_numpy_linear(ray_session):
    from parquet_converter_ray.profile import exact_quantiles

    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=3.0, sigma=2.0, size=5000)  # heavy right skew
    got = exact_quantiles(_ds(vals), "x", QS, n_bins=64)
    exp = np.quantile(vals, QS, method="linear")
    assert np.allclose(got, exp, rtol=1e-12, atol=0)


def test_exact_quantiles_skewed_bin_recurses_and_cap_fallback(ray_session):
    from parquet_converter_ray.profile import exact_quantiles

    # 90% of the mass is a single repeated value inside one histogram bin:
    # forces the recursion path, then the rounds==0 collect-anyway fallback.
    vals = np.concatenate([np.full(9000, 5.0), np.linspace(0.0, 100.0, 1000)])
    got = exact_quantiles(_ds(vals), "x", QS, n_bins=4, collect_cap=10, max_rounds=2)
    exp = np.quantile(vals, QS, method="linear")
    assert np.allclose(got, exp, rtol=1e-12, atol=0)


def test_exact_quantiles_constant_nulls_and_tiny(ray_session):
    import ray.data

    from parquet_converter_ray.profile import exact_quantiles

    # constant column -> zero-width range short-circuit
    got = exact_quantiles(_ds(np.full(100, 3.25)), "x", [0.1, 0.5, 0.9])
    assert got == [3.25, 3.25, 3.25]

    # nulls are excluded (DuckDB semantics)
    t = pa.table({"x": pa.array([None, 1.0, None, 3.0, 2.0], pa.float64())})
    got = exact_quantiles(ray.data.from_arrow(t), "x", [0.5])
    assert got == [2.0]

    # n=1 and n=2
    assert exact_quantiles(_ds([42.0], n_blocks=1), "x", [0.0, 0.5, 1.0]) == [42.0] * 3
    got = exact_quantiles(_ds([10.0, 20.0], n_blocks=1), "x", [0.25])
    assert np.allclose(got, [12.5])

    # all-null / empty -> NaN
    t = pa.table({"x": pa.array([None, None], pa.float64())})
    got = exact_quantiles(ray.data.from_arrow(t), "x", [0.5])
    assert np.isnan(got[0])


def _write(tmp_path, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / f"{name}.parquet")


def test_asof_join_unmatched_events_get_nulls(ray_session, tmp_path):
    """Events before a user's first order (or for a user with no orders) must
    left-join to NULL, matching DuckDB ASOF LEFT JOIN on the same tables."""
    import duckdb

    from parquet_converter_ray.pipelines.windows import asof_join_events_orders

    ts = lambda s: pd.Timestamp(s)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, 10, 20],
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [100.0, 250.0, 175.0, 300.0],
            # user 10 has a TIE on orderdate (orders 2,3) -> max price wins
            "o_orderdate": [ts("2024-01-05"), ts("2024-03-01"), ts("2024-03-01"), ts("2024-06-01")],
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    events = pd.DataFrame(
        {
            "event_id": [100, 101, 102, 103, 104],
            "ts": [
                ts("2024-01-01"),  # before user 10's first order -> NULL
                ts("2024-01-05"),  # exactly at order 1 -> matches (ts >= od)
                ts("2024-04-01"),  # after the tie -> max-price row (250.0)
                ts("2024-01-01"),  # user 30 has NO orders -> NULL
                ts("2024-07-01"),  # user 20 after its order
            ],
            "user_id": [10, 10, 10, 30, 20],
            "event_type": ["view"] * 5,
            "value": [1.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "events", events)

    got = asof_join_events_orders(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'")
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    import __ray_entry__ as e

    exp = con.sql(e.oracle_sql()["asof_join_events_orders"]).df()
    exp = exp.sort_values("event_id").reset_index(drop=True)
    got = got.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # spot-check the semantics directly
    by_id = got.set_index("event_id")
    assert pd.isna(by_id.loc[100, "order_price"]) and pd.isna(by_id.loc[103, "order_price"])
    assert by_id.loc[101, "order_price"] == 100.0
    assert by_id.loc[102, "order_price"] == 250.0  # tie resolved to max price
    assert by_id.loc[104, "order_price"] == 300.0


def test_running_and_rank_short_groups(ray_session, tmp_path):
    """Customers with 1 and 2 orders: sliding mean window shorter than 3 and
    top-2 rank over fewer than 2 rows."""
    from parquet_converter_ray.pipelines.windows import (
        customer_order_running,
        top2_orders_per_customer,
    )

    ts = lambda s: pd.Timestamp(s)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6],
            "o_custkey": [1, 2, 2, 3, 3, 3],
            "o_orderstatus": ["F"] * 6,
            # customer 3 has a price TIE -> rank breaks by orderkey
            "o_totalprice": [10.0, 5.0, 7.0, 9.0, 9.0, 1.0],
            "o_orderdate": [ts("2024-01-01"), ts("2024-01-01"), ts("2024-02-01"),
                            ts("2024-01-01"), ts("2024-02-01"), ts("2024-03-01")],
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    _write(tmp_path, "orders", orders)

    run = customer_order_running(str(tmp_path)).to_pandas().set_index("o_orderkey")
    assert run.loc[1, "running_total"] == 10.0 and run.loc[1, "avg3"] == 10.0
    assert run.loc[3, "running_total"] == 12.0 and run.loc[3, "avg3"] == 6.0
    assert run.loc[6, "running_total"] == 19.0 and run.loc[6, "avg3"] == pytest.approx(19 / 3, abs=1e-4)

    top = top2_orders_per_customer(str(tmp_path)).to_pandas()
    assert len(top[top["o_custkey"] == 1]) == 1  # single-order customer
    c3 = top[top["o_custkey"] == 3].sort_values("rnk")
    assert list(c3["o_orderkey"]) == [4, 5]  # tie broken by orderkey
    assert list(c3["rnk"]) == [1, 2]


def test_frequent_items_exact_under_adversarial_cardinality(ray_session):
    """Misra-Gries pass must return EXACTLY the phi-frequent keys even when
    every batch's cardinality far exceeds the sketch size (forcing the
    batched decrement), and partials must stay bounded by k+1 rows."""
    from parquet_converter_ray.profile import frequent_items

    rng = np.random.default_rng(11)
    # 3 heavy keys just above / at / far above the threshold + a long tail
    phi = 0.02
    heavy = np.concatenate([np.full(500, 1.0), np.full(205, 2.0), np.full(201, 3.0)])
    tail = rng.integers(1000, 9000, size=9094).astype(np.float64)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    got = frequent_items(_ds(vals, n_blocks=6), "x", phi=phi)

    ser = pd.Series(vals).value_counts()
    import math

    thresh = math.ceil(phi * len(vals))
    exp = ser[ser >= thresh].sort_index()
    assert list(got["key"].to_pylist()) == list(exp.index)
    assert list(got["cnt"].to_pylist()) == list(exp.values)


def test_frequent_items_nulls_and_empty(ray_session):
    import ray.data

    from parquet_converter_ray.profile import frequent_items

    t = pa.table({"x": pa.array([None, 7.0, 7.0, None, 1.0], pa.float64())})
    got = frequent_items(ray.data.from_arrow(t), "x", phi=0.5)
    # n excludes nulls: threshold = ceil(0.5*3) = 2 -> only 7.0
    assert got["key"].to_pylist() == [7.0] and got["cnt"].to_pylist() == [2]

    empty = pa.table({"x": pa.array([], pa.float64())})
    got = frequent_items(ray.data.from_arrow(empty), "x", phi=0.1)
    assert got.num_rows == 0


def test_hopping_window_membership(ray_session, tmp_path):
    """Every event lands in exactly N_HOPS consecutive windows containing it."""
    from parquet_converter_ray.pipelines.windows import events_hopping_window

    ts = pd.to_datetime(
        ["2024-01-01 00:07:00", "2024-01-01 00:16:00", "2024-01-01 03:59:59"]
    )
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "event_type": ["a", "a", "b"],
            "ts": ts.astype("datetime64[us]"),
            "value": [1.0, 2.0, 4.0],
            "payload": ["{}"] * 3,
        }
    )
    _write(tmp_path, "events", events)
    got = events_hopping_window(str(tmp_path)).to_pandas()
    # each event expands to 4 windows; events 1+2 share one window (00:00 hop
    # of e1's base vs -1 hop of e2) -> 'a' has 4+4-1... compute explicitly:
    a = got[got["event_type"] == "a"]
    b = got[got["event_type"] == "b"]
    assert a["n"].sum() == 8 and b["n"].sum() == 4  # 4 memberships per event
    # windows containing BOTH a-events: starts {23:30, 23:45, 00:00} (e1's
    # hop-starts {23:15..00:00} ∩ e2's {23:30..00:15})
    both = a[a["n"] == 2]
    assert both["sum_value"].tolist() == [3.0, 3.0, 3.0]
    assert [t.strftime("%H:%M") for t in sorted(both["window_start"])] == [
        "23:30", "23:45", "00:00",
    ]
    # window starts step by 15 min within each event's membership
    sa = sorted(a["window_start"])
    assert all((sa[i + 1] - sa[i]).total_seconds() % 900 == 0 for i in range(len(sa) - 1))


def test_top_bigrams_kernel_matches_python_reference(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.text import top_bigrams

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat sat on the mat",
                "the cat  ran",  # double space: regex \s+ collapse
                "solo",  # one token -> no bigram
                "",  # empty -> dropped
                None,  # null -> dropped
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
        }
    )
    _write(tmp_path, "documents", docs)
    got = top_bigrams(str(tmp_path), k=10).to_pandas()

    from collections import Counter

    ref = Counter()
    for t in ["the cat sat on the mat", "the cat ran"]:
        w = t.split()
        ref.update(" ".join(p) for p in zip(w, w[1:]))
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["bigram"], got["cnt"])) == exp


def test_grouped_firstk_partials_merge_across_batches(ray_session):
    """Rows for one group scattered across many blocks: first-k must merge
    partials, and each batch's partial contributes at most k rows per group."""
    import ray.data

    from parquet_converter_ray.pipelines.windows import grouped_firstk

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({"g": rng.integers(0, 5, n), "v": rng.permutation(n)})
    bounds = np.linspace(0, len(df), 9, dtype=int)
    tables = [
        pa.Table.from_pandas(df.iloc[a:b], preserve_index=False)
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    ds = ray.data.from_arrow(tables)
    got = (
        grouped_firstk(ds, ["g"], ["v"], 4)
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values("v").groupby("g", as_index=False).head(4)
        .sort_values(["g", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_event_intervals_single_event_user_and_ties(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.relational import event_intervals

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 00:01:00",
         "2024-01-01 05:00:00",  # user 2: single event -> dropped
         "2024-01-01 00:00:00", "2024-01-01 00:00:00"]  # user 3: tie ts
    )
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 6, 5],
            "user_id": [1, 1, 1, 2, 3, 3],
            "event_type": ["a"] * 6,
            "ts": ts.astype("datetime64[us]"),
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    _write(tmp_path, "events", events)
    got = event_intervals(str(tmp_path)).to_pandas().set_index("user_id")
    assert list(got.index) == [1, 3]  # user 2 dropped
    assert got.loc[1, "n_gaps"] == 2 and got.loc[1, "avg_gap_s"] == 30.0
    assert got.loc[1, "max_gap_s"] == 50.0
    assert got.loc[3, "n_gaps"] == 1 and got.loc[3, "max_gap_s"] == 0.0

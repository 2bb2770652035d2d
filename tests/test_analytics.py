"""Kernel-level tests for pipelines/analytics.py: HLL-per-group accuracy,
Bloom filter no-false-negatives, Chan co-moment merge stability, and
partitioning-invariance of the deterministic bottom-k sample."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_approx_group_distinct_close_to_exact(ray_session):
    from parquet_converter_ray.pipelines import analytics

    exact = analytics.distinct_users_by_type(SF_DIR).to_pandas().set_index("event_type")
    approx = (
        analytics.approx_distinct_users_by_type(SF_DIR).to_pandas().set_index("event_type")
    )
    assert set(exact.index) == set(approx.index)
    for t in exact.index:
        e, a = exact.loc[t, "n_users"], approx.loc[t, "n_users_approx"]
        # p=12 HLL at tiny cardinality runs in the linear-counting regime:
        # should be exact or off by at most ~2%
        assert abs(a - e) <= max(1, 0.05 * e), (t, e, a)


def test_bloom_no_false_negatives():
    from parquet_converter_ray.partition import stable_hash_ints
    from parquet_converter_ray.pipelines.analytics import _BLOOM_BITS, _bloom_positions

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=5000)
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    h = stable_hash_ints(pa.array(members, type=pa.int64()))
    for pos in _bloom_positions(h):
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    # every member must test positive
    mask = np.ones(len(h), dtype=bool)
    for pos in _bloom_positions(h):
        mask &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    assert mask.all()
    # false-positive rate on non-members stays near the design point
    others = rng.integers(2**62, 2**63, size=20000)
    ho = stable_hash_ints(pa.array(others, type=pa.int64()))
    mo = np.ones(len(ho), dtype=bool)
    for pos in _bloom_positions(ho):
        mo &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    # k=4, n=5000, m=2^20 -> theoretical fp ~ (1-exp(-kn/m))^k ~ 1.2e-7
    assert mo.sum() <= 5


def test_comoment_merge_order_invariant():
    from parquet_converter_ray.pipelines.analytics import (
        _comoment_merge,
        _comoment_partial,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(1e6, 1.0, size=9000)  # huge mean, tiny variance: the
    y = x * 1e-3 + rng.normal(0, 1e-3, size=9000)  # naive formula cancels here
    whole = _comoment_partial(x, y)
    # merge in chunks, two different orders
    chunks = [(x[i : i + 1000], y[i : i + 1000]) for i in range(0, 9000, 1000)]
    for order in (range(9), reversed(range(9))):
        acc = (0, 0.0, 0.0, 0.0, 0.0, 0.0)
        for i in order:
            acc = _comoment_merge(acc, _comoment_partial(*chunks[i]))
        corr_m = acc[5] / np.sqrt(acc[3] * acc[4])
        corr_w = whole[5] / np.sqrt(whole[3] * whole[4])
        assert acc[0] == whole[0]
        assert abs(corr_m - corr_w) < 1e-9


def test_grouped_order_stats_exact_with_value_gap(ray_session):
    """Two wanted ranks straddling a huge value gap must still converge (each
    rank refines in its own segment; a joint-span narrowing would stall)."""
    import ray.data

    from parquet_converter_ray.pipelines.analytics import _grouped_int_order_stats

    rng = np.random.default_rng(11)
    # even count, the two middle values separated by a 1e7 gap
    low = np.round(rng.uniform(0, 100, size=500), 2)
    high = np.round(rng.uniform(1e5, 1e5 + 100, size=500), 2)
    vals = np.concatenate([low, high])
    groups = np.array(["a"] * 1000)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.float64())})
    ).repartition(7)
    stats = _grouped_int_order_stats(ds, "g", "v", lambda n: [(n - 1) // 2, n // 2])
    n, resolved = stats["a"]
    assert n == 1000
    cents = np.sort(np.floor(vals * 100 + 0.5).astype(np.int64))
    assert resolved[499] == cents[499]
    assert resolved[500] == cents[500]


@pytest.mark.parametrize("override_rows", [64, 997])
def test_bottomk_sample_partition_invariant(ray_session, override_rows, monkeypatch):
    """The sample must not depend on how Ray batched the input: force small
    batch sizes through the map and compare against the single-batch result."""
    import pandas as pd

    from parquet_converter_ray.pipelines import analytics

    base = analytics.sample_orders_bottomk(SF_DIR).to_pandas()

    orig = analytics._t

    def small_batches(sf_dir, name, columns=None):
        ds = orig(sf_dir, name, columns)
        # re-slice into many tiny blocks so local_bottomk sees many partials
        return ds.repartition(max(2, ds.count() // override_rows))

    monkeypatch.setattr(analytics, "_t", small_batches)
    got = analytics.sample_orders_bottomk(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("o_orderkey").reset_index(drop=True),
        got.sort_values("o_orderkey").reset_index(drop=True),
    )


def test_weighted_sample_deterministic_and_biased(ray_session):
    from parquet_converter_ray.pipelines import analytics

    a = analytics.weighted_sample_orders(SF_DIR).to_pandas()
    b = analytics.weighted_sample_orders(SF_DIR).to_pandas()
    assert a.equals(b)
    # probability ~ totalprice: the sample's mean price must sit well above
    # the population mean (weighted sampling bias)
    import pyarrow.parquet as pq

    pop = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    pop_mean = float(np.mean(pop["o_totalprice"].to_numpy()))
    assert a["o_totalprice"].mean() > 1.15 * pop_mean
    # a different seed gives a different sample
    c = analytics.weighted_sample_orders(SF_DIR, seed=123).to_pandas()
    assert set(c["o_orderkey"]) != set(a["o_orderkey"])


def test_weighted_sample_partition_invariant(ray_session, monkeypatch):
    import pandas as pd

    from parquet_converter_ray.pipelines import analytics

    base = analytics.weighted_sample_orders(SF_DIR).to_pandas()
    orig = analytics._t

    def small(sf_dir, name, columns=None):
        ds = orig(sf_dir, name, columns)
        return ds.repartition(13)

    monkeypatch.setattr(analytics, "_t", small)
    got = analytics.weighted_sample_orders(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        base.sort_values("o_orderkey").reset_index(drop=True),
        got.sort_values("o_orderkey").reset_index(drop=True),
    )


def test_approx_quantiles_close_to_exact(ray_session):
    from parquet_converter_ray.pipelines import analytics
    from parquet_converter_ray.profile import exact_quantiles

    qs = (0.1, 0.25, 0.5, 0.75, 0.9)
    approx = analytics.approx_price_quantiles(SF_DIR, qs=qs).to_pandas()
    ds = analytics._t(SF_DIR, "orders", columns=["o_totalprice"])
    exact = exact_quantiles(ds, "o_totalprice", list(qs))
    spread = exact[-1] - exact[0]
    for got, want in zip(approx["approx_value"], exact):
        # bottom-k-hash sample of k=2000 over 1000 rows IS the full population
        # at sf0.001; allow sampling error at larger sf
        assert abs(got - want) <= 0.05 * spread + 1e-6, (got, want)


def test_salted_join_matches_plain_join(ray_session):
    """One mega-key (60% of the left side) — the salted join must return the
    exact multiset of rows the plain key-equality join produces."""
    import pandas as pd
    import ray.data

    from parquet_converter_ray.pipelines._util import salted_join

    rng = np.random.default_rng(5)
    keys = np.concatenate([np.zeros(6000, dtype=np.int64), rng.integers(1, 500, 4000)])
    left = pa.table({"k": pa.array(keys), "lv": pa.array(np.arange(len(keys)))})
    rkeys = np.arange(0, 500, dtype=np.int64)
    right = pa.table({"rk": pa.array(rkeys), "rv": pa.array(rkeys * 10)})
    lds = ray.data.from_arrow(left).repartition(6)
    rds = ray.data.from_arrow(right).repartition(3)
    got = salted_join(lds, rds, on="k", right_on="rk", salt=4).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(), left_on="k", right_on="rk")
    got_s = got.sort_values(["k", "lv"]).reset_index(drop=True)
    want_s = want[["k", "lv", "rv"]].sort_values(["k", "lv"]).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    pd.testing.assert_frame_equal(got_s[["k", "lv", "rv"]], want_s)

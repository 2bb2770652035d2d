"""Ordered / windowed relational operators the Dataset API lacks natively:
as-of join, range (interval) join, running + sliding window aggregates,
group-wise top-k rank, pivot, and exact distributed quantiles.

These extend the reference's surface (sami5001/parquet-converter analyzes and
converts; it has no ordered-join family) with the operators a transcript /
training-data pipeline needs around the codec engine — each expressed
Ray-Data-first and each with a DuckDB oracle in ``__ray_entry__.oracle_sql``.

Scale shapes (100 TB):
 - **as-of join**: both sides are tagged into a common schema, unioned, and
   hash-partitioned ONCE on the join key; the per-key merge is a vectorized
   ``searchsorted`` inside ``map_groups``. No repeated shuffles, no broadcast
   of the big side. A mega-key would salt by time like ``events_sessionize``
   (carrying each window's last-order row across the boundary).
 - **range join**: the interval table is tiny and static, so it ships once in
   the task closure (the broadcast-join shape of ``segment_revenue``); band
   assignment is one ``searchsorted`` per batch, aggregation is partial+final.
 - **window functions**: running/sliding sums are per-key sequential scans —
   groupby(key).map_groups with numpy cumsum/sliding kernels. Dollar amounts
   go through integer cents so the running sum is EXACTLY order-independent
   (float cumsum would diverge from the oracle's aggregation order in the
   last decimal).
 - **top-k per group**: per-batch local top-k partials (combiner) BEFORE the
   shuffle — the exchange carries ≤ k rows per (batch, key), not every row.
 - **pivot**: per-batch partial pivot (tiny fixed-width rows: one per
   (batch, user)) then a final groupby-sum — the shuffle carries partials.
 - **quantiles**: ``profile.exact_quantiles`` — histogram-selection in 2-3
   streaming passes, no sort shuffle (contrast ``exact_median``'s sort path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ._util import finish_on_driver, read_parquet_clean, sql_round


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# --- as-of join ---------------------------------------------------------------


def asof_join_events_orders(sf_dir: str) -> pa.Table:
    """For every event, the user's most recent order at-or-before the event
    timestamp (left as-of join, events ⟕ orders on user key, ts >= orderdate).

    Orders are first reduced to one row per (custkey, orderdate) — max price —
    so the as-of match is deterministic under timestamp ties (DuckDB's ASOF
    picks an arbitrary tied row otherwise). Oracle: ``ASOF LEFT JOIN``.
    """
    from ray.data.aggregate import Max

    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Max("o_totalprice", alias_name="o_price")
    )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["o_custkey"].cast(pa.int64()),
                "ts": b["o_orderdate"],
                "event_id": pa.nulls(len(b), pa.int64()),
                "price": b["o_price"].cast(pa.float64()),
                "side": pa.array(np.zeros(len(b), np.int8)),
            }
        )

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["user_id"].cast(pa.int64()),
                "ts": b["ts"],
                "event_id": b["event_id"].cast(pa.int64()),
                "price": pa.nulls(len(b), pa.float64()),
                "side": pa.array(np.ones(len(b), np.int8)),
            }
        )

    events = _t(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    both = o.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == 1]
        od = g[g["side"] == 0].sort_values("ts")
        ev_ts = ev["ts"].to_numpy()
        od_ts = od["ts"].to_numpy()
        od_price = od["price"].to_numpy()
        idx = np.searchsorted(od_ts, ev_ts, side="right") - 1
        hit = idx >= 0
        order_date = np.full(len(ev), np.datetime64("NaT", "us"))
        order_price = np.full(len(ev), np.nan)
        if hit.any():
            order_date[hit] = od_ts[idx[hit]]
            order_price[hit] = od_price[idx[hit]]
        return pd.DataFrame(
            {
                "event_id": ev["event_id"].to_numpy(),
                "user_id": ev["key"].to_numpy(),
                "order_date": order_date,
                "order_price": order_price,
            }
        )

    out = both.groupby("key").map_groups(merge, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["order_date"] = out["order_date"].astype("datetime64[us]")
    return pa.Table.from_pandas(out.sort_values("event_id"), preserve_index=False)


# --- range (interval) join ----------------------------------------------------

_QTY_EDGES = np.array([1.0, 10.0, 25.0, 40.0, 51.0])
_QTY_BANDS = np.array(["low", "mid", "high", "bulk"])


def quantity_band_revenue(sf_dir: str) -> pa.Table:
    """Revenue per quantity band — a range join (lineitem ⋈ bands ON
    lo <= l_quantity < hi) done as a broadcast interval lookup: the band table
    ships once in the closure, each batch does ONE ``searchsorted`` against the
    sorted edges, then the usual partial+final aggregation."""
    ds = _t(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice", "l_discount"])

    def band_partial(b: pa.Table) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(_QTY_EDGES, q, side="right") - 1
        ok = (idx >= 0) & (idx < len(_QTY_BANDS)) & (q >= _QTY_EDGES[0]) & (q < _QTY_EDGES[-1])
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"band": _QTY_BANDS[idx[ok]], "rev": rev[ok]})
        return df.groupby("band", as_index=False).agg(n=("rev", "size"), revenue=("rev", "sum"))

    out = finish_on_driver(
        ds.map_batches(band_partial, batch_format="pyarrow"), ["band"], ["n", "revenue"]
    )
    out["n"] = out["n"].astype("int64")
    out["revenue"] = sql_round(out["revenue"], 2)
    return pa.Table.from_pandas(out.sort_values("band"), preserve_index=False)


# --- running + sliding window aggregates ---------------------------------------


def customer_order_running(sf_dir: str) -> pa.Table:
    """Per customer, ordered by (orderdate, orderkey): running total of
    o_totalprice (ROWS UNBOUNDED PRECEDING) and 3-order sliding mean
    (ROWS 2 PRECEDING).

    Amounts are summed as integer cents so the result is bit-exact regardless
    of aggregation order (both sides of the oracle compare do the same).
    Per-key state is O(1) streaming; orders-per-customer is naturally bounded
    here — a hot key would use the sessionize salting pattern with per-salt
    prefix-sum offsets stitched in a second (salt-level, tiny) pass."""

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        cents = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        run = np.cumsum(cents)
        w = np.minimum(np.arange(len(cents)) + 1, 3)
        slide = run - np.concatenate([[0, 0, 0], run[:-3]])[: len(run)]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_custkey": g["o_custkey"].to_numpy(),
                "running_total": sql_round(run / 100.0, 2),
                "avg3": sql_round(slide / (100.0 * w), 4),
            }
        )

    ds = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = ds.groupby("o_custkey").map_groups(running, batch_format="pandas").to_pandas()
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("o_orderkey"), preserve_index=False)


# --- group-wise top-k (rank) ----------------------------------------------------


def top2_orders_per_customer(sf_dir: str) -> pa.Table:
    """Top-2 orders by totalprice per customer with their rank — the
    row_number()-per-partition shape. Per-batch local top-2 partials run
    BEFORE the shuffle, so the exchange carries ≤ 2 rows per (batch, key)."""
    by = ["o_custkey", "o_totalprice", "o_orderkey"]
    asc = [True, False, True]

    def local_top2(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().sort_values(by, ascending=asc)
        return df.groupby("o_custkey", as_index=False).head(2)

    def final_top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc).head(2).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]

    ds = _t(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = (
        ds.map_batches(local_top2, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(final_top2, batch_format="pandas")
        .to_pandas()
    )
    for c in ("o_custkey", "rnk", "o_orderkey"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.sort_values(["o_custkey", "rnk"]), preserve_index=False)


# --- pivot (long -> wide) -------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(sf_dir: str) -> pa.Table:
    """Pivot events long->wide: per user, total ``value`` per event type as
    one column each (missing combinations are 0, matching the oracle's
    COALESCE). Partial pivot per batch (one tiny wide row per (batch, user)),
    final groupby-sum — the shuffle moves fixed-width partials."""
    cols = [f"{t}_value" for t in _EVENT_TYPES]

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "event_type": b["event_type"].to_pandas(),
                "value": b["value"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.pivot_table(
            index="user_id", columns="event_type", values="value", aggfunc="sum", fill_value=0.0
        )
        p = p.reindex(columns=_EVENT_TYPES, fill_value=0.0)
        p.columns = cols
        return p.reset_index()

    from ray.data.aggregate import Sum

    ds = _t(sf_dir, "events", columns=["user_id", "event_type", "value"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    for c in cols:
        out[c] = sql_round(out[c], 4)
    return pa.Table.from_pandas(out.sort_values("user_id"), preserve_index=False)


# --- hopping (sliding) time window -----------------------------------------------

_HOP_US = 900_000_000  # 15 min hop
_N_HOPS = 4  # 60 min window = 4 hops


def events_hopping_window(sf_dir: str) -> pa.Table:
    """Sliding 60-minute window hopping every 15 minutes, per event type.
    Each event belongs to 4 overlapping windows, but rows are NEVER expanded:
    the batch first aggregates to tumbling 15-min HOP partials (one row per
    (type, hop) — the finest grain every window is a union of), and only
    those partials are tiled across the 4 window offsets. The 4x expansion
    multiplies partial rows, not raw rows, so the exchange carries
    ≤ 4 x types x hops-per-batch rows regardless of batch size. Contrast
    ``events_hourly_window``'s single-grain tumbling assignment."""
    ds = _t(sf_dir, "events", columns=["ts", "event_type", "value"])
    offs = np.arange(_N_HOPS, dtype=np.int64) * _HOP_US

    def assign(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hop = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "base": (ts // _HOP_US) * _HOP_US,
                "value": b["value"].to_numpy(zero_copy_only=False),
            }
        ).groupby(["event_type", "base"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        m = len(hop)
        return pd.DataFrame(
            {
                "event_type": np.tile(hop["event_type"].to_numpy(), _N_HOPS),
                "window_start": (
                    np.tile(hop["base"].to_numpy(), _N_HOPS)
                    - np.repeat(offs, m)
                ).astype("datetime64[us]"),
                "n": np.tile(hop["n"].to_numpy(), _N_HOPS),
                "sum_value": np.tile(hop["sum_value"].to_numpy(), _N_HOPS),
            }
        )

    out = finish_on_driver(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["event_type", "window_start"],
        ["n", "sum_value"],
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = sql_round(out["sum_value"], 4)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "window_start"]), preserve_index=False
    )


def events_window_unique_users(sf_dir: str) -> pa.Table:
    """EXACT distinct users per sliding 60-minute window (15-min hops) — the
    streaming-cardinality shape (unique visitors per sliding hour). Distinct
    is not mergeable from counts, so unlike ``events_hopping_window`` the
    exchange carries PAIRS, not partial sums: each batch emits its distinct
    (hop, user) pairs (bounded by hops x users-per-batch, never raw rows);
    one hash groupby keyed on USER dedups globally with no driver state
    (user groups are 4x fewer exchanged rows and far fewer keys than
    (window, user) — the many-small-groups overhead this package documents),
    each group tiles its active hops to the 4 overlapping windows in one
    ``np.unique``, and only the window-bounded count table is driver-merged.
    At 100 TB the pair exchange is the unavoidable cost of exactness — the
    approximate cousin is ``analytics.approx_distinct_users_by_type``'s HLL
    partials, which DO merge."""
    ds = _t(sf_dir, "events", columns=["ts", "user_id"])
    offs = np.arange(_N_HOPS, dtype=np.int64) * _HOP_US

    def assign(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "hop": (ts // _HOP_US) * _HOP_US,
            }
        ).drop_duplicates()

    # the exchange is keyed on USER (not (window, user)): Ray's per-key
    # aggregation overhead scales with group count, and tiling to windows
    # BEFORE the shuffle would also 4x the exchanged rows. Each user's group
    # tiles its active hops to windows and dedups in one np.unique; the
    # per-batch (window, count) partials it emits are window-bounded.
    def user_windows(g: pa.Table) -> pa.Table:
        hops = np.unique(g["hop"].to_numpy(zero_copy_only=False))
        wins = np.unique(hops[None, :] - offs[:, None])
        return pa.table({"window_start": pa.array(wins)})

    def cnt_partial(b: pa.Table) -> pd.DataFrame:
        w, c = np.unique(
            b["window_start"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pd.DataFrame({"window_start": w, "n_users": c.astype(np.int64)})

    out = finish_on_driver(
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(user_windows, batch_format="pyarrow")
        .map_batches(cnt_partial, batch_format="pyarrow"),
        ["window_start"],
        ["n_users"],
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("window_start").reset_index(drop=True), preserve_index=False
    )


def events_window_unique_users_approx(sf_dir: str, p: int = 12) -> pa.Table:
    """APPROXIMATE distinct users per sliding window — the mergeable-sketch
    dual of ``events_window_unique_users``: each batch emits one HLL register
    array PER HOP it touches (fixed 2^p bytes per (hop, batch), independent
    of user cardinality), the driver max-merges per hop, and because HLL
    union IS register max, each window's sketch is the merge of its 4 hop
    sketches. ZERO shuffles — the exact op's (hop, user) pair exchange
    disappears entirely, which is the whole trade at 100 TB. Accuracy is
    pytest-asserted against the exact op (~1.6% standard error at p=12)."""
    from ..partition import stable_hash_ints
    from ..profile import _hll_estimate, _hll_partial

    ds = _t(sf_dir, "events", columns=["ts", "user_id"])
    offs = np.arange(_N_HOPS, dtype=np.int64) * _HOP_US

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hop = (ts // _HOP_US) * _HOP_US
        h = stable_hash_ints(batch["user_id"])
        hops, regs = [], []
        for hv in np.unique(hop):
            hops.append(int(hv))
            regs.append(_hll_partial(h[hop == hv], p).tobytes())
        return pa.table(
            {"hop": pa.array(hops, pa.int64()), "reg": pa.array(regs, pa.binary())}
        )

    by_hop: dict[int, np.ndarray] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        reg = np.frombuffer(row["reg"], dtype=np.uint8)
        cur = by_hop.get(row["hop"])
        by_hop[row["hop"]] = reg if cur is None else np.maximum(cur, reg)

    wins: dict[int, np.ndarray] = {}
    for hv, reg in by_hop.items():
        for off in offs:
            w = int(hv - off)
            cur = wins.get(w)
            wins[w] = reg.copy() if cur is None else np.maximum(cur, reg)
    out = pd.DataFrame(
        {
            "window_start": np.array(sorted(wins), dtype="datetime64[us]"),
            "n_users_approx": [
                int(round(_hll_estimate(wins[w]))) for w in sorted(wins)
            ],
        }
    )
    out["n_users_approx"] = out["n_users_approx"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- frequent items (Misra-Gries sketch + exact verify pass) ----------------------


def frequent_quantities(sf_dir: str, phi: float = 0.019) -> pa.Table:
    """All l_quantity values occurring in >= phi of lineitem rows, with exact
    counts — two passes: a Misra-Gries summary (bounded state, ``profile.
    frequent_items``) finds a superset of candidates, an exact counting pass
    over just those keys finalises. Oracle: GROUP BY ... HAVING count >=
    ceil(phi * n)."""
    from ..profile import frequent_items

    ds = _t(sf_dir, "lineitem", columns=["l_quantity"])
    out = frequent_items(ds, "l_quantity", phi=phi)
    return pa.table(
        {
            "l_quantity": out["key"].cast(pa.float64()),
            "cnt": out["cnt"].cast(pa.int64()),
        }
    )


# --- exact distributed quantiles -------------------------------------------------

_QUANTILES = [0.25, 0.5, 0.75, 0.9, 0.99]


def price_quantiles(sf_dir: str) -> pa.Table:
    """Exact p25/p50/p75/p90/p99 of l_extendedprice via histogram-selection
    (``profile.exact_quantiles``) — 3 streaming passes, no sort shuffle.
    Oracle: quantile_cont."""
    from ..profile import exact_quantiles

    ds = _t(sf_dir, "lineitem", columns=["l_extendedprice"])
    vals = exact_quantiles(ds, "l_extendedprice", _QUANTILES)
    return pa.table(
        {
            "q": pa.array(_QUANTILES, pa.float64()),
            "value": pa.array([sql_round(v, 4) for v in vals], pa.float64()),
        }
    )


# --- stratified sample: first-k per group (grouped top-k) -------------------


def grouped_firstk(
    ds: "ray.data.Dataset", keys: list[str], order: list[str], k: int
) -> "ray.data.Dataset":
    """First k rows per group ordered by ``order`` — the stratified-sample /
    row_number()<=k shape. Per-batch local first-k partials (each batch
    contributes at most k rows PER GROUP to the exchange, independent of
    batch size), then a per-group merge of partials. The shuffle moves
    k x n_groups x n_batches rows, not the table."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(order, kind="mergesort").groupby(keys, as_index=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order, kind="mergesort").head(k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(final, batch_format="pandas")
    )


def docs_per_lang_sample(sf_dir: str, k: int = 3) -> pa.Table:
    """Deterministic stratified sample: the k smallest doc_ids per language.
    Oracle: QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id)<=k."""
    ds = _t(sf_dir, "documents", columns=["lang", "doc_id"])
    out = grouped_firstk(ds, ["lang"], ["doc_id"], k).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["lang", "doc_id"]), preserve_index=False
    )


def unpivot_customer(sf_dir: str) -> "ray.data.Dataset":
    """UNPIVOT / melt — the inverse of ``user_event_pivot``: wide numeric
    columns become (key, measure, value) long form. Pure map-only reshape
    (each batch melts independently via repeat/tile, no Python row loop, no
    shuffle); returned as a streaming Dataset since the output is input-sized."""
    measures = ["c_nationkey", "c_acctbal"]
    ds = _t(sf_dir, "customer", columns=["c_custkey", *measures])

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch["c_custkey"].to_numpy()
        return pa.table(
            {
                "c_custkey": np.concatenate([keys] * len(measures)),
                "measure": pa.array(np.repeat(measures, n)),
                "value": np.concatenate(
                    [batch[m].cast(pa.float64()).to_numpy() for m in measures]
                ),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")

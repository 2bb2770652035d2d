"""Relational / profiling query pipelines over the testdata star schema.

Each function takes ``sf_dir`` and returns a small materialised result
(pa.Table / pd.DataFrame) or a Dataset. Every query here is SQL-expressible and
registered with a DuckDB oracle in ``__ray_entry__.oracle_sql`` — column names
match the SQL aliases exactly (driver hashes values with columns sorted by
name).

Operator coverage (SURVEY.md §2.5/§2.6): A1 count, A2 null counts, A3 exact
distinct, A4 min/max/mean/std + exact median, A5 top-k frequency, T1 head,
plus filter/project/groupby pipelines and a broadcast hash join.

Scale notes (how each would behave at 100 TB):
 - aggregates use per-batch partial pre-aggregation inside ``map_batches``
   (the combiner pattern, so only one row per (batch, key) leaves the map);
   BOUNDED group spaces (segments, months, hours x types) finish on the
   driver (``_util.finish_on_driver`` — no exchange at all), DATA-SIZED key
   spaces (per-order, per-user) finish in a Ray ``groupby``;
 - the join broadcasts the small side once via ``ray.put`` and does a
   vectorized ``index_in`` lookup per batch — no shuffle of the big side;
 - reads prune columns at the parquet scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ._util import finish_on_driver, read_parquet_clean, sql_round


def _t(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# --- A1: count --------------------------------------------------------------


def count_lineitem(sf_dir: str) -> pa.Table:
    n = _t(sf_dir, "lineitem", columns=["l_orderkey"]).count()
    return pa.table({"n": pa.array([n], type=pa.int64())})


# --- A2/A3: null counts + exact distinct per column ------------------------


def null_unique_profile(sf_dir: str) -> pa.Table:
    """Per-column null_count + exact n_unique of orders (reference
    converter.py:624-630 / analyzer.py:197,261 parity)."""
    from ..profile import profile_dataset

    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    prof = profile_dataset(_t(sf_dir, "orders", columns=cols))
    return pa.table(
        {
            "col": pa.array(cols),
            "null_count": pa.array([prof["columns"][c]["null_count"] for c in cols], type=pa.int64()),
            "n_unique": pa.array([prof["columns"][c]["n_unique"] for c in cols], type=pa.int64()),
        }
    )


def approx_distinct_parts(sf_dir: str) -> pa.Table:
    """A3 at-scale: HyperLogLog approximate distinct of l_partkey — mergeable
    4 KB register partials per batch, no shuffle (vs the exact groupby in
    ``distinct_parts``). ~1% observed error at p=12; rows-only check
    (approximate by design), accuracy asserted vs exact in tests."""
    from ..profile import approx_distinct

    ds = _t(sf_dir, "lineitem", columns=["l_partkey"])
    n = approx_distinct(ds, "l_partkey")
    return pa.table({"n_unique_approx": pa.array([n], type=pa.int64())})


def distinct_parts(sf_dir: str) -> pa.Table:
    """Exact distinct count of a high-cardinality column — the distributed
    groupby fallback path (A3 at scale)."""
    ds = _t(sf_dir, "lineitem", columns=["l_partkey"])
    n = ds.groupby("l_partkey").count().count()
    return pa.table({"n_unique": pa.array([n], type=pa.int64())})


# --- A4: numeric stats ------------------------------------------------------


def numeric_stats_lineitem(sf_dir: str) -> pa.Table:
    from ..profile import profile_dataset

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    prof = profile_dataset(_t(sf_dir, "lineitem", columns=cols))
    rows = {"col": [], "min_v": [], "max_v": [], "mean_v": [], "std_v": []}
    for c in cols:
        p = prof["columns"][c]
        rows["col"].append(c)
        rows["min_v"].append(sql_round(p["min"], 4))
        rows["max_v"].append(sql_round(p["max"], 4))
        rows["mean_v"].append(sql_round(p["mean"], 4))
        rows["std_v"].append(sql_round(p["std"], 4))
    return pa.table(rows)


def median_totalprice(sf_dir: str) -> pa.Table:
    from ..profile import exact_median

    m = exact_median(_t(sf_dir, "orders", columns=["o_totalprice"]), "o_totalprice")
    return pa.table({"median_totalprice": pa.array([sql_round(m, 4)], type=pa.float64())})


# --- A5/T4: frequencies -----------------------------------------------------


def top5_orderpriority(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "orders", columns=["o_orderpriority"])
    out = (
        ds.groupby("o_orderpriority")
        .count()
        .sort(["count()", "o_orderpriority"], descending=[True, False])
        .limit(5)
        .to_pandas()
    )
    return pa.table(
        {"o_orderpriority": out["o_orderpriority"], "cnt": out["count()"].astype("int64")}
    )


def value_counts_returnflag(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "lineitem", columns=["l_returnflag"])
    out = ds.groupby("l_returnflag").count().to_pandas()
    return pa.table({"l_returnflag": out["l_returnflag"], "cnt": out["count()"].astype("int64")})


def mode_quantity_by_flag(sf_dir: str) -> pa.Table:
    """Exact per-group MODE (most frequent value, smallest-value tie-break):
    per-batch (flag, quantity) count partials — bounded by flags x distinct
    quantities, NOT by rows — merge on the driver, argmax per flag. The SQL
    mirror pins the same tie-break with a row_number window."""
    import pandas as pd

    from ._util import finish_on_driver

    ds = _t(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        g = batch.group_by(["l_returnflag", "l_quantity"]).aggregate([("l_quantity", "count")])
        return pd.DataFrame(
            {
                "l_returnflag": g["l_returnflag"].to_pylist(),
                "l_quantity": g["l_quantity"].to_numpy(zero_copy_only=False),
                "cnt": g["l_quantity_count"].to_numpy(zero_copy_only=False),
            }
        )

    tot = finish_on_driver(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_quantity"],
        ["cnt"],
    )
    tot = tot.sort_values(["l_returnflag", "cnt", "l_quantity"], ascending=[True, False, True])
    top = tot.groupby("l_returnflag", as_index=False).first().sort_values("l_returnflag")
    return pa.table(
        {
            "l_returnflag": pa.array(top["l_returnflag"], pa.string()),
            "mode_quantity": pa.array(top["l_quantity"].to_numpy(), pa.float64()),
            "cnt": pa.array(top["cnt"].astype("int64"), pa.int64()),
        }
    )


# --- T1/T2: ordered head/tail without a global sort --------------------------


def ordered_topk(
    ds: "ray.data.Dataset", keys: list[str], k: int, descending: bool = False
) -> pa.Table:
    """First/last k rows by ``keys`` WITHOUT shuffling the table: each batch
    keeps its local top-k (tiny partial), the driver merges the partials and
    takes the global top-k — same mergeable-partial shape as knn_bruteforce.
    A ``ds.sort().take(k)`` would move every block through an all-to-all
    exchange for k rows."""
    order = [(c, "descending" if descending else "ascending") for c in keys]

    def local_topk(batch: pa.Table) -> pa.Table:
        return batch.sort_by(order).slice(0, k)

    parts = pa.concat_tables(
        list(ds.map_batches(local_topk, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    return parts.sort_by(order).slice(0, k).combine_chunks()


def head_lineitem(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return ordered_topk(ds, ["l_orderkey", "l_linenumber"], 10)


# --- pricing summary (filter + project + partial-agg + groupby) -------------


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped: per (returnflag, linestatus) sums/averages with the
    per-batch combiner pattern; the 6-group final merge happens on the driver
    (no exchange)."""
    cutoff = pa.scalar(np.datetime64("2000-09-02", "us"), type=pa.timestamp("us"))
    ds = _t(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty": batch["l_quantity"].to_pandas(),
                "price": batch["l_extendedprice"].to_pandas(),
                "disc_price": pc.multiply(
                    batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
                ).to_pandas(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("price", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("qty", "size"),
        )
        return g

    agg = finish_on_driver(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_price", "sum_disc_price", "count_order"],
    )
    agg["avg_qty"] = sql_round(agg["sum_qty"] / agg["count_order"], 4)
    agg["avg_price"] = sql_round(agg["sum_base_price"] / agg["count_order"], 4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        agg[c] = sql_round(agg[c], 2)
    agg["count_order"] = agg["count_order"].astype("int64")
    return pa.Table.from_pandas(agg.sort_values(["l_returnflag", "l_linestatus"]), preserve_index=False)


# --- date scalar functions + grouped count ---------------------------------


def orders_by_month(sf_dir: str) -> pa.Table:
    ds = _t(sf_dir, "orders", columns=["o_orderdate"])

    def trunc(batch: pa.Table) -> pd.DataFrame:
        m = pc.floor_temporal(batch["o_orderdate"], unit="month").to_pandas()
        return pd.DataFrame({"month": m}).groupby("month", as_index=False).agg(n=("month", "size"))

    out = finish_on_driver(ds.map_batches(trunc, batch_format="pyarrow"), ["month"], ["n"])
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("month"), preserve_index=False)


# --- streaming-shaped tumbling window over events ---------------------------


def events_hourly_window(sf_dir: str) -> pa.Table:
    """Tumbling 1h window per event_type: window assignment is a vectorized
    map (no state needed for tumbling); per-batch (type, hour) partials
    finish on the driver — the window space is time-bounded."""
    ds = _t(sf_dir, "events", columns=["ts", "event_type", "value"])

    def assign(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "window_start": pc.floor_temporal(batch["ts"], unit="hour").to_pandas(),
                "value": batch["value"].to_pandas(),
            }
        )
        return df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )

    out = finish_on_driver(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["event_type", "window_start"],
        ["n", "sum_value"],
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = sql_round(out["sum_value"], 4)
    return pa.Table.from_pandas(out.sort_values(["event_type", "window_start"]), preserve_index=False)


# --- broadcast hash join ----------------------------------------------------


def segment_revenue(sf_dir: str) -> pa.Table:
    """orders ⋈ customer via broadcast: the small side ships once (ray.put),
    each batch does a vectorized index_in lookup — no shuffle of orders."""
    cust = (
        _t(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    keys = pa.array(cust["c_custkey"].to_numpy())
    segs = cust["c_mktsegment"].to_numpy()
    small_ref = ray.put((keys, segs))

    def lookup(batch: pa.Table) -> pd.DataFrame:
        k, s = ray.get(small_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=k).to_numpy(zero_copy_only=False)
        seg = np.where(idx >= 0, s[np.maximum(idx, 0)], None)
        df = pd.DataFrame({"c_mktsegment": seg, "o_totalprice": batch["o_totalprice"].to_pandas()})
        return df.groupby("c_mktsegment", as_index=False).agg(
            total=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    out = finish_on_driver(
        _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
            lookup, batch_format="pyarrow"
        ),
        ["c_mktsegment"],
        ["total", "n_orders"],
    )
    out["total"] = sql_round(out["total"], 2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("c_mktsegment"), preserve_index=False)


# --- anti-join (broadcast key set, vectorized filter) ------------------------


def customers_without_orders(sf_dir: str) -> pa.Table:
    """Customers with no order above $400k — anti-join via a broadcast key
    set + vectorized ``is_in`` filter (no shuffle of either side beyond the
    tiny key set; the Bloom-filter variant at 10^12 scale is the same shape)."""
    big_orders = (
        _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: b.filter(pc.greater(b["o_totalprice"], 400_000.0)).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    keys = pa.array(np.unique(big_orders["o_custkey"].to_numpy()))
    ref = ray.put(keys)

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.invert(pc.is_in(batch["c_custkey"], value_set=ks))
        return batch.filter(mask).select(["c_custkey"])

    out = _t(sf_dir, "customer", columns=["c_custkey"]).map_batches(anti, batch_format="pyarrow")
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by("c_custkey")


# --- session windows (gap-based, per-key map_groups over sorted groups) ------


def events_sessionize(sf_dir: str, gap_minutes: int = 30, salt_days: int = 1) -> pa.Table:
    """Gap-based session windows per user, HOT-USER SAFE: the heavy shuffle is
    keyed on (user_id, salt) where salt = the event's epoch-day bucket, so a
    mega-user's events spread across groups instead of pinning one reducer.
    Sessions are cut exactly within each salt window (phase 1), then stitched
    across window boundaries in a second, SESSION-LEVEL groupby(user_id)
    (phase 2) — per-user state there is sessions, not events, so it is bounded
    even for a user with billions of events. Result is identical to the
    unsalted single-group computation (asserted against the SQL window-function
    oracle and a dedicated mega-user skew test)."""
    gap = np.timedelta64(gap_minutes * 60_000_000, "us")
    salt_us = salt_days * 86_400_000_000

    def add_salt(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()), pa.scalar(salt_us, type=pa.int64()))
        return batch.append_column("salt", pc.cast(day, pa.int32()))

    def sessions_in_salt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy()
        new_s = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_s[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(new_s)
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "sid": sid, "ts": ts})
        return out.groupby(["user_id", "sid"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size")
        )[["user_id", "session_start", "session_end", "n_events"]]

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # sessions from adjacent salt windows merge iff the boundary gap is
        # within ``gap``; chained merges are exact because a merge never moves
        # a session's last-event time
        g = g.sort_values("session_start")
        start = g["session_start"].to_numpy()
        end = g["session_end"].to_numpy()
        new_s = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_s[1:] = ((start[1:] - end[:-1]) > gap).astype(np.int64)
        sid = np.cumsum(new_s)
        out = pd.DataFrame(
            {"sid": sid, "session_start": start, "n_events": g["n_events"].to_numpy()}
        )
        out = out.groupby("sid", as_index=False).agg(
            session_start=("session_start", "min"), n_events=("n_events", "sum")
        )
        out["user_id"] = g["user_id"].iloc[0]
        return out[["user_id", "session_start", "n_events"]]

    ds = _t(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        add_salt, batch_format="pyarrow"
    )
    per_salt = ds.groupby(["user_id", "salt"]).map_groups(sessions_in_salt, batch_format="pandas")
    out = per_salt.groupby("user_id").map_groups(stitch, batch_format="pandas").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["session_start"] = out["session_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(out.sort_values(["user_id", "session_start"]), preserve_index=False)


# --- JSON scalar extraction --------------------------------------------------


def events_json_mean(sf_dir: str) -> pa.Table:
    """Extract props->'k' (JSON) per event, average per event_type — the JSON
    scalar-function family (reference uses JSON only for config/report I/O;
    this is the data-plane variant a transcript pipeline needs). Extraction is
    a vectorized RE2 kernel (pc.extract_regex), not per-row json.loads."""
    _KEY_RE = r'"k"\s*:\s*(?P<k>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)'

    def extract(batch: pa.Table) -> pd.DataFrame:
        hit = pc.extract_regex(batch["props"], pattern=_KEY_RE)
        ks = pc.struct_field(hit, "k").cast(pa.float64())
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(), "k": ks.to_pandas()}
        )
        return df.groupby("event_type", as_index=False).agg(k_sum=("k", "sum"), n=("k", "size"))

    out = finish_on_driver(
        _t(sf_dir, "events", columns=["event_type", "props"]).map_batches(
            extract, batch_format="pyarrow"
        ),
        ["event_type"],
        ["k_sum", "n"],
    )
    out["mean_k"] = sql_round(out["k_sum"] / out["n"], 4)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out[["event_type", "mean_k", "n"]].sort_values("event_type"), preserve_index=False
    )


# --- per-key event sequences (ordered aggregation within groups) -------------


def user_event_sequence(sf_dir: str) -> pa.Table:
    """Event-type sequence per user, ordered by (ts, event_id) — the ordered
    string-aggregation shape of conversation reassembly (groupby + sorted
    within-group join). Oracle: string_agg(... ORDER BY ts, event_id)."""

    def seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "seq": [",".join(g["event_type"])]}
        )

    ds = _t(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    out = ds.groupby("user_id").map_groups(seq, batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("user_id"), preserve_index=False)


def tail_lineitem(sf_dir: str) -> pa.Table:
    """T2: tail (reference analyzer.py:344) via per-batch descending top-k
    partials — no global sort."""
    ds = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return ordered_topk(ds, ["l_orderkey", "l_linenumber"], 5, descending=True)


def ts_range_orders(sf_dir: str) -> pa.Table:
    """Timestamp min/max profiling (profile_dataset ts path)."""
    from ..profile import profile_dataset

    prof = profile_dataset(_t(sf_dir, "orders", columns=["o_orderdate"]))
    c = prof["columns"]["o_orderdate"]
    return pa.table(
        {
            "min_ts": pa.array([np.datetime64(c["min"], "us")], type=pa.timestamp("us")),
            "max_ts": pa.array([np.datetime64(c["max"], "us")], type=pa.timestamp("us")),
        }
    )


# --- large-large hash join (native Dataset.join, Ray >= 2.46) ---------------


def order_lineitem_join(sf_dir: str) -> pa.Table:
    """Revenue per order priority via a LARGE-LARGE hash join
    (``Dataset.join`` — hash-partitioned on the key, both sides shuffle).
    Contrast with ``segment_revenue``'s broadcast join for small sides."""
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    items = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})

    from .dedup import _npartitions

    items = items.map_batches(revenue, batch_format="pyarrow")
    joined = orders.join(
        items, join_type="inner", num_partitions=_npartitions(),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"o_orderpriority": batch["o_orderpriority"].to_pandas(), "rev": batch["rev"].to_pandas()}
        )
        return df.groupby("o_orderpriority", as_index=False).agg(revenue=("rev", "sum"), n=("rev", "size"))

    out = finish_on_driver(
        joined.map_batches(partial, batch_format="pyarrow"), ["o_orderpriority"], ["revenue", "n"]
    )
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("o_orderpriority"), preserve_index=False)


# --- multi-table join chains (TPC-H Q3/Q5 shapes) ----------------------------


def _broadcast_map(ds: "ray.data.Dataset", key: str, val: str):
    """Materialise a DIMENSION-sized (key -> value) pair of arrays and ship it
    once via ``ray.put``; batches look values up with vectorized index_in."""
    df = ds.to_pandas()
    return ray.put((pa.array(df[key].to_numpy()), df[val].to_numpy()))


def _lookup(ref, keys: pa.ChunkedArray) -> np.ndarray:
    ks, vs = ray.get(ref)
    idx = pc.fill_null(pc.index_in(keys, value_set=ks), -1).to_numpy(zero_copy_only=False)
    found = idx >= 0
    out = np.full(len(idx), None, dtype=object)
    out[found] = vs[idx[found]]
    return out


def q5_local_supplier_revenue(sf_dir: str, region: str = "ASIA") -> pa.Table:
    """TPC-H Q5 shape: revenue per nation where the customer's and supplier's
    nation match, inside one region — a SIX-table join chain. The dimension
    chain (region -> nation -> supplier, plus customer's nation) broadcasts
    once; the single genuinely large-large edge (orders ⋈ lineitem) is the
    only shuffle; the final per-nation aggregate is a bounded driver merge.
    At 100 TB customer outgrows broadcast — swap its lookup for a second hash
    join keyed on custkey; every other edge stays broadcast."""
    nation = _t(sf_dir, "nation").to_pandas()
    reg = _t(sf_dir, "region").to_pandas()
    ok_regions = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nation = nation[nation["n_regionkey"].isin(ok_regions)]
    nation_name = dict(zip(nation["n_nationkey"], nation["n_name"]))

    supp = _t(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nation_name)]
    supp_ref = ray.put((pa.array(supp["s_suppkey"].to_numpy()), supp["s_nationkey"].to_numpy()))

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nation_name)]
    cust_ref = ray.put((pa.array(cust["c_custkey"].to_numpy()), cust["c_nationkey"].to_numpy()))

    def orders_with_nation(batch: pa.Table) -> pa.Table:
        ks, vs = ray.get(cust_ref)
        idx = pc.fill_null(pc.index_in(batch["o_custkey"], value_set=ks), -1).to_numpy(zero_copy_only=False)
        found = idx >= 0
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(found)),
                "cust_nation": pa.array(vs[idx[found]], type=pa.int32()),
            }
        )

    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        orders_with_nation, batch_format="pyarrow"
    )

    def item_rev(batch: pa.Table) -> pa.Table:
        ks, vs = ray.get(supp_ref)
        idx = pc.fill_null(pc.index_in(batch["l_suppkey"], value_set=ks), -1).to_numpy(zero_copy_only=False)
        found = idx >= 0
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(pa.array(found)),
                "supp_nation": pa.array(vs[idx[found]], type=pa.int32()),
                "rev": rev.filter(pa.array(found)),
            }
        )

    items = _t(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(item_rev, batch_format="pyarrow")

    from .dedup import _npartitions

    joined = orders.join(
        items, join_type="inner", num_partitions=_npartitions(),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        same = pc.equal(batch["cust_nation"], batch["supp_nation"])
        b = batch.filter(same)
        df = pd.DataFrame({"nk": b["cust_nation"].to_pandas(), "rev": b["rev"].to_pandas()})
        g = df.groupby("nk", as_index=False).agg(revenue=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("nk", as_index=False).agg(revenue=("revenue", "sum"))
    out["n_name"] = out["nk"].map(nation_name)
    out["revenue"] = sql_round(out["revenue"], 2)
    return pa.Table.from_pandas(
        out[["n_name", "revenue"]].sort_values("n_name"), preserve_index=False
    )


def q3_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pa.Table:
    """TPC-H Q3 shape: top-k orders by discounted revenue for one customer
    segment, orders placed before / lineitems shipped after a date — broadcast
    the filtered customer keys, ONE hash join orders ⋈ lineitem, per-batch
    revenue partials into a small keyed groupby, driver-merged local top-k
    (no global sort)."""
    cutoff = pa.scalar(np.datetime64("1998-01-01", "us"), type=pa.timestamp("us"))
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = pa.array(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy())
    cust_ref = ray.put(keys)

    def filt_orders(batch: pa.Table) -> pa.Table:
        ks = ray.get(cust_ref)
        m = pc.and_(pc.is_in(batch["o_custkey"], value_set=ks), pc.less(batch["o_orderdate"], cutoff))
        return batch.filter(m).select(["o_orderkey", "o_orderdate"])

    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        filt_orders, batch_format="pyarrow"
    )

    def filt_items(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})

    items = _t(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(filt_items, batch_format="pyarrow")

    from .dedup import _npartitions

    joined = orders.join(
        items, join_type="inner", num_partitions=_npartitions(),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_pandas(),
                "o_orderdate": batch["o_orderdate"].to_pandas(),
                "rev": batch["rev"].to_pandas(),
            }
        )
        g = df.groupby(["o_orderkey", "o_orderdate"], as_index=False).agg(revenue=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        return batch.sort_by([("revenue", "descending"), ("o_orderkey", "ascending")]).slice(0, k)

    parts = pa.concat_tables(
        list(agg.map_batches(local_topk, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    top = parts.sort_by([("revenue", "descending"), ("o_orderkey", "ascending")]).slice(0, k)
    out = top.to_pandas()
    out["revenue"] = sql_round(out["revenue"], 2)
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return pa.Table.from_pandas(out[["o_orderkey", "o_orderdate", "revenue"]], preserve_index=False)


def brand_revenue(sf_dir: str) -> pa.Table:
    """Revenue per part brand — broadcast dimension join (part is
    dimension-sized) + per-batch partials + bounded driver merge."""
    part_ref = _broadcast_map(
        _t(sf_dir, "part", columns=["p_partkey", "p_brand"]), "p_partkey", "p_brand"
    )

    def partial(batch: pa.Table) -> pa.Table:
        brand = _lookup(part_ref, batch["l_partkey"])
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        df = pd.DataFrame({"p_brand": brand, "rev": rev.to_pandas()})
        df = df[df["p_brand"].notna()]
        g = df.groupby("p_brand", as_index=False).agg(revenue=("rev", "sum"), n=("rev", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        _t(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.groupby("p_brand", as_index=False).agg(revenue=("revenue", "sum"), n=("n", "sum"))
    out["revenue"] = sql_round(out["revenue"], 2)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("p_brand"), preserve_index=False)


# --- hierarchical rollup (multi-level re-aggregation) ------------------------


def rollup_revenue(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): discounted revenue + count
    at three grains. Only the FINEST grain touches the data (per-batch
    combiner + one small groupby); the (flag, NULL) and (NULL, NULL) levels
    are re-aggregated from the finest result (a handful of rows) on the
    driver — the standard rollup trick that avoids one scan per grain."""
    ds = _t(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "disc": disc.to_pandas(),
            }
        )
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("disc", "size"), s=("disc", "sum")
        )

    fine = finish_on_driver(
        ds.map_batches(partial, batch_format="pyarrow"), ["l_returnflag", "l_linestatus"], ["n", "s"]
    )
    lvl1 = fine.groupby("l_returnflag", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "n": [fine["n"].sum()],
            "s": [fine["s"].sum()],
        }
    )
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["sum_disc_price"] = sql_round(out["s"], 2)
    out["n"] = out["n"].astype("int64")
    out = out[["l_returnflag", "l_linestatus", "n", "sum_disc_price"]]
    return pa.Table.from_pandas(
        out.sort_values(["l_returnflag", "l_linestatus"], na_position="first"),
        preserve_index=False,
    )


# --- per-key ordered gaps (lag/lead window family) ---------------------------


def event_intervals(sf_dir: str) -> pa.Table:
    """Inter-event gap stats per user (count / avg / max seconds) — the
    lag() window shape. The shuffle is the same per-user exchange as
    ``user_event_sequence``; gaps are a vectorized ``diff`` inside each
    group (users with one event have no gap and drop out, matching the
    oracle's ``WHERE gap IS NOT NULL``). Hot users would salt exactly as
    ``events_sessionize`` does (gaps only need one boundary row per salt)."""

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        d = g["ts"].diff().dt.total_seconds().iloc[1:]
        if d.empty:
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "avg_gap_s": [], "max_gap_s": []}
            )
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_gaps": [len(d)],
                "avg_gap_s": [d.mean()],
                "max_gap_s": [d.max()],
            }
        )

    ds = _t(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    out = ds.groupby("user_id").map_groups(gaps, batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    out["avg_gap_s"] = sql_round(out["avg_gap_s"], 4)
    out["max_gap_s"] = sql_round(out["max_gap_s"], 4)
    return pa.Table.from_pandas(out.sort_values("user_id"), preserve_index=False)


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#13") -> pa.Table:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20% of
    the average quantity for their (brand-filtered) part — the CORRELATED
    scalar-aggregate subquery, decorrelated the way a distributed planner
    does it:

      pass 0  brand part keys        (tiny dimension filter, broadcast)
      pass 1  per-part (sum, count) quantity partials over a 2-column pruned
              lineitem scan restricted to those keys -> thresholds finish on
              the driver (bounded by the brand's part count, a fixed fraction
              of the part dimension — NOT by lineitem)
      pass 2  second pruned scan; vectorized index_in against the broadcast
              threshold table; sum(l_extendedprice) partials -> driver

    Zero shuffles: both passes are map-only with bounded broadcast state.
    """
    parts = _t(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    keys = pa.array(parts.loc[parts["p_brand"] == brand, "p_partkey"].to_numpy())
    keys_ref = ray.put(keys)

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        k = ray.get(keys_ref)
        batch = batch.filter(pc.is_in(batch["l_partkey"], value_set=k))
        if batch.num_rows == 0:
            return pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        df = pd.DataFrame({"l_partkey": batch["l_partkey"].to_numpy(),
                           "q": batch["l_quantity"].to_numpy()})
        g = df.groupby("l_partkey", as_index=False).agg(s=("q", "sum"), n=("q", "size"))
        return g

    stats = finish_on_driver(
        _t(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"]).map_batches(
            qty_partial, batch_format="pyarrow"
        ),
        ["l_partkey"],
        ["s", "n"],
    )
    thr_keys = pa.array(stats["l_partkey"].to_numpy())
    thr_vals = 0.2 * stats["s"].to_numpy() / stats["n"].to_numpy()
    thr_ref = ray.put((thr_keys, thr_vals))

    def rev_partial(batch: pa.Table) -> pd.DataFrame:
        tk, tv = ray.get(thr_ref)
        idx = pc.fill_null(pc.index_in(batch["l_partkey"], value_set=tk), -1).to_numpy(
            zero_copy_only=False
        )
        hit = idx >= 0
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = hit & (q < tv[np.maximum(idx, 0)])
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({"k": [0], "rev": [float(ext[keep].sum())]})

    tot = finish_on_driver(
        _t(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
            rev_partial, batch_format="pyarrow"
        ),
        ["k"],
        ["rev"],
    )
    avg_yearly = sql_round(tot["rev"].to_numpy() / 7.0, 2)
    return pa.table({"avg_yearly": pa.array(avg_yearly, pa.float64())})


def q14_promo_revenue(sf_dir: str, year: int = 1996) -> pa.Table:
    """TPC-H Q14 shape: the PROMO share of discounted revenue for one ship
    year. Broadcast dimension join (part type by partkey via ``ray.put`` +
    ``index_in``), date predicate applied batch-wise on a 4-column pruned
    scan, numerator/denominator as per-batch partials — zero shuffles."""
    parts = _t(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    keys = pa.array(parts["p_partkey"].to_numpy())
    promo = (parts["p_type"].to_numpy() == "PROMO").astype(np.bool_)
    ref = ray.put((keys, promo))
    lo = np.datetime64(f"{year}-01-01", "us").astype("int64")
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype("int64")

    def partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= lo) & (ship < hi)
        if not m.any():
            return pd.DataFrame({"k": [0], "promo": [0.0], "total": [0.0]})
        k, is_promo = ray.get(ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)[m]
        rev = (
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
        )
        idx = pc.fill_null(pc.index_in(pa.array(pk), value_set=k), -1).to_numpy(
            zero_copy_only=False
        )
        hit = idx >= 0
        p = is_promo[np.maximum(idx, 0)] & hit
        return pd.DataFrame({"k": [0], "promo": [float(rev[p].sum())], "total": [float(rev[hit].sum())]})

    cols = ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    tot = finish_on_driver(
        _t(sf_dir, "lineitem", columns=cols).map_batches(partial, batch_format="pyarrow"),
        ["k"],
        ["promo", "total"],
    )
    pct = sql_round(100.0 * tot["promo"].to_numpy() / tot["total"].to_numpy(), 4)
    return pa.table({"promo_revenue_pct": pa.array(pct, pa.float64())})


_Q19_BRANCHES = (
    # (brand, max size, qty lo, qty hi) — TPC-H Q19's shape (the classic
    # OR-of-conjunctions benchmark query) over the synth columns; size bands
    # widened so the smallest sf still selects rows
    ("Brand#12", 15, 1.0, 11.0),
    ("Brand#23", 20, 10.0, 20.0),
    ("Brand#34", 25, 20.0, 30.0),
)


def q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-band,
    quantity-band) conjunctions spanning BOTH join sides. The part dimension
    broadcasts once via ``ray.put`` (brand id + size per partkey); each
    lineitem batch maps partkeys with one vectorized ``index_in``, evaluates
    the three branch masks in numpy and ORs them — zero shuffles, one scan,
    revenue partials merged on the driver."""
    parts = _t(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    brands = [b for b, _, _, _ in _Q19_BRANCHES]
    bid = np.full(len(parts), -1, dtype=np.int8)
    pb = parts["p_brand"].to_numpy()
    for i, b in enumerate(brands):
        bid[pb == b] = i
    ref = ray.put(
        (pa.array(parts["p_partkey"].to_numpy()), bid, parts["p_size"].to_numpy().astype(np.int32))
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        keys, branch_id, size = ray.get(ref)
        idx = pc.fill_null(pc.index_in(batch["l_partkey"], value_set=keys), -1).to_numpy(
            zero_copy_only=False
        )
        hit = idx >= 0
        j = np.maximum(idx, 0)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = np.zeros(len(idx), dtype=bool)
        for i, (_, size_hi, qlo, qhi) in enumerate(_Q19_BRANCHES):
            m |= (
                hit
                & (branch_id[j] == i)
                & (size[j] >= 1)
                & (size[j] <= size_hi)
                & (qty >= qlo)
                & (qty <= qhi)
            )
        if not m.any():
            return pd.DataFrame({"k": [0], "revenue": [0.0]})
        rev = (
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)[m])
        )
        return pd.DataFrame({"k": [0], "revenue": [float(rev.sum())]})

    cols = ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    tot = finish_on_driver(
        _t(sf_dir, "lineitem", columns=cols).map_batches(partial, batch_format="pyarrow"),
        ["k"],
        ["revenue"],
    )
    return pa.table(
        {"revenue": pa.array(sql_round(tot["revenue"].to_numpy(), 2), pa.float64())}
    )


def session_duration_quantiles(
    sf_dir: str, gap_minutes: int = 30, qs: tuple = (0.5, 0.9, 0.99)
) -> pa.Table:
    """Exact session-duration quantiles — end-to-end composition of two scale
    primitives: the hot-user-safe salted sessionizer (``events_sessionize``
    dataflow, carrying session_end through the stitch) feeding the
    shuffle-free histogram-refinement selector (``profile.exact_quantiles``).
    The session set stays a streaming Dataset between the stages; nothing
    data-sized ever lands on the driver."""
    gap = np.timedelta64(gap_minutes * 60_000_000, "us")
    salt_us = 86_400_000_000

    def add_salt(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()), pa.scalar(salt_us, type=pa.int64()))
        return batch.append_column("salt", pc.cast(day, pa.int32()))

    def sessions_in_salt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy()
        new_s = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_s[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(new_s)
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "sid": sid, "ts": ts})
        return out.groupby(["user_id", "sid"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max")
        )[["user_id", "session_start", "session_end"]]

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start")
        start = g["session_start"].to_numpy()
        end = g["session_end"].to_numpy()
        new_s = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_s[1:] = ((start[1:] - end[:-1]) > gap).astype(np.int64)
        sid = np.cumsum(new_s)
        out = pd.DataFrame({"sid": sid, "session_start": start, "session_end": end})
        out = out.groupby("sid", as_index=False).agg(
            session_start=("session_start", "min"), session_end=("session_end", "max")
        )
        dur = (
            out["session_end"].to_numpy().astype("datetime64[us]").astype("int64")
            - out["session_start"].to_numpy().astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame({"duration_sec": dur.astype(np.float64) / 1e6})

    sessions = (
        _t(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby(["user_id", "salt"])
        .map_groups(sessions_in_salt, batch_format="pandas")
        .groupby("user_id")
        .map_groups(stitch, batch_format="pandas")
        # exact_quantiles is multi-pass BY DESIGN (min/max, histogram, bin
        # collect); without pinning, every pass would re-execute both
        # sessionize shuffles. The session table is orders of magnitude
        # smaller than the event stream (one row per session), so this is
        # the one intermediate worth materializing (62.7 s -> ~7 s at sf0.1)
        .materialize()
    )
    from ..profile import exact_quantiles

    vals = exact_quantiles(sessions, "duration_sec", list(qs))
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "duration_sec": pa.array(sql_round(np.array(vals), 4), pa.float64()),
        }
    )

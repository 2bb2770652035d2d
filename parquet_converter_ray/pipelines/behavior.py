"""Behavioral / product-analytics operators over the events stream: funnel
progression, cohort retention, last-event-per-user (argmax), dense gap-filled
daily series, and month-over-month growth on an aggregate.

All five follow the mergeable-partial discipline used across this package:
per-batch vectorized kernels emit bounded partials, finished on the driver
when the final key space is bounded (users, months, days x types). The funnel
and cohort operators additionally exploit that the USER dimension of an
events stream is orders of magnitude smaller than the event count (every
events-table operator here — sessionize, pivot, sequence — already holds a
per-user row); the per-user state carried between funnel passes is one int64
timestamp per user, broadcast once via ``ray.put``, never per batch.

Scale notes (100 TB):
 - ``event_funnel`` is k sequential PRUNED scans (user_id, event_type, ts
   only) for a k-stage funnel — no shuffle at all; stage timestamps are
   per-batch min-partials merged on the driver. Sequential passes are the
   price of the *ordered* semantics (stage n must happen AFTER stage n-1);
   a single-scan variant would need per-user event-time lists in a shuffle.
 - ``cohort_retention`` carries distinct (user, month) pairs per batch —
   the same pair-dedup combiner as ``analytics.distinct_users_by_type``.
 - ``latest_event_per_user`` is the argmax-by-key shape: one candidate row
   per (user, batch) partial, driver keeps the lexicographic max.
 - ``events_daily_gapfill`` merges (type, day) count partials, then builds
   the dense spine driver-side — spine size is time-bounded, not data-bounded.
 - ``revenue_mom_growth`` sums integer cents per month (exact, order-free)
   and applies the lag/pct window on the bounded month table driver-side.
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


# --- funnel analysis ---------------------------------------------------------


def _stage_min_ts(sf_dir: str, etype: str, prev: "pd.Series | None") -> "pd.Series":
    """min event ts (int64 us) per user for ``etype``, restricted to events at
    or after the user's ``prev``-stage timestamp. ``prev`` (one int64 per
    funnel-qualified user) is broadcast once via ``ray.put``."""
    ds = _t(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    if prev is not None:
        prev_ref = ray.put((pa.array(prev.index.to_numpy()), prev.to_numpy()))
    else:
        prev_ref = None

    def partial(batch: pa.Table) -> pd.DataFrame:
        t = batch.filter(pc.equal(batch["event_type"], etype))
        uid = t["user_id"].to_numpy()
        ts = t["ts"].cast(pa.int64()).to_numpy()
        if prev_ref is not None:
            keys, tmin = ray.get(prev_ref)
            idx = pc.fill_null(pc.index_in(t["user_id"], value_set=keys), -1).to_numpy(
                zero_copy_only=False
            )
            ok = (idx >= 0) & (ts >= tmin[np.maximum(idx, 0)])
            uid, ts = uid[ok], ts[ok]
        return (
            pd.DataFrame({"user_id": uid, "t": ts})
            .groupby("user_id", as_index=False)
            .agg(t=("t", "min"))
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby("user_id")["t"].min()


def event_funnel(
    sf_dir: str, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> pa.Table:
    """Ordered funnel: a user reaches stage n if they performed stages[n] at
    or after their stage n-1 completion time (min-time semantics). One pruned
    scan per stage, min-timestamp partials merged driver-side, previous-stage
    times broadcast once — zero shuffles."""
    rows = []
    prev = None
    for i, etype in enumerate(stages):
        prev = _stage_min_ts(sf_dir, etype, prev)
        rows.append({"stage_idx": i + 1, "stage": etype, "n_users": len(prev)})
    out = pd.DataFrame(rows)
    out["stage_idx"] = out["stage_idx"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# --- cohort retention --------------------------------------------------------


def cohort_retention(sf_dir: str) -> pa.Table:
    """Users active in month (cohort + offset), cohort = month of first event.
    Two partial families from ONE scan: per-batch per-user min ts, and
    per-batch distinct (user, month) pairs; both driver-merged (users x months
    is bounded). The join of activity months to cohorts happens on the merged
    per-user table — never on the event stream."""
    ds = _t(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy()
        month = pc.floor_temporal(batch["ts"], unit="month").to_pandas().to_numpy()
        pairs = pd.DataFrame({"user_id": uid, "m": month}).drop_duplicates()
        first = (
            pd.DataFrame({"user_id": uid, "t": batch["ts"].to_pandas().to_numpy()})
            .groupby("user_id", as_index=False)
            .agg(t=("t", "min"))
        )
        return pairs.merge(first, on="user_id", how="left")

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    first = parts.groupby("user_id")["t"].min()
    cohort = first.dt.to_period("M").dt.to_timestamp()
    active = parts[["user_id", "m"]].drop_duplicates()
    co = cohort.loc[active["user_id"]].to_numpy()
    off = active["m"].to_numpy().astype("datetime64[M]").astype(np.int64) - co.astype(
        "datetime64[M]"
    ).astype(np.int64)
    out = (
        pd.DataFrame({"cohort_month": co, "month_offset": off})
        .groupby(["cohort_month", "month_offset"], as_index=False)
        .agg(n_users=("month_offset", "size"))
    )
    out["month_offset"] = out["month_offset"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["cohort_month", "month_offset"]), preserve_index=False
    )


# --- argmax-by-key: last event per user --------------------------------------


def latest_event_per_user(sf_dir: str) -> pa.Table:
    """LAST_VALUE per user (argmax by (ts, event_id)): each batch keeps one
    candidate row per user present in it, the driver keeps the lexicographic
    max of the candidates — no sort, no shuffle."""
    ds = _t(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def candidates(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_id": batch["event_id"].to_numpy(),
                "last_ts": batch["ts"].to_pandas().to_numpy(),
                "last_event_type": batch["event_type"].to_pandas().to_numpy(),
            }
        )
        return df.sort_values(["user_id", "last_ts", "event_id"]).drop_duplicates(
            "user_id", keep="last"
        )

    parts = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["user_id", "last_ts", "event_id"])
        .drop_duplicates("user_id", keep="last")
        .drop(columns=["event_id"])
    )
    return pa.Table.from_pandas(out.sort_values("user_id"), preserve_index=False)


# --- dense gap-filled daily series -------------------------------------------


def events_daily_gapfill(sf_dir: str) -> pa.Table:
    """Daily event counts per type on a DENSE day spine (missing days emit 0)
    — the time-series gap-fill shape. Count partials merge driver-side; the
    spine (days x types) is built in numpy from the merged bounds, so the
    fill never touches the event stream."""
    ds = _t(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "day": pc.floor_temporal(batch["ts"], unit="day").to_pandas(),
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).agg(n=("day", "size"))

    counts = finish_on_driver(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type", "day"], ["n"]
    )
    days = counts["day"].to_numpy().astype("datetime64[D]")
    spine_days = np.arange(days.min(), days.max() + np.timedelta64(1, "D"))
    types = np.sort(counts["event_type"].unique())
    spine = pd.DataFrame(
        {
            "event_type": np.repeat(types, len(spine_days)),
            "day": np.tile(spine_days.astype("datetime64[us]"), len(types)),
        }
    )
    out = spine.merge(counts, on=["event_type", "day"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "day"]), preserve_index=False
    )


# --- window-over-aggregate: month-over-month growth --------------------------


def revenue_mom_growth(sf_dir: str) -> pa.Table:
    """Monthly revenue with month-over-month % change. Per-batch integer-cent
    sums per month (exact under any merge order) finish on the driver; the
    lag window runs on the bounded month table. First month's pct is NULL."""
    ds = _t(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "month": pc.floor_temporal(batch["o_orderdate"], unit="month").to_pandas(),
                "cents": cents,
            }
        )
        return df.groupby("month", as_index=False).agg(cents=("cents", "sum"))

    m = finish_on_driver(
        ds.map_batches(partial, batch_format="pyarrow"), ["month"], ["cents"]
    ).sort_values("month")
    cents = m["cents"].to_numpy()
    prev = np.roll(cents, 1).astype(np.float64)
    mom = sql_round((cents - np.roll(cents, 1)) * 100.0 / prev, 4)
    out = pd.DataFrame(
        {
            "month": m["month"].to_numpy(),
            "revenue": sql_round(cents / 100.0, 2),
            "mom_pct": np.where(np.arange(len(cents)) == 0, np.nan, mom),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def purchase_error_window(sf_dir: str, window_minutes: int = 60) -> pa.Table:
    """Interval join: for every purchase event, count error events from the
    SAME user whose ts falls in [purchase_ts - window, purchase_ts]; returns
    the distribution (n_errors, n_purchases).

    The scale shape is a bucketed band join — the generic plan for
    equi-key + bounded-range predicates Ray Data has no native operator for:
    time is cut into buckets exactly one window wide; each BUILD row (error)
    is replicated to its own bucket and the next one (the only two buckets
    whose purchases it can precede within the window), each PROBE row
    (purchase) lands in exactly ONE group, so per-purchase counts are final
    inside the group and need no second shuffle (replicating probes instead
    would force a per-purchase partial-sum exchange). Replication factor is
    fixed at 2x on a 3-column slice, independent of data size; within each
    (user, bucket) group the count is two vectorized ``searchsorted`` calls
    against the sorted error timestamps. The n_errors histogram finishes with
    bounded per-batch partials on the driver.
    """
    W = np.int64(window_minutes) * 60_000_000  # window in microseconds

    ds = _t(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def bucketize(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        batch = batch.filter(pc.is_in(et, value_set=pa.array(["purchase", "error"])))
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        is_p = pc.equal(batch["event_type"], "purchase").to_numpy(zero_copy_only=False)
        bucket = ts // W
        e_uid, e_ts, e_b = uid[~is_p], ts[~is_p], bucket[~is_p]
        return pa.table(
            {
                "user_id": np.concatenate([uid[is_p], e_uid, e_uid]),
                "bucket": np.concatenate([bucket[is_p], e_b, e_b + 1]),
                "kind": np.concatenate(
                    [
                        np.ones(int(is_p.sum()), np.int8),
                        np.zeros(2 * len(e_ts), np.int8),
                    ]
                ),
                "ts_us": np.concatenate([ts[is_p], e_ts, e_ts]),
            }
        )

    def count_in_group(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        pts = ts[kind == 1]
        if not len(pts):
            return pa.table({"n_errors": pa.array([], pa.int64())})
        ets = np.sort(ts[kind == 0])
        n = np.searchsorted(ets, pts, side="right") - np.searchsorted(
            ets, pts - W, side="left"
        )
        return pa.table({"n_errors": n.astype(np.int64)})

    def hist_partial(batch: pa.Table) -> pd.DataFrame:
        vals, counts = np.unique(
            batch["n_errors"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pd.DataFrame({"n_errors": vals, "n_purchases": counts.astype(np.int64)})

    grouped = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(count_in_group, batch_format="pyarrow")
    )
    out = finish_on_driver(
        grouped.map_batches(hist_partial, batch_format="pyarrow"),
        ["n_errors"],
        ["n_purchases"],
    ).sort_values("n_errors")
    return pa.Table.from_pandas(out, preserve_index=False)


def user_rolling_peak(sf_dir: str, frame: int = 4) -> pa.Table:
    """ROWS-frame rolling aggregate: per user, the PEAK of the rolling mean of
    ``value`` over the last ``frame`` events (ROWS frame-1 PRECEDING..CURRENT,
    ordered by ts then event_id) — the windowed-aggregate family
    (lag/lead live in ``event_intervals``; this is the sliding-frame shape).

    One shuffle: ``groupby(user_id)``; inside each group the rolling mean is
    a cumsum difference (no per-row loop) and only the per-user PEAK leaves
    the group, so the result is user-bounded, not event-bounded. Assumes one
    user's history fits a worker (same contract as ``events_sessionize``,
    which documents the salted-key escape hatch for mega-users; a salted
    variant here would stitch frames across chunk boundaries by shipping each
    chunk's first ``frame-1`` rows to its successor).
    """
    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def peak(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(zero_copy_only=False),
                g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            )
        )
        v = g["value"].to_numpy(zero_copy_only=False)[order]
        cs = np.concatenate(([0.0], np.cumsum(v)))
        width = np.minimum(np.arange(1, len(v) + 1), frame)
        roll = (cs[1:] - cs[np.maximum(np.arange(1, len(v) + 1) - frame, 0)]) / width
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "max_roll": pa.array([float(roll.max())], pa.float64()),
            }
        )

    out = ds.groupby("user_id").map_groups(peak, batch_format="pyarrow").to_pandas()
    out = out.sort_values("user_id")
    out["max_roll"] = sql_round(out["max_roll"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def user_rolling_peak_salted(sf_dir: str, frame: int = 4) -> pa.Table:
    """Skew-safe variant of ``user_rolling_peak`` — same result, same SQL
    oracle, but the shuffle key is (user_id, epoch-day) so a mega-user's
    history never has to fit one worker (the salting contract
    ``events_sessionize`` established, applied to a ROWS frame).

    A ROWS window crosses chunk boundaries, so each (user, day) group emits a
    BOUNDED stitch payload instead of its rows: the exact rolling peak over
    its full-window rows, plus its first/last ``frame-1`` (ts, id, value)
    boundary rows. A second user-keyed pass walks days in order carrying a
    ``frame-1``-deep value buffer, recomputes the head rows' windows exactly
    (a day with fewer than ``frame-1`` rows simply leaves the buffer spanning
    multiple days), and folds in the chunk-local peaks. State per user is
    O(days x frame), never O(events).
    """
    day_us = 86_400_000_000
    ds = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def add_day(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        return batch.append_column("day", pc.divide(ts, day_us))

    def day_partial(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(zero_copy_only=False),
                g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            )
        )
        v = g["value"].to_numpy(zero_copy_only=False)[order]
        n = len(v)
        b = frame - 1
        # full-window rows (index >= frame-1) have all predecessors in-day:
        # their rolling means are final here
        if n >= frame:
            cs = np.concatenate(([0.0], np.cumsum(v)))
            idx = np.arange(frame, n + 1)
            full = ((cs[idx] - cs[idx - frame]) / frame).max()
        else:
            full = -np.inf
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "day": pa.array([int(g["day"][0].as_py())], pa.int64()),
                "peak_full": pa.array([float(full)], pa.float64()),
                "head": pa.array([v[: min(b, n)].tolist()], pa.list_(pa.float64())),
                "tail": pa.array([v[max(n - b, 0) :].tolist()], pa.list_(pa.float64())),
            }
        )

    def stitch(g: pa.Table) -> pa.Table:
        order = np.argsort(g["day"].to_numpy(zero_copy_only=False), kind="stable")
        peaks = g["peak_full"].to_numpy(zero_copy_only=False)[order]
        heads = [g["head"][int(i)].as_py() for i in order]
        tails = [g["tail"][int(i)].as_py() for i in order]
        best = -np.inf
        buf: list[float] = []
        for pk, head, tail in zip(peaks, heads, tails):
            best = max(best, pk)
            seq = buf + head
            for j in range(len(head)):
                pos = len(buf) + j
                lo = max(0, pos - frame + 1)
                best = max(best, float(np.mean(seq[lo : pos + 1])))
            buf = (buf + tail)[-(frame - 1) :]
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "max_roll": pa.array([best], pa.float64()),
            }
        )

    out = (
        ds.map_batches(add_day, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .map_groups(day_partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(stitch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
    )
    out["max_roll"] = sql_round(out["max_roll"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)

"""Benchmark harness — prints ONE JSON line with the headline numbers.

Headline: the north-star transcript pipeline at sf-proportional scale
(sf0.1 -> 600k turns): deterministic synth input (cached on disk) ->
encode (hash-partition + sort + codec auto-select + containers) ->
decode (full read-back) — plus a set of representative query pipelines
over $GRAFT_SF_DIR.

    python bench.py                 # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh processes at 8 and 32 CPUs,
                                    # reports throughput at both + efficiency

The scaling mode is the sandbox evidence for the north rule's two-cluster-size
criterion (no real multi-node cluster here): same input, same pipeline, two
parallelism levels in fresh ray.init sessions.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/pcr_cache"


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    from parquet_converter_ray.decode import decode_dataset
    from parquet_converter_ray.encode import encode_dataset
    from parquet_converter_ray.pipelines import dedup, relational, similarity, text
    from parquet_converter_ray.pipelines.transcripts import _input_dir, _scale_rows

    n_turns = int(os.environ.get("PCR_BENCH_ROWS", 0)) or _scale_rows(SF_DIR)
    inp = _input_dir(n_turns)  # cached deterministic synth

    # reference size: parquet+snappy of the same table, one output per input
    # file exactly like the reference converter (converter.py:222) — cached
    ref_dir = os.path.join(CACHE, f"reference-{n_turns}")
    marker = os.path.join(ref_dir, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(ref_dir, ignore_errors=True)
        os.makedirs(ref_dir)
        for f in sorted(os.listdir(inp)):
            if f.endswith(".parquet"):
                pq.write_table(
                    pq.read_table(os.path.join(inp, f)),
                    os.path.join(ref_dir, f),
                    compression="snappy",
                )
        open(marker, "w").close()
    ref_bytes = sum(
        os.path.getsize(os.path.join(ref_dir, f))
        for f in os.listdir(ref_dir)
        if f.endswith(".parquet")
    )

    # warm page cache (measure compute+shuffle, not first disk read)
    ray.data.read_parquet(inp).count()

    out_dir = os.path.join(CACHE, f"bench-encoded-{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)

    page_shuffle = bool(int(os.environ.get("PCR_PAGE_SHUFFLE", "0")))
    t0 = time.monotonic()
    summary = encode_dataset(inp, out_dir, salt_rows=50_000, page_shuffle=page_shuffle)
    t_encode = time.monotonic() - t0

    t0 = time.monotonic()
    decoded_rows = decode_dataset(out_dir).count()
    t_decode = time.monotonic() - t0
    assert decoded_rows == summary["rows"], "decode row count mismatch"

    headline = t_encode + t_decode

    queries = {"encode": round(t_encode, 3), "decode": round(t_decode, 3)}
    if os.environ.get("PCR_BENCH_HEADLINE_ONLY"):
        query_list = []
    else:
        query_list = [
        ("pricing_summary", relational.pricing_summary),
        ("events_hourly_window", relational.events_hourly_window),
        ("segment_revenue", relational.segment_revenue),
        ("median_totalprice", relational.median_totalprice),
        ("token_counts", text.token_counts),
        ("dedup_exact", dedup.dedup_exact),
        ("dedup_minhash", dedup.dedup_minhash),
        ("knn_bruteforce", similarity.knn_bruteforce),
    ]
    for name, fn in query_list:
        t0 = time.monotonic()
        fn(SF_DIR)
        queries[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "transcript encode+decode wall clock (sf-proportional synth input)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": summary["rows"],
        "turns_per_sec": round(summary["rows"] / t_encode, 1),
        "gb_per_sec": round(summary["bytes_in"] / t_encode / 1e9, 4),
        "bytes_in_arrow": summary["bytes_in"],
        "bytes_encoded": summary["bytes_out"],
        "bytes_reference_parquet": ref_bytes,
        "compressed_vs_reference": round(summary["bytes_out"] / ref_bytes, 4),
        "partitions": summary["partitions"],
    }
    ray.shutdown()
    return result


def run_weak_scaling() -> dict:
    """Weak scaling: fixed work PER CPU (8 CPUs @ 2.4M turns vs 32 CPUs @
    9.6M turns) — the regime a real cluster grows in (4x nodes, 4x data).
    Efficiency = T(N, W) / T(4N, 4W)."""

    def one(ncpu: int, rows: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            PCR_BENCH_ROWS=str(rows),
            PCR_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    base_rows = 2_400_000
    # min-of-3 per level, interleaved (same host-noise windows for both)
    runs_lo, runs_hi = [], []
    for _ in range(3):
        runs_lo.append(one(8, base_rows))
        runs_hi.append(one(32, base_rows * 4))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    return {
        "metric": "weak-scaling efficiency (4x CPUs, 4x data), fresh ray sessions",
        "sec_lo_8cpu": r_lo["value"],
        "sec_hi_32cpu": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "weak_scaling_efficiency": round(r_lo["value"] / r_hi["value"], 3),
        "throughput_ratio_vs_4x": round(r_hi["turns_per_sec"] / (4 * r_lo["turns_per_sec"]), 3),
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), PCR_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # min-of-3 per level, INTERLEAVED lo/hi: the sandbox VM is shared
    # (identical back-to-back runs vary >2x from host contention); alternating
    # levels exposes both to the same noise windows, and the least-contended
    # run per level is the honest measure. Sub-runs skip the query suite.
    runs_lo, runs_hi = [], []
    for _ in range(3):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (encode+decode), fresh ray sessions",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--weak-scaling" in sys.argv:
        print(json.dumps(run_weak_scaling()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

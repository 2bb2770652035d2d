"""Training-shard export: seeded global shuffle + sharded parquet write.

The final stage of a training-data pipeline — after curation/dedup the corpus
is globally shuffled (so shards are i.i.d.) and written as N parquet shards a
data loader can stream independently. The shuffle is Ray Data's distributed
``random_shuffle`` (an all-to-all exchange — inherent to i.i.d. sharding);
the write is one file per block so a failed export resumes per shard.

Verification never trusts the writer: the shards are READ BACK and content
invariants (row count, id sum, id sum-of-squares — together they detect any
loss/duplication mix) are reduced per batch and merged on the driver, which
is how an operator at 100 TB would self-check without materializing anything.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd  # noqa: F401
import pyarrow as pa

import ray.data

from ._util import join_num_partitions, read_parquet_clean


def export_shards(
    sf_dir: str,
    out_dir: str | None = None,
    n_shards: int = 8,
    seed: int = 42,
    keep_output: bool = False,
) -> pa.Table:
    """Shuffle the documents corpus with a fixed seed, write ``n_shards``
    parquet shards, read them back, and return the content invariants
    (total_rows, sum_doc_id, sum_doc_id_sq) computed from the READ-BACK data.

    Oracle = the same invariants straight off the source table, so the whole
    shuffle→write→read loop is checked to be loss- and duplication-free."""
    cleanup = False
    if out_dir is None:
        out_dir = f"/tmp/pcr_export_{uuid.uuid4().hex[:12]}"
        cleanup = not keep_output
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet")
    docs.random_shuffle(seed=seed).repartition(n_shards).write_parquet(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "total_rows": pa.array([len(ids)], pa.int64()),
                "sum_doc_id": pa.array([int(ids.sum())], pa.int64()),
                "sum_doc_id_sq": pa.array([int((ids * ids).sum())], pa.int64()),
            }
        )

    try:
        back = read_parquet_clean(out_dir, columns=["doc_id"])
        parts = pa.concat_tables(
            list(
                back.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return pa.table(
        {
            "total_rows": pa.array([int(sum(parts["total_rows"].to_pylist()))], pa.int64()),
            "sum_doc_id": pa.array([int(sum(parts["sum_doc_id"].to_pylist()))], pa.int64()),
            "sum_doc_id_sq": pa.array(
                [int(sum(parts["sum_doc_id_sq"].to_pylist()))], pa.int64()
            ),
        }
    )


def shard_file_stats(out_dir: str) -> dict:
    """Shard layout facts for tests/manifests: file count and per-file rows."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    rows = [pq.read_metadata(f).num_rows for f in files]
    return {"n_files": len(files), "rows_per_file": rows}


# --- data-mixture sampling (per-source rate-based downsampling) ---------------


def mix_sources(sf_dir: str) -> pa.Table:
    """Deterministic data-mixture downsampling: keep each document with a
    per-source rate (even-numbered sources 100%, odd-numbered 35% — the
    upweight-curated / downweight-crawl shape of training mixtures), selected
    by ``doc_id % 100 < rate`` so the sample is reproducible and SQL-checkable.
    Returns the post-mix census per source: (source, n_docs, n_tokens).

    Scale shape: the filter and token count are one vectorized map_batches;
    the census group space is bounded (one row per source), so partials are
    merged on the driver — no exchange anywhere."""
    import pyarrow.compute as pc

    from ._util import finish_on_driver

    def partial(batch: pa.Table) -> pa.Table:
        num = batch["source"].to_pandas().str[3:].astype(np.int64).to_numpy()
        rate = np.where(num % 2 == 0, 100, 35)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(ids % 100 < rate))
        trimmed = pc.utf8_trim_whitespace(kept["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, type=pa.int64()), n)
        t = pa.table({"source": kept["source"], "n_docs": pa.array(np.ones(len(kept), np.int64)), "n_tokens": n})
        return t

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).map_batches(partial, batch_format="pyarrow")
    out = finish_on_driver(ds, keys=["source"], sums=["n_docs", "n_tokens"])
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- deterministic train/val/test split ---------------------------------------


def export_wds(
    sf_dir: str,
    out_dir: str | None = None,
    n_shards: int = 8,
    keep_output: bool = False,
) -> pa.Table:
    """WebDataset-style tar shard export (public format: a tar whose members
    group per-sample files by key — ``{key}.txt`` payload, ``{key}.json``
    metadata — streamed by PyTorch's WebDataset loader). Shard assignment is
    a content-stable hash of doc_id (re-runs land every sample in the same
    shard: resumable, diffable); each shard writes in ONE ``map_groups``
    task with members sorted by key and zeroed mtimes, so shard bytes are
    deterministic. Returns the per-shard manifest computed from the WRITTEN
    tars (read back via stdlib tarfile — the writer is never trusted).

    At 100 TB: shard count scales with corpus size, each task holds one
    shard's rows (bound batch/shard size accordingly), the tar write is
    sequential I/O, and the verification read is per-shard parallel."""
    import io
    import json
    import tarfile

    from ..partition import stable_hash_ints

    cleanup = False
    if out_dir is None:
        out_dir = f"/tmp/pcr_wds_{uuid.uuid4().hex[:12]}"
        cleanup = not keep_output
    os.makedirs(out_dir, exist_ok=True)
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        h = stable_hash_ints(batch["doc_id"].cast(pa.int64()))
        return batch.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int32))
        )

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        shard = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        with tarfile.open(path, "w") as tf:
            for _, row in g.iterrows():
                key = f"{int(row['doc_id']):09d}"
                txt = (row["text"] or "").encode()
                meta = json.dumps(
                    {"lang": row["lang"], "source": row["source"]}, sort_keys=True
                ).encode()
                for suffix, payload in ((".txt", txt), (".json", meta)):
                    info = tarfile.TarInfo(key + suffix)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic bytes across runs
                    tf.addfile(info, io.BytesIO(payload))
        return pd.DataFrame({"shard": [shard], "path": [path]})

    written = (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )

    def verify(batch: pa.Table) -> pa.Table:
        shards, samples, ids, total = [], [], [], []
        for p, s in zip(batch["path"].to_pylist(), batch["shard"].to_pylist()):
            n = 0
            id_sum = 0
            nbytes = 0
            with tarfile.open(p, "r") as tf:
                for m in tf.getmembers():
                    if m.name.endswith(".txt"):
                        n += 1
                        id_sum += int(m.name[:-4])
                    nbytes += m.size
            shards.append(s)
            samples.append(n)
            ids.append(id_sum)
            total.append(nbytes)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_samples": pa.array(samples, pa.int64()),
                "sum_doc_id": pa.array(ids, pa.int64()),
                "payload_bytes": pa.array(total, pa.int64()),
            }
        )

    try:
        man = pa.concat_tables(
            list(
                ray.data.from_pandas(written)
                .map_batches(verify, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            )
        ).sort_by("shard")
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return man


def split_assign(sf_dir: str) -> pa.Table:
    """Content-deterministic train/val/test assignment (~80/10/10): the first
    two hex chars of ``md5(str(doc_id))`` are compared as strings against the
    'cc' / 'e6' cut points (204/256 = 79.7% train, 26/256 = 10.15% each for
    val and test) — the same document lands in the same split on every run,
    machine, and engine (SQL oracle uses the identical md5 prefix rule).
    Per-row md5 is the same C-loop cost accepted in doc_fingerprint."""
    import hashlib

    import pandas as pd

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        pref = batch["doc_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest()[:2])
        split = np.where(pref < "cc", "train", np.where(pref < "e6", "val", "test"))
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "split": split})

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        f, batch_format="pandas"
    )
    out = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return out.sort_by("doc_id").combine_chunks()


# --- sequence packing (fill context windows before tokenized export) ----------


def pack_sequences(sf_dir: str, capacity: int = 256, group_size: int = 1000) -> pa.Table:
    """Greedy next-fit sequence packing: concatenate documents (by doc_id
    order) into bins of at most ``capacity`` whitespace tokens — the packing
    step that turns curated documents into dense fixed-length training
    sequences. A document longer than ``capacity`` gets its own (oversize)
    bin, per standard practice. Returns one row per bin:
    (bin_id, n_docs, n_tokens).

    Scale shape: packing is LOCAL by construction — documents are grouped by
    ``doc_id // group_size`` (a shard-sized, deterministic key), each group is
    packed independently inside ``groupby().map_groups`` and bin ids are
    globally unique as (group, local bin). The sequential next-fit loop runs
    over one bounded group, not the corpus; token counts come in vectorized."""
    import pyarrow.compute as pc

    def count_tokens(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, type=pa.int64()), n)
        grp = pc.divide(batch["doc_id"], group_size).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "grp": grp, "n_tokens": n})

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(toks), dtype=np.int64)
        b, fill = 0, 0
        for i, t in enumerate(toks):
            if fill > 0 and fill + t > capacity:
                b, fill = b + 1, 0
            bins[i] = b
            fill += t
        grp = int(g["grp"].iloc[0])
        out = pd.DataFrame({"bin": bins, "n_tokens": toks})
        agg = out.groupby("bin").agg(n_docs=("bin", "size"), n_tokens=("n_tokens", "sum"))
        agg = agg.reset_index()
        agg["bin_id"] = grp * 1_000_000 + agg["bin"]
        return agg[["bin_id", "n_docs", "n_tokens"]]

    counted = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(count_tokens, batch_format="pyarrow")
    # NB: with very few groups Ray's map_groups emits trailing empty blocks
    # (a benign "RefBundle with a different schema" executor warning even at
    # num_partitions=1); at real scale groups >> blocks and it disappears
    ds = counted.groupby("grp").map_groups(pack_group, batch_format="pandas")
    out = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    out = out.sort_by("bin_id").combine_chunks()
    return out.set_column(1, "n_docs", out["n_docs"].cast(pa.int64()))

"""Similarity search over the ``embeddings`` table (list<float> column).

 - knn_bruteforce: exact cosine top-k against a broadcast query vector; each
   batch computes a local top-k (pruning) and the tiny per-batch results are
   reduced on the driver — the shuffle-free pattern for single-query ANN.
 - knn_lsh: random-hyperplane LSH bucketing (the scale path): vectors are
   bucketed by sign pattern; the query probes its own bucket plus the
   neighbouring buckets within Hamming distance 1; exact cosine re-rank on
   the candidates only. Deterministic seeded planes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ._util import read_parquet_clean, sql_round


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def knn_bruteforce(sf_dir: str, query_id: int = 0, k: int = 10) -> pa.Table:
    """Exact cosine top-k for the embedding of ``vec_id == query_id``.

    Oracle: DuckDB list_cosine_similarity ORDER BY cos DESC, vec_id LIMIT k."""
    q = _query_vector(sf_dir, query_id)
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ qv
        keep = ids != query_id
        ids, cos = ids[keep], cos[keep]
        if len(ids) > k:
            part = np.argpartition(-cos, k)[:k]
            ids, cos = ids[part], cos[part]
        return pd.DataFrame({"vec_id": ids.astype("int64"), "cos": cos})

    parts = _emb(sf_dir).map_batches(local_topk, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = sql_round(parts["cos"], 4)
    return pa.Table.from_pandas(parts, preserve_index=False)


def range_search(sf_dir: str, modulus: int = 97, threshold: float = 0.30) -> pa.Table:
    """Radius (range) search: ALL corpus vectors within cosine >= threshold
    of EACH query vector (here the ``vec_id % modulus == 0`` subset) — the
    third ANN query shape next to top-k (`knn_*`) and self-join near-dup
    (`dedup_embedding*`). The query matrix is small by definition and
    broadcasts once via ``ray.put``; each corpus batch computes its
    (batch x queries) cosine block in one matmul and emits only matches —
    a single streaming pass, no shuffle. For query sets too large to
    broadcast, bucket BOTH sides with the hyperplane-LSH tables
    (`dedup.MultiTableLsh`) and verify per bucket instead.
    Oracle: DuckDB list_cosine_similarity theta-join."""
    qi_parts, qm_parts = [], []
    for b in _emb(sf_dir).iter_batches(batch_format="pandas"):
        ids = b["vec_id"].to_numpy()
        sel = (ids % modulus) == 0
        if sel.any():
            qi_parts.append(ids[sel])
            qm_parts.append(np.stack(b["embedding"].to_numpy()[sel]).astype(np.float64))
    qids = np.concatenate(qi_parts)
    qm = np.concatenate(qm_parts)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    order = np.argsort(qids)
    qids, qm = qids[order], qm[order]
    ref = ray.put((qids, qm))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        qi, q = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ q.T  # (batch, queries)
        ii, jj = np.nonzero((cos >= threshold) & (ids[:, None] != qi[None, :]))
        return pd.DataFrame(
            {
                "query_id": qi[jj].astype("int64"),
                "vec_id": ids[ii].astype("int64"),
                "cos": cos[ii, jj],
            }
        )

    out = _emb(sf_dir).map_batches(block, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    out["cos"] = sql_round(out["cos"].to_numpy(), 4)
    return pa.Table.from_pandas(out, preserve_index=False)


_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def train_centroids(sf_dir: str, k: int = 16, iters: int = 8, seed: int = 4242) -> np.ndarray:
    """Deterministic k-means-lite over a contiguous sample of the embeddings —
    the (small, driver-side) training step of an IVF index. At 10^12 scale the
    sample is a bounded read; the assignment pass below is the distributed
    part. Returns L2-normalized centroids (cosine k-means).

    Trained ONCE per (file, params) and cached in-process — repeated queries
    against the same index must not re-read the sample or re-run k-means
    (cache key includes the file mtime so a rewritten table retrains)."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"
    key = (os.path.abspath(path), os.path.getmtime(path), k, iters, seed)
    cached = _CENTROID_CACHE.get(key)
    if cached is not None:
        return cached
    pf = pq.ParquetFile(path)
    tbl = next(pf.iter_batches(batch_size=4096, columns=["embedding"]))
    m = np.stack([np.asarray(v) for v in tbl["embedding"].to_pylist()]).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        sims = m @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    _CENTROID_CACHE[key] = cents
    return cents


class IvfIndexer:
    """Batch stage: nearest-centroid (inverted-list id) per vector.

    Centroids (KB) are trained once on the driver and closure-shipped; the
    assignment is one matmul per batch — the classic IVF partitioning pass."""

    def __init__(self, centroids: np.ndarray):
        self.cents = np.asarray(centroids, dtype=np.float64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        batch = batch.copy()
        batch["list_id"] = (m @ self.cents.T).argmax(axis=1).astype(np.int64)
        return batch


def knn_ivf(
    sf_dir: str, query_id: int = 0, k: int = 10, n_centroids: int = 16, nprobe: int = 6
) -> pa.Table:
    """IVF approximate top-k: probe the ``nprobe`` inverted lists whose
    centroids are nearest the query, exact cosine re-rank on their members.

    Complements ``knn_lsh`` (data-independent hyperplanes) with the
    data-DEPENDENT partitioning real ANN systems deploy; per-batch local
    top-k partials merge on the driver, same shuffle-free shape as
    ``knn_bruteforce``."""
    q = _query_vector(sf_dir, query_id)
    qn = q / np.linalg.norm(q)
    cents = train_centroids(sf_dir, k=n_centroids)
    probe = np.argsort(-(cents @ qn))[:nprobe]
    probe_arr = pa.array(probe.astype(np.int64))
    ref = ray.put(qn)

    ds = _emb(sf_dir).map_batches(
        IvfIndexer(centroids=cents), batch_format="pandas", batch_size=4096
    )

    def candidates(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch["list_id"], value_set=probe_arr))
        if batch.num_rows == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
        qv = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ qv
        keep = ids != query_id
        ids, cos = ids[keep], cos[keep]
        if len(ids) > k:
            part = np.argpartition(-cos, k)[:k]
            ids, cos = ids[part], cos[part]
        return pd.DataFrame({"vec_id": ids.astype("int64"), "cos": cos})

    out = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = sql_round(out["cos"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def build_ivf_index(
    sf_dir: str, out_dir: str | None = None, n_centroids: int = 16
) -> str:
    """Build and PERSIST an IVF index as an on-disk artifact a later job can
    query without touching the corpus: ``centroids.parquet`` (KB) plus the
    vectors written hive-partitioned by inverted-list id
    (``lists/list_id=N/``). One distributed assignment pass at build; a
    query then reads ONLY its nprobe list directories — the at-scale shape
    of every deployed IVF system (train once, partition once, serve many).
    Cached per (sf, n_centroids); rebuilt if the marker is missing."""
    import json

    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = out_dir or f"/tmp/pcr_cache/ivf-index-{tag}-k{n_centroids}"
    marker = os.path.join(out_dir, "ivf_meta.json")
    if os.path.exists(marker):
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    cents = train_centroids(sf_dir, k=n_centroids)
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(len(cents), dtype=np.int64)),
                "centroid": pa.array(cents.tolist(), type=pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "centroids.parquet"),
    )
    (
        _emb(sf_dir)
        .map_batches(IvfIndexer(centroids=cents), batch_format="pandas", batch_size=4096)
        .write_parquet(os.path.join(out_dir, "lists"), partition_cols=["list_id"])
    )
    with open(marker, "w") as f:
        json.dump({"n_centroids": int(len(cents)), "dim": int(cents.shape[1])}, f)
    return out_dir


def knn_ivf_persisted(
    sf_dir: str, query_id: int = 0, k: int = 10, n_centroids: int = 16, nprobe: int = 6
) -> pa.Table:
    """Top-k against the PERSISTED IVF index: rank centroids from the KB-size
    centroid table, then read only the ``nprobe`` matching list directories
    (hive-partition pruning at the file listing — the corpus is never
    scanned) and exact-rerank their members. Same result shape as
    ``knn_ivf``; the difference is WHERE the index lives (disk artifact vs
    in-process), which is what lets many queries amortize one build."""
    import pyarrow.parquet as pq

    idx = build_ivf_index(sf_dir, n_centroids=n_centroids)
    q = _query_vector(sf_dir, query_id)
    qn = q / np.linalg.norm(q)
    ct = pq.read_table(os.path.join(idx, "centroids.parquet"))
    cents = np.array(ct["centroid"].to_pylist(), dtype=np.float64)
    lids = np.array(ct["list_id"].to_pylist())
    probe = lids[np.argsort(-(cents @ qn))[:nprobe]]
    import glob as _glob

    # expand each probed list directory to its files (a path LIST of
    # directories is not a supported read_parquet input); empty lists wrote
    # nothing and contribute nothing
    paths = [
        f
        for p in probe
        for f in sorted(_glob.glob(os.path.join(idx, "lists", f"list_id={p}", "*.parquet")))
    ]
    ref = ray.put(qn)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ qv
        keep = ids != query_id
        ids, cos = ids[keep], cos[keep]
        if len(ids) > k:
            part = np.argpartition(-cos, k)[:k]
            ids, cos = ids[part], cos[part]
        return pd.DataFrame({"vec_id": ids.astype("int64"), "cos": cos})

    out = (
        read_parquet_clean(paths, columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = sql_round(out["cos"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


class LshIndexer:
    """Batch stage: sign-pattern bucket of each vector under fixed seeded
    hyperplanes (state built once on the driver, closure-shipped)."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 777):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(0, 1, (dim, n_planes))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0
        return (signs @ (1 << np.arange(self.planes.shape[1]))).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        batch = batch.copy()
        batch["bucket"] = self.bucket_of(m)
        return batch


def knn_lsh(sf_dir: str, query_id: int = 0, k: int = 10, n_planes: int = 8) -> pa.Table:
    """Approximate top-k: probe the query's LSH bucket + Hamming-1 neighbours,
    exact cosine re-rank on candidates only (IVF-style scale path)."""
    q = _query_vector(sf_dir, query_id)
    indexer = LshIndexer(dim=len(q), n_planes=n_planes)
    qb = int(indexer.bucket_of(q[None, :])[0])
    probe = {qb} | {qb ^ (1 << i) for i in range(n_planes)}
    probe_arr = pa.array(sorted(probe), type=pa.int64())
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    ds = _emb(sf_dir).map_batches(
        LshIndexer(dim=len(q), n_planes=n_planes), batch_format="pandas", batch_size=4096
    )

    def candidates(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        keep = pc.is_in(batch["bucket"], value_set=probe_arr)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
        qv = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ qv
        keep2 = ids != query_id
        return pd.DataFrame({"vec_id": ids[keep2].astype("int64"), "cos": cos[keep2]})

    out = ds.map_batches(candidates, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = sql_round(out["cos"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label embedding centroid — the element-wise VECTOR aggregate
    (class prototypes / cluster means). Per-batch float64 sum-vectors per
    label (sorted-segment ``np.add.reduceat``), merged on the driver: state
    is n_labels x dim floats, NO shuffle — the same mergeable-partial shape
    as the scalar aggregates, lifted to vectors. Output is long-form
    (label, dim, mean_v) to match the SQL unnest oracle."""
    import pyarrow.parquet as pq_mod

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)
        order = np.argsort(labels, kind="stable")
        sl, sm = labels[order], m[order]
        bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        sums = np.add.reduceat(sm, bounds, axis=0)
        ns = np.diff(np.r_[bounds, len(sl)])
        return pa.table(
            {
                "label": pa.array(sl[bounds].astype(np.int64), pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array([row.tobytes() for row in sums], pa.binary()),
            }
        )

    acc: dict[int, tuple[int, np.ndarray]] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        s = np.frombuffer(row["s"], dtype=np.float64)
        n0, s0 = acc.get(row["label"], (0, np.zeros_like(s)))
        acc[row["label"]] = (n0 + row["n"], s0 + s)
    labels = sorted(acc)
    dim = len(next(iter(acc.values()))[1])
    out_label, out_dim, out_mean = [], [], []
    for lb in labels:
        n, s = acc[lb]
        out_label.extend([lb] * dim)
        out_dim.extend(range(1, dim + 1))
        out_mean.extend(sql_round(s / n, 6))
    return pa.table(
        {
            "label": pa.array(out_label, pa.int64()),
            "dim": pa.array(out_dim, pa.int64()),
            "mean_v": pa.array(out_mean, pa.float64()),
        }
    )

"""Deduplication operators over the ``documents`` table.

 - exact:        content-hash -> hash-partitioned groupby -> keep min doc_id
                 (SQL-checkable: GROUP BY text / min(doc_id))
 - minhash_lsh:  token-shingle MinHash signatures -> banded LSH buckets
                 (explode to (band, hash) rows -> groupby) -> candidate pairs
                 -> exact Jaccard verify against a broadcast shingle index
 - simhash:      64-bit SimHash + 16-bit band blocking -> near-dup pairs by
                 Hamming distance
 - ngram_jaccard: character-n-gram Jaccard verification over LSH candidates
 - embedding:    cosine near-dup pairs over the embeddings table (broadcast
                 matrix; j>i upper triangle) — SQL-checkable via DuckDB
                 list_cosine_similarity self-join

Scale notes: signatures/sketches are computed per batch (mergeable), buckets
shuffle only (band_id, band_hash, doc_id) triples, and pair verification
broadcasts the shingle index (small at test scale; at 10^12 scale this becomes
a hash-join of pairs against signatures — same dataflow, bigger shuffle).
MinHash/LSH per Broder 1997 / Leskovec-Rajaraman-Ullman MMDS ch.3 (public).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ._util import sql_round
from .text import hash_tokens, rolling_gram_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


def _docs(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- exact dedup ------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: md5 content hash per batch (vectorized-ish C loop), then
    hash-partitioned groupby keeps the smallest doc_id per distinct text."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["h"] = batch["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return batch[["doc_id", "h"]]

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(add_hash, batch_format="pandas")
    out = ds.groupby("h").min("doc_id").to_pandas()
    keep = out["min(doc_id)"].astype("int64").sort_values()
    return pa.table({"doc_id": pa.array(keep.to_numpy(), type=pa.int64())})


# --- MinHash signatures -----------------------------------------------------


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Token k-gram shingle hashes — vectorized (token hashes via pandas
    siphash, gram combine via rolling mix; no per-gram Python strings)."""
    ht = hash_tokens(text.lower().split())
    if len(ht) == 0:
        return np.zeros(1, dtype=np.uint64)
    return np.unique(rolling_gram_hashes(ht, k))


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature (m permutations).

    The permutation coefficients are built once per actor from a fixed seed —
    identical across actors and runs."""

    def __init__(self, m: int = 64, k: int = 3):
        rng = np.random.default_rng(12345)
        self.a = rng.integers(1, _MERSENNE, m, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, m, dtype=np.uint64)
        self.m = m
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        g = _shingle_hashes(text, self.k)
        # (a*g + b) mod p, vectorized over (grams, perms); uint64 wrap then mod
        v = (g[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return v.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"].fillna("")]
        batch = batch[["doc_id"]].copy()
        batch["sig"] = [s.astype("int64") for s in sigs]  # arrow list<int64>
        return batch


def minhash_candidates(
    sf_dir: str, bands: int = 16, rows: int = 4, m: int = 64
) -> pa.Table:
    """LSH candidate pairs: explode signatures to (band_id, band_hash, doc_id),
    groupby bucket, emit pairs within buckets."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_kwargs={"m": m}, batch_format="pandas",
        batch_size=2048, concurrency=2,
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # bucket key = mix of band id and the band's signature rows, fully
        # vectorized over (docs x bands); collisions only add candidate pairs
        # (verified later), never lose true ones within a band
        sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig"]])
        s3 = sigs.reshape(len(sigs), bands, rows)
        acc = np.full((len(sigs), bands), 0x9E3779B97F4A7C15, dtype=np.uint64)
        for r in range(rows):
            acc = (acc ^ s3[:, :, r]) * np.uint64(0x100000001B3)
        acc = acc * np.uint64(bands) + np.arange(bands, dtype=np.uint64)[None, :]
        return pd.DataFrame(
            {
                "key": acc.reshape(-1).astype(np.int64),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
            }
        )

    # (key, doc_id) pairs are tiny (16 ints/doc) — materialize so the two
    # consumers below don't re-execute the signature stage
    buckets = ds.map_batches(explode, batch_format="pandas").materialize()
    # LSH guarantees hot buckets are rare. Detect them with per-batch partial
    # (key, count) rows merged on the driver — mergeable-sketch pattern; a
    # distributed groupby would also work but Ray's per-key groupby overhead
    # dwarfs this data size (measured 80s for 80k rows vs <1s here).
    def key_counts(batch: pa.Table) -> pa.Table:
        k, c = np.unique(batch["key"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"key": k, "cnt": c.astype(np.int64)})

    parts = pa.concat_tables(
        list(buckets.map_batches(key_counts, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    ).to_pandas()
    counts = parts.groupby("key", as_index=False)["cnt"].sum()
    hot = counts[counts["cnt"] > 1]["key"]
    if len(hot) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())})
    hot_arr = pa.array(hot.to_numpy(), type=pa.int64())

    def only_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["key"], value_set=hot_arr))

    members = buckets.map_batches(only_hot, batch_format="pyarrow").to_pandas()
    pairs = []
    for _, grp in members.groupby("key"):
        ids = np.sort(grp["doc_id"].unique())[:50]  # cap giant buckets
        if len(ids) > 1:
            ii, jj = np.triu_indices(len(ids), 1)
            pairs.append(np.stack([ids[ii], ids[jj]], axis=1))
    if not pairs:
        return pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())})
    allp = np.unique(np.concatenate(pairs), axis=0)
    return pa.table({"id_a": pa.array(allp[:, 0], type=pa.int64()), "id_b": pa.array(allp[:, 1], type=pa.int64())})


def dedup_minhash(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification."""
    cand = minhash_candidates(sf_dir).to_pandas()
    if len(cand) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64()), "jaccard": pa.array([], type=pa.float64())})
    # broadcast shingle index (small side); at 10^12 scale: hash-join instead
    docs = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    shingles = {int(d): _shingle_hashes(t) for d, t in zip(docs["doc_id"], docs["text"])}
    ref = ray.put(shingles)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(ref)
        js = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = sh[int(a)], sh[int(b)]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            js.append(inter / union if union else 0.0)
        batch["jaccard"] = np.round(js, 4)
        return batch[batch["jaccard"] >= threshold]

    ds = ray.data.from_pandas(cand).map_batches(verify, batch_format="pandas")
    out = ds.to_pandas().sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out, preserve_index=False)


# --- SimHash ----------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per doc (Charikar 2002, public): sign of the sum of
    ±1 bit-vectors of token hashes."""

    def __init__(self):
        self.shifts = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = text.lower().split()
        if not toks:
            return 0
        hs = hash_tokens(toks)
        bits = ((hs[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(np.int32)
        acc = (2 * bits - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << self.shifts).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["simhash"] = [np.uint64(self.simhash(t)).astype(np.int64) for t in batch["text"].fillna("")]
        return batch[["doc_id", "simhash"]]


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup pairs: block on each of four 16-bit bands (a pair
    within Hamming<=3 of a 64-bit hash must agree on >=1 of 4 bands)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=2048, concurrency=2
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for band in range(4):
            part = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            rows.append(pd.DataFrame({"band": band, "key": part.astype("int64"), "doc_id": batch["doc_id"], "simhash": batch["simhash"]}))
        return pd.concat(rows, ignore_index=True)

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").head(50)
        ids = g["doc_id"].tolist()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        a, b, d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(hs[i] ^ hs[j])).count("1")
                if ham <= max_hamming:
                    a.append(ids[i]); b.append(ids[j]); d.append(ham)
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
    )
    out = out.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    out["hamming"] = out["hamming"].astype("int64") if len(out) else out.get("hamming", pd.Series(dtype="int64"))
    return pa.Table.from_pandas(out, preserve_index=False)


# --- char n-gram Jaccard ----------------------------------------------------


def _char_ngrams(text: str, n: int = 4) -> np.ndarray:
    """Character n-gram hashes via rolling mix over code points (vectorized)."""
    t = text.lower()
    if not t:
        return np.zeros(1, dtype=np.uint64)
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    return np.unique(rolling_gram_hashes(cps, min(n, len(cps))))


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """Character-4-gram Jaccard over MinHash-LSH candidates."""
    cand = minhash_candidates(sf_dir).to_pandas()
    empty = pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64()), "jaccard_char": pa.array([], type=pa.float64())})
    if len(cand) == 0:
        return empty
    docs = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    grams = {int(d): _char_ngrams(t) for d, t in zip(docs["doc_id"], docs["text"])}
    ref = ray.put(grams)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(ref)
        js = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = g[int(a)], g[int(b)]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            js.append(inter / union if union else 0.0)
        batch["jaccard_char"] = np.round(js, 4)
        return batch[batch["jaccard_char"] >= threshold]

    out = ray.data.from_pandas(cand).map_batches(verify, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return empty
    return pa.Table.from_pandas(out.sort_values(["id_a", "id_b"]), preserve_index=False)


# --- embedding cosine near-dup ----------------------------------------------


def dedup_embedding(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Cosine near-dup pairs over embeddings: broadcast the (small) normalized
    matrix once, each batch computes its rows x all-rows block of the upper
    triangle — at 10^12 scale the matrix side becomes LSH-bucketed."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_pdf = emb.to_pandas().sort_values("vec_id")
    ids = all_pdf["vec_id"].to_numpy()
    mat = np.stack(all_pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    matn = mat / np.maximum(norms, 1e-12)
    ref = ray.put((ids, matn))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        aids, am = ray.get(ref)
        bids = batch["vec_id"].to_numpy()
        bm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        cos = bm @ am.T
        ii, jj = np.nonzero(cos >= threshold)
        mask = bids[ii] < aids[jj]  # upper triangle, no self
        return pd.DataFrame(
            {
                "id_a": bids[ii][mask].astype("int64"),
                "id_b": aids[jj][mask].astype("int64"),
                "cos": sql_round(cos[ii, jj][mask], 4),
            }
        )

    out = emb.map_batches(block, batch_format="pandas").to_pandas()
    if len(out) == 0 or "id_a" not in out.columns:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
            }
        )
    out = out.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.45, n_planes: int = 6) -> pa.Table:
    """LSH-bucketed cosine near-dup — the 10^12-scale path for
    ``dedup_embedding``: random-hyperplane sign buckets, candidate pairs only
    within a bucket or Hamming-1 neighbour buckets, exact cosine verify.
    Approximate (recall < 1 by design); rows-only check."""
    from .similarity import LshIndexer

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = emb.map_batches(
        LshIndexer, fn_constructor_kwargs={"n_planes": n_planes},
        batch_format="pandas", batch_size=4096, concurrency=2,
    )

    def pairs_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id").head(200)
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ m.T
        ii, jj = np.nonzero(np.triu(cos >= threshold, 1))
        return pd.DataFrame(
            {"id_a": ids[ii].astype("int64"), "id_b": ids[jj].astype("int64"), "cos": sql_round(cos[ii, jj], 4)}
        )

    out = ds.groupby("bucket").map_groups(pairs_of, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64()), "cos": pa.array([], type=pa.float64())})
    out = out.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out, preserve_index=False)

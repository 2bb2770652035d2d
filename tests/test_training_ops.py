"""Targeted tests for the training-data pipeline operators added in round 3:
scrub_pii, chunk_documents, token_dup_stats, decontaminate, dedup_substring,
export_shards. The oracle equivalence is covered in test_queries.py; these
check the properties the oracle can't see (coverage, layout, real PII)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _mini_docs_dir(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_scrub_pii_redacts_real_pii(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.text import scrub_pii

    sf = _mini_docs_dir(
        tmp_path,
        [
            "contact bob.smith+x@corp.example.org for details",
            "server at 10.0.255.3 responded",
            "the customer asked a user question",
            "nothing sensitive here",
            None,
        ],
    )
    out = scrub_pii(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "contact <EMAIL> for details"
    assert out.loc[0, "n_redactions"] == 1
    assert out.loc[1, "clean_text"] == "server at <IP> responded"
    assert out.loc[2, "clean_text"] == "the <ENTITY> asked a <ENTITY> question"
    assert out.loc[2, "n_redactions"] == 2
    assert out.loc[3, "n_redactions"] == 0
    assert pd.isna(out.loc[4, "clean_text"]) and pd.isna(out.loc[4, "n_redactions"])


def test_chunk_documents_covers_every_token(ray_session):
    """Reassembling a doc's chunks (dropping each chunk's leading overlap)
    reproduces the document exactly — nothing lost, nothing duplicated."""
    from parquet_converter_ray.pipelines.text import chunk_documents

    size, overlap = 64, 8
    chunks = chunk_documents(SF_DIR, size=size, overlap=overlap).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    joined = {}
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        toks: list[str] = []
        for _, row in g.iterrows():
            ct = row["chunk_text"].split(" ")
            toks.extend(ct if not toks else ct[overlap:])
        joined[doc_id] = " ".join(toks)
        # every full chunk has exactly `size` tokens; only the last may be short
        n = g["n_tokens"].to_numpy()
        assert (n[:-1] == size).all() and 1 <= n[-1] <= size
    for _, row in docs.iterrows():
        assert joined[row["doc_id"]] == (row["text"] or "")


def test_chunk_documents_short_and_empty_docs(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.text import chunk_documents

    sf = _mini_docs_dir(tmp_path, ["one two", "", None, " ".join(["w"] * 150)])
    out = chunk_documents(sf, size=64, overlap=8).to_pandas()
    per_doc = out.groupby("doc_id").size()
    assert per_doc[0] == 1 and per_doc[1] == 1 and per_doc[2] == 1
    # 150 tokens, stride 56: starts 0,56,112 -> 3 chunks
    assert per_doc[3] == 3
    assert out[out.doc_id == 3]["n_tokens"].tolist() == [64, 64, 38]


def test_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.text import decontaminate

    bench_text = " ".join(f"tok{i}" for i in range(20))
    clean_text = " ".join(f"other{i}" for i in range(20))
    # doc 7 is the benchmark (7 % 101 == 7); doc 1 copies 10 of its tokens
    contaminated = " ".join(f"tok{i}" for i in range(5, 15)) + " trailing words here"
    sf = _mini_docs_dir(tmp_path, [clean_text, contaminated, clean_text + " x", None, clean_text + " y", clean_text + " z", clean_text + " w", bench_text])
    out = decontaminate(sf, k=8).to_pandas()
    assert out["doc_id"].tolist() == [1]
    # 10 shared tokens -> 3 shared 8-gram windows
    assert out["n_hit_grams"].tolist() == [3]


def test_dedup_substring_planted_duplicates(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.dedup import dedup_substring

    span = " ".join(f"s{i}" for i in range(16))
    a = span + " " + " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30)) + " " + span
    uniq = " ".join(f"u{i}" for i in range(50))
    sf = _mini_docs_dir(tmp_path, [a, b, uniq, "short doc", None])
    out = dedup_substring(sf, w=16).to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 1}
    # exactly one shared 16-token window between docs 0 and 1
    assert out.loc[0, "n_dup_spans"] == 1 and out.loc[1, "n_dup_spans"] == 1


def test_export_shards_layout_and_reorder(ray_session, tmp_path):
    from parquet_converter_ray.pipelines.export import export_shards, shard_file_stats

    out_dir = str(tmp_path / "shards")
    inv = export_shards(SF_DIR, out_dir=out_dir, n_shards=8, keep_output=True).to_pandas()
    stats = shard_file_stats(out_dir)
    assert stats["n_files"] == 8
    rows = np.array(stats["rows_per_file"])
    assert rows.sum() == inv.loc[0, "total_rows"] == 500
    # balanced shards (repartition splits evenly)
    assert rows.max() - rows.min() <= 1
    # the shuffle actually reorders: the first shard is not the source prefix
    import os

    first_file = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))[0]
    got_ids = pq.read_table(os.path.join(out_dir, first_file), columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    assert set(got_ids) != set(range(len(got_ids)))


def test_distinct_gram_doc_pairs_matches_naive(ray_session):
    from parquet_converter_ray.pipelines.text import distinct_gram_doc_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = pd.Series(
        [" ".join(rng.choice(vocab, size=int(n))) for n in rng.integers(0, 30, size=40)]
    )
    ids = np.arange(100, 140, dtype=np.int64)
    g, d = distinct_gram_doc_pairs(texts, ids, k=5)
    # naive reference: distinct string 5-grams per doc
    naive = []
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        grams = {" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)}
        naive.append((ids[i], len(grams)))
    got = pd.Series(d).value_counts().sort_index()
    for doc_id, n in naive:
        assert got.get(doc_id, 0) == n
    # pairs are distinct
    assert len(set(zip(g.tolist(), d.tolist()))) == len(g)


def test_dedup_substring_join_path_matches_broadcast(ray_session, monkeypatch):
    """The at-scale join dataflow must produce byte-identical output to the
    broadcast fast path (threshold forced to 0 disables broadcasting)."""
    from parquet_converter_ray.pipelines.dedup import dedup_substring

    fast = dedup_substring(SF_DIR, w=16)
    monkeypatch.setenv("PCR_BCAST_DUPGRAMS", "0")
    slow = dedup_substring(SF_DIR, w=16)
    assert fast.equals(slow)


def test_dedup_simhash_hot_bucket_recovers_all_pairs(ray_session, tmp_path):
    """VERDICT r4 item 4: a hot LSH bucket (many near-identical docs — the
    dedup-relevant case) must yield ALL candidate pairs. 250 identical docs
    share every band bucket; the old silent ``head(50)`` cap would have
    returned C(50,2)=1225 pairs instead of C(250,2)=31125."""
    from parquet_converter_ray.pipelines.dedup import dedup_simhash

    n_hot = 250
    hot = "the quick brown fox jumps over the lazy dog again and again"
    texts = [hot] * n_hot + [
        " ".join(f"u{i}w{j}" for j in range(40)) for i in range(5)
    ]
    sf = _mini_docs_dir(tmp_path, texts)
    out = dedup_simhash(sf).to_pandas()
    hot_pairs = out[(out["id_a"] < n_hot) & (out["id_b"] < n_hot)]
    assert len(hot_pairs) == n_hot * (n_hot - 1) // 2
    assert (hot_pairs["hamming"] == 0).all()
    # and pairs stay unique after the cross-band dedup
    assert len(out) == len(out.drop_duplicates(subset=["id_a", "id_b"]))


def test_dedup_incremental_planted_duplicates(ray_session, tmp_path):
    """A new-batch doc whose text exists in the seen half is flagged; novel
    and within-new-only duplicates are not."""
    from parquet_converter_ray.pipelines.dedup import dedup_incremental

    texts = [
        "seen alpha",          # 0: seen
        "seen beta",           # 1: seen
        "seen alpha",          # 2: new, dup of seen -> flagged
        "fresh gamma",         # 3: new, novel
    ]
    sf = _mini_docs_dir(tmp_path, texts)
    out = dedup_incremental(sf).to_pandas()
    assert out["doc_id"].tolist() == [2]
    # within-new duplicate without a seen twin is NOT flagged
    (tmp_path / "b").mkdir(exist_ok=True)
    sf2 = _mini_docs_dir(tmp_path / "b", ["a", "b", "new dup", "new dup"])
    out2 = dedup_incremental(sf2).to_pandas()
    assert out2.empty


def test_pack_sequences_invariants(ray_session):
    from parquet_converter_ray.pipelines.export import pack_sequences
    import pyarrow.parquet as pq2

    capacity = 256
    p = pack_sequences(SF_DIR, capacity=capacity).to_pandas()
    n_docs = pq2.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    # every doc lands in exactly one bin
    assert p["n_docs"].sum() == n_docs
    # a bin over capacity must be a single oversize document
    over = p[p["n_tokens"] > capacity]
    assert (over["n_docs"] == 1).all()
    # packing is dense: average fill of multi-doc bins is over half capacity
    multi = p[p["n_docs"] > 1]
    assert multi["n_tokens"].mean() > capacity / 2


def test_mix_sources_rates(ray_session):
    """Even-numbered sources keep everything, odd-numbered keep ~35%."""
    import duckdb

    from parquet_converter_ray.pipelines.export import mix_sources

    out = mix_sources(SF_DIR).to_pandas().set_index("source")
    full = duckdb.sql(
        f"SELECT source, count(*) n FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY source"
    ).df().set_index("source")
    for src in full.index:
        num = int(src[3:])
        if num % 2 == 0:
            assert out.loc[src, "n_docs"] == full.loc[src, "n"]
        else:
            assert out.loc[src, "n_docs"] < full.loc[src, "n"]


def test_split_assign_proportions_and_stability(ray_session):
    from parquet_converter_ray.pipelines.export import split_assign

    a = split_assign(SF_DIR).to_pandas()
    b = split_assign(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.70 < frac["train"] < 0.88
    assert 0.04 < frac["val"] < 0.17 and 0.04 < frac["test"] < 0.17

"""WebDataset tar shard export: loss-free round trip, deterministic bytes,
content-stable shard assignment."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import tarfile

import duckdb
import pytest

from parquet_converter_ray.pipelines.export import export_wds

SF_DIR = "/root/testdata/sf0.001"


def test_wds_roundtrip_and_determinism(ray_session, tmp_path):
    out = str(tmp_path / "wds")
    man = export_wds(SF_DIR, out_dir=out, n_shards=4, keep_output=True)
    # every sample lands in exactly one shard; id-sum matches the table
    n, id_sum = duckdb.sql(
        f"SELECT count(*), sum(doc_id) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    assert sum(man["n_samples"].to_pylist()) == n
    assert sum(man["sum_doc_id"].to_pylist()) == id_sum
    assert man.num_rows == 4

    # reconstruct every doc from the tars and diff against the source
    docs = {}
    for p in sorted(glob.glob(os.path.join(out, "shard-*.tar"))):
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                key, suffix = m.name[:9], m.name[9:]
                docs.setdefault(int(key), {})[suffix] = tf.extractfile(m).read()
    src = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(docs) == len(src)
    for doc_id, text, lang, source in src:
        got = docs[doc_id]
        assert got[".txt"].decode() == (text or "")
        assert json.loads(got[".json"]) == {"lang": lang, "source": source}

    # byte-determinism: a second export writes identical shard files
    out2 = str(tmp_path / "wds2")
    export_wds(SF_DIR, out_dir=out2, n_shards=4, keep_output=True)
    for p in sorted(glob.glob(os.path.join(out, "shard-*.tar"))):
        q = os.path.join(out2, os.path.basename(p))
        assert hashlib.sha256(open(p, "rb").read()).digest() == \
            hashlib.sha256(open(q, "rb").read()).digest()

"""String-prefix predicate: interval soundness units, pruning on a
string-clustered store, exactness vs LIKE, CLI grammar."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from parquet_converter_ray.zonemap import (
    _prefix_upper,
    apply_predicate,
    record_may_match,
    scan_store,
)

SF_DIR = "/root/testdata/sf0.001"


def test_prefix_upper():
    assert _prefix_upper("abc") == "abd"
    assert _prefix_upper("ab￿") == "ab\U00010000"
    assert _prefix_upper(chr(0x10FFFF)) is None
    # surrogate gap is skipped
    assert _prefix_upper("a퟿") == "a"


def test_record_may_match_prefix_bounds():
    st = {"source": {"min": "src3", "max": "src7", "nulls": 0, "t": "string"}}
    assert record_may_match(st, 10, [("source", "prefix", "src5")])
    assert not record_may_match(st, 10, [("source", "prefix", "src8")])
    assert not record_may_match(st, 10, [("source", "prefix", "q")])
    # prefix of the bounds themselves may match
    assert record_may_match(st, 10, [("source", "prefix", "src")])


def test_apply_predicate_prefix_exact():
    t = pa.table({"s": ["src1", "src10", "src19", "src2", None, "xsrc1"]})
    got = apply_predicate(t, [("s", "prefix", "src1")])
    assert got["s"].to_pylist() == ["src1", "src10", "src19"]


def test_prefix_scan_prunes_clustered_store(ray_session):
    from parquet_converter_ray.pipelines.transcripts import _documents_source_store

    store = _documents_source_store(SF_DIR)
    ds, plan = scan_store(store, [("source", "prefix", "src1")],
                          columns=["doc_id", "source"], return_plan=True)
    rows = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow"))
    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet' WHERE source LIKE 'src1%'"
    ).fetchone()[0]
    assert rows == want > 0
    # source-clustered layout: the src1* range lives in few containers
    assert plan["pruned_stats"] + plan["pruned_dict"] >= 1, plan
    assert plan["scanned"] < plan["parts_total"]


def test_prefix_rejects_numeric_column(ray_session):
    from parquet_converter_ray.pipelines.transcripts import _documents_source_store

    with pytest.raises(ValueError, match="string column"):
        scan_store(_documents_source_store(SF_DIR), [("doc_id", "prefix", "1")])
    from parquet_converter_ray.zonemap import _normalize

    with pytest.raises(ValueError, match="str value"):
        _normalize([("source", "prefix", 7)])


def test_cli_prefix_grammar():
    from parquet_converter_ray.cli import _parse_where

    assert _parse_where("source prefix src1") == ("source", "prefix", "src1")
    assert _parse_where("conv_id prefix conv-0001") == ("conv_id", "prefix", "conv-0001")


def test_cli_where_unquotes_comparison_values():
    """Quoted string literals in comparison/in/between ops must unquote —
    "role == 'user'" previously compared against the 5-char string 'user'
    (quotes included), so zone maps pruned every container and scan/agg
    silently returned zero rows."""
    from parquet_converter_ray.cli import _parse_where

    assert _parse_where("role == 'user'") == ("role", "==", "user")
    assert _parse_where('role != "tool"') == ("role", "!=", "tool")
    assert _parse_where("role in 'user','tool'") == ("role", "in", ["user", "tool"])
    assert _parse_where("k between 'a','b'") == ("k", "between", ("a", "b"))
    # quoted digits stay strings; unquoted digits stay numeric
    assert _parse_where("tag == '7'") == ("tag", "==", "7")
    assert _parse_where("n == 7") == ("n", "==", 7)


def test_knn_ivf_persisted_matches_inprocess(ray_session):
    """Persisted IVF index: identical results to the in-process IVF (same
    centroids, same assignment, same rerank) with the corpus never scanned
    at query time — only the nprobe list directories are read."""
    import shutil

    from parquet_converter_ray.pipelines.similarity import (
        build_ivf_index,
        knn_bruteforce,
        knn_ivf,
        knn_ivf_persisted,
    )

    shutil.rmtree("/tmp/pcr_cache/ivf-index-sf0.001-k16", ignore_errors=True)
    p = knn_ivf_persisted(SF_DIR)
    assert p.equals(knn_ivf(SF_DIR))
    brute = set(knn_bruteforce(SF_DIR)["vec_id"].to_pylist())
    got = set(p["vec_id"].to_pylist())
    assert len(got & brute) >= 7  # nprobe=6/16 lists: high-but-approx recall
    # second call hits the on-disk artifact (marker short-circuits the build)
    import os

    assert os.path.exists("/tmp/pcr_cache/ivf-index-sf0.001-k16/ivf_meta.json")
    assert knn_ivf_persisted(SF_DIR).equals(p)

"""Token blooms + the ``hastok``/``hasphrase`` full-text predicates:
tokenizer/filter units, exact-mask semantics vs row-wise references,
store-scan pruning over planted rare tokens (phrases reuse the same token
blooms), lifecycle carry-through (append/delete), CLI parsing."""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from parquet_converter_ray.bloom import (
    TOKEN_KEY_PREFIX,
    bloom_may_contain,
    bloom_probe_footer,
    build_token_bloom,
    column_tokens,
    hastok_mask,
    query_tokens,
)
from parquet_converter_ray.container import read_footer_file
from parquet_converter_ray.encode import (
    append_dataset,
    delete_conversations,
    encode_dataset,
)
from parquet_converter_ray.partition import stable_hash_strings
from parquet_converter_ray.zonemap import scan_store


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


# --- tokenizer units --------------------------------------------------------------


def test_query_tokens_basics():
    assert query_tokens("Spark, WINDOW dup!") == ["spark", "window", "dup"]
    assert query_tokens("a-b_c") == ["a", "b", "c"]
    assert query_tokens("dup dup DUP") == ["dup"]  # deduped, order kept
    assert query_tokens("!!! ...") == []
    assert query_tokens("naïve café") == ["na", "ve", "caf"]  # non-ascii separates


def test_column_tokens_matches_query_tokens():
    vals = ["The fast KEY", "sort/merge  part", None, "", "x1_y2"]
    toks = column_tokens(pa.array(vals, pa.string())).to_pylist()
    ref = [t for v in vals if v for t in re.split("[^a-z0-9]+", v.lower()) if t]
    assert toks == ref
    assert column_tokens(pa.array([1, 2])) is None  # non-string: no tokens


def test_token_bloom_no_false_negatives():
    texts = pa.array([f"alpha beta tok{i} gamma-{i % 7}" for i in range(3000)])
    bits, meta = build_token_bloom(texts)
    assert meta["tok"] == "lower-ascii-alnum-v1"
    present = column_tokens(texts).unique()
    h = stable_hash_strings(present)
    assert bloom_may_contain(bits, meta, h).all()  # NEVER a false negative
    absent = pa.array([f"zz{i}q" for i in range(2000)], pa.string())
    fpr = float(bloom_may_contain(bits, meta, stable_hash_strings(absent)).mean())
    assert fpr < 0.05
    # all-null / non-text columns build nothing (an empty filter would be unsound)
    assert build_token_bloom(pa.array([None], pa.string())) is None
    assert build_token_bloom(pa.array([1, 2])) is None


# --- exact mask semantics -----------------------------------------------------------


def _ref_hastok(vals, query):
    toks = query_tokens(query)
    out = []
    for v in vals:
        if v is None:
            out.append(False)
            continue
        row = set(re.split("[^a-z0-9]+", v.lower()))
        out.append(all(t in row for t in toks))
    return out


@pytest.mark.parametrize(
    "query", ["spark", "spark dup", "Window, SPARK!", "sparkdup"]
)
def test_hastok_mask_matches_rowwise_reference(query):
    vals = [
        "spark window dup",
        "the spark-dup pipeline",
        "sparkdup fused",
        "spark  window",
        "DUP then Spark",
        "windowspark dup",
        None,
        "",
        "spark0 dup",  # digits extend the token: 'spark0' != 'spark'
    ]
    m = hastok_mask(pa.array(vals, pa.string()), query)
    got = pc.fill_null(m, False).to_pylist()
    assert got == _ref_hastok(vals, query)


def _ref_hasphrase(vals, query):
    toks = query_tokens(query)
    out = []
    for v in vals:
        if v is None:
            out.append(False)
            continue
        row = [t for t in re.split("[^a-z0-9]+", v.lower()) if t]
        n = len(toks)
        out.append(any(row[i:i + n] == toks for i in range(len(row) - n + 1)))
    return out


@pytest.mark.parametrize(
    "query", ["spark", "spark dup", "spark window dup", "Window, SPARK!"]
)
def test_hasphrase_mask_matches_rowwise_reference(query):
    vals = [
        "spark window dup",
        "the spark-dup pipeline",      # separator between tokens: still adjacent
        "sparkdup fused",              # fused: one token, not the phrase
        "spark  window",
        "DUP then Spark",              # order matters for phrases
        "windowspark dup",
        "spark then window dup",       # intervening token breaks adjacency
        None,
        "",
        "spark0 dup",                  # digits extend the token
        "a spark window dup z",
    ]
    from parquet_converter_ray.bloom import hasphrase_mask

    m = hasphrase_mask(pa.array(vals, pa.string()), query)
    got = pc.fill_null(m, False).to_pylist()
    assert got == _ref_hasphrase(vals, query)


def test_hasphrase_one_token_equals_hastok():
    from parquet_converter_ray.bloom import hasphrase_mask

    vals = pa.array(["spark window", "no match", None, "SPARK!", "sparkle"])
    ph = pc.fill_null(hasphrase_mask(vals, "spark"), False).to_pylist()
    tk = pc.fill_null(hastok_mask(vals, "spark"), False).to_pylist()
    assert ph == tk


# --- store scan: pruning over planted rare tokens ------------------------------------


N_DOCS = 6_000


@pytest.fixture(scope="module")
def docs_table():
    rng = np.random.default_rng(7)
    grp = np.repeat(np.arange(8), N_DOCS // 8)
    common = np.array(["alpha beta", "gamma delta", "epsilon zeta"])
    text = [
        f"{common[rng.integers(3)]} doc {i} "
        + ("needleword special " if g == 3 else "")
        + f"tail{int(rng.integers(50))}"
        for i, g in enumerate(grp)
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "grp": pa.array(grp, pa.int64()),
            "text": pa.array(text, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def token_store(ray_session, docs_table, tmp_path_factory):
    """Range-clustered on grp so the planted token is partition-local; text
    forced to fsst so the TOKEN bloom (not the dict probe) is what prunes."""
    out = str(tmp_path_factory.mktemp("tok") / "store")
    encode_dataset(
        ray.data.from_arrow(docs_table),
        out,
        n_parts=8,
        conv_col="doc_id",
        order_col=None,
        sort_key=("doc_id",),
        salt_rows=0,
        cluster_by="grp",
        text_bloom_cols=["text"],
        codec={"text": "fsst"},
    )
    return out


def test_footer_records_token_bloom(token_store):
    path = sorted(glob.glob(os.path.join(token_store, "part-*.pcc")))[0]
    footer = read_footer_file(path)
    ent = footer["blooms"][TOKEN_KEY_PREFIX + "text"]
    assert ent["tok"] == "lower-ascii-alnum-v1"
    assert ent["m"] % 8 == 0 and ent["len"] == ent["m"] // 8 and "crc32" in ent
    # crc-verified probe straight off the footer
    assert bloom_probe_footer(
        path, footer, [("text", "hastok", "alpha")], verify_crc=True
    ) in (True, False)


def test_scan_prunes_on_token_bloom_and_matches_exact(token_store, docs_table):
    ds, plan = scan_store(
        token_store,
        [("text", "hastok", "needleword")],
        columns=["doc_id", "grp"],
        return_plan=True,
    )
    got = _collect(ds).sort_by("doc_id")
    exp = (
        docs_table.filter(pc.fill_null(hastok_mask(docs_table["text"], "needleword"), False))
        .select(["doc_id", "grp"])
        .sort_by("doc_id")
    )
    assert got.equals(exp)
    assert got.num_rows == N_DOCS // 8
    # the token lives only in grp==3 rows; every other container must prune
    # (via the token bloom, or zone maps if grp were in the predicate — it
    # is not, so the bloom is the only lever here)
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]


def test_scan_multitoken_and_absent(token_store, docs_table):
    # conjunctive: both tokens must be in the SAME row
    ds = scan_store(token_store, [("text", "hastok", "needleword alpha")],
                    columns=["doc_id", "text"])
    got = _collect(ds)
    mask = pc.fill_null(hastok_mask(docs_table["text"], "needleword alpha"), False)
    assert got.num_rows == docs_table.filter(mask).num_rows
    assert 0 < got.num_rows < N_DOCS // 8
    # absent token: every container pruned, zero rows, typed empty schema
    ds, plan = scan_store(token_store, [("text", "hastok", "zzneverq")],
                          columns=["doc_id"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["pruned_bloom"] == plan["parts_total"]


def test_hastok_composes_with_other_predicates(token_store, docs_table):
    ds = scan_store(
        token_store,
        [("text", "hastok", "needleword"), ("doc_id", "<", 3000)],
        columns=["doc_id"],
    )
    mask = pc.and_(
        pc.fill_null(hastok_mask(docs_table["text"], "needleword"), False),
        pc.less(docs_table["doc_id"], 3000),
    )
    assert _collect(ds).num_rows == docs_table.filter(mask).num_rows


def test_scan_hasphrase_prunes_and_orders(token_store, docs_table):
    from parquet_converter_ray.bloom import hasphrase_mask

    # the planted text is "... needleword special ..." — consecutive, in order
    ds, plan = scan_store(
        token_store,
        [("text", "hasphrase", "needleword special")],
        columns=["doc_id", "grp"],
        return_plan=True,
    )
    got = _collect(ds).sort_by("doc_id")
    exp = (
        docs_table.filter(
            pc.fill_null(hasphrase_mask(docs_table["text"], "needleword special"), False)
        )
        .select(["doc_id", "grp"])
        .sort_by("doc_id")
    )
    assert got.equals(exp)
    assert got.num_rows == N_DOCS // 8
    # token blooms prune the 7 containers that lack the phrase tokens
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]
    # reversed order: same tokens (bloom can't prune the grp-3 container)
    # but the exact mask yields zero rows — order is enforced row-wise
    ds, plan = scan_store(token_store, [("text", "hasphrase", "special needleword")],
                          columns=["doc_id"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["scanned"] >= 1
    # a phrase with one absent token prunes EVERY container via the bloom
    ds, plan = scan_store(token_store, [("text", "hasphrase", "needleword zzneverq")],
                          columns=["doc_id"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["pruned_bloom"] == plan["parts_total"]


def test_hastok_validation(token_store):
    with pytest.raises(ValueError, match="text column"):
        _collect(scan_store(token_store, [("doc_id", "hastok", "5")], columns=["doc_id"]))
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        _collect(scan_store(token_store, [("text", "hastok", "!!!")], columns=["doc_id"]))
    with pytest.raises(ValueError, match="text column"):
        _collect(scan_store(token_store, [("doc_id", "hasphrase", "5")],
                            columns=["doc_id"]))
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        _collect(scan_store(token_store, [("text", "hasphrase", "...")],
                            columns=["doc_id"]))


def test_store_agg_prunes_on_token_bloom(token_store, docs_table):
    """Aggregates get the footer-probe level too: a rare-token hastok
    aggregate answers after KB footer reads, decoding ONLY the containers
    whose token blooms may hold every query token."""
    from parquet_converter_ray.storeagg import store_agg

    res, plan = store_agg(
        token_store, ["count", "sum:doc_id"],
        [("text", "hastok", "needleword")], return_plan=True,
    )
    mask = pc.fill_null(hastok_mask(docs_table["text"], "needleword"), False)
    assert res["count"] == docs_table.filter(mask).num_rows == N_DOCS // 8
    assert res["sum_doc_id"] == int(pc.sum(pc.filter(docs_table["doc_id"], mask)).as_py())
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]
    # absent token: every zone-map-undecided container bloom-prunes; zero scan
    res, plan = store_agg(token_store, ["count"],
                          [("text", "hastok", "zzneverq")], return_plan=True)
    assert res["count"] == 0 and plan["scanned"] == 0
    assert plan["pruned_bloom"] == plan["parts_total"]
    # hasphrase rides the same blooms
    res, plan = store_agg(token_store, ["count"],
                          [("text", "hasphrase", "needleword special")],
                          return_plan=True)
    assert res["count"] == N_DOCS // 8
    assert plan["pruned_bloom"] >= 1


# --- hasany (disjunctive dual) --------------------------------------------------------


def _ref_hasany(vals, query):
    toks = query_tokens(query)
    out = []
    for v in vals:
        if v is None:
            out.append(False)
            continue
        row = set(re.split("[^a-z0-9]+", v.lower()))
        out.append(any(t in row for t in toks))
    return out


@pytest.mark.parametrize(
    "query", ["spark", "spark dup", "Window, SPARK!", "sparkdup", "zz dup"]
)
def test_hasany_mask_matches_rowwise_reference(query):
    from parquet_converter_ray.bloom import hasany_mask

    vals = [
        "spark window dup",
        "the spark-dup pipeline",
        "sparkdup fused",
        "spark  window",
        "DUP then Spark",
        "windowspark dup",
        None,
        "",
        "spark0 dup",  # digits extend the token: 'spark0' != 'spark'
        "nothing here",
    ]
    m = hasany_mask(pa.array(vals, pa.string()), query)
    got = pc.fill_null(m, False).to_pylist()
    assert got == _ref_hasany(vals, query)


def test_hasany_one_token_equals_hastok():
    from parquet_converter_ray.bloom import hasany_mask

    vals = pa.array(["spark window", "no match", None, "SPARK!", "sparkle"])
    any_ = pc.fill_null(hasany_mask(vals, "spark"), False).to_pylist()
    tok = pc.fill_null(hastok_mask(vals, "spark"), False).to_pylist()
    assert any_ == tok


def test_hasany_footer_probe_dual(token_store):
    """hasany prunes only when EVERY token is provably absent: a container
    holding 'alpha' survives 'alpha zzneverq' (hastok would prune it)."""
    path = sorted(glob.glob(os.path.join(token_store, "part-*.pcc")))[0]
    footer = read_footer_file(path)
    present = "alpha"  # common words are in every container's text pool
    assert bloom_probe_footer(path, footer, [("text", "hasany", f"{present} zzneverq")])
    assert not bloom_probe_footer(path, footer, [("text", "hastok", f"{present} zzneverq")])
    assert not bloom_probe_footer(
        path, footer, [("text", "hasany", "zzneverq qqneverz")]
    )


def test_scan_hasany_prunes_and_matches_exact(token_store, docs_table):
    from parquet_converter_ray.bloom import hasany_mask

    # one planted rare token OR one absent token: only grp-3 containers scan
    ds, plan = scan_store(
        token_store,
        [("text", "hasany", "needleword zzneverq")],
        columns=["doc_id", "grp"],
        return_plan=True,
    )
    got = _collect(ds).sort_by("doc_id")
    exp = (
        docs_table.filter(
            pc.fill_null(hasany_mask(docs_table["text"], "needleword zzneverq"), False)
        )
        .select(["doc_id", "grp"])
        .sort_by("doc_id")
    )
    assert got.equals(exp)
    assert got.num_rows == N_DOCS // 8
    assert plan["pruned_bloom"] >= 1
    assert plan["scanned"] < plan["parts_total"]
    # every token absent: zero rows; nearly every container prunes. Unlike
    # hastok, a disjunctive probe survives on a false positive for EITHER
    # token (~2x the FP surface), so allow one FP container to scan.
    ds, plan = scan_store(token_store, [("text", "hasany", "zzneverq qqneverz")],
                          columns=["doc_id"], return_plan=True)
    assert _collect(ds).num_rows == 0
    assert plan["pruned_bloom"] >= plan["parts_total"] - 1
    assert plan["pruned_bloom"] + plan["scanned"] == plan["parts_total"]


def test_store_agg_hasany(token_store, docs_table):
    from parquet_converter_ray.bloom import hasany_mask
    from parquet_converter_ray.storeagg import store_agg

    res, plan = store_agg(
        token_store, ["count"],
        [("text", "hasany", "needleword zzneverq")], return_plan=True,
    )
    mask = pc.fill_null(hasany_mask(docs_table["text"], "needleword zzneverq"), False)
    assert res["count"] == docs_table.filter(mask).num_rows == N_DOCS // 8
    assert plan["pruned_bloom"] >= 1


def test_hasany_validation(token_store):
    with pytest.raises(ValueError, match="text column"):
        _collect(scan_store(token_store, [("doc_id", "hasany", "5")], columns=["doc_id"]))
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        _collect(scan_store(token_store, [("text", "hasany", "!!!")], columns=["doc_id"]))


def test_parse_where_hasany():
    from parquet_converter_ray.cli import _parse_where

    assert _parse_where("text hasany 'spark window'") == ("text", "hasany", "spark window")
    assert _parse_where("text hasany needle") == ("text", "hasany", "needle")


# --- lifecycle carry-through ---------------------------------------------------------


def test_append_and_delete_carry_token_blooms(ray_session, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(2000), pa.int64()),
            "text": pa.array(
                ["wordaq base row" if i % 2 else "wordbq base row" for i in range(2000)]
            ),
        }
    )
    out = str(tmp_path / "store")
    encode_dataset(
        ray.data.from_arrow(t), out, n_parts=4, conv_col="doc_id", order_col=None,
        sort_key=("doc_id",), salt_rows=0, text_bloom_cols=["text"],
        codec={"text": "fsst"},
    )
    extra = pa.table(
        {
            "doc_id": pa.array(np.arange(2000, 2400), pa.int64()),
            "text": pa.array(["wordcq appended row"] * 400),
        }
    )
    append_dataset(ray.data.from_arrow(extra), out)
    gen = sorted(glob.glob(os.path.join(out, "part-*-g*.pcc")))
    assert gen, "append must write generation containers"
    ent = read_footer_file(gen[0])["blooms"].get(TOKEN_KEY_PREFIX + "text")
    assert ent is not None and ent["tok"] == "lower-ascii-alnum-v1"
    # appended token is findable; delete rewrites keep the sidecar
    ds = scan_store(out, [("text", "hastok", "wordcq")], columns=["doc_id"])
    assert _collect(ds).num_rows == 400
    delete_conversations(out, [0, 1, 2])
    for p in sorted(glob.glob(os.path.join(out, "part-*.pcc"))):
        ent = read_footer_file(p)["blooms"].get(TOKEN_KEY_PREFIX + "text")
        assert ent is not None, f"delete rewrite dropped the token bloom in {p}"
    ds = scan_store(out, [("text", "hastok", "wordcq")], columns=["doc_id"])
    assert _collect(ds).num_rows == 400


# --- CLI --------------------------------------------------------------------------


def test_parse_where_hastok():
    from parquet_converter_ray.cli import _parse_where

    assert _parse_where("text hastok 'spark window'") == ("text", "hastok", "spark window")
    assert _parse_where("text hastok needle") == ("text", "hastok", "needle")
    assert _parse_where("text hasphrase 'spark window'") == (
        "text", "hasphrase", "spark window")


def test_cli_scan_hastok(ray_session, token_store, capsys):
    from parquet_converter_ray.cli import main

    rc = main(["scan", token_store, "--where", "text hastok needleword",
               "--columns", "doc_id", "--count"])
    assert rc == 0
    outs = capsys.readouterr().out.strip().splitlines()
    import json

    assert json.loads(outs[-1])["rows"] == N_DOCS // 8

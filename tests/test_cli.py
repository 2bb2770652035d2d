"""CLI end-to-end tests (reference tests/test_cli.py model).

The CLI owns its Ray session when run standalone; under pytest the session
fixture has already initialised Ray, and `_init_ray` reuses it. `ray.shutdown`
in the CLI would kill the shared session, so these tests run the CLI via a
subprocess only where cheap, and in-process with a shutdown guard otherwise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "parquet_converter_ray.cli", "--num-cpus", "4", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    from parquet_converter_ray.synth import make_transcripts

    p = tmp_path_factory.mktemp("cli") / "in.parquet"
    pq.write_table(make_transcripts(3000, 11), str(p))
    return str(p)


def test_cli_encode_verify_decode(small_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 3000

    r = run_cli("verify", out, small_parquet)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["bit_identical"] is True

    dec = str(tmp_path_factory.mktemp("cli") / "dec")
    r = run_cli("decode", out, dec)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == 3000

    r = run_cli("storestats", out)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(stats) == {"role_stats", "length_histogram", "tool_usage"}
    assert sum(row["n_turns"] for row in stats["role_stats"]) == 3000
    assert sum(row["n_turns"] for row in stats["length_histogram"]) == 3000


def test_cli_convert_and_analyze(tmp_path):
    src = tmp_path / "d.csv"
    src.write_text("id,name\n1,Alice\n2,Bob\n")
    out = str(tmp_path / "out")
    r = run_cli("convert", str(src), out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"files": 1, "failed": 0}
    produced = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert produced
    r = run_cli("analyze", produced[0])
    assert r.returncode == 0
    assert "PARQUET ANALYSIS REPORT" in r.stdout


def test_cli_fsck_repair_single_json(small_parquet, tmp_path_factory):
    """fsck --repair must emit exactly ONE JSON object on stdout (consumers
    parse a single document), with the repair summary nested inside."""
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "3")
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli("fsck", out, "--repair")
    assert r.returncode == 0, r.stderr[-2000:]
    body = r.stdout.strip()
    rep = json.loads(body)  # would raise on two concatenated documents
    assert rep["ok"] is True
    assert rep["repair"]["parts_rewritten"] == 0


def test_cli_save_config_roundtrip(tmp_path):
    """--save-config writes the effective config; loading the saved file back
    (reference cli.py:65-69 parity) reproduces an identical EngineConfig,
    including values overridden by the input --config."""
    import dataclasses

    from parquet_converter_ray.config import EngineConfig

    src = tmp_path / "in.json"
    src.write_text(json.dumps({"compression": "zstd", "codec": "fsst"}))
    out = tmp_path / "saved.json"

    r = subprocess.run(
        [sys.executable, "-m", "parquet_converter_ray.cli",
         "--config", str(src), "--save-config", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"saved": str(out)}

    cfg = EngineConfig.load(str(src), env={})
    reloaded = EngineConfig.load(str(out), env={})
    assert dataclasses.asdict(reloaded) == dataclasses.asdict(cfg)
    assert reloaded.compression == "zstd" and reloaded.codec == "fsst"


def test_cli_decode_partition_by(small_parquet, tmp_path_factory):
    """decode --partition-by writes hive-partitioned parquet whose union
    equals the store contents."""
    import pyarrow.dataset as pads

    enc = str(tmp_path_factory.mktemp("dp") / "enc")
    out = str(tmp_path_factory.mktemp("dp") / "by_role")
    r = run_cli("encode", small_parquet, enc, "--n-parts", "4", "--salt-rows", "1000")
    assert r.returncode == 0, r.stderr
    r = run_cli("decode", enc, out, "--partition-by", "role")
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == 3000
    dirs = sorted(os.listdir(out))
    assert all(d.startswith("role=") for d in dirs) and len(dirs) > 1
    t = pads.dataset(out, partitioning="hive").to_table()
    src = pq.read_table(small_parquet)
    assert t.num_rows == src.num_rows
    key = [(c, "ascending") for c in sorted(src.column_names)]
    assert t.select(src.column_names).cast(src.schema).sort_by(key).equals(src.sort_by(key))


def test_cli_distinct_and_topk(small_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "4")
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli("distinct", out, "role")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    head = json.loads(lines[0])
    vals = {json.loads(ln)["role"] for ln in lines[1:]}
    assert vals == {"assistant", "system", "user", "tool"}
    assert head["plan"]["scanned"] == 0, head  # dict footers answer everything

    r = run_cli(
        "topk", out, "--by", "ts", "-k", "3",
        "--columns", "conv_id", "turn_idx", "ts",
        "--tiebreak", "conv_id,turn_idx",
        "--where", "role==user",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert json.loads(lines[0])["rows"] == 3
    rows = [json.loads(ln) for ln in lines[1:]]
    assert len(rows) == 3
    assert rows[0]["ts"] >= rows[1]["ts"] >= rows[2]["ts"]


def test_cli_group_topk(small_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli(
        "topk", out, "--by", "ts", "-k", "2", "--group-by", "role",
        "--columns", "role", "conv_id", "ts", "--tiebreak", "conv_id,turn_idx",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert json.loads(lines[0])["rows"] == 8  # 4 roles x k=2
    roles = [json.loads(ln)["role"] for ln in lines[1:]]
    assert sorted(set(roles)) == ["assistant", "system", "tool", "user"]


def test_cli_sample(small_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("sample", out, "--key", "conv_id", "-n", "5",
                "--seed", "z", "--columns", "conv_id", "--limit", "5",
                "--where", "turn_idx==0")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert json.loads(lines[0])["rows"] == 5
    a = [json.loads(ln)["conv_id"] for ln in lines[1:]]
    r2 = run_cli("sample", out, "--key", "conv_id", "-n", "5",
                 "--seed", "z", "--columns", "conv_id", "--limit", "5",
                 "--where", "turn_idx==0")
    b = [json.loads(ln)["conv_id"] for ln in r2.stdout.strip().splitlines()[1:]]
    assert a == b  # deterministic across processes


def test_cli_distinct_tuples(small_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", small_parquet, out, "--n-parts", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("distinct", out, "role,tool", "--limit", "50")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    rows = [json.loads(ln) for ln in lines[1:]]
    assert all(set(row) == {"role", "tool", "count"} for row in rows)
    tools = {row["tool"] for row in rows if row["role"] == "tool"}
    assert len(tools) > 1 and sum(row["count"] for row in rows) == 3000


def test_cli_search(tmp_path_factory):
    import numpy as np

    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(500, dtype=np.int64)),
            "text": pa.array(
                ["alpha beta"] * 498 + ["alpha beta gamma", "gamma delta"]
            ),
        }
    )
    src = str(tmp_path_factory.mktemp("cli") / "docs.parquet")
    pq.write_table(docs, src)
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    r = run_cli("encode", src, out, "--n-parts", "2", "--conv-col", "doc_id",
                "--order-col", "doc_id", "--text-bloom-cols", "text")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("search", out, "gamma delta", "-k", "3",
                "--columns", "doc_id", "--tiebreak", "doc_id")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    rows = [json.loads(ln) for ln in lines[1:]]
    assert [r_["doc_id"] for r_ in rows] == [499, 498]
    assert [r_["score"] for r_ in rows] == [2, 1]

"""Conversion parity tests (reference tests/test_converter.py + test_cli.py model)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from parquet_converter_ray.config import EngineConfig
from parquet_converter_ray.convert import (
    ConversionStats,
    convert_directory,
    convert_file,
    infer_parse_plan,
    resolve_options,
    save_conversion_report,
)


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("col1,col2\n1,a\n2,b\n3,c\n")
    return str(p)


@pytest.fixture
def txt_file(tmp_path):
    p = tmp_path / "data.txt"
    p.write_text("col1\tcol2\n1\ta\n2\tb\n3\tc\n")
    return str(p)


def test_csv_roundtrip(ray_session, csv_file, tmp_path):
    """Reference test_converter.py:66-99: 3 rows, round-trip read-back."""
    stats = convert_file(csv_file, str(tmp_path / "out"))
    assert stats.errors == []
    assert stats.rows_processed == 3
    df = pd.read_parquet(stats.output_path).sort_values("col1").reset_index(drop=True)
    assert df["col1"].tolist() == [1, 2, 3]
    assert df["col2"].tolist() == ["a", "b", "c"]


def test_txt_roundtrip(ray_session, txt_file, tmp_path):
    stats = convert_file(txt_file, str(tmp_path / "out"))
    assert stats.errors == []
    assert stats.rows_processed == 3
    df = pd.read_parquet(stats.output_path)
    assert sorted(df["col2"].tolist()) == ["a", "b", "c"]


def test_jsonl_roundtrip_types(ray_session, tmp_path):
    """JSONL source: typed JSON values AND string-encoded datetimes both land
    on the committed schema; nulls survive; bools normalise."""
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "amt": 1.5, "ok": true, "ts": "2024-01-02 03:04:05"}\n'
        '{"id": 2, "name": null, "amt": 2.5, "ok": false, "ts": "2024-01-03 04:05:06"}\n'
        '{"id": 3, "name": "c", "amt": null, "ok": true, "ts": null}\n'
    )
    stats = convert_file(str(p), str(tmp_path / "out"))
    assert stats.errors == []
    assert stats.rows_processed == 3
    df = pd.read_parquet(stats.output_path).sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 3]
    assert str(df["id"].dtype) in ("Int64", "int64")
    assert df["name"].isna().tolist() == [False, True, False]
    assert df["amt"].isna().tolist() == [False, False, True]
    assert df["ok"].tolist()[:2] == [True, False]
    assert str(df["ts"].dtype).startswith("datetime64")
    assert df["ts"].iloc[0] == pd.Timestamp("2024-01-02 03:04:05")
    assert pd.isna(df["ts"].iloc[2])


def test_convert_directory_picks_up_jsonl(ray_session, tmp_path):
    (tmp_path / "a.jsonl").write_text('{"x": 1}\n{"x": 2}\n')
    stats = convert_directory(str(tmp_path), str(tmp_path / "out"))
    assert len(stats) == 1 and stats[0].errors == []
    assert stats[0].rows_processed == 2


def test_unsupported_extension_yields_error_stats(ray_session, tmp_path):
    """Reference test_converter.py:102-113: unsupported file -> error stats, no raise."""
    p = tmp_path / "data.json"
    p.write_text("{}")
    stats = convert_file(str(p), str(tmp_path / "out"))
    assert stats.errors
    assert stats.rows_converted == 0


def test_convert_directory_isolates_failures(ray_session, tmp_path):
    """Reference test_converter.py:116-158: 2 valid + 1 invalid -> 2 outputs."""
    (tmp_path / "a.csv").write_text("x,y\n1,p\n")
    (tmp_path / "b.txt").write_text("x\ty\n2\tq\n")
    (tmp_path / "c.xml").write_text("<x/>")
    out = str(tmp_path / "out")
    stats = convert_directory(str(tmp_path), out)
    ok = [s for s in stats if not s.errors]
    assert len(ok) == 2
    report = save_conversion_report(stats, out, EngineConfig())
    assert os.path.exists(report)


def test_empty_directory(ray_session, tmp_path):
    assert convert_directory(str(tmp_path), str(tmp_path / "out")) == []


def test_inference_precedence():
    """Reference parser.py:154-268 precedence on the F5 fixture shape."""
    df = pd.DataFrame(
        {
            "id": ["1", "2", "3"],
            "name": ["Alice", "Bob", "Carol"],
            "salary": ["55000.5", "48000.0", "61000.1"],
            "joined_date": ["2023-01-15", "2023-02-20", "2023-03-10"],
            "is_active": ["true", "false", "TRUE"],
            "flag01": ["1", "0", "1"],
            "mixed": ["1", "x", "2"],
            "empty": [None, None, None],
        }
    )
    plan = infer_parse_plan(df, ["%Y-%m-%d"])
    assert plan["id"] == ("int64",)
    assert plan["name"] == ("string",)
    assert plan["salary"] == ("float64",)
    assert plan["joined_date"][0] == "datetime"
    assert plan["is_active"] == ("boolean",)
    assert plan["flag01"] == ("int64",)  # numeric wins over boolean for 0/1
    assert plan["mixed"] == ("string",)
    assert plan["empty"] == ("string",)


def test_na_tokens(ray_session, tmp_path):
    """["", "NA", "NULL"] -> null (reference config.py:55)."""
    p = tmp_path / "na.csv"
    p.write_text("v,s\n1,x\nNA,NULL\n3,\n")
    stats = convert_file(str(p), str(tmp_path / "out"))
    df = pd.read_parquet(stats.output_path).sort_values("v", na_position="last")
    assert df["v"].isna().sum() == 1
    assert df["s"].isna().sum() == 2
    assert str(df["v"].dtype) in ("Int64", "int64", "float64")


def test_explicit_dtype_override():
    df = pd.DataFrame({"zip": ["01234", "05678"]})
    plan = infer_parse_plan(df, [], dtypes={"zip": "string"})
    assert plan["zip"] == ("dtype", "string")


def test_resolve_options_dispatch():
    cfg = EngineConfig()
    assert resolve_options("x.csv", cfg).delimiter == ","
    assert resolve_options("x.txt", cfg).delimiter == "\t"
    with pytest.raises(ValueError):
        resolve_options("x.parquet", cfg)


def test_stats_serializable():
    s = ConversionStats(input_path="a.csv", rows_processed=5)
    d = s.to_dict()
    assert d["input_path"] == "a.csv" and d["rows_processed"] == 5


def test_skip_footer_legacy_path(ray_session, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("a,b\n1,x\n2,y\nTOTAL,2\n")
    from parquet_converter_ray.config import EngineConfig

    cfg = EngineConfig()
    cfg.csv.skip_footer = 1
    stats = convert_file(str(p), str(tmp_path / "out"), cfg)
    assert stats.errors == []
    df = pd.read_parquet(stats.output_path)
    assert len(df) == 2
    assert str(df["a"].dtype) in ("Int64", "int64")


def test_header_with_replacement_column_names(ray_session, tmp_path):
    """header=True + explicit column_names: the names replace the file's
    header (reference parser semantics: pandas header=0 + names) — the header
    row must be consumed, not parsed as data."""
    p = tmp_path / "named.csv"
    p.write_text("orig_a,orig_b\n1,x\n2,y\n3,z\n")
    cfg = EngineConfig()
    cfg.csv.column_names = ["new_a", "new_b"]
    stats = convert_file(str(p), str(tmp_path / "out"), cfg)
    assert stats.errors == []
    assert stats.rows_processed == 3
    df = pd.read_parquet(stats.output_path).sort_values("new_a").reset_index(drop=True)
    assert list(df.columns) == ["new_a", "new_b"]
    assert df["new_a"].tolist() == [1, 2, 3]
    assert df["new_b"].tolist() == ["x", "y", "z"]


def test_utf8_lossy_encoding(ray_session, tmp_path):
    """utf8-lossy (reference converter.py:426-450): undecodable bytes become
    U+FFFD instead of failing the file."""
    p = tmp_path / "lossy.csv"
    p.write_bytes(b"col1,col2\n1,ok\n2,b\xffad\n")
    cfg = EngineConfig()
    cfg.csv.encoding = "utf8-lossy"
    stats = convert_file(str(p), str(tmp_path / "out"), cfg)
    assert stats.errors == []
    df = pd.read_parquet(stats.output_path).sort_values("col1")
    assert df["col2"].tolist() == ["ok", "b�ad"]
    # strict utf-8 on the same file records an error, does not raise
    cfg2 = EngineConfig()
    stats2 = convert_file(str(p), str(tmp_path / "out2"), cfg2)
    assert stats2.errors


def test_normalize_encoding_vocabulary():
    from parquet_converter_ray.convert import normalize_encoding

    assert normalize_encoding("UTF-8") == ("utf-8", "strict")
    assert normalize_encoding("utf8") == ("utf-8", "strict")
    assert normalize_encoding("utf8-lossy") == ("utf-8", "replace")
    assert normalize_encoding("utf_8_lossy") == ("utf-8", "replace")
    assert normalize_encoding("latin-1") == ("latin-1", "strict")


def test_regex_delimiter_txt(ray_session, tmp_path):
    """Multi-char/regex delimiters (the reference pandas TXT fallback's
    default sep is '\\s+') route through the eager legacy path."""
    p = tmp_path / "ws.txt"
    p.write_text("col1  col2\n1   a\n2  b\n3    c\n")
    cfg = EngineConfig()
    cfg.txt.delimiter = r"\s+"
    stats = convert_file(str(p), str(tmp_path / "out"), cfg)
    assert stats.errors == []
    df = pd.read_parquet(stats.output_path).sort_values("col1").reset_index(drop=True)
    assert df["col1"].tolist() == [1, 2, 3]
    assert df["col2"].tolist() == ["a", "b", "c"]

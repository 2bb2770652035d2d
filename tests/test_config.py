"""Config tests (reference tests/test_config.py model: defaults, file
round-trip, env overrides)."""

from __future__ import annotations

import json

from parquet_converter_ray.config import EngineConfig


def test_defaults():
    cfg = EngineConfig()
    assert cfg.csv.delimiter == ","
    assert cfg.txt.delimiter == "\t"
    assert cfg.csv.na_values == ["", "NA", "NULL"]
    assert cfg.compression == "snappy"
    assert cfg.sample_rows == 100_000
    assert cfg.profiling_column_limit == 25
    assert cfg.datetime_default == "%Y-%m-%d"
    assert cfg.codec == "auto"


def test_file_roundtrip(tmp_path):
    cfg = EngineConfig()
    cfg.compression = "zstd"
    cfg.csv.delimiter = ";"
    cfg.datetime_custom = ["%d/%m/%Y"]
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    loaded = EngineConfig.load(p)
    assert loaded.compression == "zstd"
    assert loaded.csv.delimiter == ";"
    assert loaded.datetime_formats == ["%Y-%m-%d", "%d/%m/%Y"]


def test_env_overrides(tmp_path):
    cfg = EngineConfig.load(env={"PCR_COMPRESSION": "gzip", "PCR_SAMPLE_ROWS": "5000", "PCR_CODEC": "fsst"})
    assert cfg.compression == "gzip"
    assert cfg.sample_rows == 5000
    assert cfg.codec == "fsst"


def test_env_overrides_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"compression": "brotli"}))
    cfg = EngineConfig.load(str(p), env={"PCR_COMPRESSION": "zstd"})
    assert cfg.compression == "zstd"  # env wins over file (reference config.py:347-401)


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"not_a_key": 1, "compression": "lz4"}))
    assert EngineConfig.load(str(p)).compression == "lz4"


def test_env_var_map():
    """Reference env map parity (config.py:382-393) + PCR aliases."""
    import pytest

    from parquet_converter_ray.config import EngineConfig

    cfg = EngineConfig.load(env={
        "COMPRESSION_CODEC": "zstd",
        "SAMPLE_ROWS": "123",
        "VERIFY_ROWS": "7",
        "PROFILING_COLUMN_LIMIT": "9",
        "LOG_LEVEL": "DEBUG",
        "LOG_FILE": "/tmp/x.log",
        "OUTPUT_DIR": "/tmp/out",
        "ANALYZER_REPORT_DIR": "/tmp/rep",
    })
    assert cfg.compression == "zstd"
    assert cfg.sample_rows == 123
    assert cfg.verify_rows == 7
    assert cfg.profiling_column_limit == 9
    assert cfg.log_level == "DEBUG"
    assert cfg.log_file == "/tmp/x.log"
    assert cfg.output_dir == "/tmp/out"
    assert cfg.analyzer_report_dir == "/tmp/rep"
    with pytest.raises(ValueError, match="integer"):
        EngineConfig.load(env={"SAMPLE_ROWS": "notanint"})

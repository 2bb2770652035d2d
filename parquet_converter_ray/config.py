"""Engine configuration: dataclasses + YAML/JSON file + env-var overrides.

Mirrors the reference's config surface (reference config.py:18-183: CSVOptions /
TXTOptions / DateTimeFormats / Config with file + env merging, config.py:347-401)
without the Pydantic dependency. Env overrides use the same style
(``PCR_COMPRESSION=zstd`` etc.).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field


@dataclass
class ReaderOptions:
    delimiter: str = ","
    encoding: str = "utf-8"
    header: bool = True
    na_values: list[str] = field(default_factory=lambda: ["", "NA", "NULL"])
    column_names: list[str] | None = None
    dtypes: dict[str, str] | None = None
    skip_rows: int = 0
    skip_footer: int = 0


@dataclass
class EngineConfig:
    csv: ReaderOptions = field(default_factory=ReaderOptions)
    txt: ReaderOptions = field(default_factory=lambda: ReaderOptions(delimiter="\t"))
    datetime_default: str = "%Y-%m-%d"
    datetime_custom: list[str] = field(default_factory=list)
    compression: str = "snappy"  # parquet sink codec (reference config.py:175)
    sample_rows: int = 100_000  # schema-inference sample (reference converter.py:20)
    verify_rows: int = 10
    profiling_column_limit: int = 25
    log_level: str = "INFO"
    log_file: str | None = None
    output_dir: str | None = None
    analyzer_report_dir: str | None = None
    # north-star codec layer
    codec: str = "auto"  # per-column auto-selection, or a fixed codec name
    target_part_bytes: int = 64 << 20
    salt_rows: int = 100_000

    @property
    def datetime_formats(self) -> list[str]:
        return [f for f in [self.datetime_default, *self.datetime_custom] if f]

    @classmethod
    def load(cls, path: str | None = None, env: dict | None = None) -> "EngineConfig":
        cfg = cls()
        if path:
            with open(path) as f:
                if path.endswith((".yaml", ".yml")):
                    try:
                        import yaml  # optional

                        data = yaml.safe_load(f)
                    except ImportError as e:
                        raise ValueError("yaml config requires pyyaml") from e
                else:
                    data = json.load(f)
            cfg = _merge(cfg, data or {})
        env = env if env is not None else os.environ
        # the reference's env map (config.py:382-393), plus PCR_* aliases
        str_map = {
            "PCR_COMPRESSION": "compression",
            "COMPRESSION_CODEC": "compression",
            "PCR_CODEC": "codec",
            "LOG_LEVEL": "log_level",
            "LOG_FILE": "log_file",
            "OUTPUT_DIR": "output_dir",
            "ANALYZER_REPORT_DIR": "analyzer_report_dir",
        }
        int_map = {
            "PCR_SAMPLE_ROWS": "sample_rows",
            "SAMPLE_ROWS": "sample_rows",
            "VERIFY_ROWS": "verify_rows",
            "PROFILING_COLUMN_LIMIT": "profiling_column_limit",
            "PCR_SALT_ROWS": "salt_rows",
            "PCR_TARGET_PART_BYTES": "target_part_bytes",
        }
        for var, attr in str_map.items():
            if env.get(var):
                setattr(cfg, attr, env[var])
        for var, attr in int_map.items():
            if env.get(var):
                try:
                    setattr(cfg, attr, int(env[var]))
                except ValueError as e:
                    raise ValueError(
                        f"Expected integer environment variable {var}, received: {env[var]}"
                    ) from e
        return cfg

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


def _merge(cfg: EngineConfig, data: dict) -> EngineConfig:
    for k, v in data.items():
        if not hasattr(cfg, k):
            continue
        cur = getattr(cfg, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            for kk, vv in v.items():
                if hasattr(cur, kk):
                    setattr(cur, kk, vv)
        else:
            setattr(cfg, k, v)
    return cfg

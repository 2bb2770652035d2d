"""Structured logging setup + stats table (reference logging.py:60-169 parity).

``setup_logging`` validates the level (ValueError on unknown names), installs
console + optional file handlers with the reference's
``asctime - name - levelname - message`` format, and configures the package
logger. ``format_stats_table`` renders per-file conversion stats as a plain
grid (the reference uses tabulate; this renders an equivalent fixed-width
table without the dependency).
"""

from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
PACKAGE_LOGGER = "parquet_converter_ray"


def setup_logging(level: str = "INFO", log_file: str | None = None, verbose: bool = False) -> None:
    """Configure console and optional file logging (reference logging.py:60-127).

    Raises ``ValueError`` for an invalid level name.

    Examples
    --------
    >>> setup_logging(level="DEBUG")
    >>> logging.getLogger(PACKAGE_LOGGER).level == logging.DEBUG
    True
    """
    numeric_level = getattr(logging, level.upper(), None)
    if not isinstance(numeric_level, int):
        raise ValueError(f"Invalid log level: {level}")
    eff = logging.DEBUG if verbose else numeric_level
    formatter = logging.Formatter(_FMT)

    root = logging.getLogger()
    root.setLevel(eff)
    root.handlers.clear()
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(formatter)
    console.setLevel(eff)
    root.addHandler(console)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        fh.setLevel(numeric_level)
        root.addHandler(fh)

    pkg = logging.getLogger(PACKAGE_LOGGER)
    pkg.setLevel(eff)
    pkg.propagate = True


def format_stats_table(stats_list: list) -> str:
    """Plain-text grid of conversion stats (reference logging.py:130-169).

    Examples
    --------
    >>> from parquet_converter_ray.convert import ConversionStats
    >>> s = ConversionStats("a.csv", "out/a", 3, 3)
    >>> "a.csv" in format_stats_table([s])
    True
    >>> format_stats_table([])
    'No files were converted.'
    """
    if not stats_list:
        return "No files were converted."
    headers = ["File", "Rows", "Columns", "Output", "Status"]
    rows = [
        [
            s.input_path,
            str(s.rows_converted),
            str(len(s.column_stats)),
            s.output_path,
            "Success" if not s.errors else "Failed",
        ]
        for s in stats_list
    ]
    widths = [max(len(h), *(len(r[i]) for r in rows)) for i, h in enumerate(headers)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"
    out = [sep, line(headers), sep]
    out.extend(line(r) for r in rows)
    out.append(sep)
    return "\n".join(out)

"""Shared helpers for oracle-checked pipelines."""

from __future__ import annotations

import numpy as np


def sql_round(x, d: int = 4):
    """Round half AWAY FROM ZERO — DuckDB/SQL ROUND semantics.

    Python's round()/numpy round half-to-even, which diverges from the oracle
    whenever an aggregate lands exactly on a .5 boundary (it happens: the mean
    of sf0.01 l_quantity is exactly 25.40225)."""
    scale = 10.0**d
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out

"""Shared scalar helpers (SURVEY.md §2.8 function surface).

round6: round-half-up to 6 decimals, matching DuckDB's ``round(x, 6)``
(half away from zero for positive values).  Python/numpy ``round`` is
banker's rounding, which silently diverges from every SQL engine on
exact .5 boundaries — all cross-engine-compared floats in this repo go
through THIS function on the Ray side and ``round(x, 6)`` on the SQL
side.
"""

from __future__ import annotations

import numpy as np


def round6(x):
    """Half-up 6-dp rounding for positive floats (scalar or ndarray)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def round6_scalar(x: float) -> float:
    return float(round6(x))

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


def round6_signed(x):
    """Half-AWAY-FROM-ZERO 6-dp rounding (scalar or ndarray) — what
    DuckDB's ``round(x, 6)`` does for NEGATIVE values too; ``round6``
    above is only correct for non-negative inputs."""
    v = np.asarray(x, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6


def micro_signed(x) -> np.ndarray:
    """Scale by 1e6 and round half-away-from-zero to int64 — matches
    DuckDB ``CAST(round(x * 1000000) AS BIGINT)``.  Used to carry
    per-token log-probabilities as exact integers so their SUM is
    order-independent across engines."""
    v = np.asarray(x, dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)


FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def fnv1a64(s: "str | bytes") -> int:
    """Scalar FNV-1a 64-bit (reference implementation for the
    vectorized version below; property-tested equal)."""
    h = FNV_OFFSET
    for b in s.encode() if isinstance(s, str) else s:
        h = ((h ^ b) * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_arr(strs) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over the UTF-8 bytes of each string.

    Bit-identical to ``fnv1a64`` per element.  The per-BYTE loop is
    replaced by max-string-length masked numpy passes over an (n, L)
    byte matrix — callers hash only DISTINCT tokens (dictionary-encode
    first), so n is vocabulary-sized and L is a short word length.
    """
    n = len(strs)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    enc = [s.encode() for s in strs]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    if not lens.any():
        return out
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    buf = np.zeros((n, int(lens.max())), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(flat)) - np.repeat(starts, lens)
    buf[rows, cols] = flat
    prime = np.uint64(FNV_PRIME)
    for j in range(buf.shape[1]):
        mask = lens > j
        out[mask] = (out[mask] ^ buf[mask, j].astype(np.uint64)) * prime
    return out

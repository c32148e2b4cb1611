"""Variable-byte + delta codecs, fully vectorized with numpy (F5/F6).

Spec source: BASELINE.json:6 ("delta-encoded docID gaps + varbyte blocks
with skip pointers"); semantics per [LIT-IIR] ch.5 (Manning et al. 2008).

Wire format (classic IIR variable-byte): each integer is emitted as
little-endian 7-bit groups, one per byte; the HIGH bit (0x80) is set on
the LAST byte of each integer.  Values must be unsigned and < 2**63
(doc_ids are 63-bit; gaps/tfs/positions are small positives).

Both encode and decode are O(max_bytes_per_int) vectorized numpy passes
— no Python loop over integers — so whole-partition encoding during the
segment build and whole-block decoding during WAND scoring stay off the
Python interpreter's hot path.
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 9  # 9 * 7 = 63 payload bits


def vb_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint array -> (byte string, per-value byte lengths).

    The per-value lengths are returned so callers can compute block /
    term byte offsets with a cumsum instead of re-measuring.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    if bool((v >= np.uint64(1) << np.uint64(63)).any()):
        raise ValueError("vb_encode: values must be < 2**63")
    # exact per-value byte count: 1 + number of 7-bit group thresholds crossed
    nbytes = np.ones(v.size, dtype=np.int64)
    for g in range(1, _MAX_GROUPS):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * g))).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    for g in range(_MAX_GROUPS):
        m = nbytes > g
        if not m.any():
            break
        out[starts[m] + g] = ((v[m] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
    out[ends - 1] |= 0x80
    return out.tobytes(), nbytes


def vb_decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream -> uint64 array.

    ``count`` (if given) is validated against the number of decoded ints.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero(b & 0x80)[0]
    n = ends.size
    if count is not None and n != count:
        raise ValueError(f"vb_decode: expected {count} ints, stream holds {n}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    payload = (b & 0x7F).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    for g in range(int(lens.max())):
        m = lens > g
        vals[m] |= payload[starts[m] + g] << np.uint64(7 * g)
    return vals


def delta_encode(values: np.ndarray, restarts: np.ndarray) -> np.ndarray:
    """Gaps with restarts: out[i] = values[i] - values[i-1], except at
    indices listed in ``restarts`` (sorted, must include 0 when values
    is non-empty) where out[i] = values[i] (absolute).

    Used with restarts at every term start AND every 128-posting block
    start, so a block decodes without its predecessor (skip pointers).
    Values must be non-decreasing between restarts.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return v.copy()
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    out[restarts] = v[restarts]
    if (out < 0).any():
        raise ValueError("delta_encode: values decrease within a run")
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode for a SINGLE run (first value absolute)."""
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.int64), dtype=np.int64)

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codecs import delta_decode, delta_encode, vb_decode, vb_encode


def test_vb_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**62, 2**63 - 1], dtype=np.uint64)
    buf, nbytes = vb_encode(vals)
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 9, 9]
    out = vb_decode(buf, count=len(vals))
    np.testing.assert_array_equal(out, vals)


def test_vb_empty_and_single():
    buf, nb = vb_encode(np.array([], dtype=np.uint64))
    assert buf == b"" and nb.size == 0
    assert vb_decode(b"").size == 0
    buf, nb = vb_encode(np.array([42], dtype=np.uint64))
    assert len(buf) == 1
    assert vb_decode(buf)[0] == 42


def test_vb_byte_lengths_match_stream():
    vals = np.arange(0, 100000, 37, dtype=np.uint64) ** 2
    buf, nbytes = vb_encode(vals)
    assert len(buf) == nbytes.sum()
    # slicing by cumulative lengths decodes each int independently
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    for i in [0, 1, 500, len(vals) - 1]:
        one = vb_decode(buf[starts[i]:ends[i]])
        assert one[0] == vals[i]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_vb_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    buf, _ = vb_encode(vals)
    np.testing.assert_array_equal(vb_decode(buf, count=len(xs)), vals)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_delta_roundtrip_property(xs):
    vals = np.sort(np.array(xs, dtype=np.int64))
    d = delta_encode(vals, restarts=np.array([0]))
    np.testing.assert_array_equal(delta_decode(d), vals)


def test_delta_restarts():
    # two runs: [10, 15, 20] and [3, 9] with restart at index 3
    vals = np.array([10, 15, 20, 3, 9], dtype=np.int64)
    d = delta_encode(vals, restarts=np.array([0, 3]))
    assert d.tolist() == [10, 5, 5, 3, 6]
    np.testing.assert_array_equal(delta_decode(d[:3]), vals[:3])
    np.testing.assert_array_equal(delta_decode(d[3:]), vals[3:])


def test_delta_decreasing_raises():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3], dtype=np.int64), restarts=np.array([0]))

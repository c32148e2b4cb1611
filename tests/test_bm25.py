"""F7/F8 unit tests: BM25 values, monotonicity, upper-bound soundness
(SURVEY.md §5.2 — adversarial upper-bound cases are the BMW safety net)."""

import math

from hypothesis import given, strategies as st

from engine import bm25


def test_idf_hand_computed():
    # N=100, df=10: ln(1 + (100-10+0.5)/(10+0.5)) = ln(1 + 90.5/10.5)
    assert abs(bm25.idf(10, 100) - math.log(1.0 + 90.5 / 10.5)) < 1e-15
    # df == N (term everywhere) stays non-negative (Lucene variant)
    assert bm25.idf(100, 100) > 0.0
    assert bm25.idf(1, 1) > 0.0


def test_tf_part_hand_computed():
    # tf=2, dl=50, avgdl=100: 2*2.2 / (2 + 1.2*(0.25 + 0.75*0.5))
    want = (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * (50 / 100)))
    assert abs(bm25.tf_part(2.0, 50.0, 100.0) - want) < 1e-15


def test_monotonicity():
    # increasing tf increases the score; increasing dl decreases it
    prev = 0.0
    for tf in range(1, 50):
        cur = bm25.tf_part(float(tf), 100.0, 100.0)
        assert cur > prev
        prev = cur
    prev = math.inf
    for dl in (10.0, 50.0, 100.0, 500.0, 5000.0):
        cur = bm25.tf_part(3.0, dl, 100.0)
        assert cur < prev
        prev = cur


@given(
    max_tf=st.integers(1, 1000),
    tfs=st.lists(st.integers(1, 1000), min_size=1, max_size=30),
    min_dl=st.integers(1, 100),
    dls=st.lists(st.integers(1, 10000), min_size=1, max_size=30),
    df=st.integers(1, 1000),
    n=st.integers(1, 10**9),
    avgdl=st.floats(1.0, 1e6),
)
def test_upper_bound_dominates(max_tf, tfs, min_dl, dls, df, n, avgdl):
    """ub(max_tf, min_dl) >= score(tf, dl) for every tf <= max_tf and
    dl >= min_dl — the invariant WAND pruning relies on ([LIT-BMW])."""
    df = min(df, n)
    idf_t = bm25.idf(df, n)
    ub = bm25.upper_bound(float(max_tf), float(min_dl), idf_t, avgdl)
    for tf in tfs:
        tf = min(tf, max_tf)
        for dl in dls:
            dl = max(dl, min_dl)
            assert idf_t * bm25.tf_part(float(tf), float(dl), avgdl) <= ub

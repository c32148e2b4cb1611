"""Per-actor memory bounds of the read side (VERDICT r01 #3/#4/#6):
sharded global-term-df loading, LRU-bounded open segments, and
forward-index more-like-this equivalence with the legacy vocab scan."""

import os

import pytest

from engine.query import IndexReader


def test_global_terms_sharded_layout(built_index):
    """Per-segment layout: every segment carries a gt.parquet partial
    with one row group per term-hash shard; no build-time aggregation
    directory exists."""
    import pyarrow.parquet as pq

    from engine.segments import list_segments

    out = built_index["out"]
    assert os.path.exists(os.path.join(out, "global_terms_meta.json"))
    shards_seen = set()
    for seg in list_segments(out):
        fp = os.path.join(seg, "gt.parquet")
        assert os.path.exists(fp)
        md = pq.ParquetFile(fp).metadata
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            assert st.min == st.max  # one shard per row group
            shards_seen.add(st.min)
    assert len(shards_seen) >= 2  # vocabulary actually spread across shards


def test_df_shards_load_lazily(built_index):
    rd = IndexReader(built_index["out"])
    assert rd.global_df.loaded_shards == 0
    rd.search(built_index["queries"][0]["text"], k=5)
    touched = rd.global_df.loaded_shards
    assert 1 <= touched < rd.global_df.num_shards  # only what the query used


def test_df_shard_values_match_full_table(built_index):
    from engine.build import read_global_terms

    rd = IndexReader(built_index["out"])
    t = read_global_terms(built_index["out"])
    full = dict(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))
    for term in list(full)[::7]:
        assert rd.global_df.get(term) == full[term]
    assert rd.global_df.get("zzz_not_a_term_anywhere", 0) == 0


def test_segment_cache_bounded_and_identical(built_index):
    bounded = IndexReader(built_index["out"], max_open_segments=2)
    full = IndexReader(built_index["out"])
    n_segs = len(bounded.segment_paths)
    assert n_segs > 2
    for q in built_index["queries"][:6]:
        a = bounded.search(q["text"], q["k"])
        b = full.search(q["text"], q["k"])
        assert a == b
        assert len(bounded._segments) <= 2
    assert len(full._segments) == n_segs


def test_more_like_this_fwd_equals_vocab_scan(built_index):
    """The forward-index term selection must reproduce the legacy
    O(|vocab|) scan exactly (same candidates -> same ranking)."""
    rd_fwd = IndexReader(built_index["out"])
    rd_scan = IndexReader(built_index["out"])
    some_ids = sorted(built_index["ref"].doc_meta)[:8]
    for did in some_ids:
        a = rd_fwd.more_like_this(did, k=5)
        # force the legacy path by blanking the fwd lookup
        part = did % len(rd_scan.segment_paths)
        seg = rd_scan.segment(part)
        orig = seg.fwd_terms
        seg.fwd_terms = lambda _d: None
        try:
            b = rd_scan.more_like_this(did, k=5)
        finally:
            seg.fwd_terms = orig
        assert a == b


def test_fwd_point_lookup(built_index):
    rd = IndexReader(built_index["out"])
    ref = built_index["ref"]
    for did in sorted(ref.doc_meta)[:10]:
        part = did % len(rd.segment_paths)
        got = rd.segment(part).fwd_terms(did)
        assert got is not None
        terms, tfs = got
        assert list(terms) == sorted(terms)  # per-doc sorted unique terms
        assert len(terms) == len(tfs) and all(t >= 1 for t in tfs)
    assert rd.segment(0).fwd_terms(987654321) is None

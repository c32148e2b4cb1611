"""End-to-end build correctness vs the single-process oracle
(SURVEY.md §5.2: postings equality, df/cf/N/avgdl equality, dictionary
offsets decode, positions, sha256 invariant)."""

import os

import numpy as np
import pyarrow.parquet as pq

from engine.checkpoint import read_collection_stats
from engine.segments import Segment, list_segments


def _all_segments(out):
    return [Segment(p) for p in list_segments(out)]


def test_postings_equal_oracle(built_index):
    ref = built_index["ref"]
    segs = _all_segments(built_index["out"])
    # engine postings per term = union over segments, mapped to doc_ids
    got: dict[str, list[tuple[int, int]]] = {}
    for s in segs:
        for term, row in s.term_idx.items():
            ords, tfs = s.decode_idx(row)
            got.setdefault(term, []).extend(
                zip(s.doc_ids[ords].tolist(), tfs.tolist())
            )
    assert set(got) == set(ref.postings)
    for term, plist in ref.postings.items():
        assert sorted(got[term]) == sorted(plist), f"postings differ for {term!r}"


def test_positions_equal_oracle(built_index):
    ref = built_index["ref"]
    segs = _all_segments(built_index["out"])
    terms = sorted(ref.postings)[:25] + ["import", "def"]
    for term in terms:
        if term not in ref.postings:
            continue
        for s in segs:
            row = s.term_idx.get(term)
            if row is None:
                continue
            ords, _ = s.decode_idx(row)
            poslists = s.decode_positions(term)
            for o, pos in zip(ords, poslists):
                did = int(s.doc_ids[o])
                assert pos.tolist() == ref.positions[(term, did)]


def test_global_stats_equal_oracle(built_index):
    ref = built_index["ref"]
    stats = read_collection_stats(built_index["out"])
    assert stats["num_docs"] == ref.num_docs
    assert stats["total_doc_len"] == ref.total_doc_len
    assert abs(stats["avg_doc_len"] - ref.avg_doc_len) < 1e-12
    from engine.build import read_global_terms

    gt = read_global_terms(built_index["out"])
    df = dict(zip(gt.column("term").to_pylist(), gt.column("df").to_pylist()))
    assert len(df) == len(ref.postings)
    assert stats["vocab_size"] == len(ref.postings)
    for term, plist in ref.postings.items():
        assert df[term] == len(plist), term


def test_doc_stats_sha_invariant(built_index):
    """M7: per-row content sha256 equality vs source rows (BASELINE.json:15)."""
    import hashlib

    want = {}
    for r in built_index["rows"]:
        from engine.ids import doc_id_of

        did = doc_id_of(r["repo"], r["path"], r["commit"])
        sha = hashlib.sha256(r["content"].encode()).hexdigest()
        want.setdefault(did, set()).add(sha)
    seen = 0
    for s in _all_segments(built_index["out"]):
        t = pq.read_table(os.path.join(s.path, "docs.parquet"))
        for did, sha in zip(
            t.column("doc_id").to_pylist(), t.column("content_sha256").to_pylist()
        ):
            assert sha in want[did]
            seen += 1
    assert seen == built_index["ref"].num_docs


def test_doc_ids_unique_and_partitioned(built_index):
    segs = _all_segments(built_index["out"])
    num_parts = len(segs)
    all_ids = np.concatenate([s.doc_ids for s in segs])
    assert len(np.unique(all_ids)) == len(all_ids)
    for part, s in enumerate(segs):
        assert (s.doc_ids % num_parts == part).all()
        # doc_ids sorted -> ordinals valid
        assert (np.diff(s.doc_ids) > 0).all()


def test_dictionary_offsets_decode(built_index):
    """Every term's recorded byte extents decode to exactly df postings."""
    for s in _all_segments(built_index["out"]):
        for term, row in list(s.term_idx.items())[:200]:
            ords, tfs = s.decode_idx(row)
            assert len(ords) == s.df[row] == int(s.n_postings[row])
            assert (np.diff(ords) > 0).all()
            assert int(tfs.max(initial=0)) == int(s.max_tf[row])
            assert int(tfs.sum()) == int(s.cf[row])


def test_export_postings_roundtrip(built_index):
    """export_postings == the oracle's in-memory postings exactly."""
    from engine.build import export_postings

    ref = built_index["ref"]
    rows = export_postings(built_index["out"]).take_all()
    got = {(r["term"], r["doc_id"]): r["tf"] for r in rows}
    want = {
        (t, did): tf
        for t, plist in ref.postings.items()
        for did, tf in plist
    }
    assert got == want
    assert len(rows) == len(got)  # no duplicate posting rows
    # metadata resolves
    meta = ref.doc_meta
    for r in rows[:20]:
        assert r["repo"] == meta[r["doc_id"]]["repo"]

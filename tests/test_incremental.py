"""Incremental document addition (engine.build.add_documents):
delta generations, exact global-stats refresh, rank identity vs a full
rebuild, generation-aware point lookups, resume of an interrupted add.
"""

import os

import pytest

from engine.build import add_documents, build_index
from engine.checkpoint import generations, read_build_manifest
from engine.query import IndexReader
from tests.fixtures.gen import gen_corpus, gen_queries


def _ds(rows):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


@pytest.fixture(scope="module")
def incremental(ray_session, tmp_path_factory):
    """Full rebuild over A+B vs build(A) + add_documents(B)."""
    rows = gen_corpus(240)
    # split by KEY hash (not position): the fixture's duplicate rows
    # share (repo, path, commit) and must land in the same half — the
    # add_documents precondition is distinct keys vs the existing index
    def _half(r):
        import hashlib

        key = f"{r['repo']}\0{r['path']}\0{r['commit']}".encode()
        return hashlib.sha256(key).digest()[0] % 2

    a = [r for r in rows if _half(r) == 0]
    b = [r for r in rows if _half(r) == 1]
    root = tmp_path_factory.mktemp("incr")
    full = str(root / "full")
    incr = str(root / "incr")
    build_index(_ds(rows), full, num_parts=6, analyzer_concurrency=(1, 2))
    build_index(_ds(a), incr, num_parts=6, analyzer_concurrency=(1, 2))
    stats = add_documents(incr, _ds(b), num_parts=4,
                          analyzer_concurrency=(1, 2))
    return {"full": full, "incr": incr, "stats": stats, "rows": rows}


def test_add_records_generation(incremental):
    man = read_build_manifest(incremental["incr"])
    assert generations(man) == [(0, 6), (6, 4)]
    rd = IndexReader(incremental["incr"])
    assert len(rd.segment_paths) == 10


def test_add_matches_full_rebuild_stats(incremental):
    from engine.checkpoint import read_collection_stats

    f = read_collection_stats(incremental["full"])
    i = read_collection_stats(incremental["incr"])
    for key in ("num_docs", "total_doc_len", "avg_doc_len", "min_doc_len",
                "total_postings", "vocab_size"):
        assert f[key] == i[key], key


def test_add_rank_identity_with_full_rebuild(incremental):
    """BM25 after an add == BM25 after a full rebuild of the union:
    same docs, same order, same float64 scores (global stats and df are
    re-finalized exactly)."""
    rd_f = IndexReader(incremental["full"])
    rd_i = IndexReader(incremental["incr"])
    n_nonempty = 0
    for q in gen_queries():
        want = rd_f.search(q["text"], q["k"])
        got = rd_i.search(q["text"], q["k"])
        assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want], q["text"]
        for g, w in zip(got, want):
            assert abs(g["score"] - w["score"]) <= 1e-9
        n_nonempty += bool(want)
    assert n_nonempty >= 5


def test_locate_both_generations(incremental):
    """Point lookups resolve docs from every generation."""
    rd = IndexReader(incremental["incr"])
    seen_gens = set()
    for seg_id in (0, 6):
        seg = rd.segment(seg_id)
        for did in seg.doc_ids[:3]:
            loc = rd.locate(int(did))
            assert loc is not None
            assert loc[0] == seg_id
            seen_gens.add(seg_id)
    assert seen_gens == {0, 6}
    assert rd.locate(123456789) is None


def test_more_like_this_across_generations(incremental):
    rd_f = IndexReader(incremental["full"])
    rd_i = IndexReader(incremental["incr"])
    # one doc from each generation of the incremental index
    dids = [int(rd_i.segment(0).doc_ids[0]), int(rd_i.segment(6).doc_ids[0])]
    for did in dids:
        want = rd_f.more_like_this(did, k=5)
        got = rd_i.more_like_this(did, k=5)
        assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]


def test_second_add_and_incomplete_guard(incremental, tmp_path):
    import shutil

    idx = str(tmp_path / "idx3")
    shutil.copytree(incremental["incr"], idx)
    extra = []
    for r in gen_corpus(40, seed=7):
        r = dict(r)
        r["repo"] = "neworg/" + r["repo"]  # distinct keys vs the base index
        extra.append(r)
    add_documents(idx, _ds(extra), num_parts=2, analyzer_concurrency=(1, 2))
    man = read_build_manifest(idx)
    assert generations(man) == [(0, 6), (6, 4), (10, 2)]
    rd = IndexReader(idx)
    assert rd.num_docs > IndexReader(incremental["incr"]).num_docs
    # lookups still work for gen-2 docs
    seg = rd.segment(10)
    if seg.num_docs:
        assert rd.locate(int(seg.doc_ids[0]))[0] >= 10


def test_resume_interrupted_add(incremental, tmp_path):
    """Kill an add after some segments: resume finishes the SAME
    generation and the result matches an uninterrupted add."""
    import shutil

    rows_b = gen_corpus(240)[120:]
    base = incremental["incr"]
    # reference: the completed incremental index (full add of B)
    idx = str(tmp_path / "resume")
    shutil.copytree(base, idx)
    # fake an interruption of a THIRD generation: append manifest entry
    # + build only part of it by running add with resume after a manual
    # manifest append (no segments yet)
    from engine.checkpoint import append_generation

    start = append_generation(idx, 3)
    assert start == 10
    # plain add now must refuse (incomplete last generation)
    with pytest.raises(ValueError, match="incomplete"):
        add_documents(idx, _ds(rows_b[:10]), num_parts=3)
    # resume completes the recorded generation (3 parts, ignoring the
    # num_parts argument)
    add_documents(idx, _ds(rows_b[:10]), num_parts=99, resume=True,
                  analyzer_concurrency=(1, 2))
    man = read_build_manifest(idx)
    assert generations(man)[-1] == (10, 3)
    rd = IndexReader(idx)
    assert len(rd.segment_paths) == 13


def test_fresh_build_manifest_unchanged(incremental):
    """A fresh (non-incremental) build keeps the legacy manifest shape
    (no generations key) — byte-compat with existing indexes."""
    man = read_build_manifest(incremental["full"])
    assert "generations" not in man
    assert generations(man) == [(0, 6)]


def test_resumed_add_bytes_identical(incremental, tmp_path):
    """An interrupted-then-resumed add produces byte-identical delta
    segments to an uninterrupted add of the same corpus."""
    import hashlib
    import shutil

    def _seg_hashes(idx, seg_ids):
        out = {}
        for sid in seg_ids:
            p = os.path.join(idx, "segments", f"seg-{sid:05d}", "postings.bin")
            out[sid] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return out

    extra = []
    for r in gen_corpus(30, seed=11):
        r = dict(r)
        r["repo"] = "resumeorg/" + r["repo"]
        extra.append(r)

    a = str(tmp_path / "direct")
    b = str(tmp_path / "resumed")
    shutil.copytree(incremental["incr"], a)
    shutil.copytree(incremental["incr"], b)

    add_documents(a, _ds(extra), num_parts=3, analyzer_concurrency=(1, 2))

    # interrupt b's add: record the generation, build NOTHING, then
    # delete one segment of a partial attempt and resume
    add_documents(b, _ds(extra), num_parts=3, analyzer_concurrency=(1, 2))
    # simulate losing two delta segments + stats, then resume
    for sid in (10, 12):
        shutil.rmtree(os.path.join(b, "segments", f"seg-{sid:05d}"))
    os.remove(os.path.join(b, "collection_stats.json"))
    add_documents(b, _ds(extra), num_parts=3, resume=True,
                  analyzer_concurrency=(1, 2))

    assert _seg_hashes(a, [10, 11, 12]) == _seg_hashes(b, [10, 11, 12])
    from engine.checkpoint import read_collection_stats

    assert read_collection_stats(a) == read_collection_stats(b)


def test_many_generations(ray_session, tmp_path):
    """6 incremental adds: manifest tracks every generation, search
    equals a refimpl over the accumulated corpus, point lookups stay
    one-searchsorted-per-generation."""
    from engine.refimpl import RefIndex

    batches = []
    all_rows = []
    base = gen_corpus(40)
    idx = str(tmp_path / "gens")
    build_index(_ds(base), idx, num_parts=2, analyzer_concurrency=(1, 2))
    all_rows += base
    for g in range(6):
        rows = []
        for r in gen_corpus(8, seed=100 + g):
            r = dict(r)
            r["repo"] = f"gen{g}/" + r["repo"]
            rows.append(r)
        add_documents(idx, _ds(rows), num_parts=1,
                      analyzer_concurrency=(1, 2))
        all_rows += rows
    man = read_build_manifest(idx)
    gens = generations(man)
    assert len(gens) == 7
    assert gens[-1] == (7, 1)
    rd = IndexReader(idx)
    assert len(rd.segment_paths) == 8
    ref = RefIndex(all_rows)
    assert rd.num_docs == ref.num_docs
    n = 0
    for q in gen_queries()[:4]:
        want = ref.topk(q["text"], q["k"])
        got = rd.search(q["text"], q["k"])
        assert [h["doc_id"] for h in got] == [d for d, _ in want], q["text"]
        n += bool(want)
    assert n >= 2
    # a doc from the last generation resolves through all 7 generations
    seg = rd.segment(7)
    if seg.num_docs:
        assert rd.locate(int(seg.doc_ids[0]))[0] == 7


def test_auto_compact_bounds_generations(ray_session, tmp_path):
    """VERDICT r03 task #7: a long-lived index driven through ~20
    incremental adds with the auto_compact policy stays rank-identical
    to a refimpl over the accumulated corpus while the generation
    count stays bounded at max_generations."""
    from engine.maintenance import auto_compact, generation_count
    from engine.refimpl import RefIndex

    G = 4
    base = gen_corpus(30)
    live = str(tmp_path / "live0")
    build_index(_ds(base), live, num_parts=2, analyzer_concurrency=(1, 2))
    all_rows = list(base)
    n_compactions = 0
    for g in range(20):
        rows = []
        for r in gen_corpus(5, seed=300 + g):
            r = dict(r)
            r["repo"] = f"ac{g}/" + r["repo"]
            rows.append(r)
        add_documents(live, _ds(rows), num_parts=1,
                      analyzer_concurrency=(1, 2))
        all_rows += rows
        new_live, stats = auto_compact(
            live, max_generations=G,
            out_dir=str(tmp_path / f"live{g + 1}"),
        )
        if stats is not None:
            n_compactions += 1
            assert generation_count(new_live) == 1
        live = new_live
        assert generation_count(live) <= G + 1  # post-add, pre-compact peak
    assert n_compactions >= 3  # the policy actually fired repeatedly

    rd = IndexReader(live)
    ref = RefIndex(all_rows)
    # gen_corpus appends exact-duplicate rows (D1 dedups them) — compare
    # engine vs refimpl, not raw row count
    assert rd.num_docs == ref.num_docs
    n = 0
    for q in gen_queries()[:6]:
        want = ref.topk(q["text"], q["k"])
        got = rd.search(q["text"], q["k"])
        assert [h["doc_id"] for h in got] == [d for d, _ in want], q["text"]
        for h, (_, ws) in zip(got, want):
            assert abs(h["score"] - ws) <= 1e-9
        n += bool(want)
    assert n >= 3
    # below-threshold call is a no-op
    same, stats = auto_compact(live, max_generations=G)
    assert stats is None and same == live

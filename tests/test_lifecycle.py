"""Full index lifecycle: build -> incremental add -> delete ->
serve -> compact -> serve, with rank identity against a refimpl built
over the equivalent logical corpus at every step."""

import pytest

from engine.build import add_documents, build_index
from engine.maintenance import compact_index, delete_docs
from engine.query import IndexReader
from engine.refimpl import RefIndex
from tests.fixtures.gen import gen_corpus, gen_queries


def _ds(rows):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _assert_matches_ref(rd, ref, queries, ctx, min_nonempty=4):
    n = 0
    for q in queries:
        want = ref.topk(q["text"], q["k"])
        got = rd.search(q["text"], q["k"])
        assert [h["doc_id"] for h in got] == [d for d, _ in want], (ctx, q["text"])
        for h, (_, ws) in zip(got, want):
            assert abs(h["score"] - ws) <= 1e-9, (ctx, q["text"])
        n += bool(want)
    assert n >= min_nonempty, ctx


@pytest.mark.usefixtures("ray_session")
def test_full_lifecycle(tmp_path):
    rows = gen_corpus(200)
    extra = []
    for r in gen_corpus(60, seed=5):
        r = dict(r)
        r["repo"] = "lifecycle/" + r["repo"]
        extra.append(r)
    queries = gen_queries()[:8]

    idx = str(tmp_path / "idx")

    # 1. initial build
    build_index(_ds(rows), idx, num_parts=5, analyzer_concurrency=(1, 2))
    _assert_matches_ref(IndexReader(idx), RefIndex(rows), queries, "build")

    # 2. incremental add
    add_documents(idx, _ds(extra), num_parts=3, analyzer_concurrency=(1, 2))
    both = rows + extra
    _assert_matches_ref(IndexReader(idx), RefIndex(both), queries, "add")

    # 3. delete: tombstone some docs from BOTH generations (Lucene
    # semantics — stats keep pre-delete values, so the oracle is the
    # refimpl over the union with the same docs dropped from ranking)
    rd = IndexReader(idx)
    victims = [int(rd.segment(0).doc_ids[0]), int(rd.segment(5).doc_ids[0])]
    delete_docs(idx, victims)
    rd = IndexReader(idx)
    for q in queries:
        hits = rd.search(q["text"], 50)
        assert all(h["doc_id"] not in victims for h in hits), q["text"]

    # 4. compact: rewrite without tombstones; post-compact stats shrink
    # and ranking equals a refimpl over the reduced corpus
    out = str(tmp_path / "compacted")
    compact_index(idx, out)
    ref_rows = [
        r for r in both
        if _doc_id(r) not in set(victims)
    ]
    rd2 = IndexReader(out)
    assert rd2.tombstones is None
    assert rd2.num_docs == RefIndex(ref_rows).num_docs
    _assert_matches_ref(rd2, RefIndex(ref_rows), queries, "compact")


def _doc_id(row):
    from engine.ids import doc_id_of

    return doc_id_of(row["repo"], row["path"], row["commit"])

"""Federated multi-index search: scoring two independently-built
indexes with combined stats is rank-and-score identical to one index
over the union corpus (refimpl oracle)."""

import hashlib

import pytest

from engine.build import build_index
from engine.query import run_queries_federated
from engine.refimpl import RefIndex
from tests.fixtures.gen import gen_corpus, gen_queries


def _ds(rows):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _half(r):
    key = f"{r['repo']}\0{r['path']}\0{r['commit']}".encode()
    return hashlib.sha256(key).digest()[0] % 2


@pytest.fixture(scope="module")
def federated(ray_session, tmp_path_factory):
    rows = gen_corpus(200)
    a = [r for r in rows if _half(r) == 0]
    b = [r for r in rows if _half(r) == 1]
    root = tmp_path_factory.mktemp("fed")
    da, db = str(root / "a"), str(root / "b")
    build_index(_ds(a), da, num_parts=4, analyzer_concurrency=(1, 2))
    build_index(_ds(b), db, num_parts=3, analyzer_concurrency=(1, 2))
    return {"dirs": [da, db], "ref": RefIndex(rows)}


def test_federated_rank_identity(federated):
    queries = [
        {"query_id": i, "text": q["text"], "k": q["k"]}
        for i, q in enumerate(gen_queries()[:8])
    ]
    t = run_queries_federated(federated["dirs"], queries, concurrency=(1, 2))
    by_q = {}
    for r in t.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r)
    n_nonempty = 0
    for q in queries:
        want = federated["ref"].topk(q["text"], q["k"])
        got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q["text"]
        for g, (_, ws) in zip(got, want):
            assert abs(g["score"] - ws) <= 1e-9, q["text"]
        n_nonempty += bool(want)
    assert n_nonempty >= 5


def test_federated_conjunctive(federated):
    queries = [{"query_id": 0, "text": "def import", "k": 10}]
    t = run_queries_federated(
        federated["dirs"], queries, match="all", concurrency=(1, 2)
    )
    want = federated["ref"].topk_and("def import", 10)
    got = sorted(t.to_pylist(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_federated_rejects_expansions(federated):
    from engine.query import IndexReader, federated_stats

    ov = federated_stats(federated["dirs"], [{"query_id": 0, "text": "a*"}])
    rd = IndexReader(federated["dirs"][0], stats_override=ov)
    with pytest.raises(ValueError, match="expansion"):
        rd.search("a*", 5, match="prefix")


def test_federated_analyzer_mismatch(federated, tmp_path):
    rows = gen_corpus(20)
    other = str(tmp_path / "simple_idx")
    build_index(_ds(rows), other, num_parts=2, analyzer="simple",
                analyzer_concurrency=(1, 2))
    with pytest.raises(ValueError, match="analyzer"):
        run_queries_federated(
            [federated["dirs"][0], other],
            [{"query_id": 0, "text": "x", "k": 5}],
        )


def test_federated_large_query_fallback_identical(federated):
    """Past 256 queries the one-job range-major shape would duplicate
    the query block per range item; the per-index fallback must kick in
    and stay rank-and-score identical per query text."""
    base = [q for q in gen_queries()[:6]]
    small = [
        {"query_id": i, "text": q["text"], "k": 5}
        for i, q in enumerate(base)
    ]
    # 300 queries cycling the same 6 texts -> fallback path
    big = [
        {"query_id": 1000 + i, "text": base[i % len(base)]["text"], "k": 5}
        for i in range(300)
    ]
    t_small = run_queries_federated(federated["dirs"], small,
                                    concurrency=(1, 2))
    t_big = run_queries_federated(federated["dirs"], big,
                                  concurrency=(1, 2))
    by_small = {}
    for r in t_small.to_pylist():
        by_small.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    by_big = {}
    for r in t_big.to_pylist():
        by_big.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, rows in by_big.items():
        want = by_small[(qid - 1000) % len(base)]
        assert sorted(rows) == sorted(want), qid

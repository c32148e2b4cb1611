"""Percolation (reverse search): exact equivalence with a local
recompute, any/all semantics, and the broadcast-bound guards."""

import pyarrow as pa
import pytest

import ray.data

from engine import percolate

SF = "/root/testdata/sf0.001"

BANK = [
    {"query_id": 0, "text": "join hash", "match": "any"},
    {"query_id": 1, "text": "customer order data", "match": "all"},
    {"query_id": 2, "text": "zzz_oov merge", "match": "any"},
    {"query_id": 3, "text": "zzz_oov only_oov", "match": "any"},
]


def _local(rows, bank):
    want = {}
    for r in rows:
        d = {w.lower() for w in r["text"].split(" ") if w}
        for q in bank:
            qs = {w.lower() for w in q["text"].split(" ") if w}
            n = len(qs & d)
            ok = n == len(qs) if q.get("match", "any") == "all" else n >= 1
            if ok:
                want[(r["doc_id"], q["query_id"])] = n
    return want


def test_percolate_matches_local(ray_session):
    import pyarrow.parquet as pq

    got = {(r["doc_id"], r["query_id"]): r["nmatch"]
           for r in percolate.percolate(SF, BANK).take_all()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = _local(t.to_pylist(), BANK)
    assert got == want
    assert got  # non-trivial corpus coverage
    # the OOV-only query can never match
    assert not any(q == 3 for _, q in got)


def test_percolate_all_semantics(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta", "beta"]),
    }))
    bank = [{"query_id": 7, "text": "alpha beta", "match": "all"},
            {"query_id": 8, "text": "alpha beta", "match": "any"}]
    got = {(r["doc_id"], r["query_id"]): r["nmatch"]
           for r in percolate.percolate("", bank, docs=docs).take_all()}
    assert got == {(1, 7): 2, (2, 7): 2,
                   (1, 8): 2, (2, 8): 2, (3, 8): 1}


def test_percolate_duplicate_terms_count_once(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["alpha alpha alpha beta"]),
    }))
    bank = [{"query_id": 0, "text": "alpha alpha beta", "match": "all"}]
    got = percolate.percolate("", bank, docs=docs).take_all()
    assert [(r["doc_id"], r["query_id"], r["nmatch"]) for r in got] == [
        (1, 0, 2)
    ]


def test_percolate_guards():
    with pytest.raises(ValueError, match="no terms"):
        percolate.percolate(SF, [{"query_id": 0, "text": "  "}])
    big = [{"query_id": i, "text": "x"} for i in
           range(percolate.PERCOLATE_MAX_QUERIES + 1)]
    with pytest.raises(ValueError, match="broadcast bound"):
        percolate.percolate(SF, big)


def test_percolate_hot_term_skew(ray_session):
    """A bank term present in EVERY doc (df=100%) routes the whole
    corpus to that query — output stays exact and match-volume-sized
    (one row per (doc, matched query)), no dense blow-up."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = t.to_pylist()
    # find a token present in every doc (the synthetic Zipf head)
    from collections import Counter
    df = Counter()
    for r in rows:
        df.update({w.lower() for w in r["text"].split(" ") if w})
    hot, n = df.most_common(1)[0]
    bank = [{"query_id": 0, "text": hot, "match": "any"}]
    got = percolate.percolate(SF, bank).take_all()
    assert len(got) == n
    assert all(r["nmatch"] == 1 for r in got)

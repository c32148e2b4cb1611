"""Degenerate inputs: empty corpus, single doc, empty content — the
build/query paths must produce valid (empty) indexes, not crash."""

import pyarrow as pa

import ray.data

from engine.build import build_index
from engine.query import IndexReader, run_queries
from engine.schema import CORPUS


def _corpus(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=CORPUS))


def test_empty_corpus(ray_session, tmp_path):
    out = str(tmp_path / "empty")
    stats = build_index(_corpus([]), out, num_parts=4, analyzer_concurrency=(1, 2))
    assert stats["num_docs"] == 0 and stats["num_segments"] == 4
    rd = IndexReader(out)
    assert rd.search("anything", 5) == []
    res = run_queries(out, [{"query_id": 0, "text": "x", "k": 5}],
                      concurrency=(1, 1)).take_all()
    assert res == []


def test_single_doc_and_empty_content(ray_session, tmp_path):
    rows = [
        {"repo": "r", "path": "a.py", "commit": "c1", "lang": "py",
         "content": "def main(): return alphaBeta_42"},
        {"repo": "r", "path": "b.py", "commit": "c2", "lang": "py",
         "content": ""},  # zero tokens
        {"repo": "r", "path": "c.py", "commit": "c3", "lang": "py",
         "content": "!!! ### $$$"},  # only separators -> zero tokens
    ]
    out = str(tmp_path / "tiny")
    stats = build_index(_corpus(rows), out, num_parts=3, analyzer_concurrency=(1, 2))
    assert stats["num_docs"] == 3
    rd = IndexReader(out)
    hits = rd.search("alpha beta", 5)
    assert len(hits) == 1 and hits[0]["path"] == "a.py"
    # conjunctive + phrase on the only doc
    assert len(rd.search("main alpha", 5, match="all")) == 1
    assert len(rd.search("alpha beta 42", 5, match="phrase")) == 1
    assert rd.search("beta alpha", 5, match="phrase") == []  # wrong order


def test_new_modes_on_empty_index(ray_session, tmp_path):
    """Every query mode handles an empty index gracefully."""
    out = str(tmp_path / "empty2")
    build_index(_corpus([]), out, num_parts=3, analyzer_concurrency=(1, 2))
    rd = IndexReader(out)
    assert rd.search("pre*", 5, match="prefix") == []
    assert rd.search("term~", 5, match="fuzzy") == []
    assert rd.search("[a-z]+", 5, match="regex") == []
    assert rd.search("+a b -c", 5, match="bool") == []
    assert rd.search("a b", 5, match="near", slop=3) == []
    assert rd.search("x", 5, collapse="repo") == []
    assert rd.search("x", 5, scorer="tfidf") == []
    assert rd.search("x", 5, filter_lang="py") == []


def test_new_modes_single_doc(ray_session, tmp_path):
    rows = [{"repo": "r", "path": "a.py", "commit": "c", "lang": "py",
             "content": "alpha beta alpha gamma"}]
    out = str(tmp_path / "one")
    build_index(_corpus(rows), out, num_parts=2, analyzer_concurrency=(1, 2))
    rd = IndexReader(out)
    # prefix expands, fuzzy matches within distance, regex full-matches
    assert len(rd.search("alp*", 5, match="prefix")) == 1
    assert len(rd.search("alphas~", 5, match="fuzzy")) == 1
    assert len(rd.search("(alpha|delta)", 5, match="regex")) == 1
    assert rd.search("zeta*", 5, match="prefix") == []
    # near: single-term query reduces to containment
    assert len(rd.search("alpha", 5, match="near", slop=0)) == 1
    # near slop 0: 'alpha beta' adjacent -> match; 'alpha gamma' span 2
    assert len(rd.search("alpha beta", 5, match="near", slop=0)) == 1
    assert rd.search("beta gamma", 5, match="near", slop=0) == []
    assert len(rd.search("beta gamma", 5, match="near", slop=1)) == 1
    # collapse with k larger than distinct values
    assert len(rd.search("alpha", 10, collapse="repo")) == 1
    # explain sums to the score
    h = rd.search("alpha beta", 1)[0]
    rows_ = rd.explain("alpha beta", h["doc_id"])
    assert abs(sum(r["contrib"] for r in rows_) - h["score"]) <= 1e-12

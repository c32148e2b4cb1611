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

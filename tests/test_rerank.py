"""Two-stage rerank: jaccard correctness vs a local recomputation,
candidate-subset/ordering invariants, and the capability gate."""

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.query import IndexReader, run_queries
from engine import rerank
from tests.fixtures.gen import gen_corpus

QUERIES = [
    {"query_id": 0, "text": "def return while", "k": 5},
    {"query_id": 1, "text": "import mod_7 class", "k": 5},
    {"query_id": 2, "text": "for in range print", "k": 5},
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rows = gen_corpus(150, seed=7)
    out = str(tmp_path_factory.mktemp("rerank") / "idx")
    build_index(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), out,
        num_parts=4, analyzer="simple", analyzer_concurrency=(1, 2),
    )
    return {"out": out, "rows": rows}


def _local_jaccard(content: str, qtext: str) -> float:
    # simple analyzer = lowercase + split on ' ' ONLY (newlines stay
    # inside tokens), matching the SQL string_split(text, ' ') oracle
    d = {t.lower() for t in content.split(" ") if t}
    q = {t.lower() for t in qtext.split(" ") if t}
    inter = len(q & d)
    return inter / (len(q) + len(d) - inter)


def test_rerank_jaccard_matches_corpus(idx):
    """The forward-index term set IS the simple-analyzed content, so
    jaccard_r must equal the direct corpus recomputation."""
    by_path = {(r["repo"], r["path"]): r["content"] for r in idx["rows"]}
    t = rerank.rerank_topk(idx["out"], QUERIES, k=5, k0=12)
    assert t.num_rows > 0
    qtext = {q["query_id"]: q["text"] for q in QUERIES}
    for r in t.to_pylist():
        want = _local_jaccard(
            by_path[(r["repo"], r["path"])], qtext[r["query_id"]]
        )
        assert abs(r["jaccard_r"] - want) < 1e-6, r


def test_rerank_is_candidate_reorder(idx):
    """Reranked top-k is a SUBSET of the first-stage top-k0 candidate
    set, ordered by (jaccard desc, score desc)."""
    k, k0 = 5, 12
    first = run_queries(idx["out"], [{**q, "k": k0} for q in QUERIES],
                        concurrency=(1, 2)).take_all()
    cand = {(r["query_id"], r["doc_id"]) for r in first}
    t = rerank.rerank_topk(idx["out"], QUERIES, k=k, k0=k0)
    by_q: dict[int, list] = {}
    for r in sorted(t.to_pylist(), key=lambda r: (r["query_id"], r["rank"])):
        assert (r["query_id"], r["doc_id"]) in cand
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["jaccard_r"], -r["score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), qid


def test_rerank_deterministic(idx):
    a = rerank.rerank_topk(idx["out"], QUERIES, k=5, k0=12).to_pylist()
    b = rerank.rerank_topk(idx["out"], QUERIES, k=5, k0=12).to_pylist()
    assert a == b


def test_cross_encoder_capability_gate():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        rerank.CrossEncoderReranker()


def test_lexical_reranker_unknown_doc_raises(idx):
    rr = rerank.LexicalReranker(idx["out"], {0: "def return"})
    with pytest.raises(KeyError):
        rr._doc_terms(123456789)


def test_rerank_fewer_candidates_than_k(idx):
    """A rare-term query matches fewer docs than k — ranks stay
    contiguous over the short list, no crash, no padding."""
    from collections import Counter

    df = Counter()
    for r in idx["rows"]:
        df.update({t.lower() for t in r["content"].split(" ") if t})
    rare, n = min(df.items(), key=lambda kv: (kv[1], kv[0]))
    assert n < 50
    qs = [{"query_id": 9, "text": f"{rare} zzz_oov1 zzz_oov2", "k": 50}]
    t = rerank.rerank_topk(idx["out"], qs, k=50, k0=100)
    rows = sorted(t.to_pylist(), key=lambda r: r["rank"])
    assert 0 < len(rows) < 50
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))

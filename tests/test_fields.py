"""Multi-field search (per-field boosts): rank identity engine ≡
refimpl over the fielded corpus, distributed ≡ single-process, boost
semantics, and unsupported-combination guards."""

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.corpus import with_field_tokens
from engine.query import IndexReader, run_queries
from engine.refimpl import RefIndex
from tests.fixtures.gen import gen_corpus

P = 4

QUERIES = [
    "src pkg3",            # path-field terms
    "mod_7 import",        # path + content mix
    "while return def",    # content-only terms
    "py",                  # extension token (path) + possible content
    "zzz_oov pkg5",        # OOV + path term
]

BOOSTS = [
    {"path": 2.0},
    {"content": 1.0, "path": 0.5},
    {"content": 0.0, "path": 1.0},   # path-only search
    {"path": 2.0, "repo": 1.5},
]


@pytest.fixture(scope="module")
def fielded(ray_session, tmp_path_factory):
    rows = gen_corpus(120, seed=11)
    corpus = with_field_tokens(
        ray.data.from_arrow(pa.Table.from_pylist(rows)),
        fields=("path", "repo"),
    )
    rows2 = corpus.take_all()  # the SAME transformed rows feed refimpl
    out = str(tmp_path_factory.mktemp("fields") / "idx")
    build_index(
        ray.data.from_arrow(pa.Table.from_pylist(rows2)), out,
        num_parts=P, analyzer="simple", analyzer_concurrency=(1, 2),
    )
    return {"out": out, "ref": RefIndex(rows2, analyzer="simple")}


def test_field_tokens_transform(ray_session):
    rows = [{"repo": "org1/repoA", "path": "src/pkg3/mod_7.py",
             "commit": "c", "lang": "py", "content": "Alpha beta"}]
    got = with_field_tokens(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), fields=("path",)
    ).take_all()
    assert got[0]["content"] == (
        "Alpha beta «path»src «path»pkg3 «path»mod_7 «path»py"
    )


def test_rank_identity_vs_refimpl(fielded):
    rd = IndexReader(fielded["out"])
    ref = fielded["ref"]
    for text in QUERIES:
        for boosts in BOOSTS:
            got = [
                (h["doc_id"], h["score"])
                for h in rd.search(text, k=10, field_boosts=boosts)
            ]
            want = ref.topk_fields(text, k=10, boosts=boosts)
            assert got == want, (text, boosts)


def test_wand_equals_exhaustive_with_boosts(fielded):
    """Weighted idf scales WAND's upper bounds linearly, so pruning
    stays safe — both kernels must return identical results."""
    rd = IndexReader(fielded["out"])
    for text in QUERIES:
        w = [
            (h["doc_id"], h["score"])
            for h in rd.search(text, k=10, mode="wand",
                               field_boosts={"path": 2.0})
        ]
        e = [
            (h["doc_id"], h["score"])
            for h in rd.search(text, k=10, mode="exhaustive",
                               field_boosts={"path": 2.0})
        ]
        assert w == e, text


def test_distributed_equals_local(fielded):
    qs = [{"query_id": i, "text": t, "k": 10} for i, t in enumerate(QUERIES)]
    res = run_queries(
        fielded["out"], qs, concurrency=(1, 2),
        field_boosts={"path": 2.0, "repo": 1.5},
    ).take_all()
    rd = IndexReader(fielded["out"])
    by_q: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for i, t in enumerate(QUERIES):
        want = [
            (h["doc_id"], h["score"])
            for h in rd.search(t, k=10,
                               field_boosts={"path": 2.0, "repo": 1.5})
        ]
        assert by_q.get(i, []) == want, t


def test_boost_semantics(fielded):
    """A path term ranks a doc only when the path field is boosted; a
    zero content boost searches the path field alone."""
    rd = IndexReader(fielded["out"])
    # with content-only scoring the «path» postings are untouched
    plain = rd.search("pkg3", k=120)
    boosted = rd.search("pkg3", k=120, field_boosts={"path": 1.0})
    plain_ids = {h["doc_id"] for h in plain}
    boosted_ids = {h["doc_id"] for h in boosted}
    # every doc whose path contains pkg3 is found once boosted
    extra = boosted_ids - plain_ids
    assert extra, "path-field matches must add docs"
    for h in rd.search("pkg3", k=120, field_boosts={"content": 0.0, "path": 1.0}):
        assert "pkg3" in h["path"], h


def test_unsupported_combinations_raise(fielded):
    rd = IndexReader(fielded["out"])
    with pytest.raises(ValueError, match="field_boosts"):
        rd.search("src", k=5, match="all", field_boosts={"path": 1.0})
    with pytest.raises(ValueError, match="field_boosts"):
        rd.search("src", k=5, scorer="tfidf", field_boosts={"path": 1.0})
    with pytest.raises(ValueError, match="field_boosts"):
        rd.search("src", k=5, filter_lang="py", field_boosts={"path": 1.0})
    # collapse/sort_by_path route through scoring paths with no boost
    # plumbing — they must refuse rather than return unboosted ranks
    with pytest.raises(ValueError, match="field_boosts"):
        rd.search("src", k=5, collapse="repo", field_boosts={"path": 1.0})
    from engine.query import SegmentScorer
    with pytest.raises(ValueError, match="field_boosts"):
        SegmentScorer(fielded["out"], collapse="repo",
                      field_boosts={"path": 1.0})
    with pytest.raises(ValueError, match="field_boosts"):
        SegmentScorer(fielded["out"], sort_by_path=True,
                      field_boosts={"path": 1.0})


def test_null_and_empty_field_values_skip(ray_session):
    """A null or token-free field value must leave the doc's content
    untouched (not null the whole content column value)."""
    rows = [
        {"repo": "r", "path": None, "commit": "c", "lang": "py",
         "content": "alpha beta"},
        {"repo": "r", "path": "", "commit": "c", "lang": "py",
         "content": "gamma"},
        {"repo": "r", "path": " /-. ", "commit": "c", "lang": "py",
         "content": "delta"},
        {"repo": "r", "path": "/docs/a.txt", "commit": "c", "lang": "py",
         "content": "eps"},
    ]
    got = with_field_tokens(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), fields=("path",)
    ).take_all()
    by = {r["content"].split()[0]: r["content"] for r in got}
    assert by["alpha"] == "alpha beta"
    assert by["gamma"] == "gamma"
    assert by["delta"] == "delta"
    # leading separator must not mint a bare «path» token
    assert by["eps"] == "eps «path»docs «path»a «path»txt"

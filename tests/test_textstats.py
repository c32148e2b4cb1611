"""textstats operator tests vs local pure-Python oracles (the DuckDB
oracles run in the driver gate; these pin semantics independently)."""

import math
from collections import Counter

import pytest

from engine import textstats
from engine.functions import round6_scalar


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def _local_docs(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {
        did: [w.lower() for w in text.split(" ") if w]
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        )
    }


def test_tfidf_top_terms_vs_local(ray_session, sf_dir):
    k = 3
    docs = _local_docs(sf_dir)
    n = len(docs)
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    want = {}
    for did, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((t, c * math.log(n * 1.0 / df[t])) for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        for rank, (t, s) in enumerate(scored, 1):
            want[(did, rank)] = (t, round6_scalar(s))
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf_r"])
        for r in textstats.tfidf_top_terms(sf_dir, k=k).take_all()
    }
    assert got == want


def test_top_ngrams_vs_local(ray_session, sf_dir):
    n, k = 3, 20
    docs = _local_docs(sf_dir)
    cnt = Counter()
    for toks in docs.values():
        for i in range(len(toks) - n + 1):
            cnt[" ".join(toks[i : i + n])] += 1
    want = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[:k]
    got = [
        (r["ngram"], r["cnt"])
        for r in textstats.top_ngrams(sf_dir, n=n, k=k).take_all()
    ]
    assert got == want


def test_facet_counts_vs_python(ray_session, sf_dir):
    """Differential vs a local disjunctive-match counter, plus facet
    column totals: sum over facets == count of matching docs."""
    from collections import Counter

    import pyarrow.parquet as pq

    from engine.textstats import facet_counts

    queries = [(0, "join hash"), (1, "spark"), (2, "zzz_oov")]
    got = {
        (r["query_id"], r["lang"]): r["n_docs"]
        for r in facet_counts(sf_dir, queries, facet="lang").take_all()
    }
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    want: Counter = Counter()
    for text, lang in zip(t.column("text").to_pylist(), t.column("lang").to_pylist()):
        toks = {w.lower() for w in text.split(" ") if w}
        for qid, qtext in queries:
            if toks & {w.lower() for w in qtext.split(" ") if w}:
                want[(qid, lang)] += 1
    assert got == dict(want)
    assert not any(qid == 2 for qid, _ in got)  # OOV query matches nothing


def test_rank_documents_total_order(ray_session, sf_dir):
    """Sorted-head ranks == a local sort of doc lengths; ranks dense."""
    from engine.textstats import doc_lengths, rank_documents

    got = rank_documents(sf_dir, k=25).take_all()
    all_lens = [(r["doc_id"], r["doc_len"]) for r in doc_lengths(sf_dir).take_all()]
    want = sorted(all_lens, key=lambda t: (-t[1], t[0]))[:25]
    assert [r["rank"] for r in got] == list(range(1, 26))
    assert [(r["doc_id"], r["doc_len"]) for r in got] == want


def test_snippets_vs_python(ray_session, sf_dir):
    """Differential vs a local first-match window extractor."""
    import pyarrow.parquet as pq

    from engine.textstats import snippets

    queries = [(0, "spark window"), (1, "zzz_oov")]
    got = {
        (r["query_id"], r["doc_id"]): (r["first_pos"], r["snippet"])
        for r in snippets(sf_dir, queries, window=2).take_all()
    }
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = [w.lower() for w in text.split(" ") if w]
        for qid, qtext in queries:
            terms = {w.lower() for w in qtext.split(" ") if w}
            pos = [i for i, tk in enumerate(toks) if tk in terms]
            if pos:
                fp = pos[0]
                want[(qid, did)] = (
                    fp + 1,
                    " ".join(toks[max(0, fp - 2) : fp + 3]),
                )
    assert got == want
    assert len(got) > 100  # non-vacuous


def test_vocab_ops_join_equals_broadcast(ray_session, sf_dir):
    """The hash-join (vocabulary-unbounded) strategy of each per-doc
    scoring op is bit-identical to the broadcast strategy, and 'auto'
    flips to join when the vocabulary exceeds the bound (VERDICT r02
    task #5)."""
    from engine import textanalysis

    def norm(x):
        lst = x.to_pylist() if not hasattr(x, "take_all") else x.take_all()
        return sorted(tuple(sorted(r.items())) for r in lst)

    for fn in (
        lambda s: textstats.tfidf_top_terms(sf_dir, strategy=s),
        lambda s: textstats.bigram_pmi(sf_dir, strategy=s),
        lambda s: textanalysis.lm_doc_scores(sf_dir, strategy=s),
    ):
        a, b = norm(fn("broadcast")), norm(fn("join"))
        assert a == b and a
    # auto flips onto the join path under a tiny bound (and still
    # produces the same result)
    tiny = norm(textstats.tfidf_top_terms(sf_dir, strategy="auto", vocab_broadcast_max=2))
    assert tiny == norm(textstats.tfidf_top_terms(sf_dir, strategy="broadcast"))
    with pytest.raises(ValueError):
        textstats.tfidf_top_terms(
            sf_dir, strategy="broadcast", vocab_broadcast_max=2
        ).take_all()

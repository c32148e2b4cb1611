"""Conjunctive (AND) and phrase query modes: rank identity vs the
refimpl oracle on the fixture corpus (SURVEY.md Q2 + positional
postings)."""

import pytest

from engine.query import IndexReader, run_queries


def _pairs(rows):
    return [(r["doc_id"], r["score"]) for r in rows]


def _assert_same(got, want, ctx):
    assert [d for d, _ in got] == [d for d, _ in want], ctx
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-9, ctx


def test_conjunctive_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    for q in built_index["queries"]:
        want = ref.topk_and(q["text"], q["k"])
        got = _pairs(rd.search(q["text"], q["k"], match="all"))
        _assert_same(got, want, q["text"])


def test_conjunctive_oov_term_empties(built_index):
    rd = IndexReader(built_index["out"])
    assert rd.search("import zzzznotfound", 10, match="all") == []
    assert built_index["ref"].topk_and("import zzzznotfound", 10) == []


def _signed_queries(queries, rows):
    """Fixture queries with exclusions appended: each query bans a
    token drawn from another query plus one OOV term (no-op ban)."""
    texts = [q["text"] for q in queries]
    out = []
    for i, q in enumerate(queries):
        other = texts[(i + 1) % len(texts)].split()[0]
        out.append((f"{q['text']} -{other}", q["k"]))
        out.append((f"{q['text']} -zzz_oov", q["k"]))
    # ban a term from the query's own positive set (partial overlap)
    first = texts[0].split()
    if len(first) >= 2:
        out.append((f"{texts[0]} -{first[-1]}", 10))
    return out


def test_not_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text, k in _signed_queries(built_index["queries"], built_index["rows"]):
        want = ref.topk_not(text, k)
        got = _pairs(rd.search(text, k, match="not"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 3


def test_not_excludes_banned_docs(built_index):
    """No result doc may contain a banned term."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    q = built_index["queries"][0]["text"]
    ban = built_index["queries"][1]["text"].split()[0]
    res = rd.search(f"{q} -{ban}", 50, match="not")
    banned_docs = {d for d, _ in ref.postings.get(
        ref.analyze_query(ban)[0], ())} if ref.analyze_query(ban) else set()
    assert res  # fixture sanity: query still matches something
    for r in res:
        assert r["doc_id"] not in banned_docs


def _phrase_queries(rows):
    """Real 2-4 token sequences lifted from fixture docs + negatives."""
    out = []
    from engine.analysis import get_analyzer

    az = get_analyzer("code")
    for r in rows[:12]:
        toks = az(r["content"])
        if len(toks) >= 6:
            out.append(" ".join(toks[2:5]))
            out.append(" ".join(toks[0:2]))
    out += ["import zzz", "alpha beta gamma delta epsilon"]
    return out


def test_phrase_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text in _phrase_queries(built_index["rows"]):
        want = ref.topk_phrase(text, 10)
        got = _pairs(rd.search(text, 10, match="phrase"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 5  # fixture sanity: phrases actually match


def test_distributed_match_modes(built_index):
    ref = built_index["ref"]
    queries = built_index["queries"][:8]
    for match, oracle in (("all", ref.topk_and), ("phrase", ref.topk_phrase)):
        res = run_queries(
            built_index["out"], queries, match=match, concurrency=(1, 2)
        ).take_all()
        by_q = {}
        for r in res:
            by_q.setdefault(r["query_id"], []).append(r)
        for q in queries:
            want = oracle(q["text"], q["k"])
            got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
            assert [r["doc_id"] for r in got] == [d for d, _ in want], (match, q["text"])


def test_more_like_this(built_index):
    rd = IndexReader(built_index["out"])
    ref = built_index["ref"]
    some_ids = sorted(ref.doc_meta)[:5]
    for did in some_ids:
        a = rd.more_like_this(did, k=5)
        b = rd.more_like_this(did, k=5)
        assert a == b  # deterministic
        assert all(h["doc_id"] != did for h in a)  # source excluded
        assert len(a) == 5
        assert [h["rank"] for h in a] == [1, 2, 3, 4, 5]
    import pytest as _pytest

    with _pytest.raises(KeyError):
        rd.more_like_this(123456789, k=3)


# -- prefix / fuzzy expansion modes ----------------------------------------

_PREFIX_QUERIES = [
    "pa*",                  # common prefix, many expansions (pasi, pali...)
    "fu* giga",             # expansion + plain term mix
    "import import*",       # expansion overlapping a plain term (dedupe)
    "zzznope*",             # no expansion
    "c*",                   # single-char prefix (wide fan-out)
    "ruco* pobi*",          # two wildcard tokens
]

_FUZZY_QUERIES = [
    "pasa~",                # one substitution from 'pasi'/'pali'-family
    "gigo~ fepa",           # fuzzy + plain
    "falugo~2",             # distance 2
    "giga~ giga",           # fuzzy overlapping its own exact term
    "zzzzzzzz~",            # nothing within distance 1
    "fubi~2 dufu~",         # two fuzzy tokens, mixed distances
]


def test_prefix_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text in _PREFIX_QUERIES:
        want = ref.topk_prefix(text, 10)
        got = _pairs(rd.search(text, 10, match="prefix"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 4  # fixture sanity: prefixes actually expand


def test_fuzzy_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text in _FUZZY_QUERIES:
        want = ref.topk_fuzzy(text, 10)
        got = _pairs(rd.search(text, 10, match="fuzzy"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 4


def test_expansion_syntax_splitters():
    from engine.analysis import split_fuzzy, split_wildcard

    assert split_wildcard("foo* bar baz*") == ("bar", ["foo", "baz"])
    assert split_wildcard("* a*b Foo*") == ("* a*b", ["foo"])  # bare/mid '*' stay plain
    assert split_wildcard("dup* dup*") == ("", ["dup"])
    assert split_fuzzy("foo~ bar") == ("bar", [("foo", 1)])
    assert split_fuzzy("Foo~2 x~1 ~") == ("~", [("foo", 2), ("x", 1)])
    assert split_fuzzy("a~~2 b") == ("a~~2 b", [])  # '~' inside base stays plain


def test_distributed_prefix_fuzzy(built_index):
    """Distributed actor-pool path == single-process path == refimpl."""
    ref = built_index["ref"]
    queries = [
        {"query_id": i, "text": t, "k": 10}
        for i, t in enumerate(_PREFIX_QUERIES[:3])
    ]
    res = run_queries(
        built_index["out"], queries, match="prefix", concurrency=(1, 2)
    ).take_all()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = ref.topk_prefix(q["text"], q["k"])
        got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q["text"]


_REGEX_QUERIES = [
    r"pa.*",                # prefix-shaped pattern
    r"(giga|fepa)",         # alternation
    r"[fd]u.u",             # character classes
    r"zzz.*",               # no match
    r"\d+",                 # digit-only terms
]


def test_regex_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text in _REGEX_QUERIES:
        want = ref.topk_regex(text, 10)
        got = _pairs(rd.search(text, 10, match="regex"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 3


def test_lang_filter_rank_identity(built_index):
    """Metadata-filtered search == refimpl restricted to that lang."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for q in built_index["queries"][:6]:
        for lang in ("py", "go"):
            want = ref.topk_lang(q["text"], q["k"], lang)
            got = _pairs(rd.search(q["text"], q["k"], filter_lang=lang))
            _assert_same(got, want, (q["text"], lang))
            n_nonempty += bool(want)
    assert n_nonempty >= 6
    # every hit really is in the filtered language
    hits = rd.search(built_index["queries"][0]["text"], 10, filter_lang="go")
    langs = {ref.doc_meta[h["doc_id"]]["lang"] for h in hits}
    assert langs <= {"go"}
    # unsupported combination is an explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="filter_lang"):
        rd.search("alpha beta", 5, match="all", filter_lang="py")


def test_tfidf_scorer_rank_identity(built_index):
    """Pluggable classic-TF-IDF scorer == refimpl; distinct ranking
    from BM25 on at least one query (the kernels really differ)."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    differs = 0
    for q in built_index["queries"][:8]:
        want = ref.topk_tfidf(q["text"], q["k"])
        got = _pairs(rd.search(q["text"], q["k"], scorer="tfidf"))
        _assert_same(got, want, q["text"])
        bm = [d for d, _ in ref.topk(q["text"], q["k"])]
        differs += [d for d, _ in want] != bm
    assert differs >= 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scorer"):
        rd.search("alpha", 5, match="all", scorer="tfidf")


def test_collapse_rank_identity(built_index):
    """Field-collapsed search (best doc per repo / lang) == refimpl's
    collapse of the full ranking — validates the partial-collapse
    lemma across 8 segments."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for q in built_index["queries"][:8]:
        for field in ("repo", "lang"):
            want = ref.topk_collapse(q["text"], q["k"], field)
            got = _pairs(rd.search(q["text"], q["k"], collapse=field))
            _assert_same(got, want, (q["text"], field))
            n_nonempty += bool(want)
    assert n_nonempty >= 8
    # no two results share the collapse value
    hits = rd.search(built_index["queries"][0]["text"], 10, collapse="lang")
    langs = [ref.doc_meta[h["doc_id"]]["lang"] for h in hits]
    assert len(langs) == len(set(langs))


def test_collapse_distributed(built_index):
    ref = built_index["ref"]
    queries = built_index["queries"][:5]
    res = run_queries(
        built_index["out"], queries, collapse="repo", concurrency=(1, 2)
    ).take_all()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = ref.topk_collapse(q["text"], q["k"], "repo")
        got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q["text"]
        assert len({r["repo"] for r in got}) == len(got)


def test_near_rank_identity(built_index):
    """Proximity (sloppy unordered) queries == refimpl, several slops."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    # co-occurring fixture terms whose window spans actually vary with
    # slop (verified: 'def import' matches 0 -> 1 -> 47 docs at slop
    # 0 / 2 / 8)
    texts = ["def import", "import pasi", "return class", "pasi giga"]
    for text in texts:
        for slop in (0, 2, 8):
            want = ref.topk_near(text, 10, slop)
            got = _pairs(rd.search(text, 10, match="near", slop=slop))
            _assert_same(got, want, (text, slop))
            n_nonempty += bool(want)
    assert n_nonempty >= 4
    # slop monotonicity: larger slop never loses matches
    t = texts[0]
    a = {d for d, _ in ref.topk_near(t, 100, 0)}
    b = {d for d, _ in ref.topk_near(t, 100, 30)}
    assert a <= b
    # near at huge slop == conjunctive (every co-occurring doc matches)
    got = _pairs(rd.search(t, 10, match="near", slop=10_000))
    want = ref.topk_and(t, 10)
    _assert_same(got, want, (t, "slop=inf"))


_BOOL_QUERIES = [
    "+def import pasi",          # must + two should
    "+pasi +giga falugo",        # two must
    "+def -import pali",         # must + not + should
    "pasi giga -def",            # no must (pure should/not)
    "+zzz_oov pasi",             # OOV must -> empty
    "+def +import -pasi -giga",  # must only, double exclusion
]


def test_bool_rank_identity(built_index):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for text in _BOOL_QUERIES:
        want = ref.topk_bool(text, 10)
        got = _pairs(rd.search(text, 10, match="bool"))
        _assert_same(got, want, text)
        n_nonempty += bool(want)
    assert n_nonempty >= 4
    assert rd.search("+zzz_oov pasi", 10, match="bool") == []
    # must docs really contain the must term; banned really absent
    hits = rd.search("+def -import pali", 30, match="bool")
    for h in hits:
        meta_terms = set()  # reconstruct from refimpl postings
    post_def = {d for d, _ in ref.postings.get("def", ())}
    post_imp = {d for d, _ in ref.postings.get("import", ())}
    for h in hits:
        assert h["doc_id"] in post_def
        assert h["doc_id"] not in post_imp


def test_explain_sums_to_score(built_index):
    """explain() contributions sum (in analyzed order) to the doc's
    reported score, for docs at several ranks."""
    rd = IndexReader(built_index["out"])
    n_checked = 0
    for q in built_index["queries"][:6]:
        hits = rd.search(q["text"], 5)
        for h in hits[:3]:
            rows = rd.explain(q["text"], h["doc_id"])
            total = 0.0
            for r in rows:
                total += r["contrib"]
            assert abs(total - h["score"]) <= 1e-9, (q["text"], h["doc_id"])
            assert all(r["tf"] >= 1 and r["df"] >= 1 for r in rows)
            n_checked += 1
    assert n_checked >= 6
    import pytest as _pytest

    with _pytest.raises(KeyError):
        rd.explain("alpha", 987654321)


def test_near_vectorized_vs_scalar_sweep():
    """Property: the vectorized anchor sweep (_near_matches) agrees
    with the scalar k-pointer reference (_min_span) on random inputs."""
    import random

    import numpy as np

    from engine.wand import _min_span, _near_matches

    rng = random.Random(77)
    for trial in range(200):
        m = rng.randint(1, 4)
        n_docs = rng.randint(1, 12)
        per_term = []
        for _ in range(m):
            docs = []
            for _ in range(n_docs):
                n = rng.randint(1, 6)
                docs.append(np.array(
                    sorted(rng.sample(range(60), n)), dtype=np.int64))
            per_term.append(docs)
        limit = rng.randint(0, 20)
        want = {
            d for d in range(n_docs)
            if _min_span([per_term[t][d] for t in range(m)]) <= limit
        }
        got = set(
            _near_matches(np.arange(n_docs), per_term, limit).tolist()
        )
        assert got == want, (trial, limit)


def test_sort_by_path(built_index):
    """Field-sorted search (ORDER BY repo, path): distributed == the
    refimpl sort of the full match set; output really is ordered."""
    ref = built_index["ref"]
    queries = [
        {"query_id": i, "text": q["text"], "k": 10}
        for i, q in enumerate(built_index["queries"][:5])
    ]
    res = run_queries(
        built_index["out"], queries, sort_by_path=True, concurrency=(1, 2)
    ).take_all()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    n_nonempty = 0
    for q in queries:
        want = ref.topk_bypath(q["text"], q["k"])
        got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q["text"]
        for g, (_, ws) in zip(got, want):
            assert abs(g["score"] - ws) <= 1e-9
        keys = [(r["repo"], r["path"]) for r in got]
        assert keys == sorted(keys)
        n_nonempty += bool(got)
    assert n_nonempty >= 4


def test_msm_rank_identity(built_index):
    """minimum_should_match: engine ≡ refimpl for every m from 1 to
    |terms|+1 (the last is empty unless a doc holds every term)."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    n_nonempty = 0
    for q in built_index["queries"]:
        nterms = len(set(ref.analyze_query(q["text"])))
        for m in range(1, nterms + 2):
            want = ref.topk_msm(q["text"], q["k"], m=m)
            got = _pairs(rd.search(q["text"], q["k"], match="msm", msm=m))
            _assert_same(got, want, (q["text"], m))
            n_nonempty += bool(want)
    assert n_nonempty >= 3


def test_msm_degenerate_bounds(built_index):
    """m<=1 equals plain disjunctive; m=|terms| equals the conjunctive
    candidate set (scores are the same disjunctive sums)."""
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    for q in built_index["queries"]:
        any_hits = _pairs(rd.search(q["text"], q["k"], match="any",
                                    mode="exhaustive"))
        msm1 = _pairs(rd.search(q["text"], q["k"], match="msm", msm=1))
        assert msm1 == any_hits, q["text"]
        nterms = len(set(ref.analyze_query(q["text"])))
        msm_all = _pairs(rd.search(q["text"], q["k"], match="msm",
                                   msm=nterms))
        all_ids = {d for d, _ in ref.topk_and(q["text"], q["k"] * 100)}
        assert {d for d, _ in msm_all} <= all_ids or not all_ids, q["text"]


def test_msm_distributed_equals_local(built_index):
    qs = [{"query_id": i, "text": q["text"], "k": q["k"]}
          for i, q in enumerate(built_index["queries"])]
    res = run_queries(built_index["out"], qs, match="msm", msm=2,
                      concurrency=(1, 2)).take_all()
    rd = IndexReader(built_index["out"])
    by_q: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for i, q in enumerate(built_index["queries"]):
        want = _pairs(rd.search(q["text"], q["k"], match="msm", msm=2))
        assert by_q.get(i, []) == want, q["text"]


def test_msm_unsupported_combinations_raise(built_index):
    from engine.query import SegmentScorer

    rd = IndexReader(built_index["out"])
    with pytest.raises(ValueError, match="msm"):
        rd.search("import", 5, match="msm", collapse="repo")
    with pytest.raises(ValueError, match="msm"):
        SegmentScorer(built_index["out"], match="msm", collapse="repo")
    with pytest.raises(ValueError, match="msm"):
        SegmentScorer(built_index["out"], match="msm", sort_by_path=True)

"""Spell-suggestion tests: SymSpell candidate completeness vs a
brute-force Levenshtein scan of the vocabulary."""

import pytest

from engine.spell import _deletes, _lev, spell_suggest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def _brute_best(vocab_cf, q, cap):
    cands = []
    for term, cf in vocab_cf.items():
        d = _lev(q, term, cap)
        if d <= cap:
            cands.append((d, -cf, term))
    if not cands:
        return None
    d, negcf, term = min(cands)
    return (term, d, -negcf)


def test_lev_basics():
    assert _lev("abc", "abc", 2) == 0
    assert _lev("abc", "abd", 2) == 1
    assert _lev("abc", "acb", 2) == 2  # plain Levenshtein, no transposition
    assert _lev("kitten", "sitting", 3) == 3
    assert _lev("a", "abcdef", 2) == 3  # capped: returns cap+1


def test_deletes_invariant():
    # lev(a,b)<=2 => deletes<=2(a) and deletes<=2(b) intersect
    words = ["table", "tabel", "tble", "tables", "cable", "marble"]
    for a in words:
        for b in words:
            if _lev(a, b, 2) <= 2:
                assert _deletes(a, 2) & _deletes(b, 2), (a, b)


def test_spell_suggest_vs_brute(ray_session, sf_dir):
    import duckdb

    con = duckdb.connect()
    vocab_cf = dict(
        con.execute(
            f"""SELECT term, count(*) FROM (
                  SELECT lower(unnest(string_split(text, ' '))) AS term
                  FROM read_parquet('{sf_dir}/documents.parquet'))
                WHERE term <> '' GROUP BY term"""
        ).fetchall()
    )
    qs = ["tabel", "jion", "qury", "streem", "windoow", "hash", "zzzzzz",
          "vlaue", "sparc", "ky"]
    got = {
        r["qterm"]: (r["suggestion"], r["distance"], r["cf"])
        for r in spell_suggest(sf_dir, qs, max_dist=2).take_all()
    }
    for q in qs:
        want = _brute_best(vocab_cf, q, 2)
        if want is None:
            assert q not in got
        else:
            assert got[q] == want, q
    assert got["hash"][1] == 0          # in-vocab term suggests itself
    assert "zzzzzz" not in got          # nothing within distance 2


def test_suggest_terms_vs_brute(ray_session, sf_dir):
    import duckdb

    from engine.spell import suggest_terms

    vocab_cf = dict(
        duckdb.sql(
            f"""SELECT term, count(*) FROM (
                  SELECT lower(unnest(string_split(text, ' '))) AS term
                  FROM read_parquet('{sf_dir}/documents.parquet'))
                WHERE term <> '' GROUP BY term"""
        ).fetchall()
    )
    prefixes = ["cu", "s", "zzz", "", "m"]
    got = suggest_terms(sf_dir, prefixes, k=3).to_pylist()
    for p in prefixes:
        want = sorted(
            ((t, c) for t, c in vocab_cf.items() if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        mine = [(r["term"], r["cf"]) for r in got if r["prefix"] == p]
        assert mine == want, p
        ranks = [r["rank"] for r in got if r["prefix"] == p]
        assert ranks == list(range(1, len(want) + 1))

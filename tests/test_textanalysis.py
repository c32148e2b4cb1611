"""Text-analysis operator tests vs local/DuckDB oracles."""

import hashlib

import pytest

from engine import textanalysis


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_token_counts_vs_duckdb(ray_session, sf_dir):
    import duckdb

    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_re_tokens"])
           for r in textanalysis.token_counts(sf_dir).take_all()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id,
              len(list_filter(string_split(text, ' '), x -> x <> '')),
              len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n]'))
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchall()
    for did, ws, re_n in rows:
        assert got[did][0] == ws, did
        assert got[did][1] == re_n, did


def test_quality_scores_basics(ray_session, sf_dir):
    rows = textanalysis.quality_scores(sf_dir).take_all()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r["n_distinct"] <= r["n_tokens"]
        assert 0.0 <= r["distinct_ratio_r"] <= 1.0
        assert r["n_chars"] > 0


def test_language_id_deterministic_schema(ray_session, sf_dir):
    rows = sorted(textanalysis.language_id(sf_dir).take_all(), key=lambda r: r["doc_id"])
    rows2 = sorted(textanalysis.language_id(sf_dir).take_all(), key=lambda r: r["doc_id"])
    assert rows == rows2  # deterministic
    assert {r["pred_lang"] for r in rows} <= {"en", "es", "de", "fr", "zh"}


def test_fingerprints_md5_and_winnow(ray_session, sf_dir):
    import pyarrow.parquet as pq

    got = {r["doc_id"]: (r["md5"], r["winnow64"])
           for r in textanalysis.fingerprints(sf_dir).take_all()}
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    by_text: dict[str, list[int]] = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        assert got[did][0] == hashlib.md5(text.encode()).hexdigest()
        by_text.setdefault(text, []).append(did)
    # identical texts -> identical winnow fingerprints
    for ids in by_text.values():
        if len(ids) > 1:
            assert len({got[d][1] for d in ids}) == 1


def test_lm_doc_scores_vs_python(ray_session, sf_dir):
    """Differential vs a pure-python unigram-LM implementation using
    the same quantize-log-probs-to-micros scheme."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    got = {
        r["doc_id"]: (r["doc_len"], r["lm_sum_micro"], r["lm_mean_r"])
        for r in textanalysis.lm_doc_scores(sf_dir).take_all()
    }
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        did: [w.lower() for w in text.split(" ") if w]
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        )
    }
    cf = Counter(tok for toks in docs.values() for tok in toks)
    total = sum(cf.values())

    def micro(x):
        return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))

    lp = {term: micro(math.log(c / total)) for term, c in cf.items()}
    for did, toks in docs.items():
        if not toks:
            assert did not in got
            continue
        s = sum(lp[tok] for tok in toks)
        dl, sm, mean_r = got[did]
        assert dl == len(toks)
        assert sm == s
        want_mean = s / 1e6 / len(toks)
        assert abs(mean_r - want_mean) < 1.5e-6
    assert len(got) == sum(1 for toks in docs.values() if toks)


def test_repetition_scores_vs_python(ray_session, sf_dir):
    """Differential vs a pure-python bigram counter."""
    from collections import Counter

    import pyarrow.parquet as pq

    got = {
        r["doc_id"]: (r["top2gram_frac"], r["dup_gram_frac"])
        for r in textanalysis.repetition_scores(sf_dir).take_all()
    }
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    nonzero_dup = 0
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = [w.lower() for w in text.split(" ") if w]
        grams = Counter(zip(toks, toks[1:]))
        if not grams:
            assert got[did] == (0.0, 0.0)
            continue
        tot = sum(grams.values())
        top, dup = got[did]
        assert abs(top - max(grams.values()) / tot) < 1.5e-6, did
        assert abs(dup - (1.0 - len(grams) / tot)) < 1.5e-6, did
        nonzero_dup += dup > 0
    assert nonzero_dup > 100  # non-vacuous on this corpus


def test_scrub_pii_masks_and_counts(ray_session):
    import pyarrow as pa

    import ray.data

    from engine.textanalysis import scrub_pii

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "see http://a.b/x?u=1 and bob@x.co or 10.2.3.4 end",
            "url https://z.z/a@b.cd tail plus a.b-c%d@ex.org",
            "nothing sensitive here",
        ]),
    }))
    got = {r["doc_id"]: r for r in scrub_pii("", docs=docs).take_all()}
    assert got[1]["clean"] == "see <URL> and <EMAIL> or <IP> end"
    assert (got[1]["n_url"], got[1]["n_email"], got[1]["n_ip"]) == (1, 1, 1)
    # an email inside a URL is masked AS the URL, never double-counted
    assert got[2]["clean"] == "url <URL> tail plus <EMAIL>"
    assert (got[2]["n_url"], got[2]["n_email"], got[2]["n_ip"]) == (1, 1, 0)
    assert got[3]["clean"] == "nothing sensitive here"
    assert (got[3]["n_url"], got[3]["n_email"], got[3]["n_ip"]) == (0, 0, 0)

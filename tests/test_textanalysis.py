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

"""M7 invariant-checker operator (engine/verify.py) + M6 lang filter."""

import pyarrow as pa

import ray.data

from engine.verify import verify_index


def test_verify_index_ok(built_index):
    corpus = ray.data.from_arrow(pa.Table.from_pylist(built_index["rows"]))
    res = verify_index(built_index["out"], corpus)
    assert res["ok"], res
    assert res["matched"] == built_index["ref"].num_docs
    assert res["mismatched"] == 0 and res["missing_in_index"] == 0


def test_verify_index_detects_tamper(built_index, tmp_path):
    """Corrupting one source row must be caught as a mismatch."""
    rows = [dict(r) for r in built_index["rows"]]
    rows[3]["content"] = rows[3]["content"] + " TAMPERED"
    corpus = ray.data.from_arrow(pa.Table.from_pylist(rows))
    res = verify_index(built_index["out"], corpus)
    assert not res["ok"]
    assert res["mismatched"] >= 1


def test_lang_filter_pushdown(ray_session):
    from engine.corpus import read_corpus_from_documents

    sf = "/root/testdata/sf0.01"
    all_rows = read_corpus_from_documents(sf).count()
    en = read_corpus_from_documents(sf, langs=["en"])
    rows = en.take_all()
    assert 0 < len(rows) < all_rows
    assert {r["lang"] for r in rows} == {"en"}

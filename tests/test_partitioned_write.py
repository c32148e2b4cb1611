"""Partitioned-parquet sink: hive layout on disk + round-trip counts."""

import os

import duckdb

from engine import corpus

SF = "/root/testdata/sf0.01"


def test_write_partitioned_layout_and_counts(ray_session, tmp_path):
    out = str(tmp_path / "part")
    got = {
        r["lang"]: r["n_docs"]
        for r in corpus.write_partitioned(SF, out, by="lang").take_all()
    }
    want = dict(
        duckdb.connect()
        .execute(
            f"SELECT lang, count(*) FROM read_parquet('{SF}/documents.parquet') "
            "GROUP BY lang"
        )
        .fetchall()
    )
    assert got == want
    # hive layout: one directory per language, each holding parquet files
    for lang in want:
        d = os.path.join(out, f"lang={lang}")
        assert os.path.isdir(d), d
        assert any(f.endswith(".parquet") for f in os.listdir(d)), d
    # a re-run recreates from scratch (no double counting)
    again = {
        r["lang"]: r["n_docs"]
        for r in corpus.write_partitioned(SF, out, by="lang").take_all()
    }
    assert again == want

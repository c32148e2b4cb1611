"""Sketch / sampling / quantile operators vs exact oracles."""

import duckdb
import pytest

from engine import sketches

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    return c


def test_hll_within_error(ray_session, con):
    exact = con.execute(
        "SELECT count(DISTINCT t) FROM (SELECT lower(unnest(string_split(text,' '))) "
        "AS t FROM documents) WHERE t <> ''"
    ).fetchone()[0]
    est = sketches.hll_distinct_terms(SF).column("estimate")[0].as_py()
    # 2^12 registers -> ~1.6% std error; allow 10%
    assert abs(est - exact) <= max(2, 0.1 * exact)


def test_cms_heavy_hitters_match_exact(ray_session, con):
    got = sketches.cms_heavy_hitters(SF, k=5)
    exact = con.execute(
        "SELECT t, count(*) c FROM (SELECT lower(unnest(string_split(text,' '))) AS t "
        "FROM documents) WHERE t <> '' GROUP BY t ORDER BY c DESC, t LIMIT 5"
    ).fetchall()
    pairs = list(zip(got.column("term").to_pylist(), got.column("est_count").to_pylist()))
    # CMS never undercounts; with this tiny vocab there are no
    # collisions, so estimates equal truth exactly
    assert pairs == [(t, c) for t, c in exact]


def test_bottomk_deterministic_and_oracle(ray_session, con):
    a = [r["doc_id"] for r in sketches.bottomk_sample(SF, 10).take_all()]
    b = [r["doc_id"] for r in sketches.bottomk_sample(SF, 10).take_all()]
    assert a == b  # partition/order independent
    orc = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "LIMIT 10"
    ).fetchall()]
    assert a == orc


def test_exact_quantiles_match_duckdb(ray_session, con):
    got = sketches.exact_quantiles_cents(SF)
    want = con.execute(
        "SELECT quantile_disc(CAST(round(l_extendedprice*100.0) AS BIGINT), "
        "[0.25,0.5,0.75,0.9,0.99]) FROM lineitem"
    ).fetchone()[0]
    assert got.column("cents").to_pylist() == want


def test_stratified_sample_deterministic_and_oracle(ray_session, con):
    got = sorted(
        (r["stratum"], r["rank"], r["doc_id"])
        for r in sketches.stratified_sample(SF, by="lang", k=5).take_all()
    )
    again = sorted(
        (r["stratum"], r["rank"], r["doc_id"])
        for r in sketches.stratified_sample(SF, by="lang", k=5).take_all()
    )
    assert got == again  # partition/order independent
    orc = sorted(
        tuple(r)
        for r in con.execute(
            "WITH r AS (SELECT lang AS stratum, doc_id, row_number() OVER ("
            "PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank "
            "FROM documents) SELECT stratum, rank, doc_id FROM r WHERE rank <= 5"
        ).fetchall()
    )
    assert got == orc


def test_hll_recall_bounds_oracle(ray_session, con):
    """hll_recall emits the exact distributed distinct count plus a
    within-4-sigma flag; both must match the SQL recomputation."""
    t = sketches.hll_recall(SF)
    exact = con.execute(
        "SELECT count(DISTINCT t) FROM (SELECT lower(unnest(string_split(text,' '))) "
        "AS t FROM documents) WHERE t <> ''"
    ).fetchone()[0]
    assert t.column("exact_distinct")[0].as_py() == exact
    assert t.column("precision")[0].as_py() == 12
    assert t.column("within_bound")[0].as_py() == 1

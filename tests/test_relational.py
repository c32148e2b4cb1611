"""Relational operator tests (as-of join vs a DuckDB window oracle;
the broadcast join and grouped top-k are driver-oracle-checked)."""


def test_asof_join_matches_duckdb(ray_session):
    import duckdb

    from engine.relational import asof_join_events

    sf = "/root/testdata/sf0.001"
    got = {
        r["left_id"]: (r["right_id"], r["right_ts_us"], r["lag_us"])
        for r in asof_join_events(sf, "purchase", "click").take_all()
    }
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(f"""
WITH e AS (SELECT * FROM read_parquet('{sf}/events.parquet')),
l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM e WHERE event_type='purchase'),
r AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM e WHERE event_type='click'),
j AS (
  SELECT l.event_id AS lid, r.event_id AS rid, r.t AS rt, l.t - r.t AS lag,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.t DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND r.t <= l.t
)
SELECT lid, rid, rt, lag FROM j WHERE rn = 1
""").fetchall()
    }
    assert got == want
    assert len(got) > 0
    # inner semantics: purchases with no prior click are absent
    n_purchases = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet') "
        "WHERE event_type='purchase'"
    ).fetchone()[0]
    assert len(got) <= n_purchases
    for rid, rts, lag in got.values():
        assert lag >= 0


def test_asof_join_empty_side(ray_session):
    from engine.relational import asof_join_events

    sf = "/root/testdata/sf0.001"
    assert asof_join_events(sf, "purchase", "zzz_no_such_type").count() == 0


def test_json_field_stats_vs_duckdb(ray_session):
    import duckdb

    from engine.relational import json_field_stats

    sf = "/root/testdata/sf0.01"
    got = sorted(
        (r["event_type"], r["n"], r["sum_k"], r["avg_k_r"])
        for r in json_field_stats(sf, field="k").take_all()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(
            f"""SELECT event_type, count(*),
                  sum(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                        / count(*), 6)
                FROM read_parquet('{sf}/events.parquet')
                WHERE json_extract_string(props, '$.k') IS NOT NULL
                GROUP BY event_type"""
        )
        .fetchall()
    )
    assert got == want

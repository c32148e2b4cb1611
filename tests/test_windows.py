"""Windowed-aggregate operators vs DuckDB oracles (events table)."""

import duckdb
import pytest

from engine import windows

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def test_tumbling_vs_duckdb(ray_session, con):
    got = {
        (r["window_start_us"], r["event_type"]): (r["cnt"], r["sum_value_cents"])
        for r in windows.tumbling_window_agg(SF, 60).take_all()
    }
    rows = con.execute(
        "SELECT (epoch_us(ts) // 3600000000) * 3600000000, event_type, count(*), "
        "CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT) "
        "FROM events GROUP BY 1, 2"
    ).fetchall()
    want = {(w, t): (c, s) for w, t, c, s in rows}
    assert got == want


def test_sliding_vs_duckdb(ray_session, con):
    got = {
        r["window_start_us"]: (r["cnt"], r["mean_value_r"])
        for r in windows.sliding_window_agg(SF, 60, 30).take_all()
    }
    rows = con.execute(
        """WITH ex AS (
             SELECT (epoch_us(ts) // 1800000000) * 1800000000 - s.i * 1800000000 AS ws,
                    epoch_us(ts) AS t, CAST(round(value*100.0) AS BIGINT) AS cents
             FROM events, range(2) s(i))
           SELECT ws, count(*), round(sum(cents) / 100.0 / count(*), 6)
           FROM ex WHERE ws > t - 3600000000 GROUP BY ws"""
    ).fetchall()
    want = {w: (c, m) for w, c, m in rows}
    assert set(got) == set(want)
    for w in got:
        assert got[w][0] == want[w][0]
        assert abs(got[w][1] - want[w][1]) < 1e-9, w
    # every event lands in exactly window_minutes/slide_minutes windows
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert sum(c for c, _ in got.values()) == 2 * n_events


def test_sessionize_vs_duckdb(ray_session, con):
    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"], r["duration_us"])
        for r in windows.sessionize(SF, 30).take_all()
    )
    rows = con.execute(
        """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
           m AS (SELECT user_id, t,
                 CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS brk
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
           s AS (SELECT user_id, t, sum(brk) OVER (PARTITION BY user_id ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS sid FROM m)
           SELECT user_id, min(t), count(*), max(t) - min(t)
           FROM s GROUP BY user_id, sid"""
    ).fetchall()
    assert got == sorted(rows)

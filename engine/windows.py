"""Windowed aggregates over the ``events`` table (event_id, ts,
user_id, event_type, value, props) — batch-mode temporal operators.

These are BATCH window aggregates (no streaming/watermark semantics —
the spec has none, SURVEY.md §2.11): each event is assigned to its
window bucket(s) inside ``map_batches`` (vectorized timestamp
arithmetic), partial per-batch aggregates are combined first, and one
small groupby over (bucket[, key]) partials finishes the job — the
shuffle moves per-bucket partials, never events.

Oracles: DuckDB ``time_bucket`` (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .functions import round6

US_PER_MIN = 60_000_000


def _read_events(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_window_agg(sf_dir: str, window_minutes: int = 60) -> "ray.data.Dataset":
    """Per (window_start, event_type): count + sum(value) (cents).

    Tumbling windows: bucket = floor(ts / w).  Per-batch combiner emits
    one partial row per (bucket, type) pair, so the groupby exchange is
    tiny regardless of event volume.
    """
    w_us = window_minutes * US_PER_MIN

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        etype = batch.column("event_type")
        val = batch.column("value").to_numpy()
        bucket = (ts // w_us) * w_us
        denc = pc.dictionary_encode(
            etype.combine_chunks() if etype.num_chunks != 1 else etype.chunk(0)
        )
        codes = denc.indices.to_numpy().astype(np.int64)
        ntypes = len(denc.dictionary)
        # combined key: bucket index x type code
        ubuckets, binv = np.unique(bucket, return_inverse=True)
        key = binv * ntypes + codes
        ukey, kinv = np.unique(key, return_inverse=True)
        cnt = np.bincount(kinv)
        cents = np.round(val * 100.0).astype(np.int64)
        vsum = np.bincount(kinv, weights=cents).astype(np.int64)
        return pa.table(
            {
                "window_start_us": pa.array(ubuckets[ukey // ntypes], pa.int64()),
                "event_type": denc.dictionary.take(pa.array(ukey % ntypes, pa.int64())),
                "cnt": pa.array(cnt, pa.int64()),
                "sum_value_cents": pa.array(vsum, pa.int64()),
            }
        )

    return (
        _read_events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(
            ray.data.aggregate.Sum("cnt", alias_name="cnt"),
            ray.data.aggregate.Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )


def sliding_window_agg(
    sf_dir: str, window_minutes: int = 60, slide_minutes: int = 30
) -> "ray.data.Dataset":
    """Per sliding window (width w, step s): count + mean(value).

    Each event belongs to ``w/s`` windows; the per-batch combiner
    replicates events into their windows VECTORIZED (one np.repeat) and
    pre-aggregates, so the exchange still moves only partials.
    """
    w_us = window_minutes * US_PER_MIN
    s_us = slide_minutes * US_PER_MIN
    n_win = (w_us + s_us - 1) // s_us

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        val = batch.column("value").to_numpy()
        # windows containing ts: starts in (ts - w, ts], aligned to s
        last_start = (ts // s_us) * s_us
        starts = last_start[:, None] - (np.arange(n_win, dtype=np.int64) * s_us)[None, :]
        valid = starts > (ts[:, None] - w_us)
        flat_starts = starts[valid]
        cents = np.round(val * 100.0).astype(np.int64)
        flat_cents = np.repeat(cents, valid.sum(axis=1))
        ustart, sinv = np.unique(flat_starts, return_inverse=True)
        cnt = np.bincount(sinv)
        vsum = np.bincount(sinv, weights=flat_cents).astype(np.int64)
        return pa.table(
            {
                "window_start_us": pa.array(ustart, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "vsum_cents": pa.array(vsum, pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy().astype(np.float64)
        vsum = batch.column("vsum_cents").to_numpy().astype(np.float64)
        # exact int cents both engines -> identical mean after round6
        mean = round6(np.divide(vsum / 100.0, cnt, out=np.zeros_like(vsum), where=cnt > 0))
        return pa.table(
            {
                "window_start_us": batch.column("window_start_us"),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "mean_value_r": pa.array(mean, pa.float64()),
            }
        )

    return (
        _read_events(sf_dir, ["ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            ray.data.aggregate.Sum("cnt", alias_name="cnt"),
            ray.data.aggregate.Sum("vsum_cents", alias_name="vsum_cents"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user: events closer than ``gap`` belong to
    one session.  groupby(user).map_groups sorts each user's events and
    splits on gaps — the canonical keyed-window shape (the per-user
    event stream must fit a worker; true for any realistic fan-out).
    Output: (user_id, session_start_us, n_events, duration_us).
    """
    gap_us = gap_minutes * US_PER_MIN

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").cast(pa.int64()).to_numpy())
        uid = group.column("user_id")[0].as_py()
        breaks = np.nonzero(np.diff(ts) > gap_us)[0] + 1
        bounds = np.concatenate(([0], breaks, [len(ts)]))
        rows = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            rows.append(
                {
                    "user_id": uid,
                    "session_start_us": int(ts[lo]),
                    "n_events": hi - lo,
                    "duration_us": int(ts[hi - 1] - ts[lo]),
                }
            )
        return pa.Table.from_pylist(rows)

    return (
        _read_events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )

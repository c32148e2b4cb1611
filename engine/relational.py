"""Generic relational operators used as building blocks by the engine
and exposed for pipeline users: broadcast hash join (small side via
``ray.put``, no shuffle), per-group top-k (combiner-first), and an
AS-OF join (an operator Ray Data lacks, composed from groupby +
vectorized in-group merge).

These exercise the exact patterns the index pipeline relies on (J2
broadcast metadata lookup, K3 grouped top-k merge) over the TPC-H-ish
driver tables, where DuckDB can oracle-check them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data


def broadcast_join_supplier_nation_region(sf_dir: str) -> "ray.data.Dataset":
    """supplier ⋈ nation ⋈ region with BOTH small sides broadcast.

    nation (25 rows) and region (5 rows) are composed into one lookup
    dict, ray.put once, and read inside every map task — zero shuffle;
    the big side streams.  Output: (s_suppkey, s_name, n_name, r_name).
    """
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    r_name = dict(
        zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist())
    )
    lookup = {
        int(nk): (nn, r_name[int(rk)])
        for nk, nn, rk in zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
            nation.column("n_regionkey").to_pylist(),
        )
    }
    ref = ray.put(lookup)

    def join(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        nk = batch.column("s_nationkey").to_pylist()
        names = [lk[int(k)] for k in nk]
        return pa.table(
            {
                "s_suppkey": batch.column("s_suppkey"),
                "s_name": batch.column("s_name"),
                "n_name": pa.array([n for n, _ in names], pa.string()),
                "r_name": pa.array([r for _, r in names], pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).map_batches(join, batch_format="pyarrow")


def asof_join_events(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
) -> "ray.data.Dataset":
    """AS-OF join over the events table: each ``left_type`` event is
    matched to the LATEST ``right_type`` event of the same user with
    ts <= its own (inner: lefts with no prior right are dropped).

    Ray Data has no as-of join; this composes one per SURVEY §2's
    custom-operator recipe (a): a pushed-down type filter at the read,
    one groupby(user_id) exchange, and a vectorized in-group
    sorted-merge (np.searchsorted side='right' — rows sorted by
    (ts, event_id), so equal timestamps resolve to the largest
    event_id, a total order both engines agree on).

    PARTITIONING ASSUMPTION: one user's events fit in one group task's
    memory.  At 100 TB event scale, salt the key with coarse time
    buckets ((user_id, epoch_day)) and post-patch bucket boundaries
    with a second pass over each bucket's first left row.

    Output: (left_id, user_id, left_ts_us, right_id, right_ts_us,
    lag_us), all int64.  Oracle: DuckDB window/ASOF equivalent.
    """
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin([left_type, right_type]),
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "t": pa.array(ts, pa.int64()),
                "event_id": batch.column("event_id"),
                "is_left": pc.equal(batch.column("event_type"), left_type),
            }
        )

    def asof_merge(group: pa.Table) -> pa.Table:
        t = group.column("t").to_numpy()
        eid = group.column("event_id").to_numpy()
        is_left = group.column("is_left").to_numpy(zero_copy_only=False)
        uid = int(group.column("user_id")[0].as_py())
        lt, lid = t[is_left], eid[is_left]
        rt, rid = t[~is_left], eid[~is_left]
        empty = pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "left_ts_us": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "right_ts_us": pa.array([], pa.int64()),
                "lag_us": pa.array([], pa.int64()),
            }
        )
        if len(lt) == 0 or len(rt) == 0:
            return empty
        r_order = np.lexsort((rid, rt))
        rt, rid = rt[r_order], rid[r_order]
        idx = np.searchsorted(rt, lt, side="right") - 1
        keep = idx >= 0
        if not keep.any():
            return empty
        li, ri = lid[keep], idx[keep]
        return pa.table(
            {
                "left_id": pa.array(li, pa.int64()),
                "user_id": pa.array(np.full(len(li), uid), pa.int64()),
                "left_ts_us": pa.array(lt[keep], pa.int64()),
                "right_id": pa.array(rid[ri], pa.int64()),
                "right_ts_us": pa.array(rt[ri], pa.int64()),
                "lag_us": pa.array(lt[keep] - rt[ri], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(asof_merge, batch_format="pyarrow")
    )


def range_join_orders(sf_dir: str) -> "ray.data.Dataset":
    """BROADCAST RANGE JOIN: each order matched to the price band whose
    [lo_cents, hi_cents) interval contains it.

    The band table (exponentially widening intervals — deliberately
    non-uniform so this is a real range join, not arithmetic) is tiny:
    broadcast once, each batch binary-searches the sorted lower bounds
    (np.searchsorted) — zero shuffle, the big side streams.  This is
    custom-operator recipe (a) for the "range join" family: Ray Data
    has no interval join; small-side broadcast + vectorized
    searchsorted is the scale shape (a shuffle-based interval join is
    only needed when BOTH sides are large).

    Output: (o_orderkey, price_cents, band_id, band_lo_cents).
    Orders above the last band are dropped (inner semantics).
    """
    bands = price_bands()
    los = np.array([lo for lo, _ in bands], dtype=np.int64)
    his = np.array([hi for _, hi in bands], dtype=np.int64)
    ref = ray.put((los, his))

    def join(batch: pa.Table) -> pa.Table:
        lo_arr, hi_arr = ray.get(ref)
        okey = batch.column("o_orderkey").to_numpy()
        cents = np.round(batch.column("o_totalprice").to_numpy() * 100.0).astype(
            np.int64
        )
        idx = np.searchsorted(lo_arr, cents, side="right") - 1
        keep = (idx >= 0) & (cents < hi_arr[np.clip(idx, 0, len(hi_arr) - 1)])
        idx = idx[keep]
        return pa.table(
            {
                "o_orderkey": pa.array(okey[keep], pa.int64()),
                "price_cents": pa.array(cents[keep], pa.int64()),
                "band_id": pa.array(idx, pa.int64()),
                "band_lo_cents": pa.array(lo_arr[idx], pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(join, batch_format="pyarrow")


def price_bands() -> list[tuple[int, int]]:
    """Deterministic exponentially-widening price bands (cents):
    [0, 1e6), [1e6, 3e6), [3e6, 7e6), [7e6, 15e6), [15e6, 31e6), ..."""
    out, lo, width = [], 0, 1_000_000
    for _ in range(8):
        out.append((lo, lo + width))
        lo += width
        width *= 2
    return out


def distinct_users_per_event_type(sf_dir: str) -> "ray.data.Dataset":
    """Grouped EXACT distinct count: per event_type, the number of
    distinct users.  Combiner-first: each batch emits its distinct
    (event_type, user_id) pairs (vectorized unique), the groupby
    dedupes pair partials, and a final per-group count runs over
    pair rows — the shuffle moves distinct pairs, never raw events.
    Output: (event_type, n_users)."""

    def pair_partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy()
        order = np.lexsort((uid, et))
        et, uid = et[order], uid[order]
        keep = np.ones(len(et), dtype=bool)
        keep[1:] = (et[1:] != et[:-1]) | (uid[1:] != uid[:-1])
        return pa.table(
            {
                "event_type": pa.array(et[keep], pa.string()),
                "user_id": pa.array(uid[keep], pa.int64()),
            }
        )

    def count_group(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        return pa.table(
            {
                "event_type": pa.array(
                    [group.column("event_type")[0].as_py()], pa.string()
                ),
                "n_users": pa.array([len(np.unique(uid))], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        .map_batches(pair_partials, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(count_group, batch_format="pyarrow")
    )


def customers_without_orders(
    sf_dir: str, min_totalprice: float = 400000.0
) -> "ray.data.Dataset":
    """BROADCAST ANTI JOIN: customers having no order above
    ``min_totalprice`` (the predicate pushes into the orders scan).

    The distinct o_custkey set is reduced distributed (combiner-first
    unique per batch -> groupby), then broadcast as a sorted array;
    the customer side streams through a vectorized not-isin filter.
    At scale with a large right side, flip to a partitioned
    left_outer ds.join + null filter.  Output: (c_custkey, c_name)."""
    import pyarrow.dataset as pads

    keys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pads.field("o_totalprice") > min_totalprice,
        )
        .map_batches(
            lambda b: pa.table(
                {"o_custkey": pa.array(np.unique(b.column("o_custkey").to_numpy()))}
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
        .take_all()
    )
    have = np.sort(np.array([r["o_custkey"] for r in keys], dtype=np.int64))
    ref = ray.put(have)

    def anti(batch: pa.Table) -> pa.Table:
        h = ray.get(ref)
        ck = batch.column("c_custkey").to_numpy()
        if len(h) == 0:
            return batch
        pos = np.searchsorted(h, ck)
        found = (pos < len(h)) & (h[np.clip(pos, 0, len(h) - 1)] == ck)
        return batch.filter(pa.array(~found))

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(anti, batch_format="pyarrow")


def top_orders_per_customer(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per customer: its k most expensive orders, ranked.

    Combiner-first per-group top-k: each batch keeps at most k rows per
    customer (vectorized lexsort + head-of-group mask), THEN the
    groupby merges the small partials — the shuffle moves ≤ k rows per
    (batch, customer), never all orders.
    Output: (o_custkey, rank, o_orderkey, price_cents).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        price = batch.column("o_totalprice").to_numpy()
        cents = np.round(price * 100.0).astype(np.int64)
        order = np.lexsort((okey, -cents, cust))
        c_sorted = cust[order]
        newgrp = np.ones(len(order), dtype=bool)
        newgrp[1:] = c_sorted[1:] != c_sorted[:-1]
        grp_start = np.repeat(
            np.nonzero(newgrp)[0], np.diff(np.append(np.nonzero(newgrp)[0], len(order)))
        )
        within = np.arange(len(order)) - grp_start
        keep = order[within < k]
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep], pa.int64()),
                "o_orderkey": pa.array(okey[keep], pa.int64()),
                "price_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        okey = group.column("o_orderkey").to_numpy()
        cents = group.column("price_cents").to_numpy()
        order = np.lexsort((okey, -cents))[:k]
        n = len(order)
        return pa.table(
            {
                "o_custkey": group.column("o_custkey").take(pa.array(order, pa.int64())),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
                "o_orderkey": pa.array(okey[order], pa.int64()),
                "price_cents": pa.array(cents[order], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderkey", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(merge, batch_format="pyarrow")
    )


def json_field_stats(sf_dir: str, field: str = "k") -> "ray.data.Dataset":
    """Parse the events ``props`` JSON column and roll up the integer
    ``field`` per event_type: (event_type, n, sum_k, avg_k_r).

    Extraction is VECTORIZED via ``pc.extract_regex`` (no per-row
    Python json.loads in the hot path); rows whose props lack an
    integer ``field`` are skipped, matching the SQL oracle's
    ``json_extract`` NULL semantics.  Combiner-first: per-batch
    (event_type, n, sum) partials -> event-type-small groupby ->
    finalize ratio with round6.
    """
    from .functions import round6

    pat = f'"{field}":\\s*(?P<v>-?\\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        et_col = batch.column("event_type")
        et_col = et_col.combine_chunks() if et_col.num_chunks != 1 else et_col.chunk(0)
        pr = batch.column("props")
        pr = pr.combine_chunks() if pr.num_chunks != 1 else pr.chunk(0)
        ext = pc.extract_regex(pr, pat)
        ok = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        vals = np.array(
            [int(s) for s in pc.struct_field(ext, "v").drop_null().to_pylist()],
            dtype=np.int64,
        )
        ets = np.asarray(et_col.to_pylist(), dtype=object)[ok]
        uniq, inv = np.unique(ets, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(list(uniq), pa.string()),
                "n": pa.array(np.bincount(inv), pa.int64()),
                "s": pa.array(
                    np.bincount(inv, weights=vals).astype(np.int64), pa.int64()
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy()
        s = batch.column("sum(s)").to_numpy()
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(n, pa.int64()),
                "sum_k": pa.array(s, pa.int64()),
                "avg_k_r": pa.array(round6(s / n), pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "props"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "s"])
        .map_batches(finalize, batch_format="pyarrow")
    )

"""Mergeable sketch / sampling / quantile operators — the approximate
and order-statistics family for training-data pipelines.

All distributed state is MERGEABLE and flows through Ray Data's custom
``AggregateFn`` (init / accumulate_block / merge / finalize) or a
combiner-first groupby — the canonical shapes for sketches at scale:
every block contributes a fixed-size partial, merges are associative,
and only sketch-sized state crosses the wire.

- hll_distinct_terms: HyperLogLog distinct-term count (register max is
  the merge; estimate within ~1.04/sqrt(2^p)).
- cms_heavy_hitters: Count-Min Sketch counts + capped candidate set;
  top-k by estimated frequency (superset-accurate for true heavy
  hitters; property-tested against exact counts).
- bottomk_sample: DETERMINISTIC distributed sample — the k doc_ids
  with the smallest md5(doc_id) (a bottom-k hash sketch).  Unlike a
  random reservoir it is order- and partition-independent, so it is
  exactly reproducible AND SQL-oracle-checkable.
- exact_quantiles_cents: exact discrete quantiles over a money column
  via per-batch (value, count) partials -> small groupby -> cumulative
  selection (matches DuckDB ``quantile_disc``).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import AggregateFn

# ---------------------------------------------------------------------------
# token helpers (simple analyzer — SQL-replicable)
# ---------------------------------------------------------------------------


def _flat_tokens(block: pa.Table) -> pa.Array:
    col = block.column("text")
    col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    flat = pc.utf8_lower(pc.split_pattern(col, " ").flatten())
    return flat.filter(pc.not_equal(flat, ""))


def _fnv64(arr: list[str]) -> np.ndarray:
    """Vectorized FNV-1a (engine.functions.fnv1a64_arr) — bit-identical
    to the per-byte scalar loop, so sketch estimates are unchanged."""
    from .functions import fnv1a64_arr

    return fnv1a64_arr(arr)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_distinct_terms(sf_dir: str, precision: int = 12) -> pa.Table:
    """Estimate the number of distinct simple-analyzer terms in
    documents.text with a HyperLogLog of 2**precision registers.

    Returns a one-row table (estimate:int64, precision:int32).
    """
    m = 1 << precision

    def init(_key):
        return np.zeros(m, dtype=np.int8)

    def accumulate_block(regs: np.ndarray, block: pa.Table) -> np.ndarray:
        toks = _flat_tokens(block)
        uniq = pc.unique(toks).to_pylist()
        if not uniq:
            return regs
        h = _fnv64(uniq)
        idx = (h >> np.uint64(64 - precision)).astype(np.int64)
        rest = h << np.uint64(precision)  # top (64-p) hash bits at MSB
        # rank = leading zeros of rest + 1 (capped)
        rank = np.full(len(h), 64 - precision + 1, dtype=np.int8)
        nz = rest != 0
        # leading zeros via bit_length: lz = 64 - bit_length(rest)
        bl = np.frompyfunc(int.bit_length, 1, 1)(rest[nz].astype(object)).astype(np.int64)
        rank[nz] = (64 - bl + 1).astype(np.int8)
        regs = regs.copy()
        np.maximum.at(regs, idx, rank)
        return regs

    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def finalize(regs: np.ndarray) -> int:
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return int(round(est))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    res = ds.aggregate(
        AggregateFn(init=init, merge=merge, name="hll",
                    accumulate_block=accumulate_block, finalize=finalize)
    )
    return pa.table(
        {
            "estimate": pa.array([int(res["hll"])], pa.int64()),
            "precision": pa.array([precision], pa.int32()),
        }
    )


def hll_recall(sf_dir: str, precision: int = 12) -> pa.Table:
    """Driver-checkable bounds oracle for hll_distinct_terms (VERDICT
    r03 task #3, the knn_recall pattern): one row of
    (exact_distinct, precision, within_bound) where exact_distinct is
    the DISTRIBUTED exact distinct-term count (the same combiner-first
    term aggregate term_df uses — never a driver-side set) and
    within_bound asserts |estimate/exact - 1| <= 4 * 1.04/sqrt(2^p),
    four standard errors of the HLL estimator (module docstring).

    The SQL oracle recomputes COUNT(DISTINCT term) exactly and sets
    within_bound to the constant 1 — an HLL regression (bad hashing,
    register merge bug, broken correction) surfaces as a driver hash
    mismatch, converting the last oracle-convertible `no_oracle` row
    into a checked one."""
    import math

    from .textstats import term_stats

    est = int(
        hll_distinct_terms(sf_dir, precision).column("estimate")[0].as_py()
    )
    exact = int(term_stats(sf_dir).count())
    bound = 4 * 1.04 / math.sqrt(1 << precision)
    rel = abs(est - exact) / exact if exact else (0.0 if est == 0 else 1.0)
    return pa.table(
        {
            "exact_distinct": pa.array([exact], pa.int64()),
            "precision": pa.array([precision], pa.int32()),
            "within_bound": pa.array([int(rel <= bound)], pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters
# ---------------------------------------------------------------------------


def cms_heavy_hitters(
    sf_dir: str, k: int = 10, width: int = 2048, depth: int = 4,
    max_candidates: int = 4096,
) -> pa.Table:
    """Top-k terms by Count-Min-estimated frequency.

    State = (CMS matrix, candidate set capped at ``max_candidates``).
    CMS estimates never undercount, so for any true heavy hitter the
    estimate >= truth; ties broken term asc.  Returns (term, est_count)
    rows, est-count desc.
    """
    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    _cms_nbytes = depth * width * 8

    # the accumulator travels through Ray Data blocks as ONE Arrow
    # binary value (fixed-size CMS matrix prefix + \x00-joined candidate
    # terms) — keeping the state Arrow-native avoids the pickled-object
    # block fallback (and its per-block warning) entirely.
    def _pack(cms: np.ndarray, cand: dict) -> bytes:
        return cms.tobytes() + "\x00".join(cand).encode()

    def _unpack(blob: bytes) -> tuple[np.ndarray, dict]:
        cms = (
            np.frombuffer(blob[:_cms_nbytes], dtype=np.int64)
            .reshape(depth, width)
            .copy()
        )
        rest = blob[_cms_nbytes:]
        cand = {t: None for t in rest.decode().split("\x00")} if rest else {}
        return cms, cand

    def init(_key):
        return _pack(np.zeros((depth, width), dtype=np.int64), {})

    def _rows(h: np.ndarray) -> np.ndarray:
        # depth x n bucket indices
        return np.stack([((h * s) >> np.uint64(32)) % np.uint64(width) for s in seeds])

    def accumulate_block(state, block: pa.Table):
        cms, cand = _unpack(state)
        toks = _flat_tokens(block)
        if len(toks) == 0:
            return _pack(cms, cand)
        denc = pc.dictionary_encode(toks)
        codes = denc.indices.to_numpy().astype(np.int64)
        uniq = denc.dictionary.to_pylist()
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        h = _fnv64(uniq)
        rows = _rows(h)
        for d in range(depth):
            np.add.at(cms[d], rows[d].astype(np.int64), counts)
        for t in uniq:
            cand[t] = None
        if len(cand) > max_candidates:
            # keep the candidates with the largest current estimates
            ests = _estimate(cms, list(cand))
            order = np.argsort(-ests)[:max_candidates]
            names = list(cand)
            cand = {names[i]: None for i in order}
        return _pack(cms, cand)

    def _estimate(cms: np.ndarray, terms: list[str]) -> np.ndarray:
        h = _fnv64(terms)
        rows = _rows(h)
        ests = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            ests = np.minimum(ests, cms[d][rows[d].astype(np.int64)])
        return ests

    def merge(a, b):
        cms_a, cand = _unpack(a)
        cms_b, cand_b = _unpack(b)
        cand.update(cand_b)
        cms = cms_a + cms_b
        if len(cand) > max_candidates:
            ests = _estimate(cms, list(cand))
            order = np.argsort(-ests)[:max_candidates]
            names = list(cand)
            cand = {names[i]: None for i in order}
        return _pack(cms, cand)

    def finalize(state):
        # return JSON (Arrow-native string) — tuple lists would force a
        # pickled-object result block
        cms, cand = _unpack(state)
        terms = sorted(cand)  # deterministic tie-break base order
        if not terms:
            return json.dumps([])
        ests = _estimate(cms, terms)
        order = np.lexsort((np.array(terms, dtype=object), -ests))[:k]
        return json.dumps([(terms[i], int(ests[i])) for i in order])

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    res = ds.aggregate(
        AggregateFn(init=init, merge=merge, name="cms",
                    accumulate_block=accumulate_block, finalize=finalize)
    )
    rows = json.loads(res["cms"])
    return pa.table(
        {
            "term": pa.array([t for t, _ in rows], pa.string()),
            "est_count": pa.array([c for _, c in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# deterministic bottom-k hash sample
# ---------------------------------------------------------------------------


def bottomk_sample(sf_dir: str, n: int = 20) -> "ray.data.Dataset":
    """The ``n`` doc_ids with the smallest md5(doc_id) — a deterministic,
    partition-order-independent distributed sample (bottom-k sketch).

    Oracle: ``SELECT doc_id FROM documents ORDER BY
    md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT n``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (keys[j], ids[j]))[:n]
        return pa.table(
            {
                "doc_id": pa.array([ids[j] for j in order], pa.int64()),
                "hkey": pa.array([keys[j] for j in order], pa.string()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # partial bottom-n per batch -> global bottom-n (tiny sort)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["hkey", "doc_id"])
        .limit(n)
        .select_columns(["doc_id"])
    )


def stratified_sample(
    sf_dir: str, by: str = "lang", k: int = 5
) -> "ray.data.Dataset":
    """Deterministic k-per-stratum sample: within each ``by`` group,
    the ``k`` docs with the smallest (md5(doc_id), doc_id) rank key —
    the per-group extension of ``bottomk_sample``.

    Scale shape: each batch keeps at most k rows PER STRATUM seen in
    that batch (bottom-k partials), so the groupby exchange moves
    O(k x strata x batches) tiny rows, never the corpus; the number of
    strata (languages/sources) is assumed vocabulary-small.  Adding a
    stratum column never changes which docs another stratum samples
    (rank keys are per-doc, partition-independent).

    Output: (stratum, rank 1..k, doc_id).
    Oracle: ``row_number() OVER (PARTITION BY lang ORDER BY
    md5(CAST(doc_id AS VARCHAR)), doc_id)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        strata = batch.column(by).to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        keep_s, keep_i, keep_k = [], [], []
        per: dict[str, list[int]] = {}
        for j in sorted(range(len(ids)), key=lambda j: (keys[j], ids[j])):
            got = per.setdefault(strata[j], [])
            if len(got) < k:
                got.append(j)
        for s, idxs in per.items():
            for j in idxs:
                keep_s.append(s)
                keep_i.append(ids[j])
                keep_k.append(keys[j])
        return pa.table(
            {
                "stratum": pa.array(keep_s, pa.string()),
                "doc_id": pa.array(keep_i, pa.int64()),
                "hkey": pa.array(keep_k, pa.string()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        keys = group.column("hkey").to_pylist()
        order = sorted(range(len(ids)), key=lambda j: (keys[j], ids[j]))[:k]
        return pa.table(
            {
                "stratum": pa.array(
                    [group.column("stratum")[0].as_py()] * len(order), pa.string()
                ),
                "rank": pa.array(range(1, len(order) + 1), pa.int64()),
                "doc_id": pa.array([ids[j] for j in order], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", by]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("stratum")
        .map_groups(topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact distributed quantiles
# ---------------------------------------------------------------------------


def exact_quantiles_cents(
    sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> pa.Table:
    """Exact discrete quantiles of lineitem.l_extendedprice in cents.

    Per-batch (cents, count) partials -> groupby-sum (the exchange is
    bounded by the number of DISTINCT values, not rows) -> cumulative
    selection: smallest value v with cum_count >= ceil(q * N)
    (DuckDB ``quantile_disc`` semantics).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch.column("l_extendedprice").to_numpy() * 100.0).astype(
            np.int64
        )
        vals, counts = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "cents": pa.array(vals, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .sum("cnt")
        .sort("cents")
        .take_all()
    )
    vals = np.array([r["cents"] for r in hist], dtype=np.int64)
    cnts = np.array([r["sum(cnt)"] for r in hist], dtype=np.int64)
    cum = np.cumsum(cnts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        target = int(np.ceil(q * total))
        i = int(np.searchsorted(cum, max(target, 1)))
        out_q.append(float(q))
        out_v.append(int(vals[min(i, len(vals) - 1)]))
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "cents": pa.array(out_v, pa.int64()),
        }
    )

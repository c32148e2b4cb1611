"""Composite training-corpus preparation pipeline — the end-to-end
LLM-data-curation chain a user runs before pretraining:

    quality cut  ->  decontamination  ->  near-dup removal  ->  survivors

Each stage is an existing driver-verified operator; this module wires
them into ONE deterministic, SQL-oracle-checkable pipeline
(`__ray_entry__.oracle_sql()["corpus_prep"]` replays the whole chain as
a single DuckDB query).

Semantics (deliberately stage-independent: every condition is computed
on the FULL corpus, then intersected — no stage reorders another's
input, so the SQL replay needs no staged materialization):

- quality: keep docs whose distinct-token ratio (round6, as in
  textanalysis.quality_scores) is >= the corpus q-quantile of that
  ratio (DuckDB ``quantile_disc`` semantics: smallest value with
  cumulative count >= ceil(q*N)).
- decontamination: drop the held-out eval slice (doc_id % eval_mod
  == 0) and every training doc sharing >= min_overlap distinct word
  n-grams with it (engine.dedup.decontaminate).
- near-dup: for every n-gram-Jaccard pair (a < b, jaccard >=
  threshold) drop the HIGHER doc_id (engine.dedup.ngram_jaccard_pairs;
  the standard keep-first rule — no transitive clustering, so the rule
  is order-independent and SQL-expressible).

Scale shape: stage 1 produces a single threshold.  Stages 2-3 produce
removal-id sets that are SMALL on a healthy corpus (bounded by the
contaminated / duplicated minority) but corpus-order on a highly
duplicated crawl — so they are collected through the bounded-broadcast
guard (textstats.collect_bounded): under ``REMOVAL_BROADCAST_MAX`` ids
they broadcast once via ``ray.put`` and the final decision is ONE
streaming pass with vectorized masks; past the cap the pipeline flips
to a distributed LEFT ANTI hash join (Ray Dataset.join) and no
removal-id set ever materializes on the driver (VERDICT r03 task #2).
Both paths are output-identical (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import decontaminate, minhash_lsh_pairs, ngram_jaccard_pairs
from .textstats import _split_lower


def _ratio_micro(batch: pa.Table) -> np.ndarray:
    """distinct-token ratio as exact 6-dp micro-ints (round6 x 1e6),
    bit-consistent with textanalysis.quality_scores' distinct_ratio_r."""
    from .functions import round6

    doc_rep, _, flat = _split_lower(batch)
    nrows = batch.num_rows
    n_tok = np.bincount(doc_rep, minlength=nrows).astype(np.int64)
    if len(flat):
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy().astype(np.int64)
        pair = doc_rep * len(denc.dictionary) + codes
        upair = np.unique(pair)
        n_dis = np.bincount(
            upair // len(denc.dictionary), minlength=nrows
        ).astype(np.int64)
    else:
        n_dis = np.zeros(nrows, np.int64)
    ratio = round6(
        np.divide(n_dis, n_tok, out=np.zeros(nrows, np.float64), where=n_tok > 0)
    )
    return np.round(ratio * 1e6).astype(np.int64)


def quality_threshold_micro(sf_dir: str, q: float = 0.25) -> int:
    """The q-quantile (quantile_disc rule) of the distinct-token ratio,
    in exact micro-int form.  Distributed histogram: per-batch
    (ratio_micro, count) partials -> vocabulary-small groupby -> driver
    cumulative selection (same shape as exact_quantiles_cents)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(_ratio_micro(batch), return_counts=True)
        return pa.table(
            {
                "v": pa.array(vals, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
        .sort("v")
        .take_all()
    )
    vals = np.array([r["v"] for r in hist], dtype=np.int64)
    cum = np.cumsum([r["sum(cnt)"] for r in hist])
    target = max(int(np.ceil(q * int(cum[-1]))), 1)
    return int(vals[min(int(np.searchsorted(cum, target)), len(vals) - 1)])


# Removal-id sets above this row count stop being broadcast and flip
# the pipeline onto the distributed anti-join path.  4M int64 ids ==
# 32 MB per worker heap — the same order as textstats'
# VOCAB_BROADCAST_MAX reasoning.
REMOVAL_BROADCAST_MAX = 4_000_000


def corpus_prep(
    sf_dir: str,
    q: float = 0.25,
    n: int = 3,
    eval_mod: int = 50,
    min_overlap: int = 3,
    jaccard_threshold: float = 0.5,
    pair_source: str = "lsh",
    removal_broadcast_max: int | None = None,
) -> "ray.data.Dataset":
    """Run the full curation chain; returns surviving (doc_id, lang).

    Near-dup pairs come from minhash_lsh_pairs by default (bounded
    under hot shingles; identical to the exact operator at oracle
    scale — see engine.dedup.dedup_clusters); ``pair_source="exact"``
    keeps the uncapped operator for oracle-scale replays.

    ``removal_broadcast_max`` (default REMOVAL_BROADCAST_MAX) caps the
    driver-collected removal-id sets; past it the final filter runs as
    a distributed LEFT ANTI hash join instead of a broadcast isin —
    identical output, no driver-side growth on a heavily duplicated or
    contaminated crawl.  Tests force the join path with 0."""
    from .textstats import _join_parts

    def bounded_ids(ds: "ray.data.Dataset", cap: int) -> "np.ndarray | None":
        """Driver-collect a doc_id Dataset up to ``cap`` rows; None on
        overflow.  Unlike textstats.collect_bounded, an EMPTY set is a
        valid (empty) result — a clean corpus with nothing to remove
        must keep the broadcast fast path, not pay the join shuffle."""
        got: list[np.ndarray] = []
        total = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            a = b.column("doc_id").to_numpy()
            got.append(a)
            total += len(a)
            if total > cap:
                return None
        if not got:
            return np.zeros(0, np.int64)
        return np.unique(np.concatenate(got))

    cap = (
        REMOVAL_BROADCAST_MAX
        if removal_broadcast_max is None
        else removal_broadcast_max
    )
    thr = quality_threshold_micro(sf_dir, q)

    def cont_ids(batch: pa.Table) -> pa.Table:
        sel = batch.column("contaminated")
        return pa.table({"doc_id": batch.column("doc_id").filter(sel)})

    cont_ds = decontaminate(
        sf_dir, n=n, eval_mod=eval_mod, min_overlap=min_overlap
    ).map_batches(cont_ids, batch_format="pyarrow")

    if pair_source == "lsh":
        pair_ds = minhash_lsh_pairs(sf_dir, n=n, threshold=jaccard_threshold)
    elif pair_source == "exact":
        pair_ds = ngram_jaccard_pairs(sf_dir, n=n, threshold=jaccard_threshold)
    else:
        raise ValueError(f"unknown pair_source: {pair_source!r}")

    def dup_ids(batch: pa.Table) -> pa.Table:
        b = np.unique(batch.column("b").to_numpy())
        return pa.table({"doc_id": pa.array(b.astype(np.int64), pa.int64())})

    dup_ds = pair_ds.map_batches(dup_ids, batch_format="pyarrow")

    # Materialize the removal-id Datasets BEFORE the bounded probe:
    # they are narrow (doc_id only) but expensive to compute, and on
    # the past-cap path the anti-join below re-consumes them — without
    # this the decontaminate/minhash pipelines would execute twice on
    # exactly the heavily-duplicated corpora the join path targets
    # (ADVICE r04).  Blocks live in the object store and spill.
    cont_ds = cont_ds.materialize()
    dup_ds = dup_ds.materialize()
    bad_c = bounded_ids(cont_ds, cap)
    bad_d = bounded_ids(dup_ds, cap) if bad_c is not None else None

    def keep_base(batch: pa.Table) -> pa.Table:
        """Quality + eval-holdout mask (stage 1 & the eval slice drop);
        shared by both removal paths."""
        ids = batch.column("doc_id").to_numpy()
        mask = (_ratio_micro(batch) >= thr) & (ids % eval_mod != 0)
        sel = pa.array(mask)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(sel),
                "lang": batch.column("lang").filter(sel),
            }
        )

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(keep_base, batch_format="pyarrow")

    if bad_c is not None and bad_d is not None:
        # broadcast fast path: removal sets are minority-sized
        ref = ray.put((bad_c, bad_d))

        def drop_flagged(batch: pa.Table) -> pa.Table:
            c, d = ray.get(ref)
            ids = batch.column("doc_id").to_numpy()
            sel = pa.array(~np.isin(ids, c) & ~np.isin(ids, d))
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").filter(sel),
                    "lang": batch.column("lang").filter(sel),
                }
            )

        return base.map_batches(drop_flagged, batch_format="pyarrow")

    # scale path: the removal set exceeded the broadcast cap (or a test
    # forced cap=0) — distributed hash ANTI join; duplicate removal ids
    # are harmless (anti-join keeps left rows with NO match, once).
    removal = cont_ds.union(dup_ds)
    return base.join(
        removal, "left_anti", num_partitions=_join_parts(), on=("doc_id",)
    )


def split_corpus(
    sf_dir: str, bounds: dict[str, int] | None = None, mod: int = 10_000
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: one shuffle-free pass.

    Each doc's bucket is ``fnv1a64(str(doc_id)) % mod`` — content-key
    hashing, so the assignment is stable under re-runs, re-partitioning
    and corpus growth (a doc never migrates between splits when other
    docs are added, the property random sampling lacks).  ``bounds``
    maps split name -> exclusive upper bucket bound in ascending order;
    the default is 90/5/5:
    ``{"train": 9000, "val": 9500, "test": 10000}``.

    Output: (doc_id, bucket, split).  Exactly SQL-replicable (the
    FNV-1a list_reduce CTE the SimHash oracles use).
    """
    from .functions import fnv1a64_arr

    if bounds is None:
        bounds = {"train": 9000, "val": 9500, "test": 10_000}
    names = list(bounds)
    cuts = np.asarray([bounds[n] for n in names], dtype=np.int64)
    if cuts[-1] != mod or np.any(np.diff(cuts) <= 0) or cuts[0] <= 0:
        raise ValueError(f"bounds must ascend to mod={mod}: {bounds}")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = fnv1a64_arr([str(i) for i in ids])
        bucket = (h % np.uint64(mod)).astype(np.int64)
        which = np.searchsorted(cuts, bucket, side="right")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array([names[w] for w in which], pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


def epoch_shuffle(sf_dir: str, epoch: int = 0, k: int = 100) -> "ray.data.Dataset":
    """Deterministic training-epoch shuffle: the global doc order for
    epoch E is ``sort by fnv1a64(f"{E}:{doc_id}")`` — a reproducible,
    epoch-distinct permutation (the property data loaders need:
    restarting a run mid-epoch reproduces the exact stream, and no two
    epochs repeat an order).  The distributed range-partitioned sort IS
    the shuffle; ``limit(k)`` bounds the driver-checkable head (a real
    run consumes the sorted stream or writes it partitioned).

    Output: (pos, doc_id, shuffle_key) for the first ``k`` docs.
    """
    from .functions import fnv1a64_arr

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = fnv1a64_arr([f"{epoch}:{i}" for i in ids])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # int64-safe: drop the top bit (order-preserving enough
                # for a shuffle key, and DuckDB BIGINT-replicable)
                "shuffle_key": pa.array(
                    (h >> np.uint64(1)).astype(np.int64), pa.int64()
                ),
            }
        )

    head = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(key, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .limit(k)
        .take_all()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "pos": pa.array(range(1, len(head) + 1), pa.int64()),
                "doc_id": pa.array([r["doc_id"] for r in head], pa.int64()),
                "shuffle_key": pa.array(
                    [r["shuffle_key"] for r in head], pa.int64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights (data selection for pretraining)
# ---------------------------------------------------------------------------


def _gram_buckets(batch: pa.Table, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-occurrence (doc index, hashed-gram bucket) for a batch:
    grams are unigrams + within-doc bigrams of the simple analyzer,
    bucketed by fnv1a64(gram) % n_buckets.  Only DISTINCT grams are
    hashed (dictionary-encode first); the occurrence expansion is a
    table lookup."""
    from .functions import fnv1a64_arr

    doc_rep, _, flat = _split_lower(batch)
    if len(flat) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ok = doc_rep[:-1] == doc_rep[1:] if len(flat) > 1 else np.zeros(0, bool)
    if ok.any():
        a = flat.slice(0, len(flat) - 1).filter(pa.array(ok))
        b = flat.slice(1, len(flat) - 1).filter(pa.array(ok))
        bigrams = pc.binary_join_element_wise(a, b, " ")
        grams = pa.concat_arrays([flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat, bigrams])
        gram_doc = np.concatenate([doc_rep, doc_rep[:-1][ok]])
    else:
        grams = flat
        gram_doc = doc_rep
    denc = pc.dictionary_encode(grams)
    codes = denc.indices.to_numpy().astype(np.int64)
    lut = (
        fnv1a64_arr(denc.dictionary.to_pylist()) % np.uint64(n_buckets)
    ).astype(np.int64)
    return gram_doc, lut[codes]


def dsir_weights(
    sf_dir: str, n_buckets: int = 4096, target_lang: str = "en"
) -> "ray.data.Dataset":
    """DSIR-style importance weights for data selection ([Xie et al.
    2023, *Data Selection via Importance Resampling*]): fit
    bag-of-hashed-n-gram (unigram + bigram) bucket models for the
    TARGET distribution (here: docs whose ``lang == target_lang``, the
    stand-in for a high-quality target corpus) and the RAW distribution
    (all docs), then score every doc with the log importance ratio

        w(doc) = Σ_grams [ ln p̂(bucket) - ln q̂(bucket) ]

    with Laplace-smoothed bucket probabilities p̂ = (c_t+1)/(T_t+B),
    q̂ = (c_a+1)/(T_a+B).  Each per-bucket log term is quantized to
    integer MICROS once (math.log — libm, bit-equal to DuckDB ``ln``),
    so the per-doc sum is an exact, order-independent integer across
    engines (the lm_doc_scores trick).

    Scale shape: pass 1 is a combiner-first bucket-count aggregate —
    the groupby moves at most ``n_buckets`` partial rows per batch and
    the driver holds exactly B (bucket, c_all, c_tgt) rows (CONSTANT,
    chosen, not data-dependent); pass 2 broadcasts the B-entry int64
    delta table via ``ray.put`` and streams the corpus once, fully
    vectorized.  No vocabulary-sized state exists anywhere — that is
    the point of hashed features.

    Output: (doc_id, n_grams, dsir_sum_micro, dsir_mean_r); docs with
    zero tokens emit nothing (SQL join semantics).
    """
    import math

    from .functions import micro_signed, round6_signed

    def count_partial(batch: pa.Table) -> pa.Table:
        gram_doc, buckets = _gram_buckets(batch, n_buckets)
        if not len(buckets):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "c_all": pa.array([], pa.int64()),
                    "c_tgt": pa.array([], pa.int64()),
                }
            )
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        tgt_occ = (langs == target_lang)[gram_doc]
        c_all = np.bincount(buckets, minlength=n_buckets)
        c_tgt = np.bincount(buckets[tgt_occ], minlength=n_buckets)
        nz = np.nonzero(c_all)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_all": pa.array(c_all[nz], pa.int64()),
                "c_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["c_all", "c_tgt"])
        .take_all()
    )  # <= n_buckets rows — constant-bounded driver state
    c_all = np.zeros(n_buckets, np.int64)
    c_tgt = np.zeros(n_buckets, np.int64)
    for r in rows:
        c_all[int(r["bucket"])] = int(r["sum(c_all)"])
        c_tgt[int(r["bucket"])] = int(r["sum(c_tgt)"])
    t_a, t_t = int(c_all.sum()), int(c_tgt.sum())
    delta = np.zeros(n_buckets, np.int64)
    for b in np.nonzero(c_all)[0]:
        p = math.log((int(c_tgt[b]) + 1) / (t_t + n_buckets))
        q = math.log((int(c_all[b]) + 1) / (t_a + n_buckets))
        delta[b] = int(micro_signed(p)) - int(micro_signed(q))
    ref = ray.put(delta)

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        gram_doc, buckets = _gram_buckets(batch, n_buckets)
        n = batch.num_rows
        n_grams = np.bincount(gram_doc, minlength=n).astype(np.int64)
        sums = np.bincount(
            gram_doc, weights=d[buckets], minlength=n
        ).astype(np.int64)
        mask = n_grams > 0
        ids = batch.column("doc_id").to_numpy()[mask]
        ng = n_grams[mask]
        s = sums[mask]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(ng, pa.int64()),
                "dsir_sum_micro": pa.array(s, pa.int64()),
                "dsir_mean_r": pa.array(round6_signed(s / 1e6 / ng), pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(score, batch_format="pyarrow")

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

Scale shape: stages 1-3 each produce a SMALL driver-side artifact (a
single threshold; the flagged-id arrays — bounded by the contaminated /
duplicated minority, not the corpus; were a corpus majority flagged,
the broadcast sets would be replaced by the hash semi-join in
engine/relational.py), broadcast once via ``ray.put``; the final
decision is ONE streaming pass over documents with vectorized masks.
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


def corpus_prep(
    sf_dir: str,
    q: float = 0.25,
    n: int = 3,
    eval_mod: int = 50,
    min_overlap: int = 3,
    jaccard_threshold: float = 0.5,
    pair_source: str = "lsh",
) -> "ray.data.Dataset":
    """Run the full curation chain; returns surviving (doc_id, lang).

    Near-dup pairs come from minhash_lsh_pairs by default (bounded
    under hot shingles; identical to the exact operator at oracle
    scale — see engine.dedup.dedup_clusters); ``pair_source="exact"``
    keeps the uncapped operator for oracle-scale replays."""
    thr = quality_threshold_micro(sf_dir, q)

    contaminated = np.array(
        sorted(
            r["doc_id"]
            for r in decontaminate(
                sf_dir, n=n, eval_mod=eval_mod, min_overlap=min_overlap
            ).take_all()
            if r["contaminated"]
        ),
        dtype=np.int64,
    )
    if pair_source == "lsh":
        pair_ds = minhash_lsh_pairs(sf_dir, n=n, threshold=jaccard_threshold)
    elif pair_source == "exact":
        pair_ds = ngram_jaccard_pairs(sf_dir, n=n, threshold=jaccard_threshold)
    else:
        raise ValueError(f"unknown pair_source: {pair_source!r}")
    dup_b = np.array(
        sorted({r["b"] for r in pair_ds.take_all()}),
        dtype=np.int64,
    )
    ref = ray.put((thr, contaminated, dup_b))

    def keep(batch: pa.Table) -> pa.Table:
        t, bad_c, bad_d = ray.get(ref)
        ids = batch.column("doc_id").to_numpy()
        mask = (
            (_ratio_micro(batch) >= t)
            & (ids % eval_mod != 0)
            & ~np.isin(ids, bad_c)
            & ~np.isin(ids, bad_d)
        )
        sel = pa.array(mask)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(sel),
                "lang": batch.column("lang").filter(sel),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(keep, batch_format="pyarrow")


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

"""Text-statistics operators over the driver ``documents`` table
(G2-G4/K-ops in SQL-replicable "simple" analyzer mode — SURVEY.md §5.3).

These run the whitespace+lowercase analyzer (engine.analysis.
tokenize_simple) so DuckDB can replicate them exactly via
``lower(unnest(string_split(text, ' ')))``; they exercise the same Ray
Data primitives the index build uses (vectorized map_batches partials ->
small groupby), and double as the engine's corpus-profiling utilities.

Scale pattern: every per-term aggregate is COMBINED inside map_batches
first (one partial row per distinct term per batch), so the groupby
shuffle moves vocabulary-sized partials, never token streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _split_lower(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """text column -> (doc index per token, nonempty mask applied) flat
    lowercase tokens + per-doc token counts."""
    col = batch.column("text")
    if col.num_chunks != 1:
        col = col.combine_chunks()
    else:
        col = col.chunk(0)
    split = pc.split_pattern(col, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.utf8_lower(split.flatten())
    doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc_rep[nonempty], lens, flat.filter(pa.array(nonempty))


def doc_lengths(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, doc_len) with doc_len = count of nonempty simple tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_rep, lens, _ = _split_lower(batch)
        n = batch.num_rows
        doc_len = np.bincount(doc_rep, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "doc_len": pa.array(doc_len, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def _term_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (term, df_partial, cf_partial)."""
    doc_rep, _, flat = _split_lower(batch)
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
            }
        )
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy().astype(np.int64)
    nv = len(denc.dictionary)
    cf = np.bincount(codes, minlength=nv)
    # df: distinct docs per term within the batch
    pair = codes * (doc_rep.max() + 1) + doc_rep
    upair = np.unique(pair)
    df = np.bincount(upair // (doc_rep.max() + 1), minlength=nv)
    return pa.table(
        {
            "term": denc.dictionary,
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
        }
    )


def term_stats(sf_dir: str) -> "ray.data.Dataset":
    """(term, df, cf) over documents.text, simple analyzer."""
    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_term_partials, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "cf"])
        .map_batches(
            lambda b: b.rename_columns(["term", "df", "cf"]), batch_format="pyarrow"
        )
    )


def term_df(sf_dir: str) -> "ray.data.Dataset":
    return term_stats(sf_dir).select_columns(["term", "df"])


def term_cf(sf_dir: str) -> "ray.data.Dataset":
    return term_stats(sf_dir).select_columns(["term", "cf"])


def top_terms(sf_dir: str, n: int = 20) -> "ray.data.Dataset":
    """n most frequent terms; ties broken term asc (deterministic)."""
    return term_stats(sf_dir).sort(["cf", "term"], descending=[True, False]).limit(n)


def collection_stats(sf_dir: str) -> pa.Table:
    """Single-row global aggregates (G4): Ray Data count/sum/mean.

    avg_doc_len goes through round6 (the repo's cross-engine float
    invariant); the oracle rounds with round(avg(c), 6) on its side.
    """
    from .functions import round6_scalar

    dl = doc_lengths(sf_dir)
    agg = dl.aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("doc_len"),
        ray.data.aggregate.Mean("doc_len"),
    )
    return pa.table(
        {
            "num_docs": pa.array([int(agg["count()"])], pa.int64()),
            "total_tokens": pa.array([int(agg["sum(doc_len)"])], pa.int64()),
            "avg_doc_len": pa.array(
                [round6_scalar(float(agg["mean(doc_len)"]))], pa.float64()
            ),
        }
    )

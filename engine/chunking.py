"""LLM training-data shaping: document chunking and sequence packing.

- chunk_documents: split each doc into (possibly overlapping) token
  windows — the standard context-chunking step before tokenizer-level
  packing or RAG indexing.  Row-EXPANDING: per the repo's fusion
  lesson (CLAUDE.md), callers running large corpora should materialize
  the chunk table to parquet before heavy downstream ops rather than
  fusing it into them.
- pack_sequences: assign every doc to a fixed-token-budget training
  sequence via a DISTRIBUTED PREFIX SUM over doc_id order: per-bucket
  totals (one small exchange) -> driver cumsum over the tiny bucket
  table -> in-bucket sorted cumsum (groupby.map_groups).  No global
  sort of the corpus, no driver-side corpus state; buckets are doc_id
  hash-ranges so the exchange is skew-free.

Both use the simple space-split analyzer so DuckDB replays them
exactly (window functions for the prefix sum; list slicing for
chunks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textstats import _split_lower


def chunk_documents(
    sf_dir: str, size: int = 32, stride: int = 16
) -> "ray.data.Dataset":
    """(doc_id, chunk_id, n_tokens, chunk_text): token windows
    [s, s+size) for s = 0, stride, 2*stride, ... while s < doc tokens.
    Docs with zero tokens emit nothing.  chunk_text joins the window's
    tokens with single spaces (== the analyzed form, not raw text)."""
    assert stride >= 1

    def chunks(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        ids = batch.column("doc_id").to_numpy()
        toks = np.asarray(flat.to_pylist(), dtype=object)
        n_tok = np.bincount(doc_rep, minlength=len(ids))
        out_d, out_c, out_n, out_t = [], [], [], []
        starts = np.concatenate(([0], np.cumsum(n_tok)))
        for i in range(len(ids)):
            n = int(n_tok[i])
            base = int(starts[i])
            cid = 0
            for s in range(0, n, stride):
                w = toks[base + s : base + min(s + size, n)]
                out_d.append(int(ids[i]))
                out_c.append(cid)
                out_n.append(len(w))
                out_t.append(" ".join(w))
                cid += 1
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "chunk_id": pa.array(out_c, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_t, pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(chunks, batch_format="pyarrow")


def pack_sequences(
    sf_dir: str, budget: int = 256, num_buckets: int = 32
) -> "ray.data.Dataset":
    """(doc_id, doc_len, tok_offset, seq_id): exclusive prefix sum of
    doc_len in doc_id order, then seq_id = offset // budget — every doc
    lands in one fixed-budget training sequence deterministically.

    Distributed prefix-sum shape: doc_id hash-RANGE buckets (doc_id //
    bucket_width preserves order across buckets) -> per-bucket token
    totals (tiny exchange) -> driver cumsum over num_buckets rows ->
    per-bucket map_groups adds the bucket offset to the in-bucket
    sorted cumsum.  The driver never holds more than num_buckets ints;
    in-bucket state is corpus/num_buckets rows.
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lens(batch: pa.Table) -> pa.Table:
        doc_rep, _, _flat = _split_lower(batch)
        n = np.bincount(doc_rep, minlength=batch.num_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "doc_len": pa.array(n, pa.int64()),
            }
        )

    dl = docs.map_batches(lens, batch_format="pyarrow")

    # bucket = doc_id range slot, order-preserving across buckets
    ids_max = int(
        dl.aggregate(ray.data.aggregate.Max("doc_id"))["max(doc_id)"]
    )
    width = ids_max // num_buckets + 1

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = batch.column("doc_id").to_numpy() // width
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    db = dl.map_batches(with_bucket, batch_format="pyarrow")

    totals = {
        r["bucket"]: r["sum(doc_len)"]
        for r in db.groupby("bucket").sum("doc_len").take_all()
    }
    offsets = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += int(totals[b])
    ref = ray.put(offsets)

    def in_bucket(group: pa.Table) -> pa.Table:
        off = ray.get(ref)[group.column("bucket")[0].as_py()]
        ids = group.column("doc_id").to_numpy()
        ln = group.column("doc_len").to_numpy()
        order = np.argsort(ids)
        ids, ln = ids[order], ln[order]
        excl = off + np.concatenate(([0], np.cumsum(ln)[:-1]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "doc_len": pa.array(ln, pa.int64()),
                "tok_offset": pa.array(excl, pa.int64()),
                "seq_id": pa.array(excl // budget, pa.int64()),
            }
        )

    return db.groupby("bucket").map_groups(in_bucket, batch_format="pyarrow")

"""Percolation (reverse search): route a STREAM of documents to a
broadcast bank of STORED queries — the Elasticsearch percolator /
alerting primitive, and the shape a training-data pipeline uses to tag
incoming documents with subscribed topics.

Scale shape: the query bank is broadcast once (``ray.put``; bounded by
PERCOLATE_MAX_QUERIES — shard the bank across runs past that), the
corpus streams through ONE ``map_batches`` pass, and matching is fully
vectorized: tokens are dictionary-encoded per batch, only the DISTINCT
batch vocabulary is probed against the bank's term map (the
fnv1a64_arr distinct-inputs convention), and per-(doc, query) distinct
match counts accumulate SPARSELY with one ``np.unique`` over pair keys
(memory is hit volume, never |batch| x |bank| dense).  No shuffle, no
driver state, output is match-volume rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

PERCOLATE_MAX_QUERIES = 100_000


def _simple_terms(text: str) -> list[str]:
    """Distinct lowercase space-split tokens, first-occurrence order —
    analysis.tokenize_simple (the F5 SQL-replicable contract) plus the
    analyze_query dedup rule."""
    from .analysis import tokenize_simple

    return list(dict.fromkeys(tokenize_simple(text)))


def percolate(
    sf_dir: str,
    stored_queries: list[dict],
    docs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, query_id, nmatch) for every document matching a stored
    query.  ``stored_queries``: [{query_id, text, match: "any"|"all"}]
    — "any" matches on >= 1 distinct shared term, "all" requires every
    distinct query term present (nmatch counts distinct shared terms
    in both cases)."""
    if len(stored_queries) > PERCOLATE_MAX_QUERIES:
        raise ValueError(
            f"{len(stored_queries)} stored queries exceed the broadcast "
            f"bound {PERCOLATE_MAX_QUERIES}; shard the query bank across "
            "percolate() runs (the term map must stay broadcastable)"
        )
    qids = np.empty(len(stored_queries), np.int64)
    need = np.empty(len(stored_queries), np.int64)
    term_map: dict[str, list[int]] = {}
    for qi, q in enumerate(stored_queries):
        terms = _simple_terms(q["text"])
        if not terms:
            raise ValueError(f"stored query {q['query_id']} has no terms")
        qids[qi] = int(q["query_id"])
        need[qi] = len(terms) if q.get("match", "any") == "all" else 1
        for t in terms:
            term_map.setdefault(t, []).append(qi)
    ref = ray.put((term_map, need, qids))

    if docs is None:
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def match_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .dedup import _tokens

        tmap, needv, qidv = ray.get(ref)
        nq = len(qidv)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
                "nmatch": pa.array([], pa.int64()),
            }
        )
        counts, flat = _tokens(batch)
        if len(flat) == 0:
            return empty
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy().astype(np.int64)
        vocab = denc.dictionary.to_pylist()  # DISTINCT batch tokens
        # per-vocab-code query hit lists, flattened (ragged arrays)
        vq_lists = [tmap.get(t) or () for t in vocab]
        vq_len = np.fromiter((len(v) for v in vq_lists), np.int64,
                             count=len(vq_lists))
        if vq_len.sum() == 0:
            return empty
        vq_flat = np.fromiter(
            (qi for v in vq_lists for qi in v), np.int64,
            count=int(vq_len.sum()),
        )
        vq_off = np.concatenate(([0], np.cumsum(vq_len)))[:-1]
        # distinct (doc, code) pairs: a term matches a query ONCE per doc
        doc_rep = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        key = doc_rep * len(vocab) + codes
        uniq = np.unique(key)
        udoc = uniq // len(vocab)
        ucode = uniq % len(vocab)
        lens = vq_len[ucode]
        keep = lens > 0
        udoc, ucode, lens = udoc[keep], ucode[keep], lens[keep]
        if lens.size == 0:
            return empty
        total = int(lens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        cols = vq_flat[np.repeat(vq_off[ucode], lens) + within]
        rows = np.repeat(udoc, lens)
        # SPARSE per-(doc, query) distinct-match counts — memory is
        # (doc, term, query)-hit volume, never |batch| x |bank| dense
        pairkey = rows * nq + cols
        upairs, ucnt = np.unique(pairkey, return_counts=True)
        pd_doc = upairs // nq
        pd_q = upairs % nq
        keep2 = ucnt >= needv[pd_q]
        di, qi, nm = pd_doc[keep2], pd_q[keep2], ucnt[keep2]
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[di], pa.int64()),
                "query_id": pa.array(qidv[qi], pa.int64()),
                "nmatch": pa.array(nm.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(match_batch, batch_format="pyarrow")

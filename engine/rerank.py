"""Second-stage reranking of first-stage (BM25) results — the serving
pattern where a cheap recall stage over the whole index feeds a more
expensive precision stage over k0 candidates per query.

Two backends, same stage shape (an actor-pool ``map_batches`` class —
reader/model state loads once per actor in ``__init__``, the A1
pattern):

- ``LexicalReranker`` — term-set Jaccard between the analyzed query
  and the candidate doc's FORWARD-INDEX term set (one fwd.parquet
  row-group point lookup per candidate).  Exact, deterministic, and
  SQL-replicable: this is the driver-checked path (`rerank_topk`).
- ``CrossEncoderReranker`` — capability-gated sentence-transformers
  cross-encoder (the multimodal-codec precedent: absent optional
  backend raises NotImplementedError at construction, never at import).

Scale shape: first-stage output is (|queries| x k0) rows — candidate
volume, never corpus volume.  The rerank stage is a pure map over
those rows (point lookups against per-actor segment LRUs, no shuffle);
the per-query resort is k0-sized.  ``rerank_topk`` merges driver-side
for a bounded query set (the hybrid_search / rrf_fuse precedent); an
unbounded query stream composes the same ``LexicalReranker`` class
with ``groupby("query_id").map_groups`` instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .functions import round6
from .query import IndexReader, analyze_query, run_queries


class LexicalReranker:
    """Actor-pool rerank stage: ``jaccard_r`` per (query, candidate)
    row = |Q ∩ D| / |Q ∪ D| over analyzed-term SETS, where D comes
    from the segment forward index (legacy segments without
    fwd.parquet fall back to the vocabulary scan, the more_like_this
    rule).  Adds a ``jaccard_r`` column; all other columns pass
    through unchanged."""

    def __init__(self, index_dir: str, query_texts: dict[int, str]):
        self.reader = IndexReader(index_dir)
        self.qterms: dict[int, frozenset[str]] = {
            int(qid): frozenset(analyze_query(self.reader.analyzer, text))
            for qid, text in query_texts.items()
        }

    def _doc_terms(self, doc_id: int) -> frozenset[str]:
        loc = self.reader.locate(doc_id)
        if loc is None:
            raise KeyError(f"doc_id {doc_id} not in index")
        seg = self.reader.segment(loc[0])
        fwd = seg.fwd_terms(doc_id)
        if fwd is not None:
            return frozenset(fwd[0])
        o = loc[1]  # legacy segment: O(|vocab|) postings scan
        terms = []
        for term, row in seg.term_idx.items():
            ords, _tfs = seg.decode_idx_cached(row)
            j = int(np.searchsorted(ords, o))
            if j < len(ords) and int(ords[j]) == o:
                terms.append(term)
        return frozenset(terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_numpy()
        dids = batch.column("doc_id").to_numpy()
        jac = np.empty(len(qids), np.float64)
        for i in range(len(qids)):  # candidate-volume rows: point lookups
            q = self.qterms[int(qids[i])]
            d = self._doc_terms(int(dids[i]))
            inter = len(q & d)
            union = len(q) + len(d) - inter
            jac[i] = inter / union if union else 0.0
        return batch.append_column(
            "jaccard_r", pa.array(round6(jac), pa.float64())
        )


class CrossEncoderReranker:
    """Capability-gated model backend: scores (query text, doc text)
    pairs with a sentence-transformers cross-encoder.  The model loads
    ONCE per actor in ``__init__``; ``__call__`` scores one batch of
    (query_id, text, doc_text) rows.  No model ships in this sandbox,
    so construction raises NotImplementedError when the backend is
    absent (engine/multimodal.py capability-gate precedent) — the
    Ray-side plumbing (actor signature, batch shape, output column)
    is the tested contract via LexicalReranker."""

    def __init__(self, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
        try:
            from sentence_transformers import CrossEncoder  # type: ignore
        except ImportError as e:  # pragma: no cover - sandbox has no backend
            raise NotImplementedError(
                "CrossEncoderReranker needs the optional sentence-transformers "
                "backend; use LexicalReranker for a dependency-free rerank"
            ) from e
        self.model = CrossEncoder(model_name)  # pragma: no cover

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        pairs = list(
            zip(batch.column("text").to_pylist(),
                batch.column("doc_text").to_pylist())
        )
        scores = self.model.predict(pairs, convert_to_numpy=True)
        return batch.append_column(
            "rerank_score", pa.array(np.asarray(scores, np.float64))
        )


def rerank_topk(
    index_dir: str,
    queries: list[dict],
    k: int = 10,
    k0: int = 20,
    mode: str = "auto",
    concurrency=(1, 4),
) -> pa.Table:
    """BM25 recall (top-``k0``) -> lexical-Jaccard precision
    (top-``k``): (query_id, rank, doc_id, jaccard_r, score, repo,
    path), ranked per query by (jaccard desc, BM25 score desc, doc_id
    asc).  First stage is the distributed run_queries pipeline; the
    rerank stage is the LexicalReranker actor pool; the final resort
    is (|queries| x k0)-sized, merged driver-side (the rrf_fuse
    precedent — a bounded query set only)."""
    first = run_queries(
        index_dir,
        [{**q, "k": k0} for q in queries],
        mode=mode,
        concurrency=concurrency,
    )
    qtext = {int(q["query_id"]): q["text"] for q in queries}
    scored = first.map_batches(
        LexicalReranker,
        fn_constructor_args=(index_dir, qtext),
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    rows = scored.take_all()  # bounded: |queries| x k0
    by_q: dict[int, list[dict]] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    out = []
    for qid in sorted(by_q):
        cand = sorted(
            by_q[qid],
            key=lambda r: (-r["jaccard_r"], -r["score"], r["doc_id"]),
        )[:k]
        for rank, r in enumerate(cand, 1):
            out.append(
                {
                    "query_id": qid,
                    "rank": rank,
                    "doc_id": int(r["doc_id"]),
                    "jaccard_r": float(r["jaccard_r"]),
                    "score": float(r["score"]),
                    "repo": r["repo"],
                    "path": r["path"],
                }
            )
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("rank", pa.int64()),
                ("doc_id", pa.int64()),
                ("jaccard_r", pa.float64()),
                ("score", pa.float64()),
                ("repo", pa.string()),
                ("path", pa.string()),
            ]
        ),
    )

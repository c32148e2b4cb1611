"""Postings extraction (M3-M5): analyzer actor-pool stage.

Spec: BASELINE.json:6 ("code-aware tokenization, Porter-style stemming,
case folding", "per-partition posting lists (docID, term-frequency,
positions)").

Design (see engine/__init__.py): the analyzer stage emits ONE packed row
per document — ``(doc_id, part, doc_len, terms, tfs, poslists)`` plus
the metadata columns — rather than exploded (doc, term) rows.  The
segment shuffle (groupby "part") therefore moves each document exactly
once, with its postings grouped and its metadata attached, and the
shuffle key is hash-uniform (doc_id is a sha256-derived hash) no matter
how skewed the term distribution is.  Terms are sorted within each doc
at analysis time so the segment build can invert by a single
vectorized lexsort.

The stage is a callable CLASS (actor pool): the analyzer's term->stem
memo (A2) persists across batches in ``__init__``-created state.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from . import analysis

# Output schema of AnalyzeDocs (one row per input document).
ANALYZED_DOC = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("part", pa.int32()),
        ("doc_len", pa.int32()),
        ("terms", pa.list_(pa.string())),       # sorted unique terms of the doc
        ("tfs", pa.list_(pa.int32())),          # aligned with terms
        ("poslists", pa.list_(pa.list_(pa.int32()))),  # aligned with terms
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
    ]
)


def analyze_doc(analyzer: analysis.Analyzer, content: str):
    """One doc -> (doc_len, sorted terms, tfs, poslists)."""
    toks = analyzer(content)
    tf = Counter(toks)
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    terms = sorted(tf)
    return (
        len(toks),
        terms,
        [tf[t] for t in terms],
        [pos[t] for t in terms],
    )


class AnalyzeDocs:
    """Actor-pool map_batches stage: corpus+ids batch -> ANALYZED_DOC rows.

    ``__init__`` builds the analyzer once per actor (stemmer memo
    persists across batches); ``__call__`` handles one Arrow batch.
    """

    def __init__(self, analyzer: str = "code"):
        self._az = analysis.get_analyzer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch.column("content").to_pylist()
        n = len(content)
        doc_lens = np.empty(n, dtype=np.int32)
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        pos_col: list[list[list[int]]] = []
        az = self._az
        for i in range(n):
            dl, terms, tfs, poss = analyze_doc(az, content[i])
            doc_lens[i] = dl
            terms_col.append(terms)
            tfs_col.append(tfs)
            pos_col.append(poss)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "part": batch.column("part"),
                "doc_len": pa.array(doc_lens, pa.int32()),
                "terms": pa.array(terms_col, pa.list_(pa.string())),
                "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
                "poslists": pa.array(pos_col, pa.list_(pa.list_(pa.int32()))),
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "commit": batch.column("commit"),
                "lang": batch.column("lang"),
                "content_sha256": batch.column("content_sha256"),
            }
        )

"""Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of ``glennga/search-engine``
(spec: /root/repo/BASELINE.json north_star) expressed Ray-Data-first:

- index build = ``read_parquet -> map_batches (ids/sha) -> map_batches
  (analyzer actor pool -> postings rows) -> groupby(part).map_groups
  (sort-merge + varbyte encode + atomic segment write)``
- query = stateful actor-pool scorers (block-max WAND over compressed
  segments) -> ``groupby(query_id).map_groups`` top-k merge.

Architecture note (deviation from SURVEY.md SS4.2, deliberate): segments
are DOCUMENT-partitioned (hash(doc_id) % P), not term-partitioned.  Each
segment holds the full inverted index for its slice of documents, so a
scorer holding one segment computes *complete* BM25 scores for its docs
and global top-k is a correct merge of per-segment top-ks.  Hot terms
("def", "import", ...) are thereby split into per-segment sub-postings
by doc range — the spec's "hot terms split into sub-postings" — while
the shuffle key (doc hash) is uniform by construction, which is the
explicit skew defense.  The one term-keyed global aggregation (df/cf
for BM25) is combiner-style: per-segment partial (term, df, cf) rows
(bounded by vocabulary size, not postings count) -> groupby(term).sum.

No module here calls ``ray.init`` / ``ray.shutdown`` (driver contract,
__ray_entry__.py:11-13).
"""

__version__ = "0.1.0"

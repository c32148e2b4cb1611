"""Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of ``glennga/search-engine``
(spec: /root/repo/BASELINE.json north_star) expressed Ray-Data-first:

- index build = ``read_parquet -> map_batches (ids/sha) -> map_batches
  (analyzer actor pool) -> content-addressed partial-run files ->
  per-partition merge tasks (sort-merge + varbyte encode + atomic
  segment write)``.  The exchange is SPIMI-style run files on (shared)
  storage instead of a Ray all-to-all — measured faster, resumable,
  retry-idempotent (engine/postings.py rationale).
- query = stateful actor-pool scorers (adaptive: block-max WAND for
  selective queries, vectorized term-at-a-time for Zipf-head queries —
  both exact; engine/wand.py auto_topk) ->
  ``groupby(query_id).map_groups`` top-k merge.
- training-data operators: dedup (exact / n-gram Jaccard / MinHash+LSH
  / SimHash / embedding-cosine / exact + near-duplicate passages,
  engine/dedup.py), similarity search (brute-force + LSH/IVF ANN,
  int8 + product quantization, recall oracles, RRF hybrid fusion,
  engine/similarity.py), text→embedding encoding (engine/encoder.py),
  two-stage rerank (engine/rerank.py), percolation / reverse search
  (engine/percolate.py), text analysis (lang-ID, quality, token
  counts, fingerprints, PII scrubbing, engine/textanalysis.py), table
  profiling (engine/profile.py), corpus prep (quality cut,
  decontamination with bounded removal semi-join, splits, epoch
  shuffle, DSIR importance weights, engine/prep.py), multimodal
  binary-column plumbing (engine/multimodal.py).
- query modes (engine/query.py, all rank-identical to
  engine/refimpl.py): disjunctive / conjunctive / phrase / proximity
  (slop) / boolean (+must -not) / prefix / fuzzy / regex / lang-filter
  / field-collapse / sort-by-field / federated multi-index /
  per-field boosts (multi-field) / minimum_should_match, plus a
  pluggable TF-IDF scorer, per-term explain, spell-corrected rewrite,
  incremental adds (segment generations), search-after pagination,
  tombstone deletes, generation-gated auto-compaction and a serving
  alias flip (engine/maintenance.py).

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

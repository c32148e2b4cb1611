"""Query serving pipeline (SURVEY.md §3.2): stateful actor-pool scorers,
top-k merge, result enrichment.

Spec: BASELINE.json:6 — "serves BM25 top-k queries through stateful
actor-pool scorers using document-frequency and length statistics
computed as Ray Data aggregates".

Shape: ``queries × segment-ranges`` cross product (flat_map) ->
``map_batches(SegmentScorer, concurrency=(min,max))`` -> per-(query,
segment) partial top-k -> ``groupby(query_id).map_groups`` global
merge + rank.  Because segments are DOCUMENT partitions, each partial
top-k carries complete, final scores for its documents — the merge is a
pure k-way selection, no score recombination — and the doc-metadata
join (J2) is a free in-actor array lookup (the scorer already holds its
segment's repo/path arrays).

Scorer actors load per-segment state lazily and cache it across batches
(A1: dictionary + block table + mmapped postings + doc_len arrays,
loaded once per actor per segment).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray.data

from . import analysis, bm25, fsio, wand
from .checkpoint import read_build_manifest, read_collection_stats
from .segments import Segment, list_segments

# total decoded-postings cache budget per IndexReader (~1 GiB at 16 B
# per posting), divided evenly across its segments
CACHE_POSTINGS_TOTAL = 64_000_000

RESULT_PARTIAL = pa.schema(
    [
        ("query_id", pa.int64()),
        ("k", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("repo", pa.string()),
        ("path", pa.string()),
    ]
)


def analyze_query(analyzer: analysis.Analyzer, text: str) -> list[str]:
    """M8: analyze with the index's recorded analyzer; dedupe terms
    preserving first occurrence (same rule as engine.refimpl)."""
    seen: set[str] = set()
    out: list[str] = []
    for t in analyzer(text):
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


class _ShardedDf:
    """Global term -> df map, loaded ONE HASH SHARD at a time.

    Finalize aggregates the per-segment gt.parquet dictionary partials
    into ``global_terms/shard-NNNN.parquet`` partitioned by
    fnv1a64(term) % num_shards (one map task per shard, no all-to-all —
    engine.build._aggregate_global_terms), so an actor's resident
    vocabulary is bounded by the shards its query stream actually
    touches — not the whole vocabulary, and a shard load reads ONE
    small file.  Legacy indexes without the manifest fall back to a
    single lazily-loaded shard holding every file.
    """

    def __init__(self, index_dir: str):
        from .functions import fnv1a64

        self._fnv = fnv1a64
        self._gt_dir = fsio.join(index_dir, "global_terms")
        meta_path = fsio.join(index_dir, "global_terms_meta.json")
        if fsio.exists(meta_path):
            self.num_shards = int(fsio.read_json(meta_path)["num_shards"])
        else:
            self.num_shards = 1  # legacy layout: everything is shard 0
        self._shards: dict[int, dict[str, int]] = {}

    def _load(self, shard: int) -> dict[str, int]:
        out: dict[str, int] = {}
        if self.num_shards == 1:
            files = [
                f for f in fsio.listdir(self._gt_dir) if f.endswith(".parquet")
            ]
        else:  # a shard is the union of its shard-NNNN* files
            prefix = f"shard-{shard:04d}"
            files = [
                f for f in fsio.listdir(self._gt_dir)
                if f.startswith(prefix) and f.endswith(".parquet")
                and not ".tmp-" in f
            ]
        for f in files:
            t = fsio.read_parquet(
                fsio.join(self._gt_dir, f), columns=["term", "df"]
            )
            out.update(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))
        return out

    def get(self, term: str, default: int = 0) -> int:
        shard = self._fnv(term) % self.num_shards if self.num_shards > 1 else 0
        d = self._shards.get(shard)
        if d is None:
            d = self._shards[shard] = self._load(shard)
        return d.get(term, default)

    @property
    def loaded_shards(self) -> int:
        return len(self._shards)


class IndexReader:
    """Read-side state for one index dir: collection stats, sharded
    global term df (for idf), lazily-opened segments.

    Per-actor memory is bounded independently of index size:
    - term df: only TOUCHED hash shards of global_terms are resident
      (_ShardedDf; ~vocab/num_shards rows each);
    - segments: at most ``max_open_segments`` Segment objects are open
      at once (LRU eviction — dictionary/doc arrays of evicted segments
      are dropped; reopening re-reads two small parquet files);
    - decoded postings: CACHE_POSTINGS_TOTAL budget split across the
      open-segment cap.
    """

    def __init__(self, index_dir: str, max_open_segments: int = 64,
                 stats_override: dict | None = None):
        self.index_dir = index_dir
        self.stats = read_collection_stats(index_dir)
        manifest = read_build_manifest(index_dir)
        self.analyzer_name = manifest["analyzer"]
        from .checkpoint import generations

        self.generations = generations(manifest)
        # federation (run_queries_federated): score THIS index with the
        # COMBINED collection's stats — num_docs / avg_doc_len plus a
        # df map for the query terms — so scores are comparable (and
        # exactly equal) to a merged-index run
        self._df_override: dict[str, int] | None = None
        if stats_override is not None:
            self.stats = dict(self.stats)
            self.stats["num_docs"] = stats_override["num_docs"]
            self.stats["avg_doc_len"] = stats_override["avg_doc_len"]
            self._df_override = dict(stats_override["df"])
        self.analyzer = analysis.get_analyzer(self.analyzer_name)
        self.num_docs = int(self.stats["num_docs"])
        self.avg_doc_len = float(self.stats["avg_doc_len"]) or 1.0
        self.global_df = _ShardedDf(index_dir)
        self.segment_paths = list_segments(index_dir)
        self._segments: dict[int, Segment] = {}  # insertion order = LRU
        # deleted docs (engine.maintenance): loaded once per reader;
        # small-by-assumption between compactions.  Per-segment
        # exclusion ordinals are computed lazily and cached (bounded by
        # segment count x tombstone size).
        from .maintenance import read_tombstones

        tomb = read_tombstones(index_dir)
        self.tombstones: "np.ndarray | None" = tomb if tomb.size else None
        self._tomb_ords: dict[int, "frozenset | None"] = {}
        self._max_open_segments = max(1, max_open_segments)
        # fuzzy-expansion memo: (segment path, base, d) -> [terms]
        self._fuzzy_cache: dict[tuple[str, str, int], list[str]] = {}
        # filtered-search exclusion memo: (segment path, lang) -> ords
        self._lang_excl_cache: dict[tuple[str, str], np.ndarray] = {}
        # decoded-postings cache budget, split across the OPEN-segment
        # bound (not total segment count); the floor keeps each open
        # segment's Zipf-head terms resident (below it the cache
        # thrashes and p99 degrades to cold-decode latency)
        self._seg_cache_max = max(
            262_144,
            CACHE_POSTINGS_TOTAL
            // max(1, min(len(self.segment_paths), self._max_open_segments)),
        )

    def segment(self, seg_id: int) -> Segment:
        seg = self._segments.get(seg_id)
        if seg is not None:
            # move to MRU position
            del self._segments[seg_id]
            self._segments[seg_id] = seg
            return seg
        while len(self._segments) >= self._max_open_segments:
            self._segments.pop(next(iter(self._segments)))
        seg = self._segments[seg_id] = Segment(self.segment_paths[seg_id])
        seg._dec_cache_max = self._seg_cache_max
        return seg

    def _df(self, term: str, default: int = 0) -> int:
        """Global df — from the federation override when present
        (authoritative: federated scoring must use COMBINED df), else
        this index's sharded table."""
        if self._df_override is not None:
            return self._df_override.get(term, default)
        return self.global_df.get(term, default)

    def qterms(self, text: str) -> list[tuple[str, float]]:
        """[(term, idf)] in analyzed order; out-of-vocabulary terms
        dropped (df=0 -> no postings anywhere)."""
        out = []
        for t in analyze_query(self.analyzer, text):
            df = self._df(t, 0)
            if df > 0:
                out.append((t, bm25.idf(df, self.num_docs)))
        return out

    def qterms_strict(self, text: str) -> list[tuple[str, float]] | None:
        """Like qterms, but any out-of-vocabulary term means the
        conjunctive/phrase query can match nothing -> None."""
        out = []
        for t in analyze_query(self.analyzer, text):
            df = self._df(t, 0)
            if df == 0:
                return None
            out.append((t, bm25.idf(df, self.num_docs)))
        return out

    def qterms_fields(
        self, text: str, boosts: dict
    ) -> list[tuple[str, float]]:
        """Multi-field weighted terms (BM25F-lite / Lucene
        MultiFieldQueryParser shape): per analyzed query term, its
        content posting weighted by ``boosts.get('content', 1.0)``,
        then each boosted field's namespaced posting («field»term —
        corpus.with_field_tokens) weighted by its boost, fields in
        sorted-name order (deterministic float-sum order).  The weight
        just scales the term's idf, so every scoring kernel (WAND
        bounds included — upper bounds scale linearly) runs unchanged.
        Per-field df/idf come from the namespaced dictionary entries;
        zero/negative boosts drop the field."""
        out: list[tuple[str, float]] = []
        wc = float(boosts.get("content", 1.0))
        fields = sorted(f for f in boosts if f != "content")
        # analyze_query already dedups preserving first occurrence —
        # same contract qterms/qterms_strict rely on.
        for t in analyze_query(self.analyzer, text):
            if wc > 0:
                df = self._df(t, 0)
                if df > 0:
                    out.append((t, bm25.idf(df, self.num_docs) * wc))
            for f in fields:
                w = float(boosts[f])
                if w <= 0:
                    continue
                ft = f"«{f}»{t}"
                df = self._df(ft, 0)
                if df > 0:
                    out.append((ft, bm25.idf(df, self.num_docs) * w))
        return out

    # -- dictionary term expansion (prefix / fuzzy query modes) --
    #
    # Expansion is PER SEGMENT against its sorted dictionary — never a
    # global vocabulary scan, so it distributes: each scorer expands
    # only over terms that can contribute in its own segment.  Exact
    # float equality with the single-process oracle holds because a
    # term absent from a segment contributes +0.0 at its qt position,
    # which cannot perturb the IEEE sum of the remaining terms.

    def _expand_prefix(self, seg: Segment, prefix: str) -> list[str]:
        """Index terms starting with ``prefix``, dictionary (sorted)
        order.  Terms with a common prefix are CONTIGUOUS in the sorted
        dictionary, so this is one bisect + an O(matches) scan."""
        import bisect

        terms = seg.terms
        lo = bisect.bisect_left(terms, prefix)
        out = []
        for i in range(lo, len(terms)):
            if not terms[i].startswith(prefix):
                break
            out.append(terms[i])
        return out

    def _expand_fuzzy(self, seg: Segment, base: str, d: int) -> list[str]:
        """Index terms within banded Levenshtein distance ``d`` of
        ``base``, dictionary order.  Length-window prefilter + banded
        early-exit distance; cached per (segment, base, d) on the
        reader (a query stream re-probes the same few bases)."""
        from .spell import _lev

        key = (seg.path, base, d)
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return hit
        lens = seg.term_lens()
        nb = len(base)
        cand = np.flatnonzero(np.abs(lens - nb) <= d)
        out = [
            seg.terms[i] for i in cand if _lev(seg.terms[int(i)], base, d) <= d
        ]
        if len(self._fuzzy_cache) >= 4096:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return out

    def _expand_regex(self, seg: Segment, pattern: str) -> list[str]:
        """Index terms FULLY matching ``pattern`` (index terms are
        lowercase — write patterns accordingly), dictionary order.
        One compiled-regex scan over the segment dictionary, cached per
        (segment, pattern) — the Lucene-automaton equivalent without a
        DFA intersection (the dictionary is the small side: |vocab| per
        segment, not |postings|)."""
        import re

        key = (seg.path, "\x00re:" + pattern, 0)
        hit = self._fuzzy_cache.get(key)
        if hit is not None:
            return hit
        rx = re.compile(pattern)
        out = [t for t in seg.terms if rx.fullmatch(t)]
        if len(self._fuzzy_cache) >= 4096:
            self._fuzzy_cache.clear()
        self._fuzzy_cache[key] = out
        return out

    def qterms_expanded(
        self, seg: Segment, text: str, kind: str
    ) -> list[tuple[str, float]]:
        """[(term, idf)] for prefix / fuzzy / regex queries: plain
        analyzed terms first (global-df gated, first-occurrence order —
        same as qterms), then per wildcard token in query order its
        segment expansion in dictionary order, deduped against
        everything already emitted.  idf always comes from the GLOBAL
        df, so every segment scores an expanded term identically.  For
        "regex" the WHOLE query text is one pattern (no plain terms)."""
        if self._df_override is not None:
            raise ValueError(
                "expansion modes (prefix/fuzzy/regex) are not supported "
                "under federated stats overrides: expanded terms need "
                "combined df the override map does not carry"
            )
        if kind == "prefix":
            plain_text, pats = analysis.split_wildcard(text)
            expand = lambda p: self._expand_prefix(seg, p)  # noqa: E731
        elif kind == "regex":
            plain_text, pats = "", [text.strip()]
            expand = lambda p: self._expand_regex(seg, p)  # noqa: E731
        else:
            plain_text, pats = analysis.split_fuzzy(text)
            expand = lambda p: self._expand_fuzzy(seg, p[0], p[1])  # noqa: E731
        seen: set[str] = set()
        out: list[tuple[str, float]] = []
        for t in analyze_query(self.analyzer, plain_text):
            if t in seen:
                continue
            seen.add(t)
            df = self.global_df.get(t, 0)
            if df > 0:
                out.append((t, bm25.idf(df, self.num_docs)))
        for pat in pats:
            for t in expand(pat):
                if t in seen:
                    continue
                seen.add(t)
                out.append(
                    (t, bm25.idf(self.global_df.get(t, 1), self.num_docs))
                )
        return out

    def _lang_exclude(self, seg: Segment, lang: str) -> np.ndarray:
        """Segment-local ordinals whose doc lang != ``lang`` (the
        exclude-array form wand.exhaustive_topk consumes), cached per
        (segment, lang) — bounded by open segments x langs queried."""
        key = (seg.path, lang)
        hit = self._lang_excl_cache.get(key)
        if hit is None:
            if len(self._lang_excl_cache) >= 256:
                self._lang_excl_cache.clear()
            hit = np.flatnonzero(seg.langs() != lang)
            self._lang_excl_cache[key] = hit
        return hit

    def qterms_tfidf(self, text: str) -> list[tuple[str, float]]:
        """[(term, idf^2)] for the classic TF-IDF scorer (analyzed
        first-occurrence order, OOV dropped)."""
        out = []
        for t in analyze_query(self.analyzer, text):
            df = self._df(t, 0)
            if df > 0:
                i = bm25.tfidf_idf(df, self.num_docs)
                out.append((t, i * i))
        return out

    def score_segment(
        self, seg_id: int, text: str, k: int, mode: str = "auto",
        match: str = "any", filter_lang: str | None = None,
        scorer: str = "bm25", slop: int = 2,
        after: "tuple[float, int] | None" = None,
        field_boosts: dict | None = None, msm: int = 2,
    ) -> list[tuple[int, float]]:
        """Per-(query, segment) top-k -> [(doc_id, score)] best-first.

        ``match``: "any" (disjunctive BM25), "all" (conjunctive — every
        term must occur, Q2), "phrase" (exact contiguous sequence over
        the positional index), "not" ('-term' tokens in the query text
        exclude docs containing that term; scoring is disjunctive over
        the unsigned terms — analysis.split_signed syntax), "prefix"
        ('term*' tokens expand to all index terms with that prefix —
        analysis.split_wildcard syntax), "fuzzy" ('term~' / 'term~2'
        tokens expand to index terms within Levenshtein distance 1 / 2
        — analysis.split_fuzzy syntax), "regex" (the whole query text
        is one pattern; docs scoring any fully-matching index term),
        "near" (proximity: every term present with minimal window span
        <= (m-1) + ``slop``, unordered — Lucene SpanNearQuery).
        Expanded modes score disjunctively; each expanded term keeps
        its own global idf.

        ``filter_lang``: restrict results to docs of one language
        (metadata-filtered search).  Supported for disjunctive queries
        only; the disallowed ordinals are excluded BEFORE the top-k cut
        inside the vectorized exhaustive scorer, so filtered ranks are
        exact (never an over-fetch heuristic).

        Tombstoned docs never appear in results: every mode over-fetches
        k + |tombstones in this segment| (at most that many of the head
        can be deleted, so >=k survivors remain when they exist) and
        filters before the cut — exact, and the scoring kernels stay
        untouched.
        """
        seg = self.segment(seg_id)
        tomb = self._seg_tombstones(seg_id, seg)
        if tomb:
            hits = self._score_segment_inner(
                seg, text, k + len(tomb), mode, match, filter_lang, scorer,
                slop, after, field_boosts, msm,
            )
            return [
                (int(seg.doc_ids[o]), s) for o, s in hits if o not in tomb
            ][:k]
        hits = self._score_segment_inner(
            seg, text, k, mode, match, filter_lang, scorer, slop, after,
            field_boosts, msm,
        )
        return [(int(seg.doc_ids[o]), s) for o, s in hits]

    def _seg_tombstones(self, seg_id: int, seg) -> "frozenset | None":
        if self.tombstones is None:
            return None
        if seg_id not in self._tomb_ords:
            ords = np.flatnonzero(np.isin(seg.doc_ids, self.tombstones))
            self._tomb_ords[seg_id] = frozenset(ords.tolist()) if ords.size else None
        return self._tomb_ords[seg_id]

    def _score_segment_inner(
        self, seg, text: str, k: int, mode: str, match: str,
        filter_lang: str | None = None, scorer: str = "bm25",
        slop: int = 2, after: "tuple[float, int] | None" = None,
        field_boosts: dict | None = None, msm: int = 2,
    ) -> list[tuple[int, float]]:
        if after is not None and (match != "any" or scorer != "bm25"):
            raise ValueError(
                "search_after pagination is supported for disjunctive "
                f"BM25 queries (match='any'), not match={match!r}/"
                f"scorer={scorer!r}"
            )
        if field_boosts is not None and (
            match != "any" or scorer != "bm25" or filter_lang is not None
        ):
            raise ValueError(
                "field_boosts is supported for disjunctive BM25 queries "
                f"(match='any', no filter_lang), not match={match!r}/"
                f"scorer={scorer!r}/filter_lang={filter_lang!r}"
            )
        if scorer == "tfidf":
            # pluggable scorer kernel (SS2.10): classic TF-IDF,
            # disjunctive only, vectorized exhaustive path
            if match != "any":
                raise ValueError(
                    f"scorer='tfidf' supports match='any', not {match!r}"
                )
            qt2 = self.qterms_tfidf(text)
            if not qt2:
                return []
            excl = (
                self._lang_exclude(seg, filter_lang)
                if filter_lang is not None else None
            )
            return wand.exhaustive_topk_tfidf(seg, qt2, k, exclude=excl)
        if scorer != "bm25":
            raise ValueError(f"unknown scorer {scorer!r}")
        if filter_lang is not None:
            if match != "any":
                raise ValueError(
                    "filter_lang is supported for disjunctive (match='any') "
                    f"queries, not match={match!r}"
                )
            qt = self.qterms(text)
            if not qt:
                return []
            return wand.exhaustive_topk(
                seg, qt, k, self.avg_doc_len,
                exclude=self._lang_exclude(seg, filter_lang),
                after=after,
            )
        if match == "bool":
            must_text, should_text, not_text = analysis.split_bool(text)
            must = analyze_query(self.analyzer, must_text)
            if any(self._df(t, 0) == 0 for t in must):
                return []  # an OOV MUST term can match nothing
            seen: set[str] = set()
            qt = []
            for t in must + analyze_query(self.analyzer, should_text):
                if t in seen:
                    continue
                seen.add(t)
                df = self._df(t, 0)
                if df > 0:
                    qt.append((t, bm25.idf(df, self.num_docs)))
            if not qt:
                return []
            neg = analyze_query(self.analyzer, not_text)
            hits = wand.bool_topk(
                seg, list(dict.fromkeys(must)), qt, neg, k, self.avg_doc_len
            )
        elif match == "not":
            pos_text, neg_text = analysis.split_signed(text)
            qt = self.qterms(pos_text)
            if not qt:
                return []
            neg = analyze_query(self.analyzer, neg_text)
            hits = wand.not_topk(seg, qt, neg, k, self.avg_doc_len)
        elif match == "all":
            qt = self.qterms_strict(text)
            if qt is None or not qt:
                return []
            hits = wand.conjunctive_topk(seg, qt, k, self.avg_doc_len)
        elif match == "phrase":
            qt = self.qterms_strict(text)
            if qt is None or not qt:
                return []
            seq = list(self.analyzer(text))
            hits = wand.phrase_topk(seg, seq, qt, k, self.avg_doc_len)
        elif match == "near":
            qt = self.qterms_strict(text)
            if qt is None or not qt:
                return []
            hits = wand.near_topk(
                seg, [t for t, _ in qt], qt, k, self.avg_doc_len, slop
            )
        elif match == "msm":
            # minimum_should_match (Lucene msm): disjunctive scoring,
            # candidates must match >= msm distinct query terms
            qt = self.qterms(text)
            if not qt:
                return []
            hits = wand.msm_topk(seg, qt, msm, k, self.avg_doc_len)
        elif match in ("prefix", "fuzzy", "regex"):
            qt = self.qterms_expanded(seg, text, match)
            if not qt:
                return []
            hits = wand.auto_topk(seg, qt, k, self.avg_doc_len)
        elif match == "any":
            qt = (
                self.qterms_fields(text, field_boosts)
                if field_boosts is not None
                else self.qterms(text)
            )
            if not qt:
                return []
            if after is not None:
                # pagination forces the exhaustive kernel: the cursor
                # filter must see final scores (WAND's theta pruning
                # assumes the heap holds the GLOBAL best-so-far, which
                # a cursor invalidates)
                hits = wand.exhaustive_topk(
                    seg, qt, k, self.avg_doc_len, after=after
                )
            elif mode == "auto":
                hits = wand.auto_topk(seg, qt, k, self.avg_doc_len)
            elif mode == "wand":
                hits = wand.wand_topk(seg, qt, k, self.avg_doc_len)
            elif mode == "exhaustive":
                hits = wand.exhaustive_topk(seg, qt, k, self.avg_doc_len)
            else:
                raise ValueError(f"unknown mode {mode!r}")
        else:
            raise ValueError(f"unknown match {match!r}")
        return hits

    def locate(self, doc_id: int) -> tuple[int, int] | None:
        """(seg_id, ordinal) of a doc — O(generations) point lookup:
        within each generation a doc can only live in segment
        ``gen_start + doc_id % gen_parts`` (the build's partitioning
        rule), so location is one searchsorted per generation, oldest
        first (matching D1's keep-first preference if a key was ever
        re-added without a delete)."""
        for g_start, g_parts in self.generations:
            seg_id = g_start + doc_id % g_parts
            if seg_id >= len(self.segment_paths):
                continue
            seg = self.segment(seg_id)
            o = int(np.searchsorted(seg.doc_ids, doc_id))
            if o < seg.num_docs and int(seg.doc_ids[o]) == doc_id:
                return seg_id, o
        return None

    def explain(self, text: str, doc_id: int) -> list[dict]:
        """Scoring transparency (Lucene Explanation): per query term
        present in the doc, its df / idf / tf and BM25 contribution;
        the contributions sum to the doc's score in analyzed-term
        order.  One point lookup + one postings probe per term."""
        loc = self.locate(doc_id)
        if loc is None:
            raise KeyError(f"doc_id {doc_id} not in index")
        seg = self.segment(loc[0])
        o = loc[1]
        dl = float(seg.doc_lens[o])
        out = []
        for t, idf in self.qterms(text):
            row = seg.term_idx.get(t)
            if row is None:
                continue
            ords, tfs = seg.decode_idx_cached(row)
            j = int(np.searchsorted(ords, o))
            if j >= len(ords) or int(ords[j]) != o:
                continue
            tf = float(tfs[j])
            out.append(
                {
                    "term": t,
                    "df": int(self.global_df.get(t, 0)),
                    "tf": int(tf),
                    "doc_len": int(dl),
                    "contrib": idf * bm25.tf_part(tf, dl, self.avg_doc_len),
                }
            )
        return out

    def more_like_this(self, doc_id: int, k: int = 10,
                       max_terms: int = 10) -> list[dict]:
        """Similar documents: BM25 with the source doc's top terms.

        Query terms = the doc's ``max_terms`` highest tf*idf terms
        (rarest-first tie-break, then term asc — deterministic), read
        from the segment FORWARD INDEX (fwd.parquet: one row-group
        point lookup) — O(|doc|), not O(|vocab|).  Legacy segments
        without fwd.parquet fall back to a vocabulary scan.  The source
        doc itself naturally ranks first and is excluded.
        """
        loc = self.locate(doc_id)
        if loc is None:
            raise KeyError(f"doc_id {doc_id} not in index")
        seg = self.segment(loc[0])
        o = loc[1]
        fwd = seg.fwd_terms(doc_id)
        cand = []
        if fwd is not None:
            for term, tf in zip(fwd[0], fwd[1]):
                df = self.global_df.get(term, 1)
                cand.append((-float(tf) * bm25.idf(df, self.num_docs), term))
        else:  # legacy segment: O(|vocab|) postings scan
            for term, row in seg.term_idx.items():
                ords, tfs = seg.decode_idx_cached(row)
                j = int(np.searchsorted(ords, o))
                if j < len(ords) and int(ords[j]) == o:
                    df = self.global_df.get(term, 1)
                    cand.append((-float(tfs[j]) * bm25.idf(df, self.num_docs), term))
        cand.sort()
        # score with the term list DIRECTLY (no analyzer round-trip —
        # index terms are already stemmed; re-analyzing could re-stem)
        qt = [
            (t, bm25.idf(self.global_df.get(t, 1), self.num_docs))
            for _, t in cand[:max_terms]
        ]
        pool: list[tuple[float, int, int]] = []
        for seg_id in range(len(self.segment_paths)):
            s = self.segment(seg_id)
            tomb = self._seg_tombstones(seg_id, s)
            kk = k + 1 + (len(tomb) if tomb else 0)
            for o2, score in wand.auto_topk(s, qt, kk, self.avg_doc_len):
                if tomb and o2 in tomb:
                    continue
                pool.append((score, int(s.doc_ids[o2]), seg_id))
        pool.sort(key=lambda c: (-c[0], c[1]))
        out = []
        for score, did, seg_id in pool:
            if did == doc_id:
                continue
            s = self.segment(seg_id)
            o2 = int(np.searchsorted(s.doc_ids, did))
            out.append(
                {
                    "rank": len(out) + 1,
                    "doc_id": did,
                    "score": score,
                    "repo": str(s.repo[o2]),
                    "path": str(s.dpath[o2]),
                }
            )
            if len(out) == k:
                break
        return out

    def score_segment_sorted(
        self, seg_id: int, text: str, k: int,
    ) -> list[tuple[int, float]]:
        """Per-segment top-k of MATCHING docs ordered by (repo, path,
        doc_id) ASC instead of score (Lucene sort-by-field): selection
        under any total order is segment-decomposable, so per-segment
        field-sorted top-k + a field-sorted merge is exact.  Scores are
        still computed (vectorized scatter) and reported."""
        seg = self.segment(seg_id)
        qt = self.qterms(text)
        if not qt:
            return []
        n = seg.num_docs
        if n == 0:
            return []
        scores = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        dl = seg.doc_lens
        for term, idf in qt:
            row = seg.term_idx.get(term)
            if row is None:
                continue
            ords, tfs = seg.decode_idx_cached(row)
            if ords.size == 0:
                continue
            tf = tfs.astype(np.float64)
            d = dl[ords]
            scores[ords] += idf * (
                (tf * (bm25.K1 + 1.0))
                / (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (d / self.avg_doc_len)))
            )
            touched[ords] = True
        tomb = self._seg_tombstones(seg_id, seg)
        if tomb:
            touched[np.asarray(sorted(tomb), dtype=np.int64)] = False
        cand = np.nonzero(touched)[0]
        if cand.size == 0:
            return []
        order = np.lexsort(
            (seg.doc_ids[cand], seg.dpath[cand], seg.repo[cand])
        )[:k]
        sel = cand[order]
        return [(int(seg.doc_ids[o]), float(scores[o])) for o in sel]

    def _collapse_field(self, seg: Segment, field: str) -> np.ndarray:
        if field == "repo":
            return seg.repo
        if field == "lang":
            return seg.langs()
        raise ValueError(f"unknown collapse field {field!r} (repo|lang)")

    def score_segment_collapsed(
        self, seg_id: int, text: str, k: int, field: str,
        mode: str = "auto", match: str = "any",
        filter_lang: str | None = None, scorer: str = "bm25",
    ) -> list[tuple[int, float, str]]:
        """Per-segment top-k with FIELD COLLAPSING (one best doc per
        field value) -> [(doc_id, score, field_value)] best-first.

        Exactness argument (the partial-collapse lemma): a field
        value's GLOBAL champion doc is its champion in its own segment
        too (scores are segment-independent), and if it ranks outside
        this segment's collapsed top-k then >= k field values beat it
        globally — so the global collapsed top-k is always a subset of
        the union of per-segment collapsed top-ks.  Candidates are
        gathered by doubling over-fetch until k distinct field values
        (or the segment's matches) are in hand."""
        seg = self.segment(seg_id)
        vals = self._collapse_field(seg, field)
        kk = k
        while True:
            hits = self.score_segment(
                seg_id, text, kk, mode, match, filter_lang, scorer
            )
            out: list[tuple[int, float, str]] = []
            seen: set[str] = set()
            for did, score in hits:
                o = int(np.searchsorted(seg.doc_ids, did))
                v = str(vals[o])
                if v in seen:
                    continue
                seen.add(v)
                out.append((did, score, v))
                if len(out) == k:
                    return out
            if len(hits) < kk:  # segment exhausted: fewer matches exist
                return out
            kk *= 4

    def search(self, text: str, k: int = 10, mode: str = "auto",
               match: str = "any", filter_lang: str | None = None,
               scorer: str = "bm25", collapse: str | None = None,
               slop: int = 2,
               after: "tuple[float, int] | None" = None,
               field_boosts: dict | None = None,
               msm: int = 2) -> list[dict]:
        """Single-process search across all segments (serving / latency
        benchmarks; same kernels as the distributed path).  ``collapse``
        ('repo' | 'lang'): return at most one doc — the best — per
        field value (Lucene field-collapsing semantics).

        ``after``: search-after pagination cursor (score, doc_id) of
        the previous page's LAST hit; the result is the next k docs in
        global rank order — page N+1 of an infinite scroll, exact (no
        over-fetch heuristics), deep-page cost independent of offset
        (each segment still returns at most k candidates)."""
        if after is not None and collapse is not None:
            # Matches _score_segment_inner's unsupported-combination
            # check: the collapse branch cannot honor the cursor, and
            # silently returning page 1 labeled page 2 is worse.
            raise ValueError(
                "search_after pagination is not supported with collapse"
            )
        if field_boosts is not None and collapse is not None:
            # The collapse branch routes through score_segment_collapsed,
            # which has no boost plumbing; silently returning unboosted
            # ranks labeled as boosted is worse than refusing.
            raise ValueError(
                "field_boosts is not supported with collapse"
            )
        if match == "msm" and collapse is not None:
            # score_segment_collapsed has no msm plumbing; the default
            # threshold would silently replace the caller's.
            raise ValueError(
                "match='msm' is not supported with collapse"
            )
        cand: list[tuple[float, int, int]] = []  # (score, doc_id, seg_id)
        if collapse is not None:
            by_val: dict[str, tuple[float, int, int]] = {}
            for seg_id in range(len(self.segment_paths)):
                for did, score, v in self.score_segment_collapsed(
                    seg_id, text, k, collapse, mode, match, filter_lang, scorer
                ):
                    best = by_val.get(v)
                    if best is None or (-score, did) < (-best[0], best[1]):
                        by_val[v] = (score, did, seg_id)
            cand = sorted(by_val.values(), key=lambda c: (-c[0], c[1]))
        else:
            for seg_id in range(len(self.segment_paths)):
                for doc_id, score in self.score_segment(
                    seg_id, text, k, mode, match, filter_lang, scorer, slop,
                    after, field_boosts, msm,
                ):
                    cand.append((score, doc_id, seg_id))
            cand.sort(key=lambda c: (-c[0], c[1]))
        out = []
        for rank, (score, doc_id, seg_id) in enumerate(cand[:k], 1):
            seg = self.segment(seg_id)
            o = int(np.searchsorted(seg.doc_ids, doc_id))
            out.append(
                {
                    "rank": rank,
                    "doc_id": doc_id,
                    "score": score,
                    "repo": str(seg.repo[o]),
                    "path": str(seg.dpath[o]),
                }
            )
        return out


class SegmentScorer:
    """A1: actor-pool map_batches stage.  __init__ loads index state
    once per actor; __call__ scores a batch of (query_id, text, k,
    seg_lo, seg_hi) segment-range work items and emits per-(query,
    segment) partial top-k rows."""

    def __init__(self, index_dir, mode: str = "auto", match: str = "any",
                 filter_lang: str | None = None, scorer: str = "bm25",
                 collapse: str | None = None, slop: int = 2,
                 sort_by_path: bool = False, stats_override: dict | None = None,
                 field_boosts: dict | None = None, msm: int = 2):
        # index_dir may be a LIST for federated scoring: work items then
        # carry an `index_id` selecting the reader, so N indexes score
        # through ONE actor pool / one Ray job instead of N sequential
        # pool spin-ups (VERDICT r03 task #4).
        if field_boosts is not None and (collapse is not None or sort_by_path):
            # Those branches score without boost plumbing; refuse at
            # construction rather than emit unboosted ranks silently.
            raise ValueError(
                "field_boosts is not supported with collapse or sort_by_path"
            )
        if match == "msm" and (collapse is not None or sort_by_path):
            # Those branches have no msm plumbing; the default threshold
            # would silently replace the caller's.
            raise ValueError(
                "match='msm' is not supported with collapse or sort_by_path"
            )
        dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
        self.readers = [
            IndexReader(d, stats_override=stats_override) for d in dirs
        ]
        self.reader = self.readers[0]
        self.mode = mode
        self.match = match
        self.filter_lang = filter_lang
        self.scorer = scorer
        self.collapse = collapse
        self.slop = slop
        self.sort_by_path = sort_by_path
        self.field_boosts = field_boosts
        self.msm = msm

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()  # few work items; inner loops dominate
        o_qid, o_k, o_did, o_score, o_repo, o_path = [], [], [], [], [], []
        o_ckey: list[str] = []
        for row in rows:
          rd = self.readers[int(row.get("index_id") or 0)]
          lo, hi = int(row["seg_lo"]), int(row["seg_hi"])
          qids = row["query_ids"]
          texts = row["texts"]
          ks = row["ks"]
          a_s = row.get("after_scores") or [None] * len(qids)
          a_d = row.get("after_docs") or [None] * len(qids)
          # SEGMENT-major: open each segment once for the whole block
          for seg_id in range(lo, hi):
           for qid, text, k, asc, adc in zip(qids, texts, ks, a_s, a_d):
            after = None if asc is None else (float(asc), int(adc))
            if after is not None and (self.sort_by_path or self.collapse):
                raise ValueError(
                    "search_after pagination is not supported with "
                    "collapse or sort_by_path"
                )
            seg = rd.segment(seg_id)
            if self.sort_by_path:
                hits3 = [
                    (did, score, None)
                    for did, score in rd.score_segment_sorted(seg_id, text, k)
                ]
            elif self.collapse is not None:
                hits3 = rd.score_segment_collapsed(
                    seg_id, text, k, self.collapse, self.mode, self.match,
                    self.filter_lang, self.scorer,
                )
            else:
                hits3 = [
                    (did, score, None)
                    for did, score in rd.score_segment(
                        seg_id, text, k, self.mode, self.match,
                        self.filter_lang, self.scorer, self.slop, after,
                        self.field_boosts, self.msm,
                    )
                ]
            for doc_id, score, ckey in hits3:
                o = int(np.searchsorted(seg.doc_ids, doc_id))
                o_qid.append(qid)
                o_k.append(k)
                o_did.append(doc_id)
                o_score.append(score)
                o_repo.append(str(seg.repo[o]))
                o_path.append(str(seg.dpath[o]))
                o_ckey.append("" if ckey is None else ckey)
        return pa.table(
            {
                "query_id": pa.array(o_qid, pa.int64()),
                "k": pa.array(o_k, pa.int32()),
                "doc_id": pa.array(o_did, pa.int64()),
                "score": pa.array(o_score, pa.float64()),
                "repo": pa.array(o_repo, pa.string()),
                "path": pa.array(o_path, pa.string()),
                "ckey": pa.array(o_ckey, pa.string()),
            }
        )


def merge_topk(group: pa.Table) -> pa.Table:
    """K3/K4: merge per-segment partials -> global top-k + rank.
    doc_ids are disjoint across segments (document partitioning), so
    this is pure selection by (score desc, doc_id asc)."""
    scores = group.column("score").to_numpy()
    doc_ids = group.column("doc_id").to_numpy()
    k = int(group.column("k")[0].as_py())
    order = np.lexsort((doc_ids, -scores))[:k]
    sel = group.take(pa.array(order, pa.int64()))
    n = sel.num_rows
    return pa.table(
        {
            "query_id": sel.column("query_id"),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int32), pa.int32()),
            "doc_id": sel.column("doc_id"),
            "score": sel.column("score"),
            "repo": sel.column("repo"),
            "path": sel.column("path"),
        }
    )


def merge_topk_bypath(group: pa.Table) -> pa.Table:
    """K3/K4 under field ordering: global top-k by (repo, path, doc_id)
    ASC across the per-segment field-sorted partials."""
    repo = np.asarray(group.column("repo").to_pylist(), dtype=object)
    path = np.asarray(group.column("path").to_pylist(), dtype=object)
    doc_ids = group.column("doc_id").to_numpy()
    k = int(group.column("k")[0].as_py())
    order = np.lexsort((doc_ids, path, repo))[:k]
    sel = group.take(pa.array(order, pa.int64()))
    n = sel.num_rows
    return pa.table(
        {
            "query_id": sel.column("query_id"),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int32), pa.int32()),
            "doc_id": sel.column("doc_id"),
            "score": sel.column("score"),
            "repo": sel.column("repo"),
            "path": sel.column("path"),
        }
    )


def merge_topk_collapsed(group: pa.Table) -> pa.Table:
    """K3/K4 with field collapsing: per field value keep the best
    (score desc, doc_id asc) row across segments, then rank the
    champions.  Exact by the partial-collapse lemma
    (IndexReader.score_segment_collapsed)."""
    scores = group.column("score").to_numpy()
    doc_ids = group.column("doc_id").to_numpy()
    ckeys = group.column("ckey").to_pylist()
    k = int(group.column("k")[0].as_py())
    order = np.lexsort((doc_ids, -scores))
    keep: list[int] = []
    seen: set[str] = set()
    for i in order:
        v = ckeys[i]
        if v in seen:
            continue
        seen.add(v)
        keep.append(int(i))
        if len(keep) == k:
            break
    sel = group.take(pa.array(keep, pa.int64()))
    n = sel.num_rows
    return pa.table(
        {
            "query_id": sel.column("query_id"),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int32), pa.int32()),
            "doc_id": sel.column("doc_id"),
            "score": sel.column("score"),
            "repo": sel.column("repo"),
            "path": sel.column("path"),
        }
    )


def run_queries(
    index_dir: str,
    queries,
    mode: str = "auto",
    match: str = "any",
    concurrency=(1, 16),
    batch_size: int = 64,
    filter_lang: str | None = None,
    scorer: str = "bm25",
    collapse: str | None = None,
    slop: int = 2,
    sort_by_path: bool = False,
    stats_override: dict | None = None,
    field_boosts: dict | None = None,
    msm: int = 2,
) -> "ray.data.Dataset":
    """Distributed query evaluation -> Dataset with RESULTS schema.

    ``queries``: list of {query_id, text, k} dicts or a Dataset with
    those columns.  Each query is crossed with SEGMENT RANGES
    (flat_map; ``segs_per_task`` segments per work item, so task count
    is queries x ceil(P / segs_per_task) instead of queries x P —
    at hundreds of segments the per-(query, segment) fan-out was pure
    scheduling overhead), scored by the actor pool, then merged per
    query_id.
    """
    n_segs = len(list_segments(index_dir))
    if n_segs == 0:
        raise ValueError(f"no segments under {index_dir}")
    n_queries_hint = kmax_hint = 0  # Dataset input -> unknown/unbounded
    if not isinstance(queries, ray.data.Dataset):
        qlist = [
            {
                "query_id": int(q["query_id"]),
                "text": q["text"],
                "k": int(q.get("k", 10)),
                # search-after pagination cursor (optional per query)
                "after_score": (
                    None if q.get("after") is None else float(q["after"][0])
                ),
                "after_doc": (
                    None if q.get("after") is None else int(q["after"][1])
                ),
            }
            for q in queries
        ]
        n_queries_hint = len(qlist)
        kmax_hint = max((q["k"] for q in qlist), default=0)
        queries = ray.data.from_items(qlist)

    segs_per_task = max(1, min(8, n_segs))
    ranges = [
        (lo, min(lo + segs_per_task, n_segs))
        for lo in range(0, n_segs, segs_per_task)
    ]

    if 0 < n_queries_hint <= 256:
        # RANGE-MAJOR work items: one item per segment range carrying
        # the whole bounded query block, so the scorer loops
        # segment-major and each segment is opened ONCE per item.  The
        # query-major shape opened each segment once PER QUERY — with
        # hundreds of segments and the reader's LRU-bounded open set,
        # reopen cost dominated deep-index latency (measured ~13 ms
        # per reopen at 15k docs/segment; a 625-segment index spent
        # seconds per query just reopening).
        items = [
            {
                "seg_lo": lo,
                "seg_hi": hi,
                "query_ids": [q["query_id"] for q in qlist],
                "texts": [q["text"] for q in qlist],
                "ks": [q["k"] for q in qlist],
                "after_scores": [q["after_score"] for q in qlist],
                "after_docs": [q["after_doc"] for q in qlist],
            }
            for lo, hi in ranges
        ]
        work = ray.data.from_items(items)
    else:
        # unbounded / large query streams: per-query rows (the block
        # embedding above would duplicate the query set per range)
        def cross(row: dict) -> list[dict]:
            return [
                {
                    "seg_lo": lo,
                    "seg_hi": hi,
                    "query_ids": [row["query_id"]],
                    "texts": [row["text"]],
                    "ks": [row["k"]],
                    "after_scores": [row.get("after_score")],
                    "after_docs": [row.get("after_doc")],
                }
                for lo, hi in ranges
            ]

        work = queries.flat_map(cross)

    scored = work.map_batches(
        SegmentScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir, "mode": mode, "match": match,
            "filter_lang": filter_lang, "scorer": scorer, "collapse": collapse,
            "slop": slop, "sort_by_path": sort_by_path,
            "stats_override": stats_override, "field_boosts": field_boosts,
            "msm": msm,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if sort_by_path:
        merge = merge_topk_bypath
    elif collapse is not None:
        merge = merge_topk_collapsed
    else:
        merge = merge_topk

    # K3 merge: the partials are k-sized per (query, segment-range) —
    # for a bounded query batch the whole partial set is
    # n_queries x ceil(P / segs_per_task) x k rows, and routing it
    # through a groupby all-to-all costs seconds of fixed shuffle
    # overhead (CLAUDE.md rule).  Small batches therefore merge
    # driver-side; unbounded/Dataset query streams keep the
    # distributed groupby merge.
    est_partial_rows = n_queries_hint * -(-n_segs // segs_per_task) * kmax_hint
    if 0 < est_partial_rows <= 500_000:
        # Arrow-native collect: stream the k-sized partial batches and
        # concat — no row-dict round-trip (VERDICT r03 task #5).
        parts = list(
            scored.iter_batches(batch_format="pyarrow", batch_size=65536)
        )
        t = (
            pa.concat_tables(parts).combine_chunks()
            if parts
            else None
        )
        if t is None or t.num_rows == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "rank": pa.array([], pa.int32()),
                        "doc_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                        "repo": pa.array([], pa.string()),
                        "path": pa.array([], pa.string()),
                    }
                )
            )
        qids = t.column("query_id").to_numpy()
        order = np.argsort(qids, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        qids = qids[order]
        bounds = np.concatenate(
            ([0], np.nonzero(np.diff(qids))[0] + 1, [len(qids)])
        )
        merged = [
            merge(t.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(bounds) - 1)
        ]
        return ray.data.from_arrow(pa.concat_tables(merged))
    return scored.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def latency_profile(
    index_dir: str, queries: list[dict], mode: str = "auto",
    min_executions: int = 1000, max_seconds: float = 60.0,
    match: str = "any", scorer: str = "bm25", slop: int = 2,
    max_open_segments: int | None = None,
) -> dict:
    """p50/p99 per-query latency on a WARM reader (BASELINE.md metric):
    repeats the query set until >= min_executions or ``max_seconds`` of
    measured wall time (whichever first — large synthetic corpora have
    multi-second per-query latencies where 200 executions would take
    many minutes for the same percentiles), single process, same
    kernels as the actor path.

    ``max_open_segments``: defaults to holding EVERY segment open —
    this is the warm profile; a single process scanning hundreds of
    segments through the serving default's LRU bound measures reopen
    I/O, not scoring (the distributed path amortizes opens via
    range-major work items instead)."""
    n_segs = len(list_segments(index_dir))
    rd = IndexReader(
        index_dir,
        max_open_segments=(
            max_open_segments if max_open_segments is not None
            else max(64, n_segs)
        ),
    )
    for q in queries:  # warm every segment + dictionary path
        rd.search(q["text"], int(q.get("k", 10)), mode, match, slop=slop,
                  scorer=scorer)
    lat: list[float] = []
    t_start = time.perf_counter()
    while len(lat) < min_executions and time.perf_counter() - t_start < max_seconds:
        for q in queries:
            t0 = time.perf_counter()
            rd.search(q["text"], int(q.get("k", 10)), mode, match, slop=slop,
                      scorer=scorer)
            lat.append(time.perf_counter() - t0)
    a = np.array(lat)
    return {
        "executions": int(a.size),
        "p50_ms": round(float(np.percentile(a, 50)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(a, 99)) * 1e3, 3),
        "mean_ms": round(float(a.mean()) * 1e3, 3),
        "qps_single_process": round(a.size / float(a.sum()), 1),
        "mode": mode,
        "match": match,
    }


def federated_stats(index_dirs: list[str], queries) -> dict:
    """Combined collection stats for federated scoring: summed
    num_docs / total_doc_len and, for the QUERY TERMS ONLY, summed df
    across every index (one sharded-table probe per term per index —
    never a vocabulary merge)."""
    from .checkpoint import read_build_manifest, read_collection_stats

    analyzers = {read_build_manifest(d)["analyzer"] for d in index_dirs}
    if len(analyzers) != 1:
        raise ValueError(f"federated indexes disagree on analyzer: {analyzers}")
    az = analysis.get_analyzer(analyzers.pop())
    terms: set[str] = set()
    for q in queries:
        for part in (q["text"],):
            # cover plain + signed/bool syntaxes; expansion modes are
            # rejected downstream (df map cannot carry expansions)
            m, s_, n_ = analysis.split_bool(part)
            for txt in (m, s_, n_):
                terms.update(analyze_query(az, txt))
    num_docs = 0
    total_len = 0
    df: dict[str, int] = {t: 0 for t in terms}
    for d in index_dirs:
        st = read_collection_stats(d)
        num_docs += int(st["num_docs"])
        total_len += int(st["total_doc_len"])
        sh = _ShardedDf(d)
        for t in terms:
            df[t] += sh.get(t, 0)
    return {
        "num_docs": num_docs,
        "avg_doc_len": (total_len / num_docs) if num_docs else 0.0,
        "df": df,
    }


def run_queries_federated(
    index_dirs: list[str],
    queries: list[dict],
    mode: str = "auto",
    match: str = "any",
    concurrency=(1, 16),
    slop: int = 2,
) -> pa.Table:
    """Federated search across N independently-built indexes,
    RANK-AND-SCORE IDENTICAL to searching one merged index: every
    index is scored with the COMBINED stats (federated_stats), making
    scores globally comparable, so the global top-k is a pure
    selection over the per-index top-ks (each index over-reports
    nothing: a doc in the global top-k is in its own index's top-k).
    The final merge handles queries x k x n_indexes rows on the
    driver.  Precondition: disjoint doc keys across indexes (same rule
    as merge_indexes' D1 collapse — a duplicated key would score in
    both).

    All indexes score through ONE Ray job / one actor pool: work items
    carry (index_id, segment range, query block) and SegmentScorer
    holds a reader per index — N indexes no longer pay N sequential
    actor-pool spin-ups (VERDICT r03 task #4).
    """
    ov = federated_stats(index_dirs, queries)
    qlist = [
        {
            "query_id": int(q["query_id"]),
            "text": q["text"],
            "k": int(q.get("k", 10)),
        }
        for q in queries
    ]
    seg_counts = []
    total_ranges = 0
    for d in index_dirs:
        n = len(list_segments(d))
        if n == 0:
            raise ValueError(f"no segments under {d}")
        seg_counts.append(n)
        total_ranges += -(-n // max(1, min(8, n)))
    kmax = max((q["k"] for q in qlist), default=0)
    if len(qlist) > 256 or len(qlist) * total_ranges * kmax > 500_000:
        # LARGE query sets: embedding the whole query block in every
        # range item would duplicate it total_ranges times and the raw
        # partial take_all would be unbounded — fall back to the
        # per-index path, which keeps run_queries' per-query work
        # items and distributed merge; each take_all here collects
        # only the MERGED queries x k rows per index.
        parts: list[dict] = []
        for d in index_dirs:
            parts.extend(
                run_queries(
                    d, queries, mode=mode, match=match,
                    concurrency=concurrency, slop=slop, stats_override=ov,
                ).take_all()
            )
        return _federated_merge(parts, qlist)
    items: list[dict] = []
    for idx, d in enumerate(index_dirs):
        n_segs = seg_counts[idx]
        segs_per_task = max(1, min(8, n_segs))
        for lo in range(0, n_segs, segs_per_task):
            items.append(
                {
                    "index_id": idx,
                    "seg_lo": lo,
                    "seg_hi": min(lo + segs_per_task, n_segs),
                    "query_ids": [q["query_id"] for q in qlist],
                    "texts": [q["text"] for q in qlist],
                    "ks": [q["k"] for q in qlist],
                    "after_scores": [None] * len(qlist),
                    "after_docs": [None] * len(qlist),
                }
            )
    scored = ray.data.from_items(items).map_batches(
        SegmentScorer,
        fn_constructor_kwargs={
            "index_dir": index_dirs, "mode": mode, "match": match,
            "slop": slop, "stats_override": ov,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
    parts = scored.take_all()
    return _federated_merge(parts, qlist)


def _federated_merge(parts: list[dict], qlist: list[dict]) -> pa.Table:
    """Global top-k selection over per-index candidate rows (partial
    top-ks or per-index merged top-ks — both are supersets of the
    global top-k by the disjoint-doc-keys lemma)."""
    by_q: dict[int, list[dict]] = {}
    for r in parts:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    kmap = {int(q["query_id"]): int(q["k"]) for q in qlist}
    out = []
    for qid in sorted(by_q):
        cand = sorted(by_q[qid], key=lambda r: (-r["score"], r["doc_id"]))
        for rank, r in enumerate(cand[: kmap.get(qid, 10)], 1):
            out.append(
                {
                    "query_id": qid,
                    "rank": rank,
                    "doc_id": int(r["doc_id"]),
                    "score": float(r["score"]),
                    "repo": r["repo"],
                    "path": r["path"],
                }
            )
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("doc_id", pa.int64()), ("score", pa.float64()),
             ("repo", pa.string()), ("path", pa.string())]
        ),
    )

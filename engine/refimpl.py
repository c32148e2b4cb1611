"""Single-process reference implementation (Q4 — exhaustive oracle).

Per SURVEY.md SS5.1: the reference mount was empty, so THIS module is the
reference engine for rank-identity (BASELINE.json:14).  It is a plain
dict-of-lists inverted index with exhaustive disjunctive scoring — no
Ray, no compression, no pruning — sharing ONLY ``engine.analysis`` and
``engine.bm25`` with the distributed engine.  The distributed WAND path
must reproduce its top-k doc_ids, order and float64 scores exactly.
"""

from __future__ import annotations

from collections import Counter

from . import analysis, bm25
from .ids import doc_id_of


class RefIndex:
    """In-memory index over corpus rows (dicts with repo/path/commit/
    lang/content).  Duplicate (repo,path,commit) keys keep the first
    occurrence by (doc_id, content_sha256) order — same D1 rule as the
    distributed build."""

    def __init__(self, rows, analyzer: str = "code"):
        self.analyzer_name = analyzer
        az = analysis.get_analyzer(analyzer)
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.positions: dict[tuple[str, int], list[int]] = {}
        self.doc_len: dict[int, int] = {}
        self.doc_meta: dict[int, dict] = {}
        import hashlib

        cand = []
        for row in rows:
            did = doc_id_of(row["repo"], row["path"], row["commit"])
            sha = hashlib.sha256(row["content"].encode()).hexdigest()
            cand.append((did, sha, row))
        # D1: deterministic dedup — keep first by (doc_id, sha) order
        cand.sort(key=lambda d: (d[0], d[1]))
        kept, prev = [], None
        for did, sha, row in cand:
            if did == prev:
                continue
            prev = did
            kept.append((did, row, sha))
        for did, row, sha in kept:
            toks = az(row["content"])
            self.doc_len[did] = len(toks)
            self.doc_meta[did] = {
                "repo": row["repo"],
                "path": row["path"],
                "commit": row["commit"],
                "lang": row["lang"],
                "content_sha256": sha,
            }
            tf = Counter(toks)
            pos: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                pos.setdefault(t, []).append(i)
            for t, c in tf.items():
                self.postings.setdefault(t, []).append((did, c))
                self.positions[(t, did)] = pos[t]
        for t in self.postings:
            self.postings[t].sort()
        self.num_docs = len(self.doc_len)
        self.total_doc_len = sum(self.doc_len.values())
        self.avg_doc_len = self.total_doc_len / self.num_docs if self.num_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def analyze_query(self, text: str) -> list[str]:
        """Dedupe analyzed terms preserving first occurrence (M8)."""
        az = analysis.get_analyzer(self.analyzer_name)
        seen, out = set(), []
        for t in az(text):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def topk(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive disjunctive BM25 top-k; ties broken doc_id asc.

        Scores are summed in analyzed-query-term order per doc — the
        exact float64 op order the distributed engine replicates
        (engine/bm25.py determinism contract).
        """
        terms = self.analyze_query(text)
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                contrib = idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
                scores[did] = scores.get(did, 0.0) + contrib
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_msm(self, text: str, k: int = 10, m: int = 2) -> list[tuple[int, float]]:
        """minimum_should_match: disjunctive BM25 (same float-sum order
        as topk), but only docs containing >= ``m`` distinct query
        terms are candidates (engine.wand.msm_topk)."""
        terms = self.analyze_query(text)
        scores: dict[int, float] = {}
        nmatch: dict[int, int] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                contrib = idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
                scores[did] = scores.get(did, 0.0) + contrib
                nmatch[did] = nmatch.get(did, 0) + 1
        mm = max(m, 1)
        ranked = sorted(
            ((d, s) for d, s in scores.items() if nmatch[d] >= mm),
            key=lambda x: (-x[1], x[0]),
        )
        return ranked[:k]

    def topk_fields(
        self, text: str, k: int = 10, boosts: dict | None = None
    ) -> list[tuple[int, float]]:
        """Multi-field weighted BM25 (engine.query.qterms_fields
        mirror): per analyzed term — content posting x
        boosts['content'] (default 1.0), then each boosted field's
        «field»term posting x its boost, fields in sorted-name order.
        Weight scales idf BEFORE the tf multiply (same float-op order
        as the engine's weighted TermIterator)."""
        boosts = boosts or {}
        wc = float(boosts.get("content", 1.0))
        fields = sorted(f for f in boosts if f != "content")
        weighted: list[tuple[str, float]] = []
        for t in self.analyze_query(text):
            if wc > 0 and self.postings.get(t):
                weighted.append(
                    (t, bm25.idf(len(self.postings[t]), self.num_docs) * wc)
                )
            for f in fields:
                w = float(boosts[f])
                ft = f"«{f}»{t}"
                if w > 0 and self.postings.get(ft):
                    weighted.append(
                        (ft, bm25.idf(len(self.postings[ft]), self.num_docs) * w)
                    )
        scores: dict[int, float] = {}
        for t, wt in weighted:
            for did, tf in self.postings[t]:
                scores[did] = scores.get(did, 0.0) + wt * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_tfidf(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Classic TF-IDF scorer (bm25.tfidf_idf/tfidf_part): score =
        sum of idf^2 * sqrt(tf)/sqrt(dl), analyzed-term order."""
        scores: dict[int, float] = {}
        for t in self.analyze_query(text):
            plist = self.postings.get(t)
            if not plist:
                continue
            i = bm25.tfidf_idf(len(plist), self.num_docs)
            idf2 = i * i
            for did, tf in plist:
                scores[did] = scores.get(did, 0.0) + idf2 * bm25.tfidf_part(
                    float(tf), float(self.doc_len[did])
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_lang(self, text: str, k: int = 10, lang: str = "") -> list[tuple[int, float]]:
        """Disjunctive BM25 restricted to docs of one language
        (metadata-filtered search); stats/idf stay collection-wide."""
        terms = self.analyze_query(text)
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                if self.doc_meta[did]["lang"] != lang:
                    continue
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_bypath(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Sort-by-field: matching docs (disjunctive) ordered by
        (repo, path, doc_id) ASC, scores still reported."""
        scores: dict[int, float] = {}
        for t in self.analyze_query(text):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(
            scores.items(),
            key=lambda x: (
                self.doc_meta[x[0]]["repo"], self.doc_meta[x[0]]["path"], x[0]
            ),
        )
        return ranked[:k]

    def topk_bool(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Lucene-BooleanQuery semantics ('+must should -not',
        analysis.split_bool syntax): docs contain every MUST term and
        no MUST_NOT term; score = disjunctive BM25 over must + should
        terms (analyzed first-occurrence order, present terms only)."""
        must_text, should_text, not_text = analysis.split_bool(text)
        must = self.analyze_query(must_text)
        if any(self.df(t) == 0 for t in must):
            return []
        banned: set[int] = set()
        for t in self.analyze_query(not_text):
            banned.update(did for did, _ in self.postings.get(t, ()))
        seen: set[str] = set()
        qt: list[str] = []
        for t in must + self.analyze_query(should_text):
            if t not in seen:
                seen.add(t)
                if self.df(t) > 0:
                    qt.append(t)
        if not qt:
            return []
        if must:
            docsets = [
                {did for did, _ in self.postings.get(t, ())}
                for t in dict.fromkeys(must)
            ]
            cand = set.intersection(*docsets) - banned
            scores: dict[int, float] = {d: 0.0 for d in cand}
            for t in qt:
                plist = self.postings.get(t, ())
                idf_t = bm25.idf(len(plist), self.num_docs) if plist else 0.0
                for did, tf in plist:
                    if did in scores:
                        scores[did] += idf_t * bm25.tf_part(
                            float(tf), float(self.doc_len[did]), self.avg_doc_len
                        )
            ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
            return ranked[:k]
        scores = {}
        for t in qt:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                if did in banned:
                    continue
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_collapse(self, text: str, k: int = 10,
                      field: str = "repo") -> list[tuple[int, float]]:
        """Field collapsing: full disjunctive ranking, then keep only
        the first (best) doc per ``field`` value, cut to k."""
        terms = self.analyze_query(text)
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        out, seen = [], set()
        for did, s in ranked:
            v = self.doc_meta[did][field]
            if v in seen:
                continue
            seen.add(v)
            out.append((did, s))
            if len(out) == k:
                break
        return out

    def topk_not(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Boolean NOT: '-term' tokens exclude every doc containing
        that term; scoring is disjunctive BM25 over the unsigned terms
        in analyzed order (engine.analysis.split_signed syntax)."""
        pos_text, neg_text = analysis.split_signed(text)
        banned: set[int] = set()
        for t in self.analyze_query(neg_text):
            banned.update(did for did, _ in self.postings.get(t, ()))
        scores: dict[int, float] = {}
        for t in self.analyze_query(pos_text):
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                if did in banned:
                    continue
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def _vocab_sorted(self) -> list[str]:
        if not hasattr(self, "_vocab_cache"):
            self._vocab_cache = sorted(self.postings)
        return self._vocab_cache

    def _topk_expanded(self, text: str, k: int, kind: str) -> list[tuple[int, float]]:
        """Shared prefix/fuzzy scorer: qt = plain analyzed terms
        (first-occurrence order, df>0), then per wildcard token in
        query order its vocabulary expansion in sorted order, deduped —
        the exact qt rule engine.query.IndexReader.qterms_expanded
        applies per segment (absent terms add +0.0 there, so float
        sums agree exactly)."""
        if kind == "prefix":
            plain_text, pats = analysis.split_wildcard(text)
        elif kind == "regex":
            plain_text, pats = "", [text.strip()]
        else:
            plain_text, pats = analysis.split_fuzzy(text)
        seen: set[str] = set()
        qt: list[str] = []
        for t in self.analyze_query(plain_text):
            if t not in seen:
                seen.add(t)
                if self.df(t) > 0:
                    qt.append(t)
        vocab = self._vocab_sorted()
        for pat in pats:
            if kind == "prefix":
                import bisect

                lo = bisect.bisect_left(vocab, pat)
                exp = []
                for i in range(lo, len(vocab)):
                    if not vocab[i].startswith(pat):
                        break
                    exp.append(vocab[i])
            elif kind == "regex":
                import re

                rx = re.compile(pat)
                exp = [t for t in vocab if rx.fullmatch(t)]
            else:
                from .spell import _lev

                base, d = pat
                exp = [t for t in vocab if _lev(t, base, d) <= d]
            for t in exp:
                if t not in seen:
                    seen.add(t)
                    qt.append(t)
        scores: dict[int, float] = {}
        for t in qt:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = bm25.idf(len(plist), self.num_docs)
            for did, tf in plist:
                scores[did] = scores.get(did, 0.0) + idf_t * bm25.tf_part(
                    float(tf), float(self.doc_len[did]), self.avg_doc_len
                )
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def topk_prefix(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Prefix wildcards: 'term*' expands to every vocabulary term
        with that prefix (split_wildcard syntax), disjunctive BM25."""
        return self._topk_expanded(text, k, "prefix")

    def topk_fuzzy(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Fuzzy terms: 'term~' / 'term~2' expand to vocabulary terms
        within Levenshtein distance 1 / 2 (split_fuzzy syntax)."""
        return self._topk_expanded(text, k, "fuzzy")

    def topk_regex(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Regex term query: the whole text is one pattern; disjunctive
        BM25 over every fully-matching vocabulary term."""
        return self._topk_expanded(text, k, "regex")

    def _score_docs(self, terms: list[str], docs: set[int]) -> list[tuple[int, float]]:
        """BM25-score the given docs over ``terms`` (analyzed order)."""
        scores = {d: 0.0 for d in docs}
        for t in terms:
            plist = self.postings.get(t, ())
            idf_t = bm25.idf(len(plist), self.num_docs) if plist else 0.0
            for did, tf in plist:
                if did in scores:
                    scores[did] += idf_t * bm25.tf_part(
                        float(tf), float(self.doc_len[did]), self.avg_doc_len
                    )
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))

    def topk_and(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Conjunctive (AND) BM25 top-k: only docs containing EVERY
        analyzed query term; empty query -> no results."""
        terms = self.analyze_query(text)
        if not terms:
            return []
        docsets = []
        for t in terms:
            docsets.append({did for did, _ in self.postings.get(t, ())})
        cand = set.intersection(*docsets) if docsets else set()
        return self._score_docs(terms, cand)[:k]

    def topk_near(self, text: str, k: int = 10, slop: int = 2) -> list[tuple[int, float]]:
        """Proximity (unordered sloppy) top-k: every distinct analyzed
        term occurs and the minimal window span over one position per
        term is <= (m-1) + slop; matches BM25-scored over the distinct
        terms (wand.near_topk mirror)."""
        terms = self.analyze_query(text)
        if not terms:
            return []
        docsets = [
            {did for did, _ in self.postings.get(t, ())} for t in terms
        ]
        cand = set.intersection(*docsets) if docsets else set()
        limit = (len(terms) - 1) + slop
        hits = set()
        for did in cand:
            poss = [sorted(self.positions[(t, did)]) for t in terms]
            idx = [0] * len(poss)
            cur = [p[0] for p in poss]
            best = max(cur) - min(cur)
            while best > 0:
                i = min(range(len(cur)), key=lambda j: cur[j])
                idx[i] += 1
                if idx[i] >= len(poss[i]):
                    break
                cur[i] = poss[i][idx[i]]
                best = min(best, max(cur) - min(cur))
            if best <= limit:
                hits.add(did)
        return self._score_docs(terms, hits)[:k]

    def topk_phrase(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact phrase top-k: the analyzed token SEQUENCE (duplicates
        kept, order kept) must occur contiguously; matches are
        BM25-scored over the phrase's distinct terms."""
        az = analysis.get_analyzer(self.analyzer_name)
        seq = az(text)
        if not seq:
            return []
        docsets = [
            {did for did, _ in self.postings.get(t, ())} for t in set(seq)
        ]
        cand = set.intersection(*docsets) if docsets else set()
        hits = set()
        for did in cand:
            starts = set(self.positions.get((seq[0], did), ()))
            for i, t in enumerate(seq[1:], 1):
                nxt = {p - i for p in self.positions.get((t, did), ())}
                starts &= nxt
                if not starts:
                    break
            if starts:
                hits.add(did)
        terms = self.analyze_query(text)  # distinct, first-occurrence order
        return self._score_docs(terms, hits)[:k]


def table_rows(table) -> list[dict]:
    """pyarrow.Table -> list of row dicts (test helper)."""
    return table.to_pylist()

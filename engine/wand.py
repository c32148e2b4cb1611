"""Query evaluation kernels (Q1-Q4): posting iterators, DAAT, block-max
WAND, exhaustive scoring.

Spec: BASELINE.json:6 — "document-at-a-time posting-list intersection
with block-max WAND pruning and a bounded top-k heap".  Algorithms per
[LIT-WAND] Broder et al. 2003 and [LIT-BMW] Ding & Suel 2011; both
paths return EXACT top-k (safe pruning) and must be rank-identical to
engine.refimpl (tests/test_rank_identity.py, property-tested in
tests/test_wand.py).

Determinism contract (engine/bm25.py): when a candidate document is
fully evaluated, per-term contributions are summed in ANALYZED-QUERY-
TERM ORDER — never in the WAND sorted-by-current-doc order — so float64
scores are bit-identical to the oracle's.

Tie-break everywhere: score desc, then doc_id asc.  Pruning uses
``sum(upper_bounds) >= theta`` (not >) so exact-tie candidates are
always evaluated; upper bounds are inflated by one part in 2^40
(bm25.UB_EPS) against float rounding.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import bm25
from .schema import POSTINGS_BLOCK
from .segments import Segment

DONE = 1 << 62


class TermIterator:
    """Q1: lazy block-decoding cursor over one term's posting list.

    ``advance(target)`` uses the per-block last-ordinal table (the skip
    pointers) to jump whole blocks without decoding them; only the
    landing block is varbyte-decoded.
    """

    __slots__ = (
        "seg", "row", "idf", "max_ub", "blk_last", "blk_max_tf",
        "n", "nblocks", "cur_blk", "blk_ords", "blk_tfs", "pos", "cur",
    )

    def __init__(self, seg: Segment, row: int, idf: float, avg_doc_len: float):
        self.seg = seg
        self.row = row
        self.idf = idf
        self.blk_last = seg.blk_last[row]
        self.blk_max_tf = seg.blk_max_tf[row]
        self.n = int(seg.n_postings[row])
        self.nblocks = len(self.blk_last)
        # term-level upper bound: max tf over the list, min doc_len in segment
        self.max_ub = bm25.upper_bound(
            float(seg.max_tf[row]), seg.min_doc_len, idf, avg_doc_len
        )
        self.cur_blk = -1
        self.blk_ords: np.ndarray | None = None
        self.blk_tfs: np.ndarray | None = None
        self.pos = 0
        self.cur = DONE
        self._load(0)

    def _load(self, blk: int) -> None:
        if blk >= self.nblocks:
            self.cur = DONE
            return
        self.blk_ords, self.blk_tfs = self.seg.decode_block(self.row, blk)
        self.cur_blk = blk
        self.pos = 0
        self.cur = int(self.blk_ords[0])

    def block_ub(self, avg_doc_len: float) -> float:
        """Block-max upper bound for the CURRENT block ([LIT-BMW])."""
        return bm25.upper_bound(
            float(self.blk_max_tf[self.cur_blk]), self.seg.min_doc_len,
            self.idf, avg_doc_len,
        )

    def block_last(self) -> int:
        return int(self.blk_last[self.cur_blk]) if self.cur_blk < self.nblocks else DONE

    def tf(self) -> int:
        return int(self.blk_tfs[self.pos])

    def next(self) -> int:
        if self.cur == DONE:
            return DONE
        p = self.pos + 1
        if self.blk_ords is not None and p < len(self.blk_ords):
            self.pos = p
            self.cur = int(self.blk_ords[p])
        else:
            self._load(self.cur_blk + 1)
        return self.cur

    def advance(self, target: int) -> int:
        """Skip to the first posting with ordinal >= target."""
        if self.cur >= target:
            return self.cur
        if target > int(self.blk_last[self.cur_blk]):
            blk = self.cur_blk + int(
                np.searchsorted(self.blk_last[self.cur_blk:], target, side="left")
            )
            if blk >= self.nblocks:
                self.cur = DONE
                return DONE
            self._load(blk)
            if self.cur >= target:
                return self.cur
        p = int(np.searchsorted(self.blk_ords, target, side="left"))
        if p >= len(self.blk_ords):  # unreachable: blk_last >= target
            self._load(self.cur_blk + 1)
            return self.cur
        self.pos = p
        self.cur = int(self.blk_ords[p])
        return self.cur


class TopK:
    """K2: bounded top-k heap; order = (score desc, doc_id asc).

    heapq min-heap over (score, -doc_id): the root is the CURRENT
    WORST qualifying entry; a candidate qualifies iff
    (score, -doc_id) > root."""

    __slots__ = ("k", "heap")

    def __init__(self, k: int):
        self.k = k
        self.heap: list[tuple[float, int]] = []

    def theta(self) -> float:
        return self.heap[0][0] if len(self.heap) >= self.k else -1.0

    def offer(self, score: float, doc_id: int) -> None:
        item = (score, -doc_id)
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, item)
        elif item > self.heap[0]:
            heapq.heapreplace(self.heap, item)

    def ranked(self) -> list[tuple[int, float]]:
        """[(doc_id, score)] best-first."""
        return [(-nd, s) for s, nd in sorted(self.heap, reverse=True)]


def _evaluate(iters_in_qorder: list[TermIterator], d: int, doc_len: float,
              avg_doc_len: float) -> float:
    """Full evaluation of candidate d: sum in analyzed-query-term order."""
    score = 0.0
    for it in iters_in_qorder:
        if it.cur < d:
            it.advance(d)
        if it.cur == d:
            score += it.idf * bm25.tf_part(float(it.tf()), doc_len, avg_doc_len)
    return score


def wand_topk(seg: Segment, qterms: list[tuple[str, float]], k: int,
              avg_doc_len: float) -> list[tuple[int, float]]:
    """Q3: block-max WAND over one segment.

    qterms = [(term, idf)] in analyzed-query order (duplicates removed).
    Returns [(local ordinal, score)] best-first, exact.
    """
    iters_q: list[TermIterator] = []
    for term, idf in qterms:
        row = seg.term_idx.get(term)
        if row is not None and seg.n_postings[row] > 0:
            iters_q.append(TermIterator(seg, row, idf, avg_doc_len))
    if not iters_q:
        return []
    topk = TopK(k)
    live = list(iters_q)
    while True:
        live = [it for it in live if it.cur != DONE]
        if not live:
            break
        live.sort(key=lambda it: it.cur)
        # pivot: first prefix whose term-level UB sum can beat theta
        theta = topk.theta()
        acc = 0.0
        pivot = -1
        for i, it in enumerate(live):
            acc += it.max_ub
            if acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # no prefix can qualify -> done
        d = live[pivot].cur
        if live[0].cur == d:
            # block-max refinement: tighter per-block bound at d
            bacc = 0.0
            for it in live:
                if it.cur > d:
                    break
                # it.cur <= d and it.blk_last >= it.cur; ensure block holds d
                if it.block_last() < d:
                    it.advance(d)
                    if it.cur == DONE or it.cur > d:
                        continue
                bacc += it.block_ub(avg_doc_len)
            if bacc >= theta:
                score = _evaluate(iters_q, d, float(seg.doc_lens[d]), avg_doc_len)
                topk.offer(score, int(seg.doc_ids[d]))
            for it in live:
                if it.cur == d:
                    it.next()
        else:
            # advance an iterator that is strictly BEFORE d (one must
            # exist: live[0].cur != d); picking one already at d would
            # no-op and livelock.  Among those, pick the largest UB
            # (moves the most pruning power forward, [LIT-WAND]).
            best = max(
                (i for i in range(pivot) if live[i].cur < d),
                key=lambda i: live[i].max_ub,
            )
            live[best].advance(d)
    # map doc_id-ranked heap back to ordinals for the caller
    out = []
    for doc_id, score in topk.ranked():
        out.append((int(np.searchsorted(seg.doc_ids, doc_id)), score))
    return out


def _intersect_sorted(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Intersection of two SORTED UNIQUE int arrays via searchsorted
    membership — O(|small| log |big|), no concat+sort
    (np.intersect1d re-sorts both); order preserved."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0 or len(b) == 0:
        return np.zeros(0, a.dtype)
    j = np.searchsorted(b, a)
    j[j == len(b)] = len(b) - 1
    return a[b[j] == a]


def conjunctive_topk(seg: Segment, qterms: list[tuple[str, float]], k: int,
                     avg_doc_len: float) -> list[tuple[int, float]]:
    """Q2: conjunctive (AND) intersection + BM25 top-k over one segment.

    Candidate set = intersection of the query terms' posting lists
    (sorted-membership ``_intersect_sorted`` over ordinal arrays — the
    DAAT-with-skips iterator (Q1/TermIterator.advance) covers the same
    semantics; the vectorized form is faster in CPython).  Every query
    term must be present in the segment, else no candidates.  Scoring
    sums per-term contributions in analyzed-query order (determinism
    contract), so results are rank-identical to refimpl.topk_and.
    """
    if not qterms:
        return []
    decoded = []
    for term, idf in qterms:
        row = seg.term_idx.get(term)
        if row is None or seg.n_postings[row] == 0:
            return []
        ords, tfs = seg.decode_idx_cached(row)
        decoded.append((ords, tfs, idf))
    cand = decoded[0][0]
    for ords, _, _ in decoded[1:]:
        cand = _intersect_sorted(cand, ords)
        if cand.size == 0:
            return []
    dl = seg.doc_lens[cand]
    scores = np.zeros(cand.size, dtype=np.float64)
    for ords, tfs, idf in decoded:
        sel = np.searchsorted(ords, cand)
        tf = tfs[sel].astype(np.float64)
        scores += idf * ((tf * (bm25.K1 + 1.0)) /
                         (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (dl / avg_doc_len))))
    order = np.lexsort((seg.doc_ids[cand], -scores))[:k]
    sel = cand[order]
    return [(int(o), float(s)) for o, s in zip(sel, scores[order])]


def phrase_topk(seg: Segment, seq: list[str], qterms: list[tuple[str, float]],
                k: int, avg_doc_len: float) -> list[tuple[int, float]]:
    """Exact-phrase top-k over one segment: the analyzed token sequence
    ``seq`` must occur contiguously (positional verification over the
    positions stream); matches are BM25-scored over ``qterms`` exactly
    like conjunctive_topk (rank-identical to refimpl.topk_phrase)."""
    if not seq or not qterms:
        return []
    # candidate docs: conjunctive intersection over DISTINCT seq terms
    distinct = list(dict.fromkeys(seq))
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term in distinct:
        row = seg.term_idx.get(term)
        if row is None or seg.n_postings[row] == 0:
            return []
        decoded[term] = seg.decode_idx_cached(row)
    cand = decoded[distinct[0]][0]
    for term in distinct[1:]:
        cand = _intersect_sorted(cand, decoded[term][0])
        if cand.size == 0:
            return []
    # positional verification — VECTORIZED across all candidate docs:
    # anchor positions of seq[0] (offset by candidate-rank * 2^32) are
    # contiguity-checked by sorted-membership of anchor+i in seq[i]'s
    # offset position array; anchor+i never collides across docs
    # (offsets differ by 2^32 >> doc_len + |seq|).
    cats: dict[str, np.ndarray] = {}
    for t in distinct:
        pos, tfs = seg.decode_positions_flat(t)
        ords = decoded[t][0]
        sel = np.searchsorted(ords, cand)  # cand ⊆ ords
        lens = tfs[sel]
        starts = (np.cumsum(tfs) - tfs)[sel]
        total = int(lens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        idx = np.repeat(starts, lens) + within
        cats[t] = pos[idx] + np.repeat(
            np.arange(cand.size, dtype=np.int64) * _NEAR_BIG, lens
        )
    anchors = cats[seq[0]]
    ok = np.ones(anchors.size, dtype=bool)
    for i, t in enumerate(seq[1:], 1):
        cat = cats[t]
        if len(cat) == 0:  # unreachable post-intersection; stay safe
            return []
        want = anchors + i
        j = np.searchsorted(cat, want)
        jc = np.minimum(j, len(cat) - 1)
        ok &= cat[jc] == want
        if not ok.any():
            return []
    ranks = np.unique(anchors[ok] >> 32)
    if ranks.size == 0:
        return []
    cand = cand[ranks]
    dl = seg.doc_lens[cand]
    scores = np.zeros(cand.size, dtype=np.float64)
    for term, idf in qterms:
        ords, tfs = decoded[term]
        sel = np.searchsorted(ords, cand)
        tf = tfs[sel].astype(np.float64)
        scores += idf * ((tf * (bm25.K1 + 1.0)) /
                         (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (dl / avg_doc_len))))
    order = np.lexsort((seg.doc_ids[cand], -scores))[:k]
    sel = cand[order]
    return [(int(o), float(s)) for o, s in zip(sel, scores[order])]


AUTO_EXHAUSTIVE_FRAC = 0.02  # Σ local df / num_docs above which pruning can't win


def not_topk(seg: Segment, qterms: list[tuple[str, float]],
             neg_terms: list[str], k: int,
             avg_doc_len: float) -> list[tuple[int, float]]:
    """Disjunctive BM25 over ``qterms`` excluding every doc containing
    ANY of ``neg_terms`` (boolean NOT).  The exclusion set is the union
    of the negative terms' posting offsets, applied before the top-k
    cut.  Policy: always the vectorized exhaustive path — negation
    typically strikes Zipf-head terms, exactly where WAND loses (see
    auto_topk's rationale)."""
    excl = []
    for t in neg_terms:
        row = seg.term_idx.get(t)
        if row is not None:
            ords, _ = seg.decode_idx_cached(row)
            if ords.size:
                excl.append(ords)
    ex = np.unique(np.concatenate(excl)) if excl else None
    return exhaustive_topk(seg, qterms, k, avg_doc_len, exclude=ex)


def auto_topk(seg: Segment, qterms: list[tuple[str, float]], k: int,
              avg_doc_len: float) -> list[tuple[int, float]]:
    """Adaptive scoring policy: block-max WAND prunes per-posting in
    interpreted Python (~µs/step), the exhaustive path scores
    vectorized (~tens of ns/posting).  WAND therefore only wins when
    the query is SELECTIVE (it can skip almost everything); on
    Zipf-head terms ('data', 'def', 'import' ... present in most docs)
    vectorized term-at-a-time is 10-40x faster.  Both are exact, so the
    choice is pure performance policy."""
    total_df = 0
    for term, _ in qterms:
        row = seg.term_idx.get(term)
        if row is not None:
            total_df += int(seg.df[row])
    if seg.num_docs and total_df / seg.num_docs >= AUTO_EXHAUSTIVE_FRAC:
        return exhaustive_topk(seg, qterms, k, avg_doc_len)
    return wand_topk(seg, qterms, k, avg_doc_len)


def exhaustive_topk(seg: Segment, qterms: list[tuple[str, float]], k: int,
                    avg_doc_len: float,
                    exclude: "np.ndarray | None" = None,
                    after: "tuple[float, int] | None" = None,
                    ) -> list[tuple[int, float]]:
    """Q4 in-segment: vectorized disjunctive scoring of every matching
    doc; numpy elementwise ops mirror bm25.tf_part's scalar op order
    exactly, and per-doc accumulation happens in query-term order, so
    scores are bit-identical to the scalar paths.

    ``exclude``: doc OFFSETS (segment-local) to drop from candidacy
    BEFORE the top-k cut (boolean NOT support), so ranks stay exact.

    ``after``: search-after pagination cursor (score, GLOBAL doc_id) —
    only docs strictly AFTER the cursor in (score desc, doc_id asc)
    rank order remain candidates, so page N+1 continues exactly where
    page N stopped.  Scores are deterministic float64, so the equality
    comparison at the cursor's score is exact."""
    n = seg.num_docs
    if n == 0:
        return []
    scores = np.zeros(n, dtype=np.float64)
    touched = np.zeros(n, dtype=bool)
    dl = seg.doc_lens
    for term, idf in qterms:
        row = seg.term_idx.get(term)
        if row is None:
            continue
        ords, tfs = seg.decode_idx_cached(row)
        if ords.size == 0:
            continue
        tf = tfs.astype(np.float64)
        d = dl[ords]
        contrib = idf * ((tf * (bm25.K1 + 1.0)) /
                         (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (d / avg_doc_len))))
        scores[ords] += contrib
        touched[ords] = True
    if exclude is not None and exclude.size:
        touched[exclude] = False
    cand = np.nonzero(touched)[0]
    if cand.size == 0:
        return []
    sc = scores[cand]
    if after is not None:
        s_a, d_a = float(after[0]), int(after[1])
        gids = seg.doc_ids[cand]
        keep = (sc < s_a) | ((sc == s_a) & (gids > d_a))
        cand = cand[keep]
        sc = sc[keep]
        if cand.size == 0:
            return []
    if k > 0 and cand.size > 4 * k:
        # exact pre-selection: keep every candidate scoring >= the k-th
        # largest (ties INCLUDED, so the doc_id tie-break below still
        # sees all of them), then sort only that small set
        kth = np.partition(sc, cand.size - k)[cand.size - k]
        keep = sc >= kth
        cand = cand[keep]
        sc = sc[keep]
    order = np.lexsort((seg.doc_ids[cand], -sc))[:k]
    sel = cand[order]
    return [(int(o), float(scores[o])) for o in sel]


def msm_topk(seg: Segment, qterms: list[tuple[str, float]], m: int, k: int,
             avg_doc_len: float) -> list[tuple[int, float]]:
    """minimum_should_match (Lucene msm): disjunctive BM25 scoring,
    but only docs matching >= ``m`` DISTINCT query terms are
    candidates.  Same vectorized accumulation (and the same
    query-term-order float determinism) as exhaustive_topk, plus an
    int32 per-doc match counter; ``qterms`` is deduped by
    construction, so the counter counts distinct matched terms —
    exactly the oracle's count(DISTINCT q.term).  m <= 1 degenerates
    to disjunctive; m == len(qterms) to the conjunctive candidate
    set."""
    n = seg.num_docs
    if n == 0:
        return []
    scores = np.zeros(n, dtype=np.float64)
    nmatch = np.zeros(n, dtype=np.int32)
    dl = seg.doc_lens
    for term, idf in qterms:
        row = seg.term_idx.get(term)
        if row is None:
            continue
        ords, tfs = seg.decode_idx_cached(row)
        if ords.size == 0:
            continue
        tf = tfs.astype(np.float64)
        d = dl[ords]
        contrib = idf * ((tf * (bm25.K1 + 1.0)) /
                         (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (d / avg_doc_len))))
        scores[ords] += contrib
        nmatch[ords] += 1
    cand = np.nonzero(nmatch >= max(m, 1))[0]
    if cand.size == 0:
        return []
    sc = scores[cand]
    if k > 0 and cand.size > 4 * k:
        kth = np.partition(sc, cand.size - k)[cand.size - k]
        keep = sc >= kth
        cand = cand[keep]
        sc = sc[keep]
    order = np.lexsort((seg.doc_ids[cand], -sc))[:k]
    sel = cand[order]
    return [(int(o), float(scores[o])) for o in sel]


def exhaustive_topk_tfidf(seg: Segment, qterms: list[tuple[str, float]],
                          k: int, exclude: "np.ndarray | None" = None,
                          ) -> list[tuple[int, float]]:
    """Classic TF-IDF scoring kernel (pluggable scorer, SS2.10):
    ``qterms`` carries (term, idf^2); contribution = idf2 * (sqrt(tf) /
    sqrt(dl)) — numpy elementwise ops mirror bm25.tfidf_part exactly,
    accumulation in query-term order (same determinism contract as
    exhaustive_topk)."""
    n = seg.num_docs
    if n == 0:
        return []
    scores = np.zeros(n, dtype=np.float64)
    touched = np.zeros(n, dtype=bool)
    dl = seg.doc_lens
    for term, idf2 in qterms:
        row = seg.term_idx.get(term)
        if row is None:
            continue
        ords, tfs = seg.decode_idx_cached(row)
        if ords.size == 0:
            continue
        contrib = idf2 * (np.sqrt(tfs.astype(np.float64)) / np.sqrt(dl[ords]))
        scores[ords] += contrib
        touched[ords] = True
    if exclude is not None and exclude.size:
        touched[exclude] = False
    cand = np.nonzero(touched)[0]
    if cand.size == 0:
        return []
    sc = scores[cand]
    if k > 0 and cand.size > 4 * k:
        kth = np.partition(sc, cand.size - k)[cand.size - k]
        keep = sc >= kth
        cand = cand[keep]
        sc = sc[keep]
    order = np.lexsort((seg.doc_ids[cand], -sc))[:k]
    sel = cand[order]
    return [(int(o), float(scores[o])) for o in sel]


def _min_span(poss: list[np.ndarray]) -> int:
    """Minimal (max - min) over choosing one position from each sorted
    list — the classic k-pointer sweep: repeatedly advance the minimum
    pointer.  Scalar reference implementation; the serving path uses
    the vectorized anchor sweep in near_topk (differential-tested in
    tests/test_match_modes.py)."""
    idx = [0] * len(poss)
    cur = [int(p[0]) for p in poss]
    best = max(cur) - min(cur)
    while best > 0:
        i = min(range(len(cur)), key=lambda j: cur[j])
        idx[i] += 1
        if idx[i] >= len(poss[i]):
            break
        cur[i] = int(poss[i][idx[i]])
        span = max(cur) - min(cur)
        if span < best:
            best = span
    return best


_NEAR_BIG = np.int64(1) << 32  # per-candidate-doc position offset
_NEAR_HUGE = np.int64(1) << 62  # "no next position" sentinel


def _near_matches(cand: np.ndarray, per_term_pos: list[list[np.ndarray]],
                  limit: int) -> np.ndarray:
    """Candidate ranks whose minimal window span is <= ``limit`` —
    VECTORIZED across all candidate docs at once.

    Every minimal window starts at some term's position p and ends at
    max_i next_i(p) (each other term's smallest position >= p), so
    min-span(doc) = min over anchors p of max_i next_i(p) - p.
    Positions are offset by candidate-rank * 2^32, giving ONE sorted
    array per term across every candidate; a window whose next_i falls
    in a different doc exceeds 2^32 - doc_len > limit and drops out by
    construction.  Cost: one concatenate + one searchsorted per term
    over the flattened anchors — no per-doc Python loop."""
    cats = []
    for plist in per_term_pos:
        lens = np.fromiter((len(p) for p in plist), dtype=np.int64,
                           count=len(plist))
        offs = np.repeat(np.arange(len(plist), dtype=np.int64) * _NEAR_BIG, lens)
        cats.append(np.concatenate(plist) + offs if plist else
                    np.zeros(0, np.int64))
    return _near_matches_cats(cats, limit)


def _near_matches_cats(cats: list[np.ndarray], limit: int) -> np.ndarray:
    """Core of the anchor sweep over per-term offset position arrays
    (see _near_matches)."""
    anchors = np.concatenate(cats)
    window_end = np.full(anchors.size, -1, dtype=np.int64)
    for cat in cats:
        padded = np.append(cat, _NEAR_HUGE)
        nxt = padded[np.searchsorted(cat, anchors, side="left")]
        np.maximum(window_end, nxt, out=window_end)
    ok = (window_end - anchors) <= limit
    ranks = np.unique(anchors[ok] >> 32)
    return ranks


def near_topk(seg: Segment, terms: list[str],
              qterms: list[tuple[str, float]], k: int, avg_doc_len: float,
              slop: int) -> list[tuple[int, float]]:
    """Proximity (sloppy, unordered) top-k: every distinct query term
    must occur, and some window must contain one occurrence of each
    with minimal span <= (m - 1) + slop (slop 0 = the terms are
    adjacent in SOME order — Lucene SpanNearQuery, unordered).
    Matched docs are BM25-scored over ``qterms`` exactly like
    phrase_topk (rank-identical to refimpl.topk_near)."""
    if not terms or not qterms:
        return []
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term in terms:
        row = seg.term_idx.get(term)
        if row is None or seg.n_postings[row] == 0:
            return []
        decoded[term] = seg.decode_idx_cached(row)
    cand = decoded[terms[0]][0]
    for term in terms[1:]:
        cand = _intersect_sorted(cand, decoded[term][0])
        if cand.size == 0:
            return []
    limit = (len(terms) - 1) + slop
    cats: list[np.ndarray] = []
    ranks_arr = np.arange(cand.size, dtype=np.int64)
    for t in terms:
        pos, tfs = seg.decode_positions_flat(t)
        ords = decoded[t][0]
        sel = np.searchsorted(ords, cand)  # cand ⊆ ords
        lens = tfs[sel]
        starts = (np.cumsum(tfs) - tfs)[sel]
        total = int(lens.sum())
        # gather each candidate's position slice without a per-doc loop
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        idx = np.repeat(starts, lens) + within
        cats.append(pos[idx] + np.repeat(ranks_arr * _NEAR_BIG, lens))
    ranks = _near_matches_cats(cats, limit)
    if ranks.size == 0:
        return []
    cand = cand[ranks]
    dl = seg.doc_lens[cand]
    scores = np.zeros(cand.size, dtype=np.float64)
    for term, idf in qterms:
        ords, tfs = decoded[term]
        sel = np.searchsorted(ords, cand)
        tf = tfs[sel].astype(np.float64)
        scores += idf * ((tf * (bm25.K1 + 1.0)) /
                         (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (dl / avg_doc_len))))
    order = np.lexsort((seg.doc_ids[cand], -scores))[:k]
    sel = cand[order]
    return [(int(o), float(s)) for o, s in zip(sel, scores[order])]


def bool_topk(seg: Segment, must_terms: list[str],
              qterms: list[tuple[str, float]], neg_terms: list[str],
              k: int, avg_doc_len: float) -> list[tuple[int, float]]:
    """Lucene-BooleanQuery top-k: candidates must contain EVERY term in
    ``must_terms`` and none of ``neg_terms``; scoring is the
    disjunctive sum over ``qterms`` (must + should, analyzed order —
    SHOULD terms contribute only where present).  With no must terms
    this is exactly not_topk."""
    if not qterms:
        return []
    if not must_terms:
        return not_topk(seg, qterms, neg_terms, k, avg_doc_len)
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term in must_terms:
        row = seg.term_idx.get(term)
        if row is None or seg.n_postings[row] == 0:
            return []
        decoded[term] = seg.decode_idx_cached(row)
    cand = decoded[must_terms[0]][0]
    for term in must_terms[1:]:
        cand = _intersect_sorted(cand, decoded[term][0])
        if cand.size == 0:
            return []
    excl = []
    for t in neg_terms:
        row = seg.term_idx.get(t)
        if row is not None:
            ords, _ = seg.decode_idx_cached(row)
            if ords.size:
                excl.append(ords)
    if excl:
        cand = cand[~np.isin(cand, np.unique(np.concatenate(excl)))]
        if cand.size == 0:
            return []
    if cand.size * 4 > seg.num_docs:
        # DENSE candidates (Zipf-head must terms): scatter-add over the
        # whole doc-length array like exhaustive_topk, then select the
        # candidates — O(postings) scatter beats O(cand log n)
        # searchsorted per term.  Identical floats: contributions add
        # per doc in qterms order either way.
        full = np.zeros(seg.num_docs, dtype=np.float64)
        dl_full = seg.doc_lens
        for term, idf in qterms:
            row = seg.term_idx.get(term)
            if row is None:
                continue
            ords, tfs = seg.decode_idx_cached(row)
            if ords.size == 0:
                continue
            tf = tfs.astype(np.float64)
            d = dl_full[ords]
            full[ords] += idf * ((tf * (bm25.K1 + 1.0)) /
                                 (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (d / avg_doc_len))))
        scores = full[cand]
    else:
        dl = seg.doc_lens[cand]
        scores = np.zeros(cand.size, dtype=np.float64)
        for term, idf in qterms:
            row = seg.term_idx.get(term)
            if row is None:
                continue
            ords, tfs = seg.decode_idx_cached(row)
            if ords.size == 0:
                continue
            sel = np.searchsorted(ords, cand)
            sel_c = np.minimum(sel, len(ords) - 1)
            present = ords[sel_c] == cand
            tf = np.where(present, tfs[sel_c], 0).astype(np.float64)
            contrib = idf * ((tf * (bm25.K1 + 1.0)) /
                             (tf + bm25.K1 * (1.0 - bm25.B + bm25.B * (dl / avg_doc_len))))
            scores += np.where(present, contrib, 0.0)
    order = np.lexsort((seg.doc_ids[cand], -scores))[:k]
    sel = cand[order]
    return [(int(o), float(s)) for o, s in zip(sel, scores[order])]

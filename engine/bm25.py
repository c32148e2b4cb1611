"""BM25 scoring (F7/F8) — shared scalar kernels for rank-identity.

Spec: [LIT-BM25] Robertson & Zaragoza 2009, Lucene idf variant
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)), which is non-negative for
0 < df <= N — required for sound WAND upper bounds ([LIT-WAND/BMW]).

Determinism contract (SURVEY.md SS7 "hard parts"): BOTH the distributed
engine (engine.query / engine.wand) and the oracle (engine.refimpl)
score a document as

    score(d) = sum over query terms, IN ANALYZED-QUERY-TERM ORDER, of
               idf(df_t) * tf_part(tf, dl)

using these exact float64 operations in this exact order.  IEEE-754
double ops are exactly rounded, so matching the op order makes scores
bit-identical across the two implementations (tests assert <= 1e-9 but
expect exact equality).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def idf(df: int, num_docs: int) -> float:
    return math.log(1.0 + (num_docs - df + 0.5) / (df + 0.5))


def tf_part(tf: float, doc_len: float, avg_doc_len: float) -> float:
    """tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))."""
    return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * (doc_len / avg_doc_len)))


def score_term(tf: float, df: int, doc_len: float, num_docs: int, avg_doc_len: float) -> float:
    return idf(df, num_docs) * tf_part(tf, doc_len, avg_doc_len)


# Relative safety margin on upper bounds: the bound formula is monotone
# mathematically, but float rounding could in principle lose an ulp, so
# bounds are inflated by 2^-40 before pruning comparisons ([LIT-BMW]
# safety; property-tested in tests/test_bm25.py).
UB_EPS = 1.0 + 2.0**-40


def upper_bound(max_tf: float, min_doc_len: float, idf_t: float, avg_doc_len: float) -> float:
    """F8: monotone upper bound on any in-block score of a term: uses the
    block's max tf and the GLOBAL min doc_len (tf_part increases with tf,
    decreases with dl)."""
    return idf_t * tf_part(max_tf, min_doc_len, avg_doc_len) * UB_EPS


# ---------------------------------------------------------------------------
# Classic TF-IDF scorer (pluggable scorer kernel, SURVEY.md SS2.10):
# Lucene TFIDFSimilarity shape — tf' = sqrt(tf), idf = 1 + ln(N/(df+1))
# squared, norm = 1/sqrt(dl); queryNorm omitted (rank-irrelevant
# constant).  Same determinism contract as BM25: refimpl and the
# vectorized kernel use these ops in this order.
# ---------------------------------------------------------------------------


def tfidf_idf(df: int, num_docs: int) -> float:
    return 1.0 + math.log(num_docs / (df + 1.0))


def tfidf_part(tf: float, doc_len: float) -> float:
    """sqrt(tf) / sqrt(dl) — the per-doc factor multiplying idf^2."""
    return math.sqrt(tf) / math.sqrt(doc_len)

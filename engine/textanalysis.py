"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All run over the ``documents`` table (doc_id, text) as single
``map_batches`` projections — stateless, vectorized where the kernel
allows, no shuffle (each is a per-row derivation).  SQL-replicable
outputs (token counts, quality ratios, md5 fingerprints) have DuckDB
oracles in __ray_entry__; the heuristic ones (language ID, winnowing)
are rows-only checked plus pytest-verified.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data

from .functions import round6, round6_scalar

# BPE-ish word/number/punctuation splitter used for token counting:
# letter runs, digit runs, or single non-space symbols.  The symbol
# class is [^a-z0-9 \t\n] — EXACTLY the DuckDB oracle's class (\s would
# additionally exclude \r \f \v and unicode whitespace, silently
# diverging from the oracle on texts containing them).
_BPEISH = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n]")

# Tiny per-language stopword profiles (language-ID heuristic).  The
# driver documents table carries lang in {en,es,de,fr,zh}; profiles are
# common function words per language (public knowledge).
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in is that it for with as on at by from".split()),
    "es": frozenset("el la de que y en los del se las por un con una su para".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im".split()),
    "fr": frozenset("le de la et les des en un du une que est pour dans par".split()),
    "zh": frozenset("的 一 是 在 不 了 有 和 人 这 中 大 为 上 个".split()),
}
_LANG_ORDER = sorted(_LANG_PROFILES)  # deterministic tie-break order


def _texts(batch: pa.Table) -> list[str]:
    return batch.column("text").to_pylist()


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_ws_tokens, n_re_tokens): whitespace tokens and BPE-ish
    regex tokens per document.  Oracle: string_split + regexp_split."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch)
        ws = np.array([len([t for t in s.split(" ") if t]) for s in texts], np.int64)
        re_n = np.array([len(_BPEISH.findall(s.lower())) for s in texts], np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_re_tokens": pa.array(re_n, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc quality heuristics, all DuckDB-replicable:
    (doc_id, n_chars, n_tokens, n_distinct, distinct_ratio_r,
    mean_token_len_r).  Ratios rounded to 6 dp."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch)
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        n_tok = np.empty(n, np.int64)
        n_dis = np.empty(n, np.int64)
        mean_len = np.empty(n, np.float64)
        for i, s in enumerate(texts):
            toks = [t for t in s.split(" ") if t]
            n_chars[i] = len(s)
            n_tok[i] = len(toks)
            n_dis[i] = len(set(toks))
            mean_len[i] = (
                round6_scalar(sum(len(t) for t in toks) / len(toks)) if toks else 0.0
            )
        ratio = round6(
            np.divide(n_dis, n_tok, out=np.zeros(n, np.float64), where=n_tok > 0)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct": pa.array(n_dis, pa.int64()),
                "distinct_ratio_r": pa.array(ratio, pa.float64()),
                "mean_token_len_r": pa.array(mean_len, pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def language_id(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, pred_lang, score_r): stopword-profile language guess.

    score = hits(best profile) / tokens; ties broken by language code
    order (deterministic).  Tokenization is the repo-wide oracle
    convention — lower + split on single spaces, empties dropped — so
    the heuristic is DuckDB-replicable (profile table join + argmax)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch)
        preds, scores = [], []
        for s in texts:
            toks = [t for t in s.lower().split(" ") if t]
            best_lang, best_hits = _LANG_ORDER[0], -1
            for lang in _LANG_ORDER:
                prof = _LANG_PROFILES[lang]
                hits = sum(1 for t in toks if t in prof)
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            preds.append(best_lang)
            scores.append(round6_scalar(best_hits / len(toks)) if toks else 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, pa.string()),
                "score_r": pa.array(scores, pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, md5, winnow64): exact content fingerprint (md5 hex —
    DuckDB-replicable) + a winnowing rolling-hash fingerprint
    (min-sampled 64-bit Rabin-style hash over 8-char windows;
    near-identical texts collide — rows-only)."""

    def winnow(s: str, w: int = 8) -> int:
        data = s.encode()
        if len(data) < w:
            return _fnv(data)
        # rolling polynomial hash, base 257 mod 2^61-1
        MOD = (1 << 61) - 1
        B = 257
        pw = pow(B, w - 1, MOD)
        h = 0
        best = MOD
        for i, byte in enumerate(data):
            if i >= w:
                h = (h - data[i - w] * pw) % MOD
            h = (h * B + byte) % MOD
            if i >= w - 1 and h < best:
                best = h
        return best

    def _fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for x in b:
            h = ((h ^ x) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h & ((1 << 61) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        texts = _texts(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "md5": pa.array(
                    [hashlib.md5(s.encode()).hexdigest() for s in texts], pa.string()
                ),
                "winnow64": pa.array([winnow(s) for s in texts], pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def lm_doc_scores(
    sf_dir: str,
    strategy: str = "auto",
    vocab_broadcast_max: int | None = None,
) -> "ray.data.Dataset":
    """Per-doc unigram language-model score — the classic
    perplexity-style quality signal for training-data filtering: each
    token contributes ln(cf(token)/total_tokens) (corpus-MLE unigram
    log-prob), summed per doc.

    Cross-engine float determinism: each DISTINCT term's log-prob is
    computed ONCE with math.log over an exact int ratio (libm —
    bit-equal to DuckDB's ``ln``) and immediately quantized to integer
    MICROS (functions.micro_signed == ``CAST(round(x*1e6) AS
    BIGINT)``), so the per-doc sum is an integer sum — exact and
    order-independent no matter how either engine schedules it.

    Strategy (same bounded-broadcast-or-join discipline as
    tfidf_top_terms): while the vocabulary fits ``vocab_broadcast_max``
    the (term, cf) table is collected BOUNDED + broadcast and scoring
    is ONE streaming pass with dictionary-encoded token lookup
    (per-DISTINCT-term, not per-token); past the bound, (doc_id, term,
    tf) rows hash-join the distributed cf aggregate and a
    groupby(doc_id) sums the exact integer contributions — identical
    output (integer micros are associative by construction).  Docs
    with zero tokens emit nothing (no LM score; matches the SQL join
    semantics).

    Output: (doc_id, doc_len, lm_sum_micro, lm_mean_r).
    """
    import math

    from .functions import micro_signed, round6_signed
    from .textstats import (
        VOCAB_BROADCAST_MAX,
        _split_lower,
        collect_bounded,
        term_stats,
    )

    import ray

    if vocab_broadcast_max is None:
        vocab_broadcast_max = VOCAB_BROADCAST_MAX
    vt = None
    if strategy in ("auto", "broadcast"):
        vt = collect_bounded(
            term_stats(sf_dir).select_columns(["term", "cf"]),
            vocab_broadcast_max,
        )
    if vt is None:
        if strategy == "broadcast":
            raise ValueError("vocabulary exceeds vocab_broadcast_max")
        return _lm_doc_scores_join(sf_dir)

    cf_terms = vt.column("term").to_pylist()
    cf_vals = vt.column("cf").to_pylist()
    total = sum(int(c) for c in cf_vals)
    lp = {
        t: int(micro_signed(math.log(int(c) / total)))
        for t, c in zip(cf_terms, cf_vals)
    }
    ref = ray.put(lp)

    def score(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        lpm = ray.get(ref)
        n = batch.num_rows
        doc_len = np.bincount(doc_rep, minlength=n).astype(np.int64)
        enc = flat.dictionary_encode()
        lut = np.fromiter(
            (lpm[t] for t in enc.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(enc.dictionary),
        )
        tok_micro = lut[enc.indices.to_numpy(zero_copy_only=False)]
        # int64 micros fit float64 exactly far beyond any doc length
        sums = np.bincount(doc_rep, weights=tok_micro, minlength=n).astype(np.int64)
        mask = doc_len > 0
        ids = batch.column("doc_id").to_numpy()[mask]
        dl = doc_len[mask]
        s = sums[mask]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "doc_len": pa.array(dl, pa.int64()),
                "lm_sum_micro": pa.array(s, pa.int64()),
                "lm_mean_r": pa.array(
                    round6_signed(s / 1e6 / dl), pa.float64()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


def _lm_doc_scores_join(sf_dir: str) -> "ray.data.Dataset":
    """Vocabulary-unbounded LM-score path: (doc_id, term, tf) rows
    hash-join the distributed (term, cf) aggregate, per-row integer
    contributions (tf x micro log-prob) are summed by a
    groupby(doc_id).  Exactly equal to the broadcast path — the micros
    quantization makes the sum order-independent by construction."""
    import math

    import ray.data

    from .functions import micro_signed, round6_signed
    from .textstats import _doc_term_tf, _join_parts, _term_partials, term_stats

    total = int(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(_term_partials, batch_format="pyarrow")
        .sum("cf")
    )
    tf_rows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_doc_term_tf, batch_format="pyarrow")
    cf_ds = term_stats(sf_dir).select_columns(["term", "cf"])

    def contrib(batch: pa.Table) -> pa.Table:
        cf = batch.column("cf").to_numpy()
        tf = batch.column("tf").to_numpy()
        micro_by_cf = {
            int(c): int(micro_signed(math.log(int(c) / total)))
            for c in np.unique(cf)
        }
        micro = np.fromiter(
            (micro_by_cf[int(c)] for c in cf), np.int64, count=len(cf)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tf": batch.column("tf"),
                "c_micro": pa.array(tf * micro, pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        dl = batch.column("sum(tf)").to_numpy()
        s = batch.column("sum(c_micro)").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "doc_len": pa.array(dl, pa.int64()),
                "lm_sum_micro": pa.array(s, pa.int64()),
                "lm_mean_r": pa.array(round6_signed(s / 1e6 / dl), pa.float64()),
            }
        )

    return (
        tf_rows.join(cf_ds, "inner", num_partitions=_join_parts(), on=("term",))
        .map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .sum(["tf", "c_micro"])
        .map_batches(finish, batch_format="pyarrow")
    )


def repetition_scores(sf_dir: str, dup_w: int = 2) -> "ray.data.Dataset":
    """Gopher-style repetition quality signals per document — the
    filters a training-data pipeline applies before (or alongside)
    dedup: heavily self-repetitive docs are low-quality even when not
    duplicated corpus-wide.

    - ``top2gram_frac``: occurrences of the doc's most frequent token
      bigram / total bigram occurrences.
    - ``dup_gram_frac``: fraction of ``dup_w``-gram occurrences that
      are repeats, i.e. 1 - distinct/total (Gopher uses windows 2-4;
      default 2 — wider windows are vacuously 0 on short docs).

    Docs with fewer grams than the window get 0.0 (matches the SQL
    LEFT JOIN + COALESCE).  Stateless one-pass map_batches, no
    shuffle; gram counting is numpy (dictionary-encode tokens once,
    then row-wise unique over code windows — no string n-gram
    materialization, no hash collisions).

    Output: (doc_id, top2gram_frac, dup_gram_frac).
    """
    from .textstats import _split_lower

    def _doc_grams(doc_rep: np.ndarray, codes: np.ndarray, w: int):
        """Rows (doc, c_0..c_{w-1}) for every in-doc window of width w."""
        m = len(codes) - w + 1
        if m <= 0:
            return np.empty((0, w + 1), np.int64)
        cols = [doc_rep[: len(doc_rep) - w + 1]]
        cols += [codes[i : m + i] for i in range(w)]
        rows = np.column_stack(cols)
        return rows[rows[:, 0] == doc_rep[w - 1 :]]  # window stays in one doc

    def fn(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        n = batch.num_rows
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

        top2 = np.zeros(n, np.float64)
        g2 = _doc_grams(doc_rep, codes, 2)
        if len(g2):
            uniq, counts = np.unique(g2, axis=0, return_counts=True)
            mx = np.zeros(n, np.int64)
            np.maximum.at(mx, uniq[:, 0], counts)
            tot = np.bincount(g2[:, 0], minlength=n)
            has = tot > 0
            top2[has] = mx[has] / tot[has]

        dupf = np.zeros(n, np.float64)
        gd = _doc_grams(doc_rep, codes, dup_w)
        if len(gd):
            uniqd = np.unique(gd, axis=0)
            distinct = np.bincount(uniqd[:, 0], minlength=n)
            totd = np.bincount(gd[:, 0], minlength=n)
            has = totd > 0
            dupf[has] = 1.0 - distinct[has] / totd[has]

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "top2gram_frac": pa.array(round6(top2), pa.float64()),
                "dup_gram_frac": pa.array(round6(dupf), pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


# PII scrub patterns, applied in THIS order (URLs first so an email
# inside a URL is masked as part of the URL, never double-counted).
# Both pyarrow.compute's regex kernels and DuckDB run RE2, so the
# masking and the counts replay bit-exact in SQL (regexp_replace /
# regexp_extract_all with the same patterns).
PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(
    sf_dir: str, docs: "ray.data.Dataset | None" = None
) -> "ray.data.Dataset":
    """PII masking (the Dolma/RedPajama curation step): URLs, emails
    and IPv4 literals are replaced by typed mask tokens, with per-doc
    match counts — (doc_id, n_url, n_email, n_ip, clean).  One
    streaming map, all RE2 kernels (pc.count_substring_regex +
    pc.replace_substring_regex), no Python per row."""
    import pyarrow.compute as pc

    if docs is None:
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cols = {"doc_id": batch.column("doc_id")}
        for name, pat, mask in PII_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(
                pa.int64()
            )
            text = pc.replace_substring_regex(text, pat, mask)
        cols["clean"] = text
        return pa.table(cols)

    return docs.map_batches(scrub, batch_format="pyarrow")

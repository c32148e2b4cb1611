"""Text-statistics operators over the driver ``documents`` table
(G2-G4/K-ops in SQL-replicable "simple" analyzer mode — SURVEY.md §5.3).

These run the whitespace+lowercase analyzer (engine.analysis.
tokenize_simple) so DuckDB can replicate them exactly via
``lower(unnest(string_split(text, ' ')))``; they exercise the same Ray
Data primitives the index build uses (vectorized map_batches partials ->
small groupby), and double as the engine's corpus-profiling utilities.

Scale pattern: every per-term aggregate is COMBINED inside map_batches
first (one partial row per distinct term per batch), so the groupby
shuffle moves vocabulary-sized partials, never token streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _split_lower(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """text column -> (doc index per token, nonempty mask applied) flat
    lowercase tokens + per-doc token counts."""
    col = batch.column("text")
    if col.num_chunks != 1:
        col = col.combine_chunks()
    else:
        col = col.chunk(0)
    split = pc.split_pattern(col, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.utf8_lower(split.flatten())
    doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc_rep[nonempty], lens, flat.filter(pa.array(nonempty))


def doc_lengths(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, doc_len) with doc_len = count of nonempty simple tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_rep, lens, _ = _split_lower(batch)
        n = batch.num_rows
        doc_len = np.bincount(doc_rep, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "doc_len": pa.array(doc_len, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def _term_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (term, df_partial, cf_partial)."""
    doc_rep, _, flat = _split_lower(batch)
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
            }
        )
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy().astype(np.int64)
    nv = len(denc.dictionary)
    cf = np.bincount(codes, minlength=nv)
    # df: distinct docs per term within the batch
    pair = codes * (doc_rep.max() + 1) + doc_rep
    upair = np.unique(pair)
    df = np.bincount(upair // (doc_rep.max() + 1), minlength=nv)
    return pa.table(
        {
            "term": denc.dictionary,
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
        }
    )


def term_stats(sf_dir: str) -> "ray.data.Dataset":
    """(term, df, cf) over documents.text, simple analyzer."""
    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_term_partials, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "cf"])
        .map_batches(
            lambda b: b.rename_columns(["term", "df", "cf"]), batch_format="pyarrow"
        )
    )


# terms; bound on any driver-collected / broadcast vocabulary table.
# Zipf/Heaps keeps word corpora far under it; a code corpus
# (10^7-10^8 identifiers) exceeds it and flips the per-doc scoring ops
# below onto their hash-join path automatically.
VOCAB_BROADCAST_MAX = 4_000_000


def _join_parts(lo: int = 2, hi: int = 16) -> int:
    """Hash-join partition count sized to the cluster: a join's shuffle
    actors must fit alongside the map tasks, or the streaming executor
    can starve (the actor-pool==num_cpus deadlock family)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(lo, min(hi, cpus))


def collect_bounded(ds: "ray.data.Dataset", cap: int) -> pa.Table | None:
    """Stream a (small-by-assumption) Dataset into the driver, bailing
    out with None the moment it exceeds ``cap`` rows — the guard that
    keeps "broadcast the vocabulary" from becoming "driver OOM" when
    the vocabulary assumption breaks (VERDICT r02 wrong #3)."""
    got: list[pa.Table] = []
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        got.append(b)
        total += b.num_rows
        if total > cap:
            return None
    if not got:
        return None
    return pa.concat_tables(got)


def _doc_term_tf(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, term, tf) rows — complete per doc (a doc's
    text is one input row), so no groupby is needed to finalize tf."""
    doc_rep, _, flat = _split_lower(batch)
    if len(flat) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    ids = batch.column("doc_id").to_numpy()
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy().astype(np.int64)
    nv = len(denc.dictionary)
    pair = doc_rep * nv + codes
    upair, tf = np.unique(pair, return_counts=True)
    pd_, pt = upair // nv, upair % nv
    return pa.table(
        {
            "doc_id": pa.array(ids[pd_], pa.int64()),
            "term": denc.dictionary.take(pa.array(pt, pa.int64())),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
        }
    )


def term_df(sf_dir: str) -> "ray.data.Dataset":
    return term_stats(sf_dir).select_columns(["term", "df"])


def term_cf(sf_dir: str) -> "ray.data.Dataset":
    return term_stats(sf_dir).select_columns(["term", "cf"])


def top_terms(sf_dir: str, n: int = 20) -> "ray.data.Dataset":
    """n most frequent terms; ties broken term asc (deterministic)."""
    return term_stats(sf_dir).sort(["cf", "term"], descending=[True, False]).limit(n)


def tfidf_top_terms(
    sf_dir: str,
    k: int = 3,
    strategy: str = "auto",
    vocab_broadcast_max: int = VOCAB_BROADCAST_MAX,
) -> "ray.data.Dataset":
    """Per-document keyword extraction: the k terms with the highest
    tf x ln(N/df) score per doc (ties: term asc).

    Two execution strategies, identical output:

    - "broadcast" (taken by "auto" while the vocabulary fits
      ``vocab_broadcast_max``): the (term, df) table is collected
      BOUNDED (collect_bounded — never an unconditional full-vocab
      take_all) and shipped once via ``ray.put``; scoring is ONE
      streaming pass, fully vectorized.
    - "join" (taken by "auto" when the vocabulary exceeds the bound —
      e.g. a 10^7-10^8-identifier code corpus): (doc_id, term, tf)
      rows hash-join the distributed (term, df) aggregate on term,
      then a groupby(doc_id) ranks per doc.  Two all-to-alls, but no
      driver- or worker-resident vocabulary anywhere.

    idf values are computed per DISTINCT df with math.log (libm —
    bit-identical to DuckDB's ``ln``) rather than numpy's SIMD log,
    so round6(score) never straddles a rounding boundary across
    engines.

    Output: (doc_id, rank 1..k, term, tfidf_r).
    """
    import math

    from .functions import round6

    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()

    vt = None
    if strategy in ("auto", "broadcast"):
        vt = collect_bounded(
            term_stats(sf_dir).select_columns(["term", "df"]),
            vocab_broadcast_max,
        )
    if vt is None:
        if strategy == "broadcast":
            raise ValueError("vocabulary exceeds vocab_broadcast_max")
        return _tfidf_top_terms_join(sf_dir, k, n_docs)

    terms = np.asarray(vt.column("term").to_pylist())
    dfs = vt.column("df").to_numpy()
    idf_by_df = {int(d): math.log(n_docs * 1.0 / int(d)) for d in np.unique(dfs)}
    order = np.argsort(terms)
    term_sorted, idf_sorted = (
        terms[order],
        np.array([idf_by_df[int(d)] for d in dfs[order]], dtype=np.float64),
    )
    ref = ray.put((term_sorted, idf_sorted))

    def score(batch: pa.Table) -> pa.Table:
        tsort, idf = ray.get(ref)
        doc_rep, _, flat = _split_lower(batch)
        ids = batch.column("doc_id").to_numpy()
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tfidf_r": pa.array([], pa.float64()),
                }
            )
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy().astype(np.int64)
        # distinct (doc, term) pairs + tf counts, vectorized
        nv = len(denc.dictionary)
        pair = doc_rep * nv + codes
        upair, tf = np.unique(pair, return_counts=True)
        pd_, pt = upair // nv, upair % nv
        batch_terms = np.asarray(denc.dictionary.to_pylist())
        gi = np.searchsorted(tsort, batch_terms[pt])
        sc = tf.astype(np.float64) * idf[gi]
        t_arr = batch_terms[pt]
        so = np.lexsort((t_arr, -sc, pd_))
        pd_, t_arr, sc = pd_[so], t_arr[so], sc[so]
        starts = np.searchsorted(pd_, np.arange(len(ids)))
        rank = np.arange(len(pd_)) - np.repeat(
            starts, np.diff(np.append(starts, len(pd_)))
        )
        keep = rank < k
        return pa.table(
            {
                "doc_id": pa.array(ids[pd_[keep]], pa.int64()),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
                "term": pa.array(t_arr[keep], pa.string()),
                "tfidf_r": pa.array(round6(sc[keep]), pa.float64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


def _tfidf_top_terms_join(sf_dir: str, k: int, n_docs: int) -> "ray.data.Dataset":
    """Vocabulary-unbounded path: hash-join (doc_id, term, tf) rows
    against the distributed (term, df) aggregate, then rank per doc.
    Floats are identical to the broadcast path (same math.log per
    distinct df, same tf x idf product)."""
    import math

    from .functions import round6

    tf_rows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_doc_term_tf, batch_format="pyarrow")
    df_ds = term_stats(sf_dir).select_columns(["term", "df"])

    def score_rows(batch: pa.Table) -> pa.Table:
        dfs = batch.column("df").to_numpy()
        idf_by_df = {int(d): math.log(n_docs * 1.0 / int(d)) for d in np.unique(dfs)}
        idf = np.fromiter(
            (idf_by_df[int(d)] for d in dfs), np.float64, count=len(dfs)
        )
        sc = batch.column("tf").to_numpy().astype(np.float64) * idf
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "sc": pa.array(sc, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        terms = np.asarray(group.column("term").to_pylist())
        sc = group.column("sc").to_numpy()
        order = np.lexsort((terms, -sc))[:k]
        n = len(order)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.full(n, group.column("doc_id")[0].as_py(), np.int64),
                    pa.int64(),
                ),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
                "term": pa.array(terms[order], pa.string()),
                "tfidf_r": pa.array(round6(sc[order]), pa.float64()),
            }
        )

    return (
        tf_rows.join(df_ds, "inner", num_partitions=_join_parts(), on=("term",))
        .map_batches(score_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def top_ngrams(sf_dir: str, n: int = 3, k: int = 20) -> "ray.data.Dataset":
    """k most frequent word n-grams (occurrence-counted, not distinct
    per doc); ties broken ngram asc — the n-gram analogue of top_terms.

    Combiner-first: each batch emits one partial row per DISTINCT
    n-gram (Zipf-bounded), so the groupby exchange never carries the
    raw n-gram stream.
    """

    def partials(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        empty = pa.table(
            {"ngram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        if len(flat) < n:
            return empty
        # positions whose whole n-window stays inside one doc
        ok = doc_rep[: len(doc_rep) - n + 1] == doc_rep[n - 1 :]
        if not ok.any():
            return empty
        parts = [
            flat.slice(j, len(flat) - n + 1).filter(pa.array(ok)) for j in range(n)
        ]
        grams = pc.binary_join_element_wise(*parts, " ")  # last arg = separator
        denc = pc.dictionary_encode(grams)
        cnt = np.bincount(
            denc.indices.to_numpy().astype(np.int64),
            minlength=len(denc.dictionary),
        )
        return pa.table(
            {
                "ngram": denc.dictionary,
                "c": pa.array(cnt, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("ngram")
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["ngram", "cnt"]), batch_format="pyarrow"
        )
        .sort(["cnt", "ngram"], descending=[True, False])
        .limit(k)
    )


def collection_stats(sf_dir: str) -> pa.Table:
    """Single-row global aggregates (G4): Ray Data count/sum/mean.

    avg_doc_len goes through round6 (the repo's cross-engine float
    invariant); the oracle rounds with round(avg(c), 6) on its side.
    """
    from .functions import round6_scalar

    dl = doc_lengths(sf_dir)
    agg = dl.aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("doc_len"),
        ray.data.aggregate.Mean("doc_len"),
    )
    return pa.table(
        {
            "num_docs": pa.array([int(agg["count()"])], pa.int64()),
            "total_tokens": pa.array([int(agg["sum(doc_len)"])], pa.int64()),
            "avg_doc_len": pa.array(
                [round6_scalar(float(agg["mean(doc_len)"]))], pa.float64()
            ),
        }
    )


def facet_counts(
    sf_dir: str, queries: list[tuple[int, str]], facet: str = "lang"
) -> "ray.data.Dataset":
    """Faceted search: per (query, facet value), how many documents
    match the query (disjunctive simple-analyzer term match).

    One streaming corpus pass: per batch, tokens are
    dictionary-encoded ONCE, each query's term set is intersected with
    the batch dictionary (per-DISTINCT-term, not per-token), matching
    docs found via a bincount over token positions, and partial
    (query_id, facet, n) counts emitted — the groupby shuffle moves
    queries x facet-cardinality partials per batch, never documents.

    Output: (query_id, {facet}, n_docs).
    """
    qterms = [
        (qid, frozenset(t.lower() for t in text.split(" ") if t))
        for qid, text in queries
    ]

    def partials(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        n = batch.num_rows
        enc = flat.dictionary_encode()
        dict_terms = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        fvals = batch.column(facet).to_pylist()
        out_q, out_f, out_n = [], [], []
        for qid, terms in qterms:
            qcodes = np.array(
                [i for i, t in enumerate(dict_terms) if t in terms], np.int64
            )
            if len(qcodes) == 0:
                continue
            hit_tok = np.isin(codes, qcodes)
            ndocs_hit = np.bincount(doc_rep[hit_tok], minlength=n) > 0
            counts: dict[str, int] = {}
            for i in np.flatnonzero(ndocs_hit):
                counts[fvals[i]] = counts.get(fvals[i], 0) + 1
            for fv, c in counts.items():
                out_q.append(qid)
                out_f.append(fv)
                out_n.append(c)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                facet: pa.array(out_f, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t.column("query_id"),
                facet: t.column(facet),
                "n_docs": t.column("sum(n)").cast(pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", facet]
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["query_id", facet])
        .sum("n")
        .map_batches(rename, batch_format="pyarrow")
    )


def rank_documents(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    """Globally ranked longest-k documents via Ray Data's distributed
    sort: ``sort((doc_len DESC, doc_id ASC))`` (range-partitioned
    all-to-all) then ``limit(k)``.  Rank assignment touches only the
    k-bounded head, never the corpus.

    For small k a per-batch heap + tiny merge (see
    ``relational.grouped_topk``) is cheaper than a full sort; this op
    exists for total-ordering workloads (sorted exports, curriculum
    ordering) where the sort is the point — the limit here just bounds
    the driver-checkable result.

    Output: (rank, doc_id, doc_len).
    """
    head = (
        doc_lengths(sf_dir)
        .sort(["doc_len", "doc_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(1, len(head) + 1), pa.int64()),
                "doc_id": pa.array([r["doc_id"] for r in head], pa.int64()),
                "doc_len": pa.array([r["doc_len"] for r in head], pa.int64()),
            }
        )
    )


def snippets(
    sf_dir: str, queries: list[tuple[int, str]], window: int = 2
) -> "ray.data.Dataset":
    """Search-result snippet extraction: for every (query, matching
    doc), the +-``window``-token context around the FIRST occurrence of
    any query term (disjunctive simple-analyzer match).

    One streaming corpus pass, no shuffle: per batch, tokens are
    dictionary-encoded once, each query's first-match position per doc
    is found with a vectorized minimum-scatter, and the snippet is
    sliced out of the flat token array via per-doc offsets.  Emitted
    rows are (matching doc x query)-sized — results, not corpus.

    At serving scale this runs over the top-k result set instead of
    the whole corpus: broadcast the result doc_ids, push the set into
    the parquet read filter, same per-batch kernel.

    Output: (query_id, doc_id, first_pos, snippet); first_pos is
    1-based to match the SQL oracle's generate_subscripts convention.
    """
    qterms = [
        (qid, frozenset(t.lower() for t in text.split(" ") if t))
        for qid, text in queries
    ]

    def fn(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        n = batch.num_rows
        doc_len = np.bincount(doc_rep, minlength=n)
        starts = np.concatenate([[0], np.cumsum(doc_len)[:-1]])
        enc = flat.dictionary_encode()
        dict_terms = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        toks = None  # lazy; only built if some query matches
        ids = batch.column("doc_id").to_numpy()
        pos_in_doc = np.arange(len(codes), dtype=np.int64) - starts[doc_rep]
        out_q, out_d, out_p, out_s = [], [], [], []
        for qid, terms in qterms:
            qcodes = np.array(
                [i for i, t in enumerate(dict_terms) if t in terms], np.int64
            )
            if len(qcodes) == 0:
                continue
            hit = np.isin(codes, qcodes)
            first = np.full(n, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(first, doc_rep[hit], pos_in_doc[hit])
            if toks is None:
                toks = flat.to_pylist()
            for d in np.flatnonzero(first < np.iinfo(np.int64).max):
                fp = int(first[d])
                lo = max(0, fp - window)
                hi = min(int(doc_len[d]), fp + window + 1)
                s = int(starts[d])
                out_q.append(qid)
                out_d.append(int(ids[d]))
                out_p.append(fp + 1)
                out_s.append(" ".join(toks[s + lo : s + hi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "first_pos": pa.array(out_p, pa.int64()),
                "snippet": pa.array(out_s, pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def corpus_mixture(sf_dir: str) -> pa.Table:
    """Domain-mixture report (pretraining data curation): per source,
    document and token counts plus corpus shares — the table a mixture
    re-weighting decision reads.  Combiner-first: each batch emits one
    (source, n_docs, n_tokens) partial, so the exchange is
    O(sources x blocks) rows to the driver, never documents."""

    def partial(batch: pa.Table) -> pa.Table:
        doc_rep, _, _ = _split_lower(batch)
        n = batch.num_rows
        tok_per_doc = np.bincount(doc_rep, minlength=n).astype(np.int64)
        src = batch.column("source").to_pylist()
        agg: dict[str, list[int]] = {}
        for i, s in enumerate(src):
            a = agg.setdefault(s, [0, 0])
            a[0] += 1
            a[1] += int(tok_per_doc[i])
        return pa.table(
            {
                "source": pa.array(list(agg), pa.string()),
                "n_docs": pa.array([v[0] for v in agg.values()], pa.int64()),
                "n_tokens": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["source"], [0, 0])
        a[0] += r["n_docs"]
        a[1] += r["n_tokens"]
    total_docs = sum(v[0] for v in agg.values())
    total_toks = sum(v[1] for v in agg.values())
    from .functions import round6

    rows = [
        {
            "source": s,
            "n_docs": v[0],
            "n_tokens": v[1],
            "doc_share_r": round6(v[0] / total_docs) if total_docs else 0.0,
            "token_share_r": round6(v[1] / total_toks) if total_toks else 0.0,
        }
        for s, v in sorted(agg.items())
    ]
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()),
             ("n_tokens", pa.int64()), ("doc_share_r", pa.float64()),
             ("token_share_r", pa.float64())]
        ),
    )


def bigram_pmi(
    sf_dir: str,
    k: int = 20,
    min_count: int = 5,
    strategy: str = "auto",
    vocab_broadcast_max: int = VOCAB_BROADCAST_MAX,
) -> pa.Table:
    """Collocations: top-k word bigrams by pointwise mutual information,
    PMI = ln( (c_ab/T2) / ((c_a/T1) * (c_b/T1) ) ), restricted to
    bigrams with count >= min_count; ties (round6 PMI desc, bigram asc).

    Shape: bigram counts ride the existing combiner-first groupby (one
    partial row per distinct bigram per batch).  The unigram side is
    either BROADCAST (bounded collect — Heaps'-law small for word
    corpora) into a vectorized PMI pass emitting per-batch partial
    top-k rows, or — when the vocabulary exceeds
    ``vocab_broadcast_max`` — hash-JOINED onto the min_count-filtered
    bigram table twice (once per word), so no vocabulary is ever
    resident anywhere.  Both strategies produce identical output
    (math.log over the identical full expression).  T2 (total bigram
    windows) is closed-form T1 - num_docs, so no extra pass.
    """
    import duckdb  # only to count docs without another Ray pass

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]

    uni_t = None
    if strategy in ("auto", "broadcast"):
        uni_t = collect_bounded(
            term_stats(sf_dir).select_columns(["term", "cf"]),
            vocab_broadcast_max,
        )
    if uni_t is None:
        if strategy == "broadcast":
            raise ValueError("vocabulary exceeds vocab_broadcast_max")
        t1 = float(ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(_term_partials, batch_format="pyarrow").sum("cf"))
        return _bigram_pmi_join(sf_dir, k, min_count, t1, t1 - float(n_docs))

    cf = dict(
        zip(uni_t.column("term").to_pylist(), uni_t.column("cf").to_pylist())
    )
    t1 = float(sum(cf.values()))
    t2 = t1 - float(n_docs)

    import ray as _ray

    cf_ref = _ray.put(cf)

    def partials(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        empty = pa.table(
            {"ngram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        if len(flat) < 2:
            return empty
        ok = doc_rep[:-1] == doc_rep[1:]
        if not ok.any():
            return empty
        a = flat.slice(0, len(flat) - 1).filter(pa.array(ok))
        b = flat.slice(1, len(flat) - 1).filter(pa.array(ok))
        grams = pc.binary_join_element_wise(a, b, " ")
        denc = pc.dictionary_encode(grams)
        cnt = np.bincount(
            denc.indices.to_numpy().astype(np.int64), minlength=len(denc.dictionary)
        )
        return pa.table(
            {"ngram": denc.dictionary, "c": pa.array(cnt, pa.int64())}
        )

    def pmi_partial(batch: pa.Table) -> pa.Table:
        import math

        from .functions import round6

        uni = _ray.get(cf_ref)
        out = []
        for gram, c in zip(
            batch.column("ngram").to_pylist(), batch.column("c").to_pylist()
        ):
            if c < min_count:
                continue
            wa, wb = gram.split(" ", 1)
            pmi = math.log(
                (c * 1.0 / t2) / ((uni[wa] * 1.0 / t1) * (uni[wb] * 1.0 / t1))
            )
            out.append({"bigram": gram, "cnt": int(c), "pmi_r": round6(pmi)})
        out.sort(key=lambda r: (-r["pmi_r"], r["bigram"]))
        return pa.Table.from_pylist(
            out[:k],
            schema=pa.schema(
                [("bigram", pa.string()), ("cnt", pa.int64()),
                 ("pmi_r", pa.float64())]
            ),
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("ngram")
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["ngram", "c"]), batch_format="pyarrow"
        )
        .map_batches(pmi_partial, batch_format="pyarrow")
        .take_all()
    )
    parts.sort(key=lambda r: (-r["pmi_r"], r["bigram"]))
    top = parts[:k]
    for rank, r in enumerate(top, 1):
        r["rank"] = rank
    return pa.Table.from_pylist(
        [{"rank": r["rank"], "bigram": r["bigram"], "cnt": r["cnt"],
          "pmi_r": r["pmi_r"]} for r in top],
        schema=pa.schema(
            [("rank", pa.int64()), ("bigram", pa.string()),
             ("cnt", pa.int64()), ("pmi_r", pa.float64())]
        ),
    )


def _bigram_pmi_join(
    sf_dir: str, k: int, min_count: int, t1: float, t2: float
) -> pa.Table:
    """Vocabulary-unbounded PMI path: the min_count-filtered bigram
    count table (small — collocation candidates, not the gram stream)
    hash-joins the distributed unigram aggregate once per word; the
    final per-batch partial top-k reaches the driver as O(k x blocks)
    rows.  Identical floats to the broadcast path (math.log over the
    same full expression per bigram)."""
    import math

    from .functions import round6

    def partials(batch: pa.Table) -> pa.Table:
        doc_rep, _, flat = _split_lower(batch)
        empty = pa.table(
            {"ngram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        if len(flat) < 2:
            return empty
        ok = doc_rep[:-1] == doc_rep[1:]
        if not ok.any():
            return empty
        a = flat.slice(0, len(flat) - 1).filter(pa.array(ok))
        b = flat.slice(1, len(flat) - 1).filter(pa.array(ok))
        grams = pc.binary_join_element_wise(a, b, " ")
        denc = pc.dictionary_encode(grams)
        cnt = np.bincount(
            denc.indices.to_numpy().astype(np.int64), minlength=len(denc.dictionary)
        )
        return pa.table({"ngram": denc.dictionary, "c": pa.array(cnt, pa.int64())})

    def split_filter(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy()
        keep = c >= min_count
        sub = batch.filter(pa.array(keep))
        grams = sub.column("ngram")
        if grams.num_chunks != 1:
            grams = grams.combine_chunks()
        parts = pc.split_pattern(grams, " ", max_splits=1)
        return pa.table(
            {
                "ngram": sub.column("ngram"),
                "c": sub.column("c"),
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
            }
        )

    grams = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("ngram")
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["ngram", "c"]), batch_format="pyarrow"
        )
        .map_batches(split_filter, batch_format="pyarrow")
    )
    uni_a = term_stats(sf_dir).select_columns(["term", "cf"]).map_batches(
        lambda b: b.rename_columns(["term", "cf_a"]), batch_format="pyarrow"
    )
    uni_b = term_stats(sf_dir).select_columns(["term", "cf"]).map_batches(
        lambda b: b.rename_columns(["term", "cf_b"]), batch_format="pyarrow"
    )
    # materialize between the two joins: two concurrent hash-shuffle
    # operator pools can starve each other on small clusters
    half = grams.join(
        uni_a, "inner", num_partitions=_join_parts(), on=("w1",), right_on=("term",)
    ).materialize()
    joined = half.join(
        uni_b, "inner", num_partitions=_join_parts(), on=("w2",), right_on=("term",)
    )

    def pmi_partial(batch: pa.Table) -> pa.Table:
        out = []
        for gram, c, ca, cb in zip(
            batch.column("ngram").to_pylist(),
            batch.column("c").to_pylist(),
            batch.column("cf_a").to_pylist(),
            batch.column("cf_b").to_pylist(),
        ):
            pmi = math.log(
                (c * 1.0 / t2) / ((ca * 1.0 / t1) * (cb * 1.0 / t1))
            )
            out.append({"bigram": gram, "cnt": int(c), "pmi_r": round6(pmi)})
        out.sort(key=lambda r: (-r["pmi_r"], r["bigram"]))
        return pa.Table.from_pylist(
            out[:k],
            schema=pa.schema(
                [("bigram", pa.string()), ("cnt", pa.int64()),
                 ("pmi_r", pa.float64())]
            ),
        )

    parts = joined.map_batches(pmi_partial, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: (-r["pmi_r"], r["bigram"]))
    top = parts[:k]
    return pa.Table.from_pylist(
        [
            {"rank": rank, "bigram": r["bigram"], "cnt": r["cnt"],
             "pmi_r": r["pmi_r"]}
            for rank, r in enumerate(top, 1)
        ],
        schema=pa.schema(
            [("rank", pa.int64()), ("bigram", pa.string()),
             ("cnt", pa.int64()), ("pmi_r", pa.float64())]
        ),
    )

"""Spelling suggestion ("did you mean") over the corpus vocabulary.

SymSpell-shaped scale path (public algorithm: symmetric delete
spelling correction): if lev(a, b) <= d then some <=d-char deletion of
``a`` equals some <=d-char deletion of ``b``, so candidate generation
is an exact-match join between deletion variants of the query terms
and deletion variants of the vocabulary — no all-pairs edit-distance
scan.  Here the query side is tiny: its delete->terms map is broadcast
(``ray.put`` once) and the vocabulary side streams through ONE
``map_batches`` pass that generates each vocab term's deletes in
place, probes the broadcast map, and exact-verifies survivors with a
real Levenshtein.  The only exchange is the candidate table
(query-terms x few matches) through a tiny groupby — never
vocabulary-sized (CLAUDE.md all-to-all rule).

Winner per query term: min distance, then max collection frequency,
then lexicographic — deterministic and SQL-replicable (DuckDB
``levenshtein``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _deletes(term: str, d: int) -> set[str]:
    """All strings reachable from ``term`` by deleting <= d chars."""
    out = {term}
    frontier = {term}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein distance, early-exit above ``cap``."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def spell_suggest(
    sf_dir: str, qterms: list[str], max_dist: int = 2
) -> "ray.data.Dataset":
    """Best in-vocabulary correction for each query term.

    Output: (qterm, suggestion, distance, cf) — one row per query term
    that has >=1 vocab term within ``max_dist`` edits (a term already
    in the vocabulary suggests itself at distance 0).
    """
    from .textstats import term_stats

    qmap: dict[str, list[str]] = {}
    for q in qterms:
        for dv in _deletes(q, max_dist):
            qmap.setdefault(dv, []).append(q)
    ref = ray.put((qmap, max_dist))

    def probe(batch: pa.Table) -> pa.Table:
        qm, cap = ray.get(ref)
        terms = batch.column("term").to_pylist()
        cfs = batch.column("cf").to_pylist()
        out_q, out_t, out_d, out_c = [], [], [], []
        for term, cf in zip(terms, cfs):
            seen: set[str] = set()
            for dv in _deletes(term, cap):
                for q in qm.get(dv, ()):
                    if q in seen:
                        continue
                    seen.add(q)
                    d = _lev(q, term, cap)
                    if d <= cap:
                        out_q.append(q)
                        out_t.append(term)
                        out_d.append(d)
                        out_c.append(int(cf))
        return pa.table(
            {
                "qterm": pa.array(out_q, pa.string()),
                "suggestion": pa.array(out_t, pa.string()),
                "distance": pa.array(out_d, pa.int64()),
                "cf": pa.array(out_c, pa.int64()),
            }
        )

    def best(group: pa.Table) -> pa.Table:
        d = group.column("distance").to_numpy()
        cf = group.column("cf").to_numpy()
        sug = group.column("suggestion").to_pylist()
        order = sorted(
            range(len(sug)), key=lambda i: (d[i], -cf[i], sug[i])
        )
        i = order[0]
        return group.take([i])

    cands = term_stats(sf_dir).select_columns(["term", "cf"]).map_batches(
        probe, batch_format="pyarrow"
    )
    return cands.groupby("qterm").map_groups(best, batch_format="pyarrow")


_SUGGEST_SCHEMA = pa.schema(
    [
        ("prefix", pa.string()),
        ("rank", pa.int64()),
        ("term", pa.string()),
        ("cf", pa.int64()),
    ]
)


def suggest_terms(sf_dir: str, prefixes: list[str], k: int = 5) -> pa.Table:
    """Query autocompletion: top-``k`` vocabulary terms per prefix by
    collection frequency (cf desc, term asc — deterministic).

    One streaming pass over the (term, cf) aggregate: each batch emits
    per-prefix PARTIAL top-k rows (pyarrow starts_with over the term
    column), so the only data reaching the driver is
    <= k x |prefixes| x blocks candidate rows — never the vocabulary
    (CLAUDE.md all-to-all rule: no sort/groupby added for a
    vocabulary-sized table)."""
    import pyarrow.compute as pc

    from .textstats import term_stats

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch.column("term")
        cfs = batch.column("cf").to_numpy()
        rows = []
        for p in prefixes:
            idx = np.flatnonzero(
                pc.starts_with(terms, p).to_numpy(zero_copy_only=False)
            )
            if not idx.size:
                continue
            tl = terms.take(pa.array(idx)).to_pylist()
            sub = cfs[idx]
            order = sorted(range(len(tl)), key=lambda i: (-sub[i], tl[i]))[:k]
            for i in order:
                rows.append(
                    {"prefix": p, "rank": 0, "term": tl[i], "cf": int(sub[i])}
                )
        return pa.Table.from_pylist(rows, schema=_SUGGEST_SCHEMA)

    parts = (
        term_stats(sf_dir)
        .select_columns(["term", "cf"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    by_p: dict[str, list] = {}
    for r in parts:
        by_p.setdefault(r["prefix"], []).append(r)
    out = []
    for p in prefixes:
        cand = sorted(by_p.get(p, []), key=lambda r: (-r["cf"], r["term"]))[:k]
        for rank, r in enumerate(cand, 1):
            out.append({"prefix": p, "rank": rank, "term": r["term"], "cf": r["cf"]})
    return pa.Table.from_pylist(out, schema=_SUGGEST_SCHEMA)

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

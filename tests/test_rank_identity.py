"""Top-k rank identity: distributed engine (WAND and exhaustive paths)
vs the single-process oracle — identical doc_ids, identical order,
float64 scores equal within 1e-9 (BASELINE.json:14; SURVEY.md §5.1).
"""

import pytest

from engine.query import IndexReader, run_queries


def _ref_topk(ref, text, k):
    return ref.topk(text, k)


@pytest.mark.parametrize("mode", ["exhaustive", "wand", "auto"])
def test_local_rank_identity(built_index, mode):
    ref = built_index["ref"]
    rd = IndexReader(built_index["out"])
    mismatches = []
    for q in built_index["queries"]:
        want = _ref_topk(ref, q["text"], q["k"])
        got = rd.search(q["text"], q["k"], mode=mode)
        got_pairs = [(r["doc_id"], r["score"]) for r in got]
        if [d for d, _ in got_pairs] != [d for d, _ in want]:
            mismatches.append((q["text"], got_pairs, want))
            continue
        for (gd, gs), (wd, ws) in zip(got_pairs, want):
            if abs(gs - ws) > 1e-9:
                mismatches.append((q["text"], got_pairs, want))
                break
    assert not mismatches, f"{len(mismatches)} queries mismatch: {mismatches[:3]}"


def test_distributed_rank_identity(built_index):
    ref = built_index["ref"]
    queries = built_index["queries"][:20]
    res = run_queries(
        built_index["out"], queries, mode="wand", concurrency=(1, 2)
    ).take_all()
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in queries:
        want = _ref_topk(ref, q["text"], q["k"])
        got = sorted(by_q.get(q["query_id"], []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q["text"]
        for r, (_, ws) in zip(got, want):
            assert abs(r["score"] - ws) <= 1e-9
        # rank column is 1..n
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
        # metadata enrichment matches the oracle's doc_meta
        for r in got:
            meta = ref.doc_meta[r["doc_id"]]
            assert r["repo"] == meta["repo"] and r["path"] == meta["path"]


def test_empty_and_oov_queries(built_index):
    rd = IndexReader(built_index["out"])
    assert rd.search("zzzznotfound", 10) == []
    assert rd.search("", 10) == []


def test_search_after_pagination(built_index):
    """search_after: paging with the (score, doc_id) cursor reproduces
    the single-shot top-3k exactly — single-process AND distributed —
    and the final page is short/empty when results run out."""
    rd = IndexReader(built_index["out"])
    queries = built_index["queries"][:6]
    for q in queries:
        full = rd.search(q["text"], 30)
        if not full:
            continue
        pages = []
        after = None
        for _ in range(3):
            page = rd.search(q["text"], 10, after=after)
            if not page:
                break
            pages.extend(page)
            after = (page[-1]["score"], page[-1]["doc_id"])
        assert [(p["doc_id"], p["score"]) for p in pages] == [
            (p["doc_id"], p["score"]) for p in full
        ]
        # cursor past the end -> empty page, no crash
        if len(full) < 30:
            assert rd.search(q["text"], 10, after=after) == []

    # distributed path: page 2 via run_queries equals ranks 11-20
    q = queries[0]
    full = rd.search(q["text"], 20)
    assert len(full) == 20
    after = (full[9]["score"], full[9]["doc_id"])
    rows = run_queries(
        built_index["out"],
        [{"query_id": 7, "text": q["text"], "k": 10, "after": after}],
        concurrency=(1, 2),
    ).take_all()
    rows.sort(key=lambda r: r["rank"])
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (p["doc_id"], p["score"]) for p in full[10:20]
    ]

    # unsupported combination is an explicit error
    import pytest as _pt

    with _pt.raises(ValueError):
        rd.search(q["text"], 10, match="all", after=after)


def test_dataset_query_input_identical(built_index):
    """Feeding queries as a ray.data.Dataset takes the UNBOUNDED path
    (per-query work items + distributed groupby merge, no driver-side
    collect) — results must equal the bounded list-input path
    row-for-row."""
    import pyarrow as pa
    import ray.data

    queries = built_index["queries"][:12]
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in run_queries(
            built_index["out"], queries, mode="wand", concurrency=(1, 2)
        ).take_all()
    )
    qds = ray.data.from_arrow(
        pa.Table.from_pylist(
            [
                {"query_id": int(q["query_id"]), "text": q["text"],
                 "k": int(q.get("k", 10))}
                for q in queries
            ]
        )
    )
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in run_queries(
            built_index["out"], qds, mode="wand", concurrency=(1, 2)
        ).take_all()
    )
    assert got == want and len(got) > 0

"""Skew handling (SURVEY.md §4.2): a term present in 100% of documents
must (a) not skew the partition shuffle — the shuffle key is the
hash-uniform doc partition, never the term — (b) end up split into
per-segment sub-posting lists ("hot terms split into sub-postings",
BASELINE.json:6), and (c) stay rank-identical to the oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.query import IndexReader
from engine.refimpl import RefIndex
from engine.segments import Segment, list_segments
from tests.fixtures.gen import gen_corpus

P = 8


@pytest.fixture(scope="module")
def skewed(ray_session, tmp_path_factory):
    # every doc gets the ultra-hot term many times
    rows = gen_corpus(240, seed=5)
    for r in rows:
        r["content"] = "hotterm " * 7 + r["content"] + " hotterm"
    out = str(tmp_path_factory.mktemp("skew") / "idx")
    build_index(ray.data.from_arrow(pa.Table.from_pylist(rows)), out,
                num_parts=P, analyzer_concurrency=(1, 2))
    return {"rows": rows, "out": out, "ref": RefIndex(rows)}


def test_hot_term_split_into_subpostings(skewed):
    """The 100%-df term appears in EVERY segment, each holding only its
    partition's slice — no single partition holds the full posting list."""
    segs = [Segment(p) for p in list_segments(skewed["out"])]
    ref = skewed["ref"]
    full_df = ref.df("hotterm")
    assert full_df == ref.num_docs  # fixture sanity: term is universal
    per_seg = []
    for s in segs:
        row = s.term_idx.get("hotterm")
        assert row is not None, "hot term missing from a segment"
        per_seg.append(int(s.df[row]))
    assert sum(per_seg) == full_df
    # uniform split: no segment holds more than ~3x its fair share
    assert max(per_seg) <= 3 * (full_df // P + 1)


def test_partition_sizes_uniform_under_skew(skewed):
    """Doc counts per partition stay balanced despite extreme term skew
    (the exchange key is hash(doc), by construction skew-immune)."""
    segs = [Segment(p) for p in list_segments(skewed["out"])]
    counts = np.array([s.num_docs for s in segs])
    assert counts.sum() == skewed["ref"].num_docs
    assert counts.max() <= 2.5 * counts.mean()


def test_rank_identity_under_skew(skewed):
    ref = skewed["ref"]
    rd = IndexReader(skewed["out"])
    for text in ("hotterm", "hotterm index query", "hotterm zzzznotfound",
                 "import hotterm merge"):
        want = ref.topk(text, 10)
        got = [(r["doc_id"], r["score"]) for r in rd.search(text, 10, mode="wand")]
        assert [d for d, _ in got] == [d for d, _ in want], text
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9


def test_duplicate_passages_hot_passage_exact(ray_session, tmp_path):
    """A passage shared by EVERY document (the license-header case) puts
    the whole corpus into ONE passage-hash group; the op must stay
    EXACT there (emit every occurrence with the full distinct-doc
    count) and the group kernel is vectorized, not quadratic."""
    import pyarrow.parquet as pq

    from engine.dedup import duplicate_passages

    W = 20
    header = " ".join(f"lic{i}" for i in range(W))  # one full hot window
    n = 300
    rows = []
    for d in range(n):
        # unique tail so ONLY the header window is shared
        tail = " ".join(f"u{d}w{j}" for j in range(W))
        rows.append({"doc_id": d, "text": f"{header} {tail}"})
    sf = str(tmp_path)
    pq.write_table(
        pa.Table.from_pylist(rows), f"{sf}/documents.parquet"
    )
    got = sorted(
        (r["doc_id"], r["passage_idx"], r["n_docs_sharing"])
        for r in duplicate_passages(sf, width=W).take_all()
    )
    assert got == [(d, 0, n) for d in range(n)]

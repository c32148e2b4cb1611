"""Q1/Q3 property tests: iterator advance correctness over block
boundaries; block-max WAND ≡ exhaustive top-k on randomized indexes
(SURVEY.md §5.2 test_wand layer).

These build tiny single-segment indexes directly through
engine.segments.build_segment (no Ray needed — build_segment is a plain
function) and compare wand_topk against exhaustive_topk.
"""

import random

import numpy as np
import pyarrow as pa
import pytest

from engine import bm25, wand
from engine.postings import ANALYZED_DOC
from engine.segments import Segment, build_segment


def _mk_segment(tmp_path, docs: list[list[str]], part: int = 0) -> Segment:
    """docs: list of token lists -> one on-disk segment (doc_id = 8*i+part)."""
    rows = []
    for i, toks in enumerate(docs):
        tf: dict[str, int] = {}
        pos: dict[str, list[int]] = {}
        for p, t in enumerate(toks):
            tf[t] = tf.get(t, 0) + 1
            pos.setdefault(t, []).append(p)
        terms = sorted(tf)
        rows.append(
            {
                "doc_id": 8 * i + part,
                "part": part,
                "doc_len": len(toks),
                "terms": terms,
                "tfs": [tf[t] for t in terms],
                "poslists": [pos[t] for t in terms],
                "repo": "r",
                "path": f"p{i}",
                "commit": "c",
                "lang": "py",
                "content_sha256": f"s{i}",
            }
        )
    table = pa.Table.from_pylist(rows, schema=ANALYZED_DOC)
    out = str(tmp_path)
    build_segment(table, out, part, "test")
    return Segment(f"{out}/segments/seg-{part:05d}")


def test_iterator_advance_across_blocks(tmp_path):
    # one term in 1000 docs -> ~8 blocks of 128; advance must skip blocks
    docs = [["t"] for _ in range(1000)]
    seg = _mk_segment(tmp_path, docs)
    it = wand.TermIterator(seg, seg.term_idx["t"], 1.0, 10.0)
    # targets crossing block boundaries, hitting exact block-last ordinals
    for target in [0, 1, 127, 128, 129, 255, 256, 500, 767, 768, 999]:
        it2 = wand.TermIterator(seg, seg.term_idx["t"], 1.0, 10.0)
        assert it2.advance(target) == target  # every ordinal present
    assert it.advance(1000) == wand.DONE
    # sequential next() walks every posting exactly once
    it3 = wand.TermIterator(seg, seg.term_idx["t"], 1.0, 10.0)
    seen = [it3.cur]
    while it3.next() != wand.DONE:
        seen.append(it3.cur)
    assert seen == list(range(1000))


def test_iterator_advance_sparse(tmp_path):
    rng = random.Random(7)
    present = sorted(rng.sample(range(5000), 700))
    docs = []
    pset = set(present)
    for i in range(5000):
        docs.append(["t"] if i in pset else ["x"])
    seg = _mk_segment(tmp_path, docs)
    row = seg.term_idx["t"]
    arr = np.array(present)
    for target in rng.sample(range(5200), 50):
        it = wand.TermIterator(seg, row, 1.0, 10.0)
        got = it.advance(target)
        j = np.searchsorted(arr, target)
        want = int(arr[j]) if j < len(arr) else wand.DONE
        assert got == want, f"advance({target})"


@pytest.mark.parametrize("seed", range(8))
def test_wand_equals_exhaustive_random(tmp_path, seed):
    """Property: block-max WAND returns EXACTLY the exhaustive top-k
    (same ordinals, same order, bit-equal scores) on random corpora."""
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(30)]
    n_docs = rng.randint(50, 400)
    docs = []
    for _ in range(n_docs):
        n = rng.randint(1, 60)
        # skewed: low-index words much more common
        docs.append([vocab[min(int(rng.expovariate(0.2)), 29)] for _ in range(n)])
    seg = _mk_segment(tmp_path / str(seed), docs)
    avgdl = float(np.mean([len(d) for d in docs]))
    for _ in range(25):
        qn = rng.randint(1, 5)
        terms = rng.sample(vocab, qn)
        k = rng.choice([1, 3, 10])
        qt = []
        for t in terms:
            row = seg.term_idx.get(t)
            df = int(seg.df[row]) if row is not None else 0
            if df:
                qt.append((t, bm25.idf(df, n_docs)))
        got = wand.wand_topk(seg, qt, k, avgdl)
        want = wand.exhaustive_topk(seg, qt, k, avgdl)
        assert [o for o, _ in got] == [o for o, _ in want], (terms, k)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == ws  # bit-identical float64


def test_wand_tie_scores(tmp_path):
    """Exact ties: identical docs -> equal scores; tie-break doc_id asc
    must hold and no tied candidate may be pruned."""
    docs = [["a", "b"]] * 20 + [["a"]] * 5
    seg = _mk_segment(tmp_path, docs)
    qt = [("a", bm25.idf(int(seg.df[seg.term_idx["a"]]), 25))]
    got = wand.wand_topk(seg, qt, 10, 2.0)
    want = wand.exhaustive_topk(seg, qt, 10, 2.0)
    assert got == want
    # two score tiers: the 5 shorter ["a"] docs outrank the ["a","b"]
    # docs; within each tier, tie-break is doc_id asc
    dids = [int(seg.doc_ids[o]) for o, _ in got]
    short_ids = sorted(int(seg.doc_ids[o]) for o in range(20, 25))
    long_ids = sorted(int(seg.doc_ids[o]) for o in range(20))
    assert dids == short_ids + long_ids[:5]
    scores = [s for _, s in got]
    assert len(set(scores[:5])) == 1 and len(set(scores[5:])) == 1

"""Index merging without re-analysis: merging indexes built from corpus
halves must be byte-identical to a direct build of the full corpus
(the strongest possible check — reconstruction, re-partitioning, and
the merge stage are all exactly deterministic)."""

import hashlib
import os

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index, merge_indexes
from engine.segments import Segment, list_segments, segment_to_analyzed
from tests.fixtures.gen import gen_corpus

P = 6


def _hashes(out: str) -> dict:
    res = {}
    for seg in list_segments(out):
        for fname in ("postings.bin", "dict.parquet", "blockmax.parquet", "docs.parquet"):
            with open(os.path.join(seg, fname), "rb") as f:
                res[f"{os.path.basename(seg)}/{fname}"] = hashlib.sha256(
                    f.read()
                ).hexdigest()
    return res


@pytest.fixture(scope="module")
def split_built(ray_session, tmp_path_factory):
    rows = gen_corpus(240, seed=17)
    root = tmp_path_factory.mktemp("mergeidx")
    full = str(root / "full")
    build_index(ray.data.from_arrow(pa.Table.from_pylist(rows)), full,
                num_parts=P, analyzer_concurrency=(1, 2))
    half_a = str(root / "a")
    half_b = str(root / "b")
    build_index(ray.data.from_arrow(pa.Table.from_pylist(rows[:120])), half_a,
                num_parts=P, analyzer_concurrency=(1, 2))
    build_index(ray.data.from_arrow(pa.Table.from_pylist(rows[120:])), half_b,
                num_parts=P, analyzer_concurrency=(1, 2))
    return {"rows": rows, "root": root, "full": full, "a": half_a, "b": half_b}


def test_segment_roundtrip(split_built):
    """segment_to_analyzed is the exact inverse of the build for every
    segment: re-building from reconstructed rows is byte-identical."""
    from engine.segments import build_segment

    import tempfile

    for seg_path in list_segments(split_built["full"]):
        part = int(os.path.basename(seg_path).split("-")[1])
        analyzed = segment_to_analyzed(seg_path, P)
        with tempfile.TemporaryDirectory() as td:
            build_segment(analyzed, td, part, "code")
            for fname in ("postings.bin", "dict.parquet", "docs.parquet"):
                with open(os.path.join(seg_path, fname), "rb") as f1, open(
                    os.path.join(td, "segments", f"seg-{part:05d}", fname), "rb"
                ) as f2:
                    assert f1.read() == f2.read(), (seg_path, fname)


def test_merge_equals_direct_build(split_built):
    out = str(split_built["root"] / "merged")
    stats = merge_indexes([split_built["a"], split_built["b"]], out, num_parts=P)
    assert stats["num_segments"] == P
    assert _hashes(out) == _hashes(split_built["full"])


def test_merge_repartitions(split_built):
    """Merging into a different partition count redistributes docs and
    preserves totals."""
    out = str(split_built["root"] / "rep")
    stats = merge_indexes([split_built["a"], split_built["b"]], out, num_parts=4)
    assert stats["num_segments"] == 4
    segs = [Segment(p) for p in list_segments(out)]
    import numpy as np

    all_ids = np.concatenate([s.doc_ids for s in segs])
    full_ids = np.concatenate(
        [Segment(p).doc_ids for p in list_segments(split_built["full"])]
    )
    assert sorted(all_ids.tolist()) == sorted(full_ids.tolist())
    for i, s in enumerate(segs):
        assert (s.doc_ids % 4 == i).all()


def test_merge_analyzer_mismatch_rejected(split_built, tmp_path, ray_session):
    import pyarrow as pa

    other = str(tmp_path / "simple_idx")
    build_index(
        ray.data.from_arrow(pa.Table.from_pylist(split_built["rows"][:50])),
        other, num_parts=P, analyzer="simple", analyzer_concurrency=(1, 2),
    )
    with pytest.raises(ValueError, match="different analyzers"):
        merge_indexes([split_built["a"], other], str(tmp_path / "x"))

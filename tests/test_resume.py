"""Checkpoint/resume (S6/S7): a build interrupted after j segments,
resumed, must yield byte-identical segments and identical collection
stats (BASELINE.json:6,14; SURVEY.md §5.2 resume layer)."""

import hashlib
import os
import shutil

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.checkpoint import completed_parts, read_collection_stats
from engine.segments import list_segments
from tests.fixtures.gen import gen_corpus

P = 6


def _dir_hash(seg: str) -> dict:
    out = {}
    for fname in ("postings.bin", "dict.parquet", "blockmax.parquet", "docs.parquet"):
        with open(os.path.join(seg, fname), "rb") as f:
            out[fname] = hashlib.sha256(f.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def corpora(ray_session, tmp_path_factory):
    rows = gen_corpus(200, seed=11)
    table = pa.Table.from_pylist(rows)
    root = tmp_path_factory.mktemp("resume")

    full = str(root / "full")
    build_index(ray.data.from_arrow(table), full, num_parts=P,
                analyzer_concurrency=(1, 2))
    return {"rows": rows, "table": table, "root": root, "full": full}


def test_resume_byte_identical(corpora):
    """Simulate a crash: build fully, delete 3 of P segments (as if the
    run died before writing them), resume, compare bytes."""
    root, table = corpora["root"], corpora["table"]
    out = str(root / "interrupted")
    build_index(ray.data.from_arrow(table), out, num_parts=P,
                analyzer_concurrency=(1, 2))
    want = {s: _dir_hash(s) for s in list_segments(out)}
    want_stats = read_collection_stats(out)

    # crash simulation: 3 segments never committed
    for part in (1, 3, 4):
        shutil.rmtree(os.path.join(out, "segments", f"seg-{part:05d}"))
    assert completed_parts(out) == {0, 2, 5}

    stats = build_index(ray.data.from_arrow(table), out, num_parts=P,
                        resume=True, analyzer_concurrency=(1, 2))
    got = {s: _dir_hash(s) for s in list_segments(out)}
    assert got == want
    for key in ("num_docs", "total_doc_len", "total_postings", "vocab_size"):
        assert stats[key] == want_stats[key]


def test_resume_matches_uninterrupted(corpora):
    """Resumed index is byte-identical to a never-interrupted build."""
    full_hashes = {os.path.basename(s): _dir_hash(s) for s in list_segments(corpora["full"])}
    out = os.path.join(str(corpora["root"]), "interrupted")
    res_hashes = {os.path.basename(s): _dir_hash(s) for s in list_segments(out)}
    assert res_hashes == full_hashes


def test_resume_config_mismatch_rejected(corpora):
    with pytest.raises(ValueError, match="config mismatch"):
        build_index(ray.data.from_arrow(corpora["table"]), corpora["full"],
                    num_parts=P + 1, resume=True)


def test_fresh_dir_required_without_resume(corpora):
    with pytest.raises(ValueError, match="resume=True"):
        build_index(ray.data.from_arrow(corpora["table"]), corpora["full"],
                    num_parts=P)


def test_completed_build_resume_is_noop(corpora):
    stats = build_index(ray.data.from_arrow(corpora["table"]), corpora["full"],
                        num_parts=P, resume=True)
    assert stats["num_segments"] == P

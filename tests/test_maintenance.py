"""Index maintenance: tombstone deletes are exact (results == full
results minus deleted docs), survive the distributed path, and
compaction is byte-identical to a direct build of the reduced corpus."""

import hashlib
import os

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.ids import doc_id_of
from engine.maintenance import compact_index, delete_docs, read_tombstones
from engine.query import IndexReader, run_queries
from engine.segments import list_segments
from tests.fixtures.gen import gen_corpus

P = 6
QTEXT = "def data index"


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
def built(ray_session, tmp_path_factory):
    rows = gen_corpus(200, seed=23)
    root = tmp_path_factory.mktemp("maint")
    full = str(root / "full")
    build_index(ray.data.from_arrow(pa.Table.from_pylist(rows)), full,
                num_parts=P, analyzer_concurrency=(1, 2))
    return {"rows": rows, "root": root, "full": full}


def test_delete_is_exact_minus_filter(built, tmp_path):
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    k = 15
    r0 = IndexReader(idx)
    base = r0.search(QTEXT, k=k + 3)
    assert len(base) > 5
    dead = [h["doc_id"] for h in base[:3]]  # delete 3 docs from the head
    assert delete_docs(idx, dead) == 3
    r1 = IndexReader(idx)  # fresh reader sees tombstones
    got = r1.search(QTEXT, k=k)
    want = [h for h in base if h["doc_id"] not in set(dead)][:k]
    assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]
    assert [h["score"] for h in got] == [h["score"] for h in want]
    # all match modes exclude deleted docs
    for match in ("any", "all", "not"):
        text = {"any": QTEXT, "all": "data", "not": "data -zzznope"}[match]
        for h in r1.search(text, k=50, match=match):
            assert h["doc_id"] not in set(dead)


def test_delete_merge_idempotent(built, tmp_path):
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    assert delete_docs(idx, [111, 222]) == 2
    assert delete_docs(idx, [222, 333]) == 3
    assert sorted(read_tombstones(idx).tolist()) == [111, 222, 333]


def test_distributed_queries_exclude_deleted(built, tmp_path):
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    base = IndexReader(idx).search(QTEXT, k=5)
    dead = {h["doc_id"] for h in base[:2]}
    delete_docs(idx, dead)
    res = run_queries(
        idx, [{"query_id": 0, "text": QTEXT, "k": 10}], concurrency=(1, 2)
    ).take_all()
    assert len(res) == 10
    assert not ({r["doc_id"] for r in res} & dead)


def test_compaction_byte_identity(built, tmp_path):
    import shutil

    rows = built["rows"]
    ids = [doc_id_of(r["repo"], r["path"], r["commit"]) for r in rows]
    dead_ids = sorted({ids[i] for i in range(0, len(rows), 7)})
    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    delete_docs(idx, dead_ids)

    compacted = str(tmp_path / "compacted")
    stats = compact_index(idx, compacted)
    assert stats["num_docs"] == len(set(ids) - set(dead_ids))
    assert read_tombstones(compacted).size == 0

    direct = str(tmp_path / "direct")
    keep = [r for r, i in zip(rows, ids) if i not in set(dead_ids)]
    build_index(ray.data.from_arrow(pa.Table.from_pylist(keep)), direct,
                num_parts=P, analyzer_concurrency=(1, 2))
    assert _hashes(compacted) == _hashes(direct)
    # deleted docs are gone even without tombstones
    r = IndexReader(compacted)
    for h in r.search(QTEXT, k=50):
        assert h["doc_id"] not in set(dead_ids)


def test_alias_flip(built, tmp_path):
    """Serving alias: points at the live index, flips atomically to the
    compacted one, and readers resolve through it."""
    from engine.maintenance import read_alias, write_alias
    from engine.query import IndexReader

    idx = built["full"]
    alias = str(tmp_path / "alias.json")
    write_alias(alias, idx)
    assert read_alias(alias) == idx
    rd = IndexReader(read_alias(alias))
    assert rd.num_docs > 0
    # flip to a compacted copy
    from engine.maintenance import compact_index

    dest = str(tmp_path / "compacted")
    compact_index(idx, dest)
    write_alias(alias, dest)
    assert read_alias(alias) == dest
    rd2 = IndexReader(read_alias(alias))
    assert rd2.num_docs == rd.num_docs  # no tombstones -> same corpus


def test_compact_crash_resume_and_alias_safety(built, tmp_path):
    """Compaction crash safety (VERDICT r04 task #6): a compaction that
    dies mid-rewrite leaves (a) the serving alias still on the OLD
    index — the flip happens only after compact_index returns, (b) a
    DETECTABLE partial destination (collection_stats.json is written
    manifest-LAST, so a crash can never leave the done-marker next to
    missing segments), and (c) a resumable state: compact_index(...,
    resume=True) completes byte-identical to an uninterrupted
    compaction, after which the flip serves rank-identical results."""
    import shutil

    from engine.checkpoint import completed_parts
    from engine.maintenance import read_alias, write_alias

    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    head = IndexReader(idx).search(QTEXT, k=5)
    delete_docs(idx, [h["doc_id"] for h in head[:2]])
    alias = str(tmp_path / "alias.json")
    write_alias(alias, idx)
    want = IndexReader(idx).search(QTEXT, k=10)  # tombstone-filtered

    # reference: an uninterrupted compaction
    clean = str(tmp_path / "clean")
    compact_index(idx, clean)

    # crash simulation mid-rewrite: segments partially committed, the
    # manifest-last done marker never written (the test_resume shape)
    crashed = str(tmp_path / "crashed")
    compact_index(idx, crashed)
    for part in sorted(completed_parts(crashed))[:2]:
        shutil.rmtree(os.path.join(crashed, "segments", f"seg-{part:05d}"))
    os.remove(os.path.join(crashed, "collection_stats.json"))

    # (a) the alias never pointed at the partial index
    assert read_alias(alias) == idx
    live = IndexReader(read_alias(alias)).search(QTEXT, k=10)
    assert [(h["doc_id"], h["score"]) for h in live] == [
        (h["doc_id"], h["score"]) for h in want
    ]

    # (b) the partial dest is detectable before any flip
    assert not os.path.exists(os.path.join(crashed, "collection_stats.json"))
    assert completed_parts(crashed) != completed_parts(clean)

    # (c) resume -> byte-identical to the uninterrupted compaction;
    # post-flip results equal the clean compaction's (NOT the
    # tombstoned index's scores: compaction re-finalizes N/avgdl/df
    # over the reduced corpus, the documented Lucene-merge semantics)
    compact_index(idx, crashed, resume=True)
    assert _hashes(crashed) == _hashes(clean)
    write_alias(alias, crashed)
    got = IndexReader(read_alias(alias)).search(QTEXT, k=10)
    ref = IndexReader(clean).search(QTEXT, k=10)
    assert [(h["doc_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["score"]) for h in ref
    ]
    # no tombstoned doc resurfaces through the resumed compaction
    dead = set(read_tombstones(idx).tolist())
    assert not ({h["doc_id"] for h in got} & dead)


def test_reader_holds_old_generation_through_compaction(built, tmp_path):
    """Out-of-place compaction contract: a reader constructed on the
    old generation keeps serving IDENTICAL results while the rewrite
    runs and after the alias flips (the old dir is untouched until the
    caller retires it); new readers resolve through the alias to the
    compacted index with the same tombstone-filtered ranking; retiring
    the old dir leaves alias readers working."""
    import shutil

    from engine.maintenance import read_alias, write_alias

    idx = str(tmp_path / "idx")
    shutil.copytree(built["full"], idx)
    head = IndexReader(idx).search(QTEXT, k=5)
    delete_docs(idx, [head[0]["doc_id"]])
    alias = str(tmp_path / "alias.json")
    write_alias(alias, idx)

    old_reader = IndexReader(idx)
    warm = old_reader.search(QTEXT, k=10)  # warmed before compaction

    dest = str(tmp_path / "gen2")
    compact_index(idx, dest)
    # mid-lifecycle: old reader unaffected by the rewrite
    assert [
        (h["doc_id"], h["score"]) for h in old_reader.search(QTEXT, k=10)
    ] == [(h["doc_id"], h["score"]) for h in warm]

    write_alias(alias, dest)
    # old reader STILL serves after the flip (holds the old generation)
    assert [
        (h["doc_id"], h["score"]) for h in old_reader.search(QTEXT, k=10)
    ] == [(h["doc_id"], h["score"]) for h in warm]
    # new readers see the compacted generation (scores re-finalized
    # over the reduced corpus — compare against its own reference),
    # and the tombstoned doc stays gone
    ref = IndexReader(dest).search(QTEXT, k=10)
    fresh = IndexReader(read_alias(alias)).search(QTEXT, k=10)
    assert [(h["doc_id"], h["score"]) for h in fresh] == [
        (h["doc_id"], h["score"]) for h in ref
    ]
    assert head[0]["doc_id"] not in {h["doc_id"] for h in fresh}

    # retire the old generation: alias readers keep working
    shutil.rmtree(idx)
    after = IndexReader(read_alias(alias)).search(QTEXT, k=10)
    assert [(h["doc_id"], h["score"]) for h in after] == [
        (h["doc_id"], h["score"]) for h in ref
    ]

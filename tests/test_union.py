"""D2 union of corpus shards: a union of disjoint language-filtered
shards must build a byte-identical index to the direct full-corpus
build (segment bytes are deterministic by content, not block order)."""

import hashlib
import os


def _postings_sha(index_dir: str) -> dict[str, str]:
    from engine.segments import list_segments

    out = {}
    for seg in list_segments(index_dir):
        with open(os.path.join(seg, "postings.bin"), "rb") as f:
            out[os.path.basename(seg)] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_union_of_language_shards_builds_identical_index(ray_session, tmp_path):
    from engine.build import build_index
    from engine.corpus import read_corpus_from_documents, union_corpora

    sf = "/root/testdata/sf0.001"
    full = read_corpus_from_documents(sf)
    shards = union_corpora(
        [
            read_corpus_from_documents(sf, langs=["en", "es"]),
            read_corpus_from_documents(sf, langs=["de", "fr"]),
            read_corpus_from_documents(sf, langs=["zh"]),
        ]
    )
    a = str(tmp_path / "full")
    b = str(tmp_path / "union")
    sa = build_index(full, a, num_parts=4, analyzer="simple",
                     analyzer_concurrency=(1, 2), source="full")
    sb = build_index(shards, b, num_parts=4, analyzer="simple",
                     analyzer_concurrency=(1, 2), source="union")
    assert sa["num_docs"] == sb["num_docs"] > 0
    assert sa["total_postings"] == sb["total_postings"]
    assert _postings_sha(a) == _postings_sha(b)

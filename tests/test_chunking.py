"""chunk_documents / pack_sequences vs pure-Python recomputation and
DuckDB (documents table).  Key invariants: windows tile every token,
pack offsets are an exclusive prefix sum in doc_id order, and both are
independent of parallelism / bucket count."""

import duckdb
import pytest

from engine import chunking

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    c = duckdb.connect()
    return c.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_chunks_vs_python(ray_session, docs):
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunking.chunk_documents(SF, size=32, stride=16).take_all()
    }
    want = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        for cid, s in enumerate(range(0, len(toks), 16)):
            w = toks[s : s + 32]
            want[(doc_id, cid)] = (len(w), " ".join(w))
    assert got == want


def test_chunks_cover_all_tokens_no_stride_gap(ray_session):
    # stride == size -> disjoint tiling: n_tokens sums to doc_len
    rows = chunking.chunk_documents(SF, size=16, stride=16).take_all()
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    lens = {
        r["doc_id"]: r["doc_len"]
        for r in chunking.pack_sequences(SF, budget=256).take_all()
        if r["doc_len"] > 0
    }
    assert per_doc == lens


def test_pack_prefix_sum_and_bucket_independence(ray_session):
    a = sorted(
        (r["doc_id"], r["doc_len"], r["tok_offset"], r["seq_id"])
        for r in chunking.pack_sequences(SF, budget=256, num_buckets=3).take_all()
    )
    b = sorted(
        (r["doc_id"], r["doc_len"], r["tok_offset"], r["seq_id"])
        for r in chunking.pack_sequences(SF, budget=256, num_buckets=11).take_all()
    )
    assert a == b
    # exclusive prefix sum in doc_id order
    acc = 0
    for doc_id, doc_len, off, seq in a:
        assert off == acc
        assert seq == off // 256
        acc += doc_len

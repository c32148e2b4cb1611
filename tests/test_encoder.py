"""Text->embedding encoder stage: fake-backend projection vs a local
numpy oracle, determinism, capability gate, and the encode -> ANN
end-to-end wiring (VERDICT r04 task #3)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import encoder
from engine.functions import fnv1a64


SF = "/root/testdata/sf0.001"


def _local_encode(texts, dim):
    """Scalar-oracle replay of the fake projection."""
    out = {}
    for i, text in enumerate(texts):
        toks = [w.lower() for w in text.split(" ") if w]
        if not toks:
            continue
        s = np.zeros(dim, dtype=np.int64)
        for t in toks:
            h = fnv1a64(t)
            s[h % dim] += 1 if (h >> 63) & 1 else -1
        n2 = int((s * s).sum())
        v = s.astype(np.float64)
        if n2 > 0:
            v = v / np.sqrt(float(n2))
        out[i] = v
    return out


def test_fake_encoder_matches_scalar_oracle(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "data processing at scale with streaming batches",
        "",  # zero tokens -> dropped
        "   ",  # whitespace only -> dropped
        "naïve ütf8 tökens",  # non-ASCII bytes
        "repeat repeat repeat repeat",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    dim = 16
    got = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in encoder.encode_documents(str(tmp_path), dim=dim).take_all()
    }
    want = _local_encode(texts, dim)
    assert set(got) == set(want)
    for did in want:
        assert np.allclose(got[did], want[did], atol=0), did
    # determinism: a second run is bit-identical
    again = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in encoder.encode_documents(str(tmp_path), dim=dim).take_all()
    }
    for did in got:
        assert (got[did] == again[did]).all()


def test_fake_encoder_unit_norm(ray_session):
    rows = encoder.encode_documents(SF, dim=32).take_all()
    assert rows
    for r in rows[:50]:
        v = np.asarray(r["embedding"])
        n = float(np.linalg.norm(v))
        # signs can cancel to a zero vector, otherwise unit norm
        assert n == 0.0 or abs(n - 1.0) < 1e-9


def test_model_backend_capability_gate():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        encoder.TextEncoder(backend="model")
    with pytest.raises(ValueError, match="unknown encoder backend"):
        encoder.TextEncoder(backend="bogus")


def test_encode_flat_matches_vectors(ray_session):
    from engine.functions import round6_signed

    dim = 16
    vecs = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in encoder.encode_documents(SF, dim=dim).take_all()
    }
    flat = encoder.encode_documents_flat(SF, dim=dim).take_all()
    assert len(flat) == len(vecs) * dim
    for r in flat[:200]:
        assert r["value_r"] == round6_signed(vecs[r["doc_id"]][r["dim"]])


def test_encode_to_ann_end_to_end(ray_session, tmp_path):
    """The wiring VERDICT asked for: encoder output materialized in the
    embeddings-table shape feeds knn_bruteforce unchanged, and the
    top-k matches a local numpy cosine oracle."""
    from engine import similarity

    out = encoder.encode_to_parquet(SF, str(tmp_path / "enc"), dim=32)
    got = similarity.knn_bruteforce(out, k=3, n_queries=4).take_all()
    assert got

    t = pq.read_table(f"{out}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    m = np.vstack(t.column("embedding").to_numpy(zero_copy_only=False))
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    qids = ids[:4]
    from engine.functions import round6

    sims = round6(m[:4] @ m.T)
    want = []
    for qi in range(4):
        row = sims[qi]
        top = np.lexsort((ids, -row))[:3]
        for rank, j in enumerate(top, 1):
            want.append((int(qids[qi]), rank, int(ids[j]), float(row[j])))
    got_t = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine_r"]) for r in got
    )
    assert got_t == sorted(want)


def test_encoded_vectors_feed_embedding_dedup(ray_session, tmp_path):
    """Encoded near-identical docs are caught by embedding_dedup_keep
    over the encoder's materialized table (threshold close to 1)."""
    from engine import dedup

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        "totally different words here about other topics entirely",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = encoder.encode_to_parquet(
        str(tmp_path), str(tmp_path / "enc"), dim=32
    )
    kept = sorted(
        r["vec_id"]
        for r in dedup.embedding_dedup_keep(out, threshold=0.99).take_all()
    )
    assert kept == [1, 3]  # doc 2 is doc 1's duplicate -> dropped

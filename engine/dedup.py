"""Deduplication operators over a document corpus — the training-data
pipeline family: exact, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup.

All operate on the driver ``documents`` table (doc_id:int64,
text:string) as Ray Data pipelines; every shuffle key is a hash (digest,
shingle hash, band bucket) so the exchanges are skew-resistant, and
per-batch combiners run before every groupby so the shuffle moves
partials, not token streams.

Scale notes (100 TB corpus):
- exact_dedup moves one 16-byte digest row per doc; the groupby is the
  only exchange.
- ngram_jaccard_pairs materializes candidate PAIRS; at corpus scale it
  must be gated behind minhash_lsh_pairs (which prunes candidates to
  LSH-colliding ones) — exposed here separately so the exact operator
  stays an oracle-checkable building block.
- minhash signatures are fixed-width (NUM_HASHES u64), so the band
  exchange is O(docs x bands) small rows; verification re-computes
  exact Jaccard only for colliding pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .functions import round6, round6_scalar

# ---------------------------------------------------------------------------
# shared tokenization / shingling (whitespace tokens — SQL-replicable)
# ---------------------------------------------------------------------------

MERSENNE = (1 << 61) - 1  # modulus for the affine minhash family
NUM_HASHES = 128
BANDS = 32  # x ROWS_PER_BAND = NUM_HASHES
ROWS_PER_BAND = 4


def _tokens(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """text column -> (per-doc token counts, flat nonempty lowercase
    tokens).  Same tokenization as the DuckDB oracle:
    lower(string_split(text, ' ')) with empties dropped."""
    col = batch.column("text")
    col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    split = pc.split_pattern(col, " ")
    flat = pc.utf8_lower(split.flatten())
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(np.arange(len(lens)), lens)[nonempty]
    counts = np.bincount(doc_rep, minlength=len(lens)).astype(np.int64)
    return counts, flat.filter(pa.array(nonempty))


def _shingle_hashes(batch: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per doc: DISTINCT word n-gram hashes (uint64).

    Returns (doc_rep, shingle_hash) flat arrays.  The hash is a 64-bit
    FNV-1a over the joined shingle string — stable across runs and
    processes (no PYTHONHASHSEED dependence).
    """
    counts, flat = _tokens(batch)
    toks = flat.to_pylist()
    bounds = np.concatenate(([0], np.cumsum(counts)))
    doc_out: list[int] = []
    h_out: list[int] = []
    for d in range(len(counts)):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        if hi - lo < n:
            continue
        seen = set()
        words = toks[lo:hi]
        for i in range(hi - lo - n + 1):
            s = " ".join(words[i : i + n])
            if s not in seen:
                seen.add(s)
                h_out.append(_fnv1a64(s))
                doc_out.append(d)
    return np.asarray(doc_out, dtype=np.int64), np.asarray(h_out, dtype=np.uint64)


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# ---------------------------------------------------------------------------
# D-EX: exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact content dedup: keep the minimum doc_id per distinct text.

    map_batches digest (per-row md5, vectorized-ish) -> groupby(digest)
    min(doc_id).  Returns (doc_id) of kept docs.  Oracle:
    ``SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)``.
    """

    def digest(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "h": pa.array([hashlib.md5(t.encode()).hexdigest() for t in texts]),
                "doc_id": batch.column("doc_id"),
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(digest, batch_format="pyarrow")
        .groupby("h")
        .min("doc_id")
        .map_batches(
            lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# D-NG: exact n-gram Jaccard pairs (inverted index on shingles)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5) -> "ray.data.Dataset":
    """All doc pairs with word-``n``-gram Jaccard >= threshold.

    Pipeline: per-doc distinct shingle hashes -> explode (shingle, doc)
    -> groupby(shingle).map_groups(emit in-bucket pairs) -> groupby
    (a, b) count = |intersection| -> join per-doc shingle counts
    (broadcast: the count map is 8 bytes/doc) -> jaccard + filter.
    Returns (a, b, jaccard_r) with a < b, jaccard rounded to 6 dp.
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        doc_rep, hashes = _shingle_hashes(batch, n)
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "sh": pa.array(hashes, pa.uint64()),
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow")

    # per-doc shingle set sizes (collected to the driver: 1 row/doc, then
    # broadcast via ray.put — a lookup, not a shuffle join)
    sizes_ds = exploded.groupby("doc_id").count()
    sizes = {
        r["doc_id"]: r["count()"] for r in sizes_ds.iter_rows()
    }
    sizes_ref = ray.put(sizes)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group.column("doc_id").to_numpy())
        if len(ids) < 2 or len(ids) > 1000:  # hot-shingle guard (stopword shingles)
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"a": pa.array(ids[a_idx], pa.int64()), "b": pa.array(ids[b_idx], pa.int64())}
        )

    pairs = exploded.groupby("sh").map_groups(bucket_pairs, batch_format="pyarrow")
    inter = pairs.groupby(["a", "b"]).count()

    def finish(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        c = batch.column("count()").to_numpy().astype(np.float64)
        ca = np.array([sz[x] for x in a], dtype=np.float64)
        cb = np.array([sz[x] for x in b], dtype=np.float64)
        j = c / (ca + cb - c)
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "jaccard_r": pa.array(round6(j[keep]), pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# D-MH: MinHash + LSH candidate pairs, exact-verified
# ---------------------------------------------------------------------------


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic affine family h_i(x) = (a_i * x + b_i) mod p."""
    rng = np.random.RandomState(0xC0FFEE & 0x7FFFFFFF)
    a = rng.randint(1, MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    return a, b


def _signatures(batch: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids kept, signature matrix [n_docs x NUM_HASHES] u64).
    Docs with < n tokens are dropped (no shingles)."""
    doc_rep, hashes = _shingle_hashes(batch, n)
    ids = batch.column("doc_id").to_numpy()
    if len(doc_rep) == 0:
        return np.zeros(0, np.int64), np.zeros((0, NUM_HASHES), np.uint64)
    A, B = _minhash_params()
    x = (hashes % np.uint64(MERSENNE)).astype(np.uint64)
    # python-object modmul is exact; vectorize via object dtype only at
    # the reduceat level: use 128-bit-safe double-split multiply instead
    hi = x >> np.uint64(32)
    lo = x & np.uint64(0xFFFFFFFF)
    uniq_docs, starts = np.unique(doc_rep, return_index=True)
    sig = np.empty((len(uniq_docs), NUM_HASHES), dtype=np.uint64)
    bounds = np.append(starts, len(doc_rep))
    for j in range(NUM_HASHES):
        aj, bj = A[j], B[j]
        # (a*x + b) mod p with p = 2^61-1 using split multiply:
        # a*x = a*hi*2^32 + a*lo; reduce each part mod p
        t1 = (aj * hi) % np.uint64(MERSENNE)
        t1 = (t1 << np.uint64(32)) % np.uint64(MERSENNE)
        t2 = (aj * lo) % np.uint64(MERSENNE)
        hv = (t1 + t2 + bj) % np.uint64(MERSENNE)
        sig[:, j] = np.minimum.reduceat(hv, bounds[:-1])
    return ids[uniq_docs], sig


def minhash_lsh_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5
) -> "ray.data.Dataset":
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    map_batches(signatures) -> explode (band_id, bucket_hash, doc_id) ->
    groupby bucket -> candidate pairs -> dedupe -> exact-verify (shingle
    sets of candidates only, broadcast) -> (a, b, jaccard_r).
    Candidate recall vs the exact operator is property-tested in
    tests/test_dedup.py (banding theory: P[collide] = 1-(1-j^r)^b).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bands(batch: pa.Table) -> pa.Table:
        ids, sig = _signatures(batch, n)
        if len(ids) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.uint64()), "doc_id": pa.array([], pa.int64())}
            )
        view = sig.reshape(len(ids), BANDS, ROWS_PER_BAND)
        buckets = np.empty((len(ids), BANDS), dtype=np.uint64)
        for bnd in range(BANDS):
            h = np.full(len(ids), 0xCBF29CE484222325, dtype=np.uint64)
            h = (h ^ np.uint64(bnd)) * np.uint64(0x100000001B3)
            for r in range(ROWS_PER_BAND):
                col = view[:, bnd, r]
                h = (h ^ (col & np.uint64(0xFFFFFFFF))) * np.uint64(0x100000001B3)
                h = (h ^ (col >> np.uint64(32))) * np.uint64(0x100000001B3)
            buckets[:, bnd] = h
        return pa.table(
            {
                "bucket": pa.array(buckets.ravel(), pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, BANDS), pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("doc_id").to_numpy())
        if len(ids) < 2 or len(ids) > 1000:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"a": pa.array(ids[ai], pa.int64()), "b": pa.array(ids[bi], pa.int64())}
        )

    cand = (
        docs.map_batches(bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    # exact verification of candidates: shingle sets broadcast once
    shingle_sets: dict[int, set] = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        doc_rep, hashes = _shingle_hashes(b, n)
        ids = b.column("doc_id").to_numpy()
        for d, h in zip(doc_rep, hashes):
            shingle_sets.setdefault(int(ids[d]), set()).add(int(h))
    sets_ref = ray.put(shingle_sets)

    def verify(batch: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        keep_a, keep_b, js = [], [], []
        for x, y in zip(a, b):
            sx, sy = ss.get(int(x), set()), ss.get(int(y), set())
            if not sx or not sy:
                continue
            inter = len(sx & sy)
            j = inter / (len(sx) + len(sy) - inter)
            if j >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                js.append(round6_scalar(j))
        return pa.table(
            {
                "a": pa.array(keep_a, pa.int64()),
                "b": pa.array(keep_b, pa.int64()),
                "jaccard_r": pa.array(js, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# D-SH: SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash:uint64): 64-bit SimHash over tf-weighted token
    FNV hashes — vectorized bit-count accumulation per batch."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fp(batch: pa.Table) -> pa.Table:
        counts, flat = _tokens(batch)
        toks = flat.to_pylist()
        th = np.array([_fnv1a64(t) for t in toks], dtype=np.uint64)
        doc_rep = np.repeat(np.arange(len(counts)), counts)
        # bits matrix: +1/-1 per bit, summed per doc
        sims = np.zeros(len(counts), dtype=np.uint64)
        if len(th):
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            ) * 2 - 1
            acc = np.zeros((len(counts), 64), dtype=np.int64)
            np.add.at(acc, doc_rep, bits)
            sims = (
                (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sims, pa.uint64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Scale path (implemented): 4-block permutation index — split the 64
    bits into 4 x 16-bit keys; docs within Hamming <= 3 must agree on at
    least one block (pigeonhole), so groupby each block key and check
    exact distance only within buckets.
    """
    fps = simhash_fingerprints(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sh = batch.column("simhash").to_numpy()
        blocks = []
        for blk in range(4):
            key = ((sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.uint64)
            key = key | (np.uint64(blk) << np.uint64(16))  # disjoint keyspace per block
            blocks.append(
                pa.table(
                    {
                        "key": pa.array(key, pa.uint64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "simhash": pa.array(sh, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(blocks)

    def bucket_check(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        sh = group.column("simhash").to_numpy()
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        # drop same-doc duplicates from multi-block collisions
        uniq = np.ones(len(ids), dtype=bool)
        uniq[1:] = ids[1:] != ids[:-1]
        ids, sh = ids[uniq], sh[uniq]
        if len(ids) < 2 or len(ids) > 2000:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        ai, bi = np.triu_indices(len(ids), k=1)
        x = sh[ai] ^ sh[bi]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[ai[keep]], pa.int64()),
                "b": pa.array(ids[bi[keep]], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow")
        .groupby("key")
        .map_groups(bucket_check, batch_format="pyarrow")
    )
    # a pair can collide in several blocks -> dedupe
    return pairs.groupby(["a", "b"]).min("hamming").map_batches(
        lambda b: b.rename_columns(["a", "b", "hamming"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# D-EC: embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95) -> "ray.data.Dataset":
    """Pairs of vectors with cosine similarity >= threshold.

    The full (normalized) matrix is broadcast once via ray.put; each
    batch computes a [batch x all] matmul and keeps pairs above the
    threshold with a < b.  At corpus scale the broadcast side must be an
    IVF/LSH partition (engine.similarity) — this brute-force operator is
    the exactness baseline that variant is tested against.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = t.column("vec_id").to_numpy()
    mat = np.vstack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids_all, mat))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        m = np.vstack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        sims = m @ all_mat.T
        bi, aj = np.nonzero(sims >= threshold)
        a = ids[bi]
        b = all_ids[aj]
        keep = a < b
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine_r": pa.array(round6(sims[bi, aj][keep]), pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")

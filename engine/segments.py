"""Compressed on-disk index segments: build (S3), layout, reader (Q1 data).

Spec: BASELINE.json:6 — "distributed sort-merge of partial postings into
a compressed on-disk index (delta-encoded docID gaps + varbyte blocks
with skip pointers)", "checkpointed segment writes that allow resume
after failure".

Segment = one document partition (part = doc_id % P; engine/__init__.py
architecture note).  Layout under ``<out>/segments/seg-{part:05d}/``:

- ``docs.parquet``   — this partition's documents sorted by doc_id; the
  ROW INDEX is the document's local ordinal.  Postings store ordinals,
  so docID gaps are small and varbyte-compress well; ordinal -> doc_id
  is an array lookup at query time.
- ``postings.bin``   — three sections, [docs][tfs][positions]:
    * doc section: per term, ordinal gaps in 128-posting blocks
      (absolute restart at each block start -> a block decodes without
      its predecessor: that block table IS the skip-pointer structure);
    * tf section: per term, varbyte tfs, block-aligned offsets;
    * pos section: per term, per posting, position gaps (first
      absolute), varbyte; only read by positional queries, never by
      BM25 scoring.
- ``dict.parquet``   — per term: local df/cf/max_tf + byte extents of
  its three stream slices (schema engine.schema.SEGMENT_DICT).
- ``fwd.parquet``    — forward index: per doc (doc_id, term_rows, tfs)
  where term_rows are int32 DICTIONARY ROW indices (the term strings
  live once in dict.parquet — no string repetition), rows in doc_id
  order, SMALL row groups so a point lookup reads one row group
  (more-like-this term selection without scanning the segment
  vocabulary).
- ``blockmax.parquet`` — per term: per-block last ordinal (skip
  pointer), max tf (block-max WAND bound), block byte offsets.
- ``manifest.json``  — lineage + metrics (written LAST = commit marker;
  see engine.checkpoint).

Everything in the build path is vectorized numpy/arrow over the whole
segment — one dictionary-encode, one stable argsort, one varbyte pass
per stream; no Python loop over postings.

Writes are object-store safe: every file commits atomically through
engine.fsio (tmp+rename locally, atomic PUT on object stores) and
``manifest.json`` is written LAST as the commit marker — no directory
rename exists.  Retries overwrite-or-skip identical deterministic
bytes; crashed attempts leave no manifest and are cleared + rebuilt on
resume (clear_uncommitted).
"""

from __future__ import annotations

import hashlib
import mmap
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import fsio
from .codecs import delta_encode, vb_decode, vb_encode
from .schema import POSTINGS_BLOCK

SEG_PREFIX = "seg-"

# term-hash shards of the global df/cf table (per-segment gt.parquet
# partials; see _write_gt_partial / engine.query._ShardedDf)
GT_NUM_SHARDS = 16


def _arr(table: pa.Table, name: str) -> pa.Array:
    """Column as a single contiguous pa.Array (not ChunkedArray)."""
    col = table.column(name)
    if col.num_chunks == 1:
        return col.chunk(0)
    if col.num_chunks == 0:
        return pa.array([], type=col.type)
    return col.combine_chunks()


def seg_dir(out_dir: str, part: int) -> str:
    return fsio.join(out_dir, "segments", f"{SEG_PREFIX}{part:05d}")


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


def _dedup_sorted(group: pa.Table) -> tuple[pa.Table, int]:
    """D1: sort by (doc_id, content_sha256), keep first row per doc_id.

    Returns (docs sorted by doc_id — row index is the local ordinal,
    number of duplicate rows dropped).
    """
    doc_id = group.column("doc_id").to_numpy(zero_copy_only=False)
    sha = group.column("content_sha256").to_numpy(zero_copy_only=False)
    order = np.lexsort((sha, doc_id))
    sorted_ids = doc_id[order]
    keep = np.ones(order.size, dtype=bool)
    keep[1:] = sorted_ids[1:] != sorted_ids[:-1]
    kept = order[keep]
    return group.take(pa.array(kept, pa.int64())), int(order.size - kept.size)


def _exclusive_cumsum(x: np.ndarray) -> np.ndarray:
    out = np.empty(x.size + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(x, out=out[1:])
    return out


def build_segment(group: pa.Table, out_dir: str, part: int, analyzer: str) -> dict:
    """Invert one partition's ANALYZED_DOC rows into a compressed segment.

    Returns the manifest dict (also written to disk, atomically).
    """
    t0 = time.perf_counter()
    group = group.combine_chunks()
    docs, dup_dropped = _dedup_sorted(group)
    n_docs = docs.num_rows

    doc_lens = docs.column("doc_len").to_numpy()

    # ---- flatten per-doc postings -> parallel arrays of length M ----
    terms_list = _arr(docs, "terms")
    tfs_list = _arr(docs, "tfs")
    pos_list = _arr(docs, "poslists")
    counts = pc.list_value_length(terms_list).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_terms = terms_list.flatten()
    flat_tfs = tfs_list.flatten().to_numpy().astype(np.int64)
    flat_pos = pos_list.flatten()  # list<int32>, length M
    m = len(flat_terms)
    ord_rep = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    # ---- sort postings by (term, ordinal) via dictionary codes ----
    # terms are sorted within each doc and docs are scanned in ordinal
    # order, so a STABLE sort on the term code alone yields (term, ord).
    if m:
        denc = pc.dictionary_encode(flat_terms)
        codes = denc.indices.to_numpy().astype(np.int64)
        uniq = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        uniq_order = np.argsort(uniq)  # unicode code-point order (== python sorted)
        rank = np.empty(uniq.size, dtype=np.int64)
        rank[uniq_order] = np.arange(uniq.size)
        sorted_codes = rank[codes]
        perm = np.argsort(sorted_codes, kind="stable")
        p_code = sorted_codes[perm]
        p_ord = ord_rep[perm]
        p_tf = flat_tfs[perm]
        vocab = uniq[uniq_order]
    else:
        perm = np.zeros(0, dtype=np.int64)
        p_code = p_ord = p_tf = np.zeros(0, dtype=np.int64)
        sorted_codes = np.zeros(0, dtype=np.int64)
        vocab = np.zeros(0, dtype=object)
    n_terms = vocab.size

    # ---- term runs and 128-posting blocks ----
    term_starts = np.nonzero(np.diff(p_code, prepend=-1))[0] if m else np.zeros(0, dtype=np.int64)
    term_bounds = np.append(term_starts, m)  # len V+1
    df_local = np.diff(term_bounds)
    nblocks = (df_local + POSTINGS_BLOCK - 1) // POSTINGS_BLOCK
    total_blocks = int(nblocks.sum())
    block_bounds = _exclusive_cumsum(nblocks)  # per-term first block index, len V+1
    within = np.arange(total_blocks, dtype=np.int64) - np.repeat(block_bounds[:-1], nblocks)
    block_starts = np.repeat(term_starts, nblocks) + within * POSTINGS_BLOCK
    block_ends = np.minimum(
        block_starts + POSTINGS_BLOCK, np.repeat(term_bounds[1:], nblocks)
    )

    # ---- doc-ordinal stream: delta with restart at every block ----
    doc_deltas = delta_encode(p_ord, block_starts)
    doc_bytes, nb_doc = vb_encode(doc_deltas)
    off_doc = _exclusive_cumsum(nb_doc)  # byte offset of posting i in doc section

    # ---- tf stream ----
    tf_bytes, nb_tf = vb_encode(p_tf)
    off_tf = _exclusive_cumsum(nb_tf)

    # ---- positions stream: per-posting gaps, first absolute ----
    if m:
        flat_pos_perm = flat_pos.take(pa.array(perm, pa.int64()))
        pos_counts = (
            pc.list_value_length(flat_pos_perm).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        pos_values = flat_pos_perm.flatten().to_numpy().astype(np.int64)
        posting_pos_starts = _exclusive_cumsum(pos_counts)  # len M+1
        pos_deltas = delta_encode(pos_values, posting_pos_starts[:-1][pos_counts > 0])
        pos_bytes, nb_pos = vb_encode(pos_deltas)
        off_pos = _exclusive_cumsum(nb_pos)
        term_pos_value_bounds = posting_pos_starts[term_bounds]
    else:
        pos_bytes = b""
        off_pos = np.zeros(1, dtype=np.int64)
        term_pos_value_bounds = np.zeros(1, dtype=np.int64)

    # ---- per-term absolute byte extents (sections concatenated) ----
    doc_sec_len = len(doc_bytes)
    tf_sec_len = len(tf_bytes)
    term_doc_off = off_doc[term_bounds]  # len V+1
    term_tf_off = off_tf[term_bounds]
    term_pos_off = off_pos[term_pos_value_bounds]

    dict_table = pa.table(
        {
            "term": pa.array(vocab.tolist(), pa.string()),
            "df": pa.array(df_local, pa.int64()),
            "cf": pa.array(
                np.add.reduceat(p_tf, term_starts) if m else np.zeros(0, np.int64),
                pa.int64(),
            ),
            "n_postings": pa.array(df_local.astype(np.int32), pa.int32()),
            "max_tf": pa.array(
                (np.maximum.reduceat(p_tf, term_starts) if m else np.zeros(0, np.int64)).astype(
                    np.int32
                ),
                pa.int32(),
            ),
            "doc_off": pa.array(term_doc_off[:-1], pa.int64()),
            "doc_nbytes": pa.array(np.diff(term_doc_off), pa.int64()),
            "tf_off": pa.array(term_tf_off[:-1] + doc_sec_len, pa.int64()),
            "tf_nbytes": pa.array(np.diff(term_tf_off), pa.int64()),
            "pos_off": pa.array(term_pos_off[:-1] + doc_sec_len + tf_sec_len, pa.int64()),
            "pos_nbytes": pa.array(np.diff(term_pos_off), pa.int64()),
        }
    )

    # ---- block table (skip pointers + block-max) ----
    boffs_dtype = pa.list_(pa.int64())
    if total_blocks:
        last_ords = p_ord[block_ends - 1]
        blk_max_tf = np.maximum.reduceat(p_tf, block_starts)
        blk_doc_boffs = off_doc[block_starts] - np.repeat(term_doc_off[:-1], nblocks)
        blk_tf_boffs = off_tf[block_starts] - np.repeat(term_tf_off[:-1], nblocks)
    else:
        last_ords = blk_max_tf = blk_doc_boffs = blk_tf_boffs = np.zeros(0, np.int64)
    boff32 = pa.array(block_bounds, pa.int32())
    blockmax_table = pa.table(
        {
            "term": dict_table.column("term"),
            "last_dids": pa.ListArray.from_arrays(boff32, pa.array(last_ords, pa.int64())),
            "max_tfs": pa.ListArray.from_arrays(
                boff32, pa.array(blk_max_tf.astype(np.int32), pa.int32())
            ),
            "doc_boffs": pa.ListArray.from_arrays(boff32, pa.array(blk_doc_boffs, pa.int64())),
            "tf_boffs": pa.ListArray.from_arrays(boff32, pa.array(blk_tf_boffs, pa.int64())),
        }
    ) if n_terms else pa.table(
        {
            "term": pa.array([], pa.string()),
            "last_dids": pa.array([], boffs_dtype),
            "max_tfs": pa.array([], pa.list_(pa.int32())),
            "doc_boffs": pa.array([], boffs_dtype),
            "tf_boffs": pa.array([], boffs_dtype),
        }
    )

    docs_table = docs.select(
        ["doc_id", "doc_len", "repo", "path", "commit", "lang", "content_sha256"]
    )
    # forward index: doc-major dictionary-row refs (sorted_codes is the
    # doc-major flat term-rank stream; ranks are in term-string order,
    # so per-doc lists come out term-sorted)
    fwd_off32 = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    fwd_table = pa.table(
        {
            "doc_id": docs.column("doc_id"),
            "term_rows": pa.ListArray.from_arrays(
                fwd_off32, pa.array(sorted_codes.astype(np.int32), pa.int32())
            ),
            "tfs": pa.ListArray.from_arrays(
                fwd_off32, pa.array(flat_tfs.astype(np.int32), pa.int32())
            ),
        }
    )

    # ---- object-store-safe commit: per-file atomic writes (write-once
    # content; atomic PUT on object stores, tmp+rename locally — see
    # engine.fsio), then manifest.json LAST as the commit marker.  No
    # directory rename exists; a retry racing a winner skips identical
    # write-once files, and a crashed attempt leaves no manifest, so
    # resume rebuilds the segment (build_index clears uncommitted
    # segment dirs of remaining parts first). ----
    final = seg_dir(out_dir, part)
    fsio.makedirs(final)
    fsio.write_chunks(
        fsio.join(final, "postings.bin"),
        [doc_bytes, tf_bytes, pos_bytes],
        once=True,
    )
    fsio.write_parquet(dict_table, fsio.join(final, "dict.parquet"), once=True)
    _write_gt_partial(dict_table, fsio.join(final, "gt.parquet"))
    fsio.write_parquet(
        blockmax_table, fsio.join(final, "blockmax.parquet"), once=True
    )
    fsio.write_parquet(docs_table, fsio.join(final, "docs.parquet"), once=True)
    # small row groups: a doc_id point lookup decodes one row group via
    # the parquet min/max stats, not the whole partition
    fsio.write_parquet(
        fwd_table, fsio.join(final, "fwd.parquet"), once=True, row_group_size=1024
    )

    sha_roll = hashlib.sha256()
    for s in docs_table.column("content_sha256").to_pylist():
        sha_roll.update(s.encode())
    manifest = {
        "part": int(part),
        "analyzer": analyzer,
        "num_docs": int(n_docs),
        "dup_rows_dropped": int(dup_dropped),
        "vocab_size": int(n_terms),
        "num_postings": int(m),
        "total_doc_len": int(doc_lens.sum()) if n_docs else 0,
        "min_doc_len": int(doc_lens.min()) if n_docs else 0,
        "content_sha256_rollup": sha_roll.hexdigest(),
        "postings_bytes": doc_sec_len + tf_sec_len + len(pos_bytes),
        "sections": {"doc": doc_sec_len, "tf": tf_sec_len, "pos": len(pos_bytes)},
        "build_seconds": round(time.perf_counter() - t0, 4),
    }
    fsio.write_json(fsio.join(final, "manifest.json"), manifest)
    return manifest


def clear_uncommitted(out_dir: str, parts) -> None:
    """Delete the segment dirs of PARTS that lack a committed manifest —
    a crashed attempt may have left partial write-once files there, and
    rebuild must start from empty keys (engine.fsio commit protocol)."""
    for p in parts:
        d = seg_dir(out_dir, int(p))
        if fsio.exists(d):
            fsio.rmtree(d)


def _write_gt_partial(dict_table: pa.Table, path: str) -> None:
    """Write this segment's (shard, term, df, cf) global-terms PARTIAL,
    one parquet ROW GROUP per term-hash shard (shard column stats locate
    a shard's row group without reading the rest).

    This is how global df/cf is maintained WITHOUT any build-time
    all-to-all: the merge task that just inverted the segment already
    holds its dictionary, so the per-shard slices are written here (one
    extra small parquet, atomic with the segment) and the read side
    (engine.query._ShardedDf) SUMS the per-segment partials of a shard
    lazily — resident vocabulary stays shard-bounded, and finalize
    (engine.build.finalize_stats) needs no groupby over dictionaries.
    """
    from .functions import fnv1a64_arr

    terms = dict_table.column("term").to_pylist()
    sub = pa.table(
        {
            "shard": pa.array(
                (fnv1a64_arr(terms) % np.uint64(GT_NUM_SHARDS)).astype(np.int32),
                pa.int32(),
            ),
            "term": dict_table.column("term"),
            "df": dict_table.column("df"),
            "cf": dict_table.column("cf"),
        }
    )
    # dict rows are term-sorted; a stable sort by shard keeps terms
    # sorted within each shard -> deterministic bytes
    import io

    sub = sub.sort_by("shard")
    shards = sub.column("shard").to_numpy()
    bounds = np.nonzero(np.diff(shards, prepend=-1))[0] if len(shards) else []
    buf = io.BytesIO()
    with pq.ParquetWriter(buf, sub.schema) as w:
        for i, lo in enumerate(bounds):
            hi = bounds[i + 1] if i + 1 < len(bounds) else len(shards)
            w.write_table(sub.slice(lo, hi - lo))
    fsio.write_bytes_once(path, buf.getvalue())


def read_gt_shard(seg_path: str, shard: int) -> pa.Table | None:
    """One shard's (term, df, cf) rows from a segment's gt.parquet,
    reading only that shard's row group (located via column stats)."""
    fp = fsio.join(seg_path, "gt.parquet")
    if not fsio.exists(fp):
        return None
    pf = fsio.parquet_file(fp)
    md = pf.metadata
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(0).statistics
        if st is not None and st.min == shard and st.max == shard:
            return pf.read_row_group(rg, columns=["term", "df", "cf"])
    return None


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


class Segment:
    """Read-side view of one segment, loaded once per scorer actor (A1).

    The dictionary and block tables are held as in-memory arrays keyed
    by a term->row hash map; postings.bin is mmapped so block decodes
    slice without copying the file into the heap.
    """

    def __init__(self, path: str):
        self.path = path
        d = fsio.read_parquet(fsio.join(path, "dict.parquet"))
        self.terms: list[str] = d.column("term").to_pylist()  # row order == term order
        self.term_idx: dict[str, int] = {t: i for i, t in enumerate(self.terms)}
        self.df = d.column("df").to_numpy()
        self.cf = d.column("cf").to_numpy()
        self.max_tf = d.column("max_tf").to_numpy()
        self.doc_off = d.column("doc_off").to_numpy()
        self.doc_nbytes = d.column("doc_nbytes").to_numpy()
        self.tf_off = d.column("tf_off").to_numpy()
        self.tf_nbytes = d.column("tf_nbytes").to_numpy()
        self.pos_off = d.column("pos_off").to_numpy()
        self.pos_nbytes = d.column("pos_nbytes").to_numpy()
        self.n_postings = d.column("n_postings").to_numpy()

        b = fsio.read_parquet(fsio.join(path, "blockmax.parquet"))
        self.blk_last = _list_col(b, "last_dids")
        self.blk_max_tf = _list_col(b, "max_tfs")
        self.blk_doc_boffs = _list_col(b, "doc_boffs")
        self.blk_tf_boffs = _list_col(b, "tf_boffs")

        docs = fsio.read_parquet(fsio.join(path, "docs.parquet"))
        self.doc_ids = docs.column("doc_id").to_numpy()
        self.doc_lens = docs.column("doc_len").to_numpy().astype(np.float64)
        self.repo = docs.column("repo").to_numpy(zero_copy_only=False)
        self.dpath = docs.column("path").to_numpy(zero_copy_only=False)
        self.num_docs = len(self.doc_ids)
        self.min_doc_len = float(self.doc_lens.min()) if self.num_docs else 1.0

        self.manifest = fsio.read_json(fsio.join(path, "manifest.json"))
        self.buf: memoryview | bytes
        if "://" not in path and not fsio.FORCE_NO_RENAME:
            # local fast path: mmap so block decodes slice zero-copy
            self._f = open(os.path.join(path, "postings.bin"), "rb")
            size = os.fstat(self._f.fileno()).st_size
            if size:
                self.buf = memoryview(
                    mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
                )
            else:
                self.buf = b""
        else:
            # generic-filesystem path: one ranged read of the postings
            # file (remote serving would put a local block cache here)
            self.buf = fsio.read_bytes(fsio.join(path, "postings.bin"))
        # decoded-postings LRU (hot Zipf-head terms are decoded on every
        # query otherwise); bounded by posting count, not entries
        self._dec_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._dec_cached_postings = 0
        self._dec_cache_max = 4_000_000  # postings (~64 MB at 16 B each)
        # decoded-positions LRU (positional queries re-probe Zipf-head
        # terms); bounded by position count
        self._pos_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._pos_cached_positions = 0
        self._pos_cache_max = 4_000_000  # positions (~32 MB at 8 B each)
        # forward-index point-lookup state (lazy; one row group cached)
        self._fwd_pf: pq.ParquetFile | None = None
        self._fwd_rg_max: np.ndarray | None = None
        self._fwd_rg_cache: tuple[int, pa.Table] | None = None

    def langs(self) -> np.ndarray:
        """Per-ordinal doc language (lazy; filtered-search masks).  Not
        loaded in __init__ — only filtered queries pay for it."""
        if getattr(self, "_langs", None) is None:
            t = fsio.read_parquet(
                fsio.join(self.path, "docs.parquet"), columns=["lang"]
            )
            self._langs = t.column("lang").to_numpy(zero_copy_only=False)
        return self._langs

    def term_lens(self) -> np.ndarray:
        """Per-dictionary-row term lengths (lazy; fuzzy-expansion
        length-window prefilter)."""
        if getattr(self, "_term_lens", None) is None:
            self._term_lens = np.fromiter(
                (len(t) for t in self.terms), dtype=np.int64, count=len(self.terms)
            )
        return self._term_lens

    # -- forward index (more-like-this term selection) --

    def fwd_terms(self, doc_id: int) -> tuple[list[str], np.ndarray] | None:
        """The doc's (terms, tfs) from fwd.parquet, reading ONE row
        group (located by the parquet doc_id min/max stats — rows are in
        doc_id order); term_rows dictionary refs resolve through the
        already-loaded segment vocabulary.  None if the doc is absent or
        the segment predates the forward index."""
        if self._fwd_pf is None:
            fp = fsio.join(self.path, "fwd.parquet")
            if not fsio.exists(fp):
                return None
            self._fwd_pf = fsio.parquet_file(fp)
            md = self._fwd_pf.metadata
            self._fwd_rg_max = np.array(
                [md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)],
                dtype=np.int64,
            )
        assert self._fwd_rg_max is not None
        if len(self._fwd_rg_max) == 0:
            return None
        rg = int(np.searchsorted(self._fwd_rg_max, doc_id))
        if rg >= len(self._fwd_rg_max):
            return None
        if self._fwd_rg_cache is None or self._fwd_rg_cache[0] != rg:
            self._fwd_rg_cache = (rg, self._fwd_pf.read_row_group(rg))
        t = self._fwd_rg_cache[1]
        ids = t.column("doc_id").to_numpy()
        o = int(np.searchsorted(ids, doc_id))
        if o >= len(ids) or int(ids[o]) != doc_id:
            return None
        rows = t.column("term_rows")[o].as_py()
        terms = [self.terms[r] for r in rows]
        tfs = np.asarray(t.column("tfs")[o].as_py(), dtype=np.int64)
        return terms, tfs

    # -- full-list decode (exhaustive scoring / tests) --

    def decode_term(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full posting list -> (ordinals asc, tfs), vectorized."""
        i = self.term_idx.get(term)
        if i is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return self.decode_idx(i)

    def decode_idx_cached(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """decode_idx through the bounded LRU (read-only result!)."""
        hit = self._dec_cache.get(i)
        if hit is not None:
            # move to MRU position
            del self._dec_cache[i]
            self._dec_cache[i] = hit
            return hit
        out = self.decode_idx(i)
        n = len(out[0])
        if n <= self._dec_cache_max:
            while self._dec_cached_postings + n > self._dec_cache_max and self._dec_cache:
                old = next(iter(self._dec_cache))
                self._dec_cached_postings -= len(self._dec_cache.pop(old)[0])
            self._dec_cache[i] = out
            self._dec_cached_postings += n
        return out

    def decode_idx(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        n = int(self.n_postings[i])
        deltas = vb_decode(
            self.buf[self.doc_off[i] : self.doc_off[i] + self.doc_nbytes[i]], count=n
        ).astype(np.int64)
        boffs = self.blk_doc_boffs[i]
        # segmented cumsum: absolute restart at every block start
        ords = np.cumsum(deltas)
        if len(boffs) > 1:
            starts = np.arange(0, n, POSTINGS_BLOCK)
            corr = ords[starts[1:] - 1]
            reset = np.zeros(n, dtype=np.int64)
            reset[starts[1:]] = np.diff(np.concatenate(([0], corr)))
            ords = ords - np.cumsum(reset)
        tfs = vb_decode(
            self.buf[self.tf_off[i] : self.tf_off[i] + self.tf_nbytes[i]], count=n
        ).astype(np.int64)
        return ords, tfs

    def decode_positions_flat(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """All of a term's positions as ONE flat array + per-posting
        counts (aligned with decode_idx's ordinals) — fully vectorized:
        the per-doc position cumsum is a global cumsum minus each doc's
        exclusive prefix (no per-posting Python loop).  Results are
        LRU-cached (read-only!) like decoded postings: positional
        queries re-probe the same Zipf-head terms every request, and a
        cold decode costs a varbyte pass over cf positions."""
        i = self.term_idx.get(term)
        if i is None:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        hit = self._pos_cache.get(i)
        if hit is not None:
            del self._pos_cache[i]
            self._pos_cache[i] = hit  # move to MRU
            return hit
        _, tfs = self.decode_idx_cached(i)
        total = int(tfs.sum())
        flat = vb_decode(
            self.buf[self.pos_off[i] : self.pos_off[i] + self.pos_nbytes[i]],
            count=total,
        ).astype(np.int64)
        if total == 0:
            out = (flat, tfs)
        else:
            g = np.cumsum(flat)
            ends = np.cumsum(tfs)
            prefix = np.concatenate(([0], g[ends[:-1] - 1]))
            out = (g - np.repeat(prefix, tfs), tfs)
        if total <= self._pos_cache_max:
            while (
                self._pos_cached_positions + total > self._pos_cache_max
                and self._pos_cache
            ):
                old = next(iter(self._pos_cache))
                self._pos_cached_positions -= len(self._pos_cache.pop(old)[0])
            self._pos_cache[i] = out
            self._pos_cached_positions += total
        return out

    def decode_positions(self, term: str) -> list[np.ndarray]:
        """Per-posting position arrays (phrase/positional queries)."""
        i = self.term_idx.get(term)
        if i is None:
            return []
        pos, tfs = self.decode_positions_flat(term)
        return np.split(pos, np.cumsum(tfs)[:-1]) if len(tfs) else []

    def decode_block(self, i: int, blk: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode one 128-posting block of term row i -> (ords, tfs)."""
        boffs = self.blk_doc_boffs[i]
        toffs = self.blk_tf_boffs[i]
        n = int(self.n_postings[i])
        lo = blk * POSTINGS_BLOCK
        cnt = min(POSTINGS_BLOCK, n - lo)
        d0 = int(self.doc_off[i] + boffs[blk])
        d1 = int(
            self.doc_off[i] + (boffs[blk + 1] if blk + 1 < len(boffs) else self.doc_nbytes[i])
        )
        ords = np.cumsum(vb_decode(self.buf[d0:d1], count=cnt).astype(np.int64))
        t0 = int(self.tf_off[i] + toffs[blk])
        t1 = int(
            self.tf_off[i] + (toffs[blk + 1] if blk + 1 < len(toffs) else self.tf_nbytes[i])
        )
        tfs = vb_decode(self.buf[t0:t1], count=cnt).astype(np.int64)
        return ords, tfs


def segment_to_analyzed(path: str, num_parts_out: int) -> pa.Table:
    """Reconstruct a segment's ANALYZED_DOC rows exactly (inverse of the
    build): per-doc sorted terms, tfs, positions, metadata.

    This is what makes indexes MERGEABLE without re-analysis
    (engine.build.merge_indexes): postings/positions are decoded once,
    regrouped doc-major, and re-partitioned for the target index's
    ``num_parts_out``.
    """
    from .postings import ANALYZED_DOC

    seg = Segment(path)
    docs = fsio.read_parquet(fsio.join(path, "docs.parquet"))
    n = docs.num_rows
    # dict.parquet rows are written in term-string order; iterate rows
    # in order so a stable sort by ordinal yields per-doc sorted terms
    term_rows = sorted(seg.term_idx.items())
    ord_parts, tid_parts, tf_parts = [], [], []
    pos_parts: list[np.ndarray] = []
    term_strs: list[str] = []
    for t, row in term_rows:
        ords, tfs = seg.decode_idx(row)
        poss = seg.decode_positions(t)
        term_strs.append(t)
        tid = len(term_strs) - 1
        ord_parts.append(ords)
        tid_parts.append(np.full(len(ords), tid, np.int64))
        tf_parts.append(tfs)
        pos_parts.extend(poss)
    if term_strs:
        ord_all = np.concatenate(ord_parts)
        tid_all = np.concatenate(tid_parts)
        tf_all = np.concatenate(tf_parts)
    else:
        ord_all = tid_all = tf_all = np.zeros(0, np.int64)
    perm = np.argsort(ord_all, kind="stable")
    s_ord = ord_all[perm]
    s_tid = tid_all[perm]
    s_tf = tf_all[perm]
    s_pos = [pos_parts[i] for i in perm]

    counts = np.bincount(s_ord, minlength=n).astype(np.int64) if n else np.zeros(0, np.int64)
    off32 = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    term_dict = pa.array(term_strs, pa.string())
    terms_child = (
        term_dict.take(pa.array(s_tid, pa.int64())) if len(s_tid) else pa.array([], pa.string())
    )
    flat_pos = (
        np.concatenate(s_pos) if s_pos else np.zeros(0, np.int64)
    ).astype(np.int32)
    pos_lens = np.array([len(p) for p in s_pos], dtype=np.int64)
    pos_off32 = pa.array(np.concatenate(([0], np.cumsum(pos_lens))), pa.int32())
    poslists_inner = pa.ListArray.from_arrays(pos_off32, pa.array(flat_pos, pa.int32()))

    doc_ids = docs.column("doc_id").to_numpy()
    return pa.table(
        {
            "doc_id": docs.column("doc_id"),
            "part": pa.array((doc_ids % num_parts_out).astype(np.int32), pa.int32()),
            "doc_len": docs.column("doc_len"),
            "terms": pa.ListArray.from_arrays(off32, terms_child),
            "tfs": pa.ListArray.from_arrays(off32, pa.array(s_tf.astype(np.int32), pa.int32())),
            "poslists": pa.ListArray.from_arrays(off32, poslists_inner),
            "repo": docs.column("repo"),
            "path": docs.column("path"),
            "commit": docs.column("commit"),
            "lang": docs.column("lang"),
            "content_sha256": docs.column("content_sha256"),
        }
    ).cast(ANALYZED_DOC)


def _list_col(t: pa.Table, name: str) -> list[np.ndarray]:
    col = _arr(t, name)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    return [flat[bounds[i] : bounds[i + 1]] for i in range(len(lens))]


def segment_manifest(seg_path: str) -> dict | None:
    """The ONE commit predicate: a segment is committed iff its
    manifest.json exists AND parses.  Shared by readers (list_segments)
    and resume (engine.checkpoint) so a manifest torn by a crash
    mid-write on a URI root is 'uncommitted' to BOTH sides — never
    live to readers while invisible to resume."""
    try:
        return fsio.read_json(fsio.join(seg_path, "manifest.json"))
    except (FileNotFoundError, OSError, ValueError):
        return None


def list_segments(out_dir: str) -> list[str]:
    root = fsio.join(out_dir, "segments")
    return sorted(
        fsio.join(root, d)
        for d in fsio.listdir(root)
        if d.startswith(SEG_PREFIX)
        and not ".tmp-" in d
        and segment_manifest(fsio.join(root, d)) is not None
    )

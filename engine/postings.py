"""Postings extraction (M3-M5): analyzer actor-pool stage + partial-run
writer (the SPIMI exchange, [LIT-IIR] ch.4).

Spec: BASELINE.json:6 ("code-aware tokenization, Porter-style stemming,
case folding", "per-partition posting lists (docID, term-frequency,
positions)", "distributed sort-merge of partial postings").

Design (see engine/__init__.py): the analyzer stage emits ONE packed row
per document — ``(doc_id, part, doc_len, terms, tfs, poslists)`` plus
the metadata columns — rather than exploded (doc, term) rows, and the
exchange to the per-partition merge happens through CONTENT-ADDRESSED
RUN FILES (``<out>/runs/run-<digest>.arrow``, Arrow IPC, one record
batch per partition) written by each analyze task, not through a Ray
Data all-to-all:

- the partition key is ``part = doc_id % P`` with doc_id a sha256-derived
  hash, so run sizes are uniform no matter how skewed the term
  distribution is (hot terms end up split into P per-segment
  sub-posting lists — the spec's "hot terms split into sub-postings");
- a run file's name is the sha256 of its sorted doc_ids, so a retried
  task rewrites byte-identical files under the same write-once key
  (engine.fsio commit protocol — atomic PUT on object stores,
  tmp+rename locally): retries and speculative re-execution are
  idempotent;
- on a multi-node cluster the runs directory lives on shared/object
  storage — the same medium the segments target — which makes the
  exchange resumable and spill-free (measured here: the Ray sort-based
  groupby exchange was 2-10x slower on this corpus and is O(all data)
  through the object store; the run exchange is one sequential write +
  one sequential read of the same bytes).

The analyze stage is a callable CLASS (actor pool): the analyzer's
term->stem memo (A2) persists across batches in ``__init__``-created
state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import analysis, fsio

# Output schema of AnalyzeDocs (one row per input document).
ANALYZED_DOC = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("part", pa.int32()),
        ("doc_len", pa.int32()),
        ("terms", pa.list_(pa.string())),       # sorted unique terms of the doc
        ("tfs", pa.list_(pa.int32())),          # aligned with terms
        ("poslists", pa.list_(pa.list_(pa.int32()))),  # aligned with terms
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
    ]
)

RUN_SUMMARY = pa.schema(
    [
        ("part", pa.int32()),
        ("num_docs", pa.int64()),
        ("run_path", pa.string()),
        ("row_group", pa.int32()),
    ]
)


def analyze_doc(analyzer: analysis.Analyzer, content: str):
    """One doc -> (doc_len, sorted terms, tfs, poslists)."""
    toks = analyzer(content)
    tf: dict[str, int] = {}
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        tf[t] = tf.get(t, 0) + 1
        pos.setdefault(t, []).append(i)
    terms = sorted(tf)
    return (
        len(toks),
        terms,
        [tf[t] for t in terms],
        [pos[t] for t in terms],
    )


def _exclusive_starts(counts: np.ndarray) -> np.ndarray:
    c = np.cumsum(counts)
    return c - counts


class AnalyzeDocs:
    """Actor-pool map_batches stage: corpus+ids batch -> ANALYZED_DOC rows.

    Vectorized: raw tokens come from ONE Arrow C++ regex split over the
    whole content column; only the (Zipf-small) set of DISTINCT raw
    tokens goes through the Python analyzer (split_ident + casefold +
    Porter), memoized per actor, and the expansion back to per-doc
    (term, tf, positions) lists is pure numpy.  Semantics are
    bit-identical to applying ``analysis.get_analyzer(name)`` per doc —
    property-tested against the row-wise path
    (tests/test_analysis.py::test_vectorized_equals_rowwise).

    ``__init__`` state (once per actor): the raw-token -> final-terms
    memo and the growing term dictionary.
    """

    def __init__(self, analyzer: str = "code"):
        self._az = analysis.get_analyzer(analyzer)
        self._name = analyzer
        # raw token -> np.ndarray of term ids (into _term_strs)
        self._sub: dict[str, np.ndarray] = {}
        self._term_id: dict[str, int] = {}
        self._term_strs: list[str] = []

    def _terms_of_raw(self, raw: str) -> np.ndarray:
        got = self._sub.get(raw)
        if got is None:
            ids = []
            for term in self._az(raw):
                tid = self._term_id.get(term)
                if tid is None:
                    tid = self._term_id[term] = len(self._term_strs)
                    self._term_strs.append(term)
                ids.append(tid)
            got = self._sub[raw] = np.asarray(ids, dtype=np.int64)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        content = batch.column("content")
        content = content.combine_chunks() if content.num_chunks != 1 else content.chunk(0)
        if self._name == "simple":
            split = pc.split_pattern(content, " ")
        else:
            split = pc.split_pattern_regex(content, "[^A-Za-z0-9_]+")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[nonempty]
        flat = flat.filter(pa.array(nonempty))

        if len(flat):
            denc = pc.dictionary_encode(flat)
            codes = denc.indices.to_numpy().astype(np.int64)
            uniq_raw = denc.dictionary.to_pylist()
        else:
            codes = np.zeros(0, np.int64)
            uniq_raw = []

        # distinct raw tokens through the memoized analyzer
        sub_lists = [self._terms_of_raw(r) for r in uniq_raw]
        sub_counts = np.asarray([len(s) for s in sub_lists], dtype=np.int64)
        sub_flat = (
            np.concatenate(sub_lists) if sub_lists else np.zeros(0, np.int64)
        )
        sub_starts = _exclusive_starts(sub_counts)

        # expand occurrences -> emitted term ids (+ owning doc)
        rep = sub_counts[codes] if len(codes) else np.zeros(0, np.int64)
        total = int(rep.sum())
        occ_starts = _exclusive_starts(rep)
        within = np.arange(total, dtype=np.int64) - np.repeat(occ_starts, rep)
        emitted_tid = sub_flat[np.repeat(sub_starts[codes], rep) + within]
        doc_out = np.repeat(doc_rep, rep)  # nondecreasing

        doc_len = np.bincount(doc_out, minlength=n_docs).astype(np.int64)
        doc_first = _exclusive_starts(doc_len)
        pos = np.arange(total, dtype=np.int64) - np.repeat(doc_first, doc_len)

        # group by (doc, term-STRING order) — match the row-wise path's
        # sorted-unique-terms-per-doc layout exactly
        used = np.unique(emitted_tid) if total else np.zeros(0, np.int64)
        rank_of = np.zeros(len(self._term_strs), dtype=np.int64)
        if len(used):
            used_strs = [self._term_strs[t] for t in used]
            order_used = np.argsort(np.asarray(used_strs, dtype=object))
            rank_of[used[order_used]] = np.arange(len(used))
        key_rank = rank_of[emitted_tid] if total else np.zeros(0, np.int64)
        # single combined-key STABLE sort: emission order already has pos
        # ascending within each (doc, term), and stability preserves it
        perm = np.argsort(doc_out * max(len(used), 1) + key_rank, kind="stable")
        s_doc = doc_out[perm]
        s_tid = emitted_tid[perm]
        s_pos = pos[perm]

        # run boundaries per (doc, term)
        if total:
            newrun = np.ones(total, dtype=bool)
            newrun[1:] = (s_doc[1:] != s_doc[:-1]) | (s_tid[1:] != s_tid[:-1])
            run_starts = np.nonzero(newrun)[0]
            run_bounds = np.append(run_starts, total)
            tf = np.diff(run_bounds)
            run_doc = s_doc[run_starts]
            run_tid = s_tid[run_starts]
        else:
            run_starts = np.zeros(0, np.int64)
            run_bounds = np.zeros(1, np.int64)
            tf = np.zeros(0, np.int64)
            run_doc = np.zeros(0, np.int64)
            run_tid = np.zeros(0, np.int64)

        runs_per_doc = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
        doc_off32 = pa.array(
            np.concatenate(([0], np.cumsum(runs_per_doc))), pa.int32()
        )
        run_off32 = pa.array(run_bounds, pa.int32())

        term_dict = pa.array(self._term_strs, pa.string())
        terms_child = (
            term_dict.take(pa.array(run_tid, pa.int64()))
            if len(run_tid)
            else pa.array([], pa.string())
        )
        poslists_inner = pa.ListArray.from_arrays(
            run_off32, pa.array(s_pos.astype(np.int32), pa.int32())
        )
        terms_col = pa.ListArray.from_arrays(doc_off32, terms_child)
        tfs_col = pa.ListArray.from_arrays(
            doc_off32, pa.array(tf.astype(np.int32), pa.int32())
        )
        pos_col = pa.ListArray.from_arrays(doc_off32, poslists_inner)

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "part": batch.column("part"),
                "doc_len": pa.array(doc_len.astype(np.int32), pa.int32()),
                "terms": terms_col,
                "tfs": tfs_col,
                "poslists": pos_col,
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "commit": batch.column("commit"),
                "lang": batch.column("lang"),
                "content_sha256": batch.column("content_sha256"),
            }
        )

    def rowwise(self, batch: pa.Table) -> pa.Table:
        """Reference row-at-a-time implementation (differential tests)."""
        content = batch.column("content").to_pylist()
        n = len(content)
        doc_lens = np.empty(n, dtype=np.int32)
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        pos_col: list[list[list[int]]] = []
        az = self._az
        for i in range(n):
            dl, terms, tfs, poss = analyze_doc(az, content[i])
            doc_lens[i] = dl
            terms_col.append(terms)
            tfs_col.append(tfs)
            pos_col.append(poss)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "part": batch.column("part"),
                "doc_len": pa.array(doc_lens, pa.int32()),
                "terms": pa.array(terms_col, pa.list_(pa.string())),
                "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
                "poslists": pa.array(pos_col, pa.list_(pa.list_(pa.int32()))),
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "commit": batch.column("commit"),
                "lang": batch.column("lang"),
                "content_sha256": batch.column("content_sha256"),
            }
        )


class AnalyzeWriteRuns(AnalyzeDocs):
    """Analyze a batch AND write its partial run as ONE Arrow IPC file
    with ONE RECORD BATCH PER PARTITION (rows sorted by part, doc_id,
    sha; lz4-compressed).

    Output: RUN_SUMMARY rows — (part, run_path, row_group, num_docs) per
    partition touched (``row_group`` = record-batch index).  The heavy
    analyzed data never enters a Ray exchange; the merge stage
    memory-maps each file and reads exactly the record batches listed
    for its partition.  IPC (not parquet) because the run is transient
    intermediate data read exactly once: IPC write+read measured ~10x
    cheaper than parquet on this nested schema, and record-batch access
    is O(1) per batch with no per-open metadata decode.

    The file name is the sha256 of the batch's sorted doc_ids, so a
    retried task rewrites a byte-identical file under the same
    write-once key (engine.fsio commit protocol): retries are
    idempotent, and stale files from a dead execution are never read
    because each build's merge stage only consumes record batches
    listed in ITS OWN materialized summary.
    """

    def __init__(self, analyzer: str, out_dir: str):
        super().__init__(analyzer)
        self._out = fsio.join(out_dir, "runs")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return write_run(super().__call__(batch), self._out)


def write_run(analyzed: pa.Table, runs_dir: str) -> pa.Table:
    """Write one ANALYZED_DOC table as a content-addressed IPC run file
    (one record batch per partition, rows sorted by part/doc_id/sha);
    returns its RUN_SUMMARY rows.  Idempotent under retry."""
    analyzed = analyzed.combine_chunks()
    order = pc.sort_indices(
        analyzed,
        sort_keys=[
            ("part", "ascending"),
            ("doc_id", "ascending"),
            ("content_sha256", "ascending"),
        ],
    )
    analyzed = analyzed.take(order).combine_chunks()
    parts = analyzed.column("part").to_numpy()
    ids = analyzed.column("doc_id").to_numpy()
    # Content-address by (doc_id, content_sha256) pairs in canonical
    # (part, doc_id, sha) order — doc_ids alone can collide for two
    # batches holding duplicate-keyed rows with DIFFERENT content, which
    # would silently alias two distinct runs to one file name.
    h = hashlib.sha256(ids.tobytes())
    for s in analyzed.column("content_sha256").to_pylist():
        h.update(s.encode())
    digest = h.hexdigest()[:32]
    final = fsio.join(runs_dir, f"run-{digest}.arrow")

    bounds = np.concatenate(([0], np.nonzero(np.diff(parts))[0] + 1, [len(parts)]))
    uniq_parts = parts[bounds[:-1]] if len(parts) else np.zeros(0, np.int32)
    if not fsio.exists(final):  # idempotent under retry (write-once key)
        import io

        opts = pa.ipc.IpcWriteOptions(compression="lz4")
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, analyzed.schema, options=opts) as w:
            for i in range(len(uniq_parts)):
                chunk = analyzed.slice(bounds[i], bounds[i + 1] - bounds[i])
                w.write_table(chunk)  # one record batch (contiguous slice)
        fsio.write_bytes_once(final, buf.getvalue())
    return pa.table(
        {
            "part": pa.array(uniq_parts.astype(np.int32), pa.int32()),
            "num_docs": pa.array(np.diff(bounds), pa.int64()),
            "run_path": pa.array([final] * len(uniq_parts), pa.string()),
            "row_group": pa.array(np.arange(len(uniq_parts), dtype=np.int32), pa.int32()),
        }
    )


def load_run_parts(
    parts: list[int], refs: list[tuple[str, int, int]]
) -> dict[int, pa.Table]:
    """Load several partitions' run slices in ONE pass over the files.

    ``refs``: (run_path, record_batch_idx, part) triples.  Each file is
    memory-mapped and footer-parsed exactly once regardless of how many
    partitions the calling merge task owns — per-part opens made the
    exchange O(partitions x files) in file-metadata work, which
    dominated low-parallelism builds.
    """
    batches: dict[int, list] = {int(p): [] for p in parts}
    by_file: dict[str, list[tuple[int, int]]] = {}
    for path, rg, part in refs:
        by_file.setdefault(path, []).append((int(rg), int(part)))
    for path in sorted(by_file):
        with pa.ipc.open_file(fsio.open_input(path)) as r:
            for rg, part in sorted(by_file[path]):
                batches[part].append(r.get_batch(rg))
    return {
        p: (
            pa.Table.from_batches(b, schema=ANALYZED_DOC)
            if b
            else ANALYZED_DOC.empty_table()
        )
        for p, b in batches.items()
    }

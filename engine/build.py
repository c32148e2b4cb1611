"""Distributed index build pipeline (SURVEY.md §3.1).

Spec: BASELINE.json:6 — streaming-execution pipeline over the Parquet
corpus.  Two stages, SPIMI-style ([LIT-IIR] ch.4):

1. ``read_parquet -> map_batches(ids+sha, stateless) ->
   map_batches(AnalyzeWriteRuns actor pool)``: each task analyzes its
   batch and writes per-partition sorted partial RUNS to
   ``out/runs/part=NNNNN/`` (content-addressed, retry-idempotent —
   engine/postings.py).  No Ray all-to-all: the exchange is one
   sequential write + one sequential read through (shared) storage,
   which on this corpus measured 2-10x faster than the sort-based
   groupby shuffle and never holds more than one batch in memory.
2. ``from_items(parts) -> map_batches(merge_part)``: P independent
   tasks; each k-way merges its partition's runs (vectorized concat +
   lexsort — the "distributed sort-merge of partial postings") and
   writes one compressed segment atomically.

Partitioning / skew (BASELINE.json:14 "partitioning / shuffle / skew
handled explicitly"): part = doc_id % P where doc_id is sha256-derived,
so partitions are uniform BY CONSTRUCTION regardless of term skew —
'def'/'import'-grade hot terms end up split into P per-segment
sub-posting lists (the spec's "hot terms split into sub-postings"),
scored independently and merged at query time.  The only term-keyed
aggregation (global df/cf) runs over per-segment dictionary PARTIALS —
at most |vocab| rows per segment, a combiner — so its groupby moves
dictionary rows, never postings.

No ray.init / ray.shutdown here (driver contract).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from . import checkpoint, fsio
from .ids import assign_ids
from .postings import AnalyzeWriteRuns, load_run_parts
from .segments import GT_NUM_SHARDS, build_segment, clear_uncommitted, list_segments

def _split_evenly(seq, n_chunks: int):
    """Split seq into n_chunks near-equal contiguous chunks."""
    n = len(seq)
    out = []
    start = 0
    for i in range(n_chunks):
        end = start + (n - start) // (n_chunks - i)
        out.append(seq[start:end])
        start = end
    return [c for c in out if c]


SUMMARY_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("num_docs", pa.int64()),
        ("num_postings", pa.int64()),
        ("build_seconds", pa.float64()),
    ]
)


def build_index(
    corpus: "ray.data.Dataset",
    out_dir: str,
    num_parts: int = 32,
    analyzer: str = "code",
    resume: bool = False,
    analyzer_concurrency=(1, 32),
    analyzer_batch_size: int | None = 4096,
    merge_num_cpus: float = 2.0,
    merge_tasks: int | None = None,
    source: str = "corpus",
) -> dict:
    """Build (or resume) the index at ``out_dir``.  Returns build metrics."""
    t0 = time.perf_counter()
    checkpoint.write_build_manifest(out_dir, num_parts, analyzer, source)
    done = checkpoint.completed_parts(out_dir)
    if done and not resume:
        raise ValueError(
            f"{out_dir} already holds {len(done)} segments; pass resume=True "
            "or use a fresh out_dir"
        )
    remaining = sorted(set(range(num_parts)) - done)

    if remaining:
        # runs from an interrupted attempt are stale (each build's merge
        # only reads row groups listed in its own summary) — drop them,
        # along with any uncommitted segment dirs (write-once keys must
        # start empty — engine.fsio commit protocol)
        fsio.rmtree(fsio.join(out_dir, "runs"))
        clear_uncommitted(out_dir, remaining)

        ds = corpus.map_batches(
            lambda b: assign_ids(b, num_parts), batch_format="pyarrow"
        )
        if done:
            todo = pa.array(remaining, pa.int32())

            def keep_remaining(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_in(batch.column("part"), value_set=todo))

            ds = ds.map_batches(keep_remaining, batch_format="pyarrow")

        # ---- stage 1: analyze + write partial runs (barrier: the tiny
        # run-summary table is materialized; the analyzed data itself
        # stays in run files, outside the object store) ----
        run_summary = ds.map_batches(
            AnalyzeWriteRuns,
            fn_constructor_kwargs={"analyzer": analyzer, "out_dir": out_dir},
            batch_format="pyarrow",
            batch_size=analyzer_batch_size,
            concurrency=analyzer_concurrency,
        ).take_all()  # tiny: one row per (analyze task, part touched)

        _merge_stage(out_dir, analyzer, run_summary, remaining,
                     merge_num_cpus, merge_tasks)
        fsio.rmtree(fsio.join(out_dir, "runs"))

    stats = finalize_stats(out_dir)
    wall = time.perf_counter() - t0
    stats["build_wall_seconds"] = round(wall, 3)
    stats["docs_per_sec"] = round(stats["num_docs"] / wall, 1) if wall else 0.0
    stats["postings_per_sec"] = (
        round(stats["total_postings"] / wall, 1) if wall else 0.0
    )
    return stats


def _merge_stage(out_dir: str, analyzer: str, run_summary, remaining,
                 merge_num_cpus: float, merge_tasks: int | None) -> None:
    """Stage 2: merge+write tasks; each task handles a RANGE of
    partitions so every run file is opened (footer-parsed) once per
    task, not once per partition — per-part opens made the exchange
    O(P x files) in metadata work and dominated low-parallelism runs.

    Memory bound: a merge task materializes its whole CHUNK of
    partitions at once (load_run_parts), i.e. ~P/merge_tasks segments'
    analyzed rows.  With merge_tasks defaulting to 4 x CPUs and P
    sized so one segment's postings fit a worker (SURVEY §4.2), the
    per-task working set is a few segments — bounded by configuration;
    shrink merge_tasks only together with merge_num_cpus."""
    refs_by_part: dict[int, list[tuple[str, int]]] = {p: [] for p in remaining}
    for r in run_summary:
        part = int(r["part"])
        if part in refs_by_part:
            refs_by_part[part].append((r["run_path"], int(r["row_group"])))

    if merge_tasks is None:
        try:
            cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cluster_cpus = 8
        merge_tasks = max(1, int(4 * cluster_cpus / max(merge_num_cpus, 1)))
    chunks = [
        list(c) for c in _split_evenly(remaining, min(len(remaining), merge_tasks))
    ]

    def merge_chunk(batch: pa.Table) -> pa.Table:
        rows = []
        for parts, paths, rgs, rgp in zip(
            batch.column("parts").to_pylist(),
            batch.column("paths").to_pylist(),
            batch.column("rgs").to_pylist(),
            batch.column("rg_parts").to_pylist(),
        ):
            groups = load_run_parts(parts, list(zip(paths, rgs, rgp)))
            for part in parts:
                man = build_segment(groups.pop(part), out_dir, int(part), analyzer)
                rows.append(
                    {
                        "part": int(part),
                        "num_docs": man["num_docs"],
                        "num_postings": man["num_postings"],
                        "build_seconds": man["build_seconds"],
                    }
                )
        return pa.Table.from_pylist(rows, schema=SUMMARY_SCHEMA)

    items = []
    for chunk in chunks:
        paths, rgs, parts_of = [], [], []
        for p in chunk:
            for path, rg in refs_by_part[p]:
                paths.append(path)
                rgs.append(rg)
                parts_of.append(p)
        items.append(
            {"parts": chunk, "paths": paths, "rgs": rgs, "rg_parts": parts_of}
        )
    # batch_size=1 -> one merge task per chunk (no repartition
    # all-to-all needed to spread the chunk list across tasks)
    ray.data.from_items(items).map_batches(
        merge_chunk, batch_format="pyarrow", batch_size=1,
        num_cpus=merge_num_cpus,
    ).materialize()


def add_documents(
    index_dir: str,
    corpus: "ray.data.Dataset",
    num_parts: int = 16,
    resume: bool = False,
    analyzer_concurrency=(1, 32),
    analyzer_batch_size: int | None = 4096,
    merge_num_cpus: float = 2.0,
    merge_tasks: int | None = None,
) -> dict:
    """Incrementally add documents to an EXISTING index (Lucene-style
    delta generation — no rebuild of existing segments).

    The new docs are built into ``num_parts`` fresh segments appended
    after the current ones; the build manifest records the new
    GENERATION (first_seg_id, num_parts) so point lookups keep their
    closed-form location rule (checkpoint.generations).  Global
    statistics (N, avgdl, per-term df/cf) are then re-finalized over
    ALL segments — the same vocabulary-partials groupby a fresh build
    runs, so BM25 scores after an add are EXACTLY those of a full
    rebuild over the union corpus (rank identity tested in
    tests/test_incremental.py).  The exchange cost of an add is
    O(|new docs|) analysis + one vocabulary-sized aggregate — it never
    touches existing postings.

    Precondition: added doc keys (repo, path, commit) must not already
    exist in the index — updating a doc is ``maintenance.delete_docs``
    (tombstone) followed by ``add_documents`` with the new content,
    then ``maintenance.compact_index`` at leisure.  A key collision
    would leave the same doc_id live in two generations (both score;
    lookups prefer the oldest) — exactly Lucene's
    deleted-but-not-merged state, resolved by compaction.

    ``resume=True`` finishes an interrupted add: if the manifest's
    LAST generation has uncommitted parts, that generation (with its
    recorded num_parts) is completed instead of opening a new one —
    re-run with the SAME corpus; segment bytes are deterministic, so
    the result is identical to an uninterrupted add.
    """
    t0 = time.perf_counter()
    man = checkpoint.read_build_manifest(index_dir)
    analyzer = man["analyzer"]
    gens = checkpoint.generations(man)
    done = checkpoint.completed_parts(index_dir)
    last_start, last_parts = gens[-1]
    last_missing = set(range(last_start, last_start + last_parts)) - done
    if last_missing and not resume:
        raise ValueError(
            f"{index_dir}: generation at segment {last_start} is incomplete "
            f"({len(last_missing)} parts missing); pass resume=True to finish "
            "it (with the same corpus) before adding more"
        )
    if resume and last_missing:
        start, q = last_start, last_parts  # finish the interrupted add
    else:
        q = num_parts
        start = checkpoint.append_generation(index_dir, q)
    remaining = sorted(set(range(start, start + q)) - done)

    if remaining:
        fsio.rmtree(fsio.join(index_dir, "runs"))
        ds = corpus.map_batches(
            lambda b: assign_ids(b, q, part_offset=start), batch_format="pyarrow"
        )
        if len(remaining) < q:
            todo = pa.array(remaining, pa.int32())

            def keep_remaining(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.is_in(batch.column("part"), value_set=todo))

            ds = ds.map_batches(keep_remaining, batch_format="pyarrow")
        run_summary = ds.map_batches(
            AnalyzeWriteRuns,
            fn_constructor_kwargs={"analyzer": analyzer, "out_dir": index_dir},
            batch_format="pyarrow",
            batch_size=analyzer_batch_size,
            concurrency=analyzer_concurrency,
        ).take_all()
        _merge_stage(index_dir, analyzer, run_summary, remaining,
                     merge_num_cpus, merge_tasks)
        fsio.rmtree(fsio.join(index_dir, "runs"))

    stats = finalize_stats(index_dir)
    stats["add_wall_seconds"] = round(time.perf_counter() - t0, 3)
    return stats


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    num_parts: int | None = None,
    resume: bool = False,
    merge_num_cpus: float = 2.0,
    merge_tasks: int | None = None,
    exclude_doc_ids=None,
) -> dict:
    """Merge N existing indexes into a fresh one WITHOUT re-analysis
    (Lucene-style segment merge, distributed).

    Each input segment is decoded back to its exact ANALYZED_DOC rows
    (engine.segments.segment_to_analyzed), re-partitioned for the
    output ``num_parts`` (default: max of the inputs'), written as a
    content-addressed run, and the standard merge stage builds the
    output segments.  Duplicate docs across inputs collapse by the
    build's D1 rule.  Because every step is deterministic, merging
    split-built indexes is byte-identical to a direct build of the
    combined corpus (tests/test_merge_indexes.py).

    ``exclude_doc_ids``: optional doc_ids dropped during segment
    reconstruction (the compaction path — engine.maintenance); small
    by assumption, shipped to reconstruct tasks via ``ray.put``.
    """
    t0 = time.perf_counter()
    manifests = [checkpoint.read_build_manifest(d) for d in index_dirs]
    analyzers = {m["analyzer"] for m in manifests}
    if len(analyzers) != 1:
        raise ValueError(f"cannot merge indexes with different analyzers: {analyzers}")
    analyzer = analyzers.pop()
    if num_parts is None:
        num_parts = max(m["num_parts"] for m in manifests)
    checkpoint.write_build_manifest(
        out_dir, num_parts, analyzer, source="merge:" + ",".join(index_dirs)
    )
    done = checkpoint.completed_parts(out_dir)
    if done and not resume:
        raise ValueError(
            f"{out_dir} already holds {len(done)} segments; pass resume=True "
            "or use a fresh out_dir"
        )
    remaining = sorted(set(range(num_parts)) - done)

    if remaining:
        fsio.rmtree(fsio.join(out_dir, "runs"))
        runs_dir = fsio.join(out_dir, "runs")
        seg_paths = [p for d in index_dirs for p in list_segments(d)]
        excl = np.unique(np.asarray(exclude_doc_ids, np.int64)) if (
            exclude_doc_ids is not None and len(exclude_doc_ids)
        ) else None
        excl_ref = ray.put(excl)

        def reconstruct(batch: pa.Table) -> pa.Table:
            from .postings import write_run
            from .segments import segment_to_analyzed

            ex = ray.get(excl_ref)
            outs = []
            for path in batch.column("item").to_pylist():
                rows = segment_to_analyzed(path, num_parts)
                if ex is not None:
                    keep = ~np.isin(rows.column("doc_id").to_numpy(), ex)
                    rows = rows.filter(pa.array(keep))
                outs.append(write_run(rows, runs_dir))
            return pa.concat_tables(outs)

        run_summary = (
            ray.data.from_items(seg_paths)
            .map_batches(reconstruct, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        _merge_stage(out_dir, analyzer, run_summary, remaining,
                     merge_num_cpus, merge_tasks)
        fsio.rmtree(runs_dir)

    stats = finalize_stats(out_dir)
    stats["merge_wall_seconds"] = round(time.perf_counter() - t0, 3)
    return stats


def finalize_stats(out_dir: str) -> dict:
    """Global aggregates (G2-G4): collection stats from segment
    manifests (driver-side rollup of P small JSONs).

    Global per-term df/cf needs NO finalize work at all: each merge
    task already wrote its segment's term-hash-sharded gt.parquet
    partial next to the segment (engine.segments._write_gt_partial),
    and the read side sums a shard's partials lazily
    (engine.query._ShardedDf) — so the one remaining global quantity,
    vocabulary size (distinct terms across segments), is a MAP-ONLY
    Ray job over the disjoint hash shards (no all-to-all: every Ray
    Data shuffle costs seconds of fixed overhead even on
    vocabulary-sized data, which is why the previous
    read_parquet→groupby finalize was the round-2 build regression)."""
    manifests = checkpoint.read_segment_manifests(out_dir)
    num_docs = sum(m["num_docs"] for m in manifests)
    total_doc_len = sum(m["total_doc_len"] for m in manifests)
    total_postings = sum(m["num_postings"] for m in manifests)
    min_doc_len = min(
        (m["min_doc_len"] for m in manifests if m["num_docs"]), default=0
    )

    seg_paths = [s for s in list_segments(out_dir)]
    gt_dir = fsio.join(out_dir, "global_terms")
    fsio.rmtree(gt_dir)
    fsio.makedirs(gt_dir)
    vocab_size = _aggregate_global_terms(seg_paths, gt_dir) if seg_paths else 0
    meta = {"num_shards": GT_NUM_SHARDS, "hash": "fnv1a64"}
    fsio.write_json(fsio.join(out_dir, "global_terms_meta.json"), meta)

    stats = {
        "num_docs": num_docs,
        "total_doc_len": total_doc_len,
        "avg_doc_len": (total_doc_len / num_docs) if num_docs else 0.0,
        "min_doc_len": min_doc_len,
        "total_postings": total_postings,
        "vocab_size": vocab_size,
        "num_segments": len(manifests),
    }
    checkpoint.write_collection_stats(out_dir, stats)
    return dict(stats)


def _aggregate_global_terms(seg_paths: list[str], gt_dir: str) -> int:
    """Sum the per-segment gt.parquet partials into ONE aggregated
    ``global_terms/shard-NNNN.parquet`` per term-hash shard, returning
    the vocabulary size (shards are term-disjoint, so vocab = Σ of
    per-shard distinct counts).

    This is a MAP-ONLY Ray job — one task per shard, each reading only
    its own row group of every segment's gt.parquet (peak memory per
    task = one shard's vocabulary, ~vocab/num_shards).  No all-to-all:
    the hash partitioning was fixed at segment-write time, so the
    "shuffle" already happened for free inside the merge tasks.  Query
    actors then load one small file per touched shard
    (engine.query._ShardedDf).  Writes go through the fsio commit
    protocol with deterministic bytes, so task retries are benign."""
    from .segments import read_gt_shard

    def agg_shard(batch: pa.Table) -> pa.Table:
        outs = []
        for s in batch.column("item").to_pylist():
            parts = [
                t for p in seg_paths if (t := read_gt_shard(p, int(s))) is not None
            ]
            if parts:
                tbl = (
                    pa.concat_tables(parts)
                    .group_by("term")
                    .aggregate([("df", "sum"), ("cf", "sum")])
                    .rename_columns(["term", "df", "cf"])
                    .sort_by("term")
                )
            else:
                tbl = pa.table(
                    {"term": pa.array([], pa.string()),
                     "df": pa.array([], pa.int64()),
                     "cf": pa.array([], pa.int64())}
                )
            fsio.write_parquet(
                tbl, fsio.join(gt_dir, f"shard-{int(s):04d}.parquet")
            )
            outs.append(tbl.num_rows)
        return pa.table({"n": pa.array(outs, pa.int64())})

    rows = (
        ray.data.from_items(list(range(GT_NUM_SHARDS)))
        .map_batches(agg_shard, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    return int(sum(r["n"] for r in rows))


def read_global_terms(out_dir: str) -> pa.Table:
    """The aggregated (term, df, cf) table, driver-side — TEST/AUDIT
    helper only (it materializes the whole vocabulary; production paths
    go through the sharded lazy loader in engine.query)."""
    parts = []
    for s in list_segments(out_dir):
        fp = fsio.join(s, "gt.parquet")
        if fsio.exists(fp):
            parts.append(fsio.read_parquet(fp, columns=["term", "df", "cf"]))
    if not parts:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "df": pa.array([], pa.int64()),
             "cf": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(parts)
    return (
        t.group_by("term")
        .aggregate([("df", "sum"), ("cf", "sum")])
        .rename_columns(["term", "df", "cf"])
        .sort_by("term")
    )


def read_doc_stats(out_dir: str) -> "ray.data.Dataset":
    """T6 doc_stats as a Dataset: the per-segment docs.parquet files ARE
    the partitioned doc-stats table (resumable output layout)."""
    files = [fsio.join(s, "docs.parquet") for s in list_segments(out_dir)]
    return ray.data.read_parquet(files)


def export_postings(index_dir: str) -> "ray.data.Dataset":
    """The inverted index as a relational Dataset: one row per posting
    (term, doc_id, tf, repo, path) — the bridge from index files back
    into Ray Data for downstream analytics (term co-occurrence,
    df audits, join-with-metadata pipelines).

    One decode task per segment (vectorized varbyte decode per term,
    doc metadata resolved by ordinal take); the term column is emitted
    DICTIONARY-encoded, so a segment's export is ~the size of its
    postings, not |postings| x avg-term-length strings."""
    import pyarrow as _pa

    from .segments import Segment, list_segments

    seg_paths = list_segments(index_dir)

    def decode(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch.column("item").to_pylist():
            seg = Segment(p)
            v = len(seg.terms)
            if v == 0:
                continue
            codes = np.repeat(
                np.arange(v, dtype=np.int32),
                seg.n_postings.astype(np.int64),
            )
            ords_all, tfs_all = [], []
            for i in range(v):
                o, t = seg.decode_idx(i)
                ords_all.append(o)
                tfs_all.append(t)
            ords = np.concatenate(ords_all)
            tfs = np.concatenate(tfs_all)
            term_col = _pa.DictionaryArray.from_arrays(
                _pa.array(codes, _pa.int32()), _pa.array(seg.terms, _pa.string())
            )
            outs.append(
                pa.table(
                    {
                        "term": term_col,
                        "doc_id": pa.array(seg.doc_ids[ords], pa.int64()),
                        "tf": pa.array(tfs.astype(np.int64), pa.int64()),
                        "repo": pa.array(
                            seg.repo[ords].astype(str), pa.string()
                        ),
                        "path": pa.array(
                            seg.dpath[ords].astype(str), pa.string()
                        ),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "term": _pa.DictionaryArray.from_arrays(
                        _pa.array([], _pa.int32()), _pa.array([], _pa.string())
                    ),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(seg_paths).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )

"""Index maintenance: document deletion (tombstones) and compaction.

Lucene-style lifecycle: deletes are O(deleted) metadata — a sorted
``tombstones.parquet`` at the index root — applied at query time by
every reader; segments stay immutable (the byte-determinism invariant
is untouched).  Compaction rewrites the index WITHOUT the tombstoned
docs through the existing no-re-analysis merge path and drops the
tombstone file; the result is byte-identical to a direct build of the
reduced corpus (tests/test_maintenance.py), so resume/merge guarantees
carry over.

Scale assumptions (documented, standard for tombstone designs):

- the tombstone set is small relative to the corpus between
  compactions — readers hold it in memory and per-segment exclusion
  ordinals are an ``np.isin`` against each segment's doc_id array;
- BM25 stats (N, avgdl, df) keep their pre-delete values until
  compaction, exactly like Lucene before a merge: scores of surviving
  docs are unchanged, deleted docs just can't be returned;
- readers see the tombstones that existed when they were constructed
  (actor-pool scorers load them in ``__init__``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONES = "tombstones.parquet"


def read_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 doc_ids marked deleted (empty array if none)."""
    from . import fsio

    p = fsio.join(index_dir, TOMBSTONES)
    if not fsio.exists(p):
        return np.zeros(0, np.int64)
    return fsio.read_parquet(p, columns=["doc_id"]).column("doc_id").to_numpy()


def delete_docs(index_dir: str, doc_ids) -> int:
    """Mark ``doc_ids`` deleted.  Idempotent, atomic (tmp + rename),
    merges with existing tombstones.  Returns the total tombstone
    count after the merge."""
    new = np.asarray(list(doc_ids), np.int64)
    merged = np.unique(np.concatenate([read_tombstones(index_dir), new]))
    from . import fsio

    fsio.write_parquet(
        pa.table({"doc_id": pa.array(merged, pa.int64())}),
        fsio.join(index_dir, TOMBSTONES),
    )
    return int(merged.size)


ALIAS_FILE = "alias.json"


def write_alias(alias_path: str, index_dir: str) -> None:
    """Point a serving ALIAS at an index directory — the flip step of
    out-of-place compaction (auto_compact).  The alias is a single
    JSON key; the flip is atomic on plain local paths (tmp+rename) and
    on real object stores (PUT is atomic per key), so readers see
    either the old or the new target.  ``file://`` URIs take the
    generic in-place-write protocol and are NOT atomic — that path
    form exists for protocol testing, not serving; keep serving
    aliases on a plain local path or a real object store."""
    from . import fsio

    fsio.write_json(alias_path, {"index_dir": index_dir, "version": 1})


def read_alias(alias_path: str) -> str:
    """The index directory an alias currently points at."""
    from . import fsio

    return str(fsio.read_json(alias_path)["index_dir"])


def generation_count(index_dir: str) -> int:
    """Number of segment generations (1 fresh build + one per
    add_documents).  Point lookups (more_like_this) are
    O(generations), so a long-lived incrementally-updated index should
    be compacted when this grows."""
    from .checkpoint import generations, read_build_manifest

    return len(generations(read_build_manifest(index_dir)))


def default_compact_dest(index_dir: str) -> str:
    """The ONE default destination convention for out-of-place
    compaction, shared by auto_compact and the CLI."""
    return index_dir.rstrip("/") + ".compact"


def auto_compact(
    index_dir: str,
    max_generations: int = 4,
    out_dir: str | None = None,
    min_tombstones: int | None = None,
    **merge_kwargs,
) -> tuple[str, dict | None]:
    """Compaction POLICY for long-lived incrementally-updated indexes
    (VERDICT r03 task #7): when the index exceeds ``max_generations``
    generations — or, if ``min_tombstones`` is set, has accumulated at
    least that many tombstones — rewrite it through compact_index into
    ``out_dir`` (default ``default_compact_dest``) and return
    ``(live_dir, stats)`` where live_dir is the path callers should
    serve from now on.  Below both thresholds this is a no-op
    returning ``(index_dir, None)``.

    Deliberately OUT-OF-PLACE: the object-store commit protocol has no
    atomic directory swap (engine.fsio — no renames on URI roots), and
    readers enumerate segments by directory scan, so an in-place
    rewrite would double-score mid-compaction.  The old index stays
    intact until the caller retires it — the same alias-flip pattern
    object-store table formats use.  Calling it after every
    add_documents bounds generations at ``max_generations`` with one
    O(corpus) rewrite per ``max_generations`` adds.

    An EXISTING destination is an error, never silently deleted: on a
    repeated schedule the default dest may be the index a serving
    alias currently points at, and rmtree'ing it would pull the live
    index out from under readers — pass a fresh ``out_dir`` per
    compaction (or retire the old one first)."""
    due = generation_count(index_dir) > max_generations
    if not due and min_tombstones is not None:
        due = read_tombstones(index_dir).size >= min_tombstones
    if not due:
        return index_dir, None
    dest = out_dir if out_dir is not None else default_compact_dest(index_dir)
    from . import fsio

    if fsio.exists(dest):
        raise ValueError(
            f"compaction destination already exists: {dest} — it may be a "
            "live (alias-targeted) index; pass a fresh out_dir or remove "
            "it explicitly"
        )
    stats = compact_index(index_dir, dest, **merge_kwargs)
    return dest, stats


def compact_index(index_dir: str, out_dir: str, **merge_kwargs) -> dict:
    """Rewrite the index without its tombstoned docs (no re-analysis).

    Runs the standard distributed merge over this single index with
    the tombstone set excluded during segment reconstruction; the
    output carries no tombstone file and its segments are
    byte-identical to a direct build of the reduced corpus.
    """
    from .build import merge_indexes

    return merge_indexes(
        [index_dir],
        out_dir,
        exclude_doc_ids=read_tombstones(index_dir),
        **merge_kwargs,
    )

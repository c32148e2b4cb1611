"""Checkpointing, lineage manifests, resume planning (S6/S7/J4).

Spec: BASELINE.json:6,14 — "per-partition lineage manifests, checkpointed
segment writes that allow resume after failure", "resumable from
checkpoint with per-partition lineage + metrics".

Unit of checkpoint = one segment partition.  A segment is COMMITTED iff
its directory contains a PARSEABLE ``manifest.json`` — the manifest is
written LAST by engine.segments.build_segment, so it is the commit
marker (no directory rename anywhere: the protocol works on object
stores, engine.fsio).  Resume therefore needs no WAL: scan committed
manifests, subtract their parts from range(P), and rebuild only the
remainder.  Because doc_id (and so part = doc_id % P) is
content-derived (engine/ids.py), a resumed build assigns every document
to the same partition and produces byte-identical segments (tested in
tests/test_resume.py).

The build-level manifest (``build_manifest.json``) records the global
config (P, analyzer, input) and is written FIRST; a resume validates the
config matches before reusing segments.

All paths may be plain local paths or filesystem URIs (engine.fsio).
"""

from __future__ import annotations

from . import fsio
from .segments import SEG_PREFIX

BUILD_MANIFEST = "build_manifest.json"
STATS_FILE = "collection_stats.json"


def write_build_manifest(out_dir: str, num_parts: int, analyzer: str, source: str) -> None:
    fsio.makedirs(out_dir)
    path = fsio.join(out_dir, BUILD_MANIFEST)
    cfg = {"num_parts": num_parts, "analyzer": analyzer, "source": source, "version": 1}
    if fsio.exists(path):
        prev = fsio.read_json(path)
        # compare the BASE config only: an incrementally-extended index
        # additionally carries a "generations" list (add_documents)
        if {k: prev.get(k) for k in cfg} != cfg:
            raise ValueError(
                f"resume config mismatch: index at {out_dir} was built with "
                f"{prev}, now asked for {cfg}; use a fresh out_dir"
            )
        return
    fsio.write_json(path, cfg)


def generations(manifest: dict) -> list[tuple[int, int]]:
    """Segment GENERATIONS of an index: [(first_seg_id, num_parts)].

    A fresh build is one generation [(0, P)]; each ``add_documents``
    call appends one.  Within a generation, a doc lives in segment
    ``first_seg_id + doc_id % num_parts`` — the closed-form location
    rule the point lookups (more_like_this) rely on."""
    gens = manifest.get("generations")
    if gens:
        return [(int(s), int(p)) for s, p in gens]
    return [(0, int(manifest["num_parts"]))]


def append_generation(out_dir: str, parts: int) -> int:
    """Record one more segment generation; returns its first segment
    id.  Written BEFORE the generation's segments are built, so an
    interrupted add_documents is visible (last generation has missing
    parts) and resumable."""
    path = fsio.join(out_dir, BUILD_MANIFEST)
    man = fsio.read_json(path)
    gens = [list(g) for g in generations(man)]
    start = gens[-1][0] + gens[-1][1]
    man["generations"] = gens + [[start, parts]]
    fsio.write_json(path, man)
    return start


def read_build_manifest(out_dir: str) -> dict:
    return fsio.read_json(fsio.join(out_dir, BUILD_MANIFEST))


def _segment_manifest(seg_path: str) -> dict | None:
    """The segment's manifest, or None when absent/torn (= uncommitted;
    a torn manifest can only result from an interrupted attempt, and
    treating it as uncommitted makes resume rebuild the segment).
    Delegates to segments.segment_manifest — the single commit
    predicate shared with readers (list_segments)."""
    from .segments import segment_manifest

    return segment_manifest(seg_path)


def completed_parts(out_dir: str) -> set[int]:
    """Parts with a committed segment (parseable manifest present)."""
    root = fsio.join(out_dir, "segments")
    done: set[int] = set()
    for d in fsio.listdir(root):
        if d.startswith(SEG_PREFIX) and ".tmp-" not in d:
            if _segment_manifest(fsio.join(root, d)) is not None:
                done.add(int(d[len(SEG_PREFIX):]))
    return done


def read_segment_manifests(out_dir: str) -> list[dict]:
    root = fsio.join(out_dir, "segments")
    out = []
    for d in fsio.listdir(root):
        if d.startswith(SEG_PREFIX) and ".tmp-" not in d:
            m = _segment_manifest(fsio.join(root, d))
            if m is not None:
                out.append(m)
    return out


def write_collection_stats(out_dir: str, stats: dict) -> None:
    fsio.write_json(fsio.join(out_dir, STATS_FILE), stats)


def read_collection_stats(out_dir: str) -> dict:
    return fsio.read_json(fsio.join(out_dir, STATS_FILE))

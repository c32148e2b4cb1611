"""Checkpointing, lineage manifests, resume planning (S6/S7/J4).

Spec: BASELINE.json:6,14 — "per-partition lineage manifests, checkpointed
segment writes that allow resume after failure", "resumable from
checkpoint with per-partition lineage + metrics".

Unit of checkpoint = one segment partition.  A segment is COMMITTED iff
its directory (renamed atomically from a tmp dir by
engine.segments.build_segment) contains ``manifest.json``.  Resume
therefore needs no WAL: scan committed manifests, subtract their parts
from range(P), and rebuild only the remainder.  Because doc_id (and so
part = doc_id % P) is content-derived (engine/ids.py), a resumed build
assigns every document to the same partition and produces byte-identical
segments (tested in tests/test_resume.py).

The build-level manifest (``build_manifest.json``) records the global
config (P, analyzer, input) and is written FIRST; a resume validates the
config matches before reusing segments.
"""

from __future__ import annotations

import json
import os

from .segments import SEG_PREFIX

BUILD_MANIFEST = "build_manifest.json"
STATS_FILE = "collection_stats.json"


def write_build_manifest(out_dir: str, num_parts: int, analyzer: str, source: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, BUILD_MANIFEST)
    cfg = {"num_parts": num_parts, "analyzer": analyzer, "source": source, "version": 1}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        # compare the BASE config only: an incrementally-extended index
        # additionally carries a "generations" list (add_documents)
        if {k: prev.get(k) for k in cfg} != cfg:
            raise ValueError(
                f"resume config mismatch: index at {out_dir} was built with "
                f"{prev}, now asked for {cfg}; use a fresh out_dir"
            )
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f, indent=1, sort_keys=True)
    os.rename(tmp, path)


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
    path = os.path.join(out_dir, BUILD_MANIFEST)
    with open(path) as f:
        man = json.load(f)
    gens = [list(g) for g in generations(man)]
    start = gens[-1][0] + gens[-1][1]
    man["generations"] = gens + [[start, parts]]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.rename(tmp, path)
    return start


def read_build_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, BUILD_MANIFEST)) as f:
        return json.load(f)


def completed_parts(out_dir: str) -> set[int]:
    """Parts with a committed segment (manifest present)."""
    root = os.path.join(out_dir, "segments")
    done: set[int] = set()
    if not os.path.isdir(root):
        return done
    for d in os.listdir(root):
        if d.startswith(SEG_PREFIX) and ".tmp-" not in d:
            if os.path.exists(os.path.join(root, d, "manifest.json")):
                done.add(int(d[len(SEG_PREFIX):]))
    return done


def read_segment_manifests(out_dir: str) -> list[dict]:
    root = os.path.join(out_dir, "segments")
    out = []
    for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        p = os.path.join(root, d, "manifest.json")
        if d.startswith(SEG_PREFIX) and ".tmp-" not in d and os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def write_collection_stats(out_dir: str, stats: dict) -> None:
    tmp = os.path.join(out_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(out_dir, STATS_FILE))


def read_collection_stats(out_dir: str) -> dict:
    with open(os.path.join(out_dir, STATS_FILE)) as f:
        return json.load(f)

"""Doc-id assignment, content hashing, corpus mapping (M1/M2/D1).

- doc_id = lower 63 bits of sha256(repo \\0 path \\0 commit) (M1):
  deterministic and content-independent of row order, so task retries
  and resumed builds reproduce identical ids (BASELINE.json:14
  rank-identity + resume).  Collisions are checked once per build
  (segment build asserts doc_id uniqueness after dedup).
- content_sha256 = sha256(content) hex (M2) — the per-row invariant vs
  the source table (BASELINE.json:15).
- Exact duplicate (repo, path, commit) rows map to the SAME doc_id and
  therefore the same partition; the segment build keeps the first by
  (doc_id, content_sha256) order (D1, deterministic).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def doc_id_of(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}\0{path}\0{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def assign_ids(batch: pa.Table, num_parts: int, part_offset: int = 0) -> pa.Table:
    """map_batches fn: corpus batch -> + doc_id, content_sha256, part.

    part = part_offset + doc_id % num_parts: doc_id is a hash, so
    partitions are uniform regardless of term/content skew (SURVEY.md
    SS4.2 rationale in engine/__init__.py).  ``part_offset`` shifts the
    range for incremental generations (engine.build.add_documents).
    """
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    content = batch.column("content").to_pylist()
    n = len(repo)
    ids = np.empty(n, dtype=np.int64)
    shas = []
    for i in range(n):
        ids[i] = doc_id_of(repo[i], path[i], commit[i])
        shas.append(hashlib.sha256(content[i].encode()).hexdigest())
    batch = batch.append_column("doc_id", pa.array(ids, pa.int64()))
    batch = batch.append_column("content_sha256", pa.array(shas, pa.string()))
    batch = batch.append_column(
        "part",
        pa.array((part_offset + ids % num_parts).astype(np.int32), pa.int32()),
    )
    return batch

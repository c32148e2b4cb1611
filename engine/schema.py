"""Declared pyarrow schemas for every logical table (SURVEY.md SS1.1-1.2).

Spec source: BASELINE.json:15 fixes the corpus (T1) schema exactly:
(repo:string, path:string, commit:string, lang:string, content:string).
All other schemas are engine-internal and frozen here so each stage can
assert its input.
"""

from __future__ import annotations

import pyarrow as pa

# T1 — input corpus (binding, BASELINE.json:15).
CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# T2/T6 — per-document stats + metadata (doc_len = emitted token count).
DOC_STATS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("doc_len", pa.int32()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
    ]
)

# T3 — exploded postings (one row per (doc, term)), pre-shuffle.
POSTINGS_RAW = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("positions", pa.list_(pa.int32())),
        ("part", pa.int32()),
    ]
)

# T5 — per-segment dictionary (local stats + byte offsets into postings.bin).
SEGMENT_DICT = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),          # local df (postings count in this segment)
        ("cf", pa.int64()),          # local collection frequency (sum tf)
        ("n_postings", pa.int32()),
        ("max_tf", pa.int32()),
        ("doc_off", pa.int64()),     # absolute byte offset into postings.bin
        ("doc_nbytes", pa.int64()),
        ("tf_off", pa.int64()),
        ("tf_nbytes", pa.int64()),
        ("pos_off", pa.int64()),
        ("pos_nbytes", pa.int64()),
    ]
)

# block-max / skip-pointer table: one row per term, list columns per block.
SEGMENT_BLOCKMAX = pa.schema(
    [
        ("term", pa.string()),
        ("last_dids", pa.list_(pa.int64())),   # last doc_id per block (skip pointers)
        ("max_tfs", pa.list_(pa.int32())),     # max tf per block (block-max WAND)
        ("doc_boffs", pa.list_(pa.int64())),   # block start offsets, relative to doc_off
        ("tf_boffs", pa.list_(pa.int64())),    # block start offsets, relative to tf_off
    ]
)

# global term stats (df/cf across all segments) — BM25 inputs.
GLOBAL_TERMS = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
    ]
)

# T9 — query workload.
QUERIES = pa.schema(
    [
        ("query_id", pa.int64()),
        ("text", pa.string()),
        ("k", pa.int32()),
    ]
)

# T10 — ranked results.
RESULTS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("repo", pa.string()),
        ("path", pa.string()),
    ]
)

POSTINGS_BLOCK = 128  # postings per compressed block (delta restart per block)


def assert_schema(table: pa.Table, schema: pa.Schema, stage: str) -> None:
    """Cheap stage-input assertion: names and types must match (order-insensitive)."""
    got = {f.name: f.type for f in table.schema}
    for f in schema:
        if f.name not in got:
            raise ValueError(f"{stage}: missing column {f.name!r}; have {sorted(got)}")
        if got[f.name] != f.type:
            raise ValueError(f"{stage}: column {f.name!r} is {got[f.name]}, want {f.type}")

"""Index verification (M7): per-row content-sha256 invariant vs the
source corpus (BASELINE.json:15 "per-row invariant vs the reference:
content sha256 equality").

``verify_index`` recomputes sha256(content) for every corpus row and
joins it (Ray Data hash join on doc_id) against the index's persisted
doc_stats.  Everything is distributed: the only driver-side values are
the final counters.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .build import read_doc_stats
from .checkpoint import read_build_manifest
from .ids import assign_ids


def verify_index(index_dir: str, corpus: "ray.data.Dataset",
                 num_partitions: int = 16) -> dict:
    """Check the sha256 invariant of ``index_dir`` against ``corpus``.

    Returns {num_corpus_docs, num_index_docs, matched, mismatched,
    missing_in_index, ok}.  Duplicate corpus keys (same repo/path/
    commit) collapse to one doc by the build's D1 rule (first by
    (doc_id, sha)), mirrored here with a groupby-min.
    """
    num_parts = int(read_build_manifest(index_dir)["num_parts"])

    def want_rows(batch: pa.Table) -> pa.Table:
        b = assign_ids(batch, num_parts)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "src_sha": b.column("content_sha256"),
            }
        )

    want = (
        corpus.map_batches(want_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .min("src_sha")  # D1: keep first by (doc_id, sha) == min sha
        .map_batches(
            lambda b: b.rename_columns(["doc_id", "src_sha"]),
            batch_format="pyarrow",
        )
    )
    have = read_doc_stats(index_dir).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "idx_sha": b.column("content_sha256")}
        ),
        batch_format="pyarrow",
    )
    joined = want.join(
        have, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",)
    )

    def summarize(batch: pa.Table) -> pa.Table:
        idx = batch.column("idx_sha")
        src = batch.column("src_sha")
        missing = pc.sum(pc.is_null(idx).cast(pa.int64())).as_py() or 0
        matched = pc.sum(
            pc.and_(pc.is_valid(idx), pc.equal(idx, src)).cast(pa.int64())
        ).as_py() or 0
        n = batch.num_rows
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "matched": pa.array([matched], pa.int64()),
                "missing": pa.array([missing], pa.int64()),
            }
        )

    parts = joined.map_batches(summarize, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    matched = sum(r["matched"] for r in parts)
    missing = sum(r["missing"] for r in parts)
    num_index = read_doc_stats(index_dir).count()
    out = {
        "num_corpus_docs": int(n),
        "num_index_docs": int(num_index),
        "matched": int(matched),
        "mismatched": int(n - matched - missing),
        "missing_in_index": int(missing),
    }
    out["ok"] = (
        out["mismatched"] == 0
        and out["missing_in_index"] == 0
        and out["num_index_docs"] == out["num_corpus_docs"]
    )
    return out

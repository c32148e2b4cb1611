"""Corpus sources: the driver `documents` table -> corpus(T1) mapping
(FIXTURES.md F1b) and helpers to scale it for benchmarks.

The mapping is a pure map_batches projection; content bytes equal the
source ``text`` so the sha256 per-row invariant (BASELINE.json:15) is
checkable against the source parquet.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data


def documents_batch_to_corpus(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, n_chars) -> corpus rows.

    repo/path derive via arrow string kernels (no Python row loop —
    this map sits inside the benchmarked build path); the commit sha1
    is necessarily a per-row digest loop (no vectorized kernel exists;
    same trade as exact_dedup's md5)."""
    import pyarrow.compute as pc

    text_col = batch.column("text")
    return pa.table(
        {
            "repo": pc.binary_join_element_wise(
                "testdata/", pc.cast(batch.column("source"), pa.string()), ""
            ),
            "path": pc.binary_join_element_wise(
                "docs/",
                pc.cast(batch.column("doc_id"), pa.string()),
                ".txt",
                "",
            ),
            "commit": pa.array(
                [
                    hashlib.sha1(t.encode()).hexdigest()
                    for t in text_col.to_pylist()
                ],
                pa.string(),
            ),
            "lang": batch.column("lang").cast(pa.string()),
            "content": pc.cast(text_col, pa.string()),
        }
    )


# Field-token namespace marker: guillemets survive the SIMPLE
# analyzer untouched (whitespace split, lower() no-op on punctuation)
# and cannot be produced by whitespace tokenization of ordinary text.
FIELD_MARK = "«{field}»"  # «path»term


def with_field_tokens(
    corpus: "ray.data.Dataset", fields: tuple[str, ...] = ("path",)
) -> "ray.data.Dataset":
    """Multi-field indexing transform (Lucene multi-field documents):
    append each requested metadata field's tokens to ``content`` as
    namespaced terms («field»token), so one ordinary build yields
    per-field postings — per-field df/idf fall out of the shared
    dictionary for free, and query-time boosts are just weighted terms
    (IndexReader.qterms_fields / run_queries(field_boosts=...)).

    Field values are lowercased and split on ``/ . -`` and whitespace
    (path-segment tokenization).  SIMPLE-analyzer indexes only: the
    whitespace tokenizer keeps «field»tok intact, while the code
    tokenizer would strip the marker.  Shared doc length grows by the
    field-token count (BM25F-lite: shared length normalization,
    per-field idf/tf) — a fielded index is a distinct, self-consistent
    configuration, rank-identical to refimpl over the same transformed
    corpus.  Fully vectorized (a few Arrow kernels per field).

    A null or token-free (empty / all-separator) field value skips
    that field for that document: the doc keeps its content tokens
    (null would otherwise propagate through the join and silently
    null the ENTIRE content, dropping every posting of the doc).
    """
    import pyarrow.compute as pc

    def add(batch: pa.Table) -> pa.Table:
        content = batch.column("content")
        for f in fields:
            if f == "content":
                continue
            mark = FIELD_MARK.format(field=f)
            vals = pc.utf8_lower(batch.column(f))
            # token-free values -> null, so the final skip-join leaves
            # content untouched; trimming also stops a leading/trailing
            # separator from minting a bare marker token
            vals = pc.utf8_trim(vals, "/. \t\n\r\v\f-")
            vals = pc.if_else(
                pc.equal(vals, ""), pa.scalar(None, pa.string()), vals
            )
            # "docs/5.txt" -> "«path»docs «path»5 «path»txt"
            toks = pc.replace_substring_regex(vals, r"[/.\s-]+", " " + mark)
            toks = pc.binary_join_element_wise(
                pa.array([mark] * batch.num_rows), toks, ""
            )
            content = pc.binary_join_element_wise(
                content, toks, " ", null_handling="skip"
            )
        i = batch.schema.get_field_index("content")
        return batch.set_column(i, "content", content)

    return corpus.map_batches(add, batch_format="pyarrow")


def union_corpora(corpora: list["ray.data.Dataset"]) -> "ray.data.Dataset":
    """D2: union of corpus shards -> one corpus Dataset.

    ``ds.union`` is lazy and moves no data (the shards' blocks simply
    concatenate into one stream); duplicate (repo, path, commit) keys
    across shards collapse later by the build's D1 rule, exactly as
    duplicates within one shard do.  For many Parquet directories
    prefer the multi-path ``ray.data.read_parquet([dir1, dir2, ...])``
    form — one read op, better file-level parallelism; this helper is
    for already-constructed Datasets (e.g. differently-filtered
    sources).
    """
    if not corpora:
        raise ValueError("union_corpora needs at least one corpus")
    out = corpora[0]
    for ds in corpora[1:]:
        out = out.union(ds)
    return out


def read_corpus_from_documents(
    sf_dir: str,
    repeat: int = 1,
    override_num_blocks: int | None = None,
    langs: list[str] | None = None,
) -> "ray.data.Dataset":
    """Read sf_dir/documents.parquet as a corpus Dataset.

    ``repeat`` > 1 replicates each document with a distinct path suffix
    (deterministic) to scale benchmark inputs to >=100k docs
    (BASELINE.md metric table) without external data.

    ``langs`` (M6): optional ``lang IN (...)`` predicate, pushed into
    the Parquet scan as a filter expression so pruned row groups never
    leave storage.
    """
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if langs is not None:
        import pyarrow.dataset as pads

        kwargs["filter"] = pads.field("lang").isin(list(langs))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        **kwargs,
    )

    if repeat == 1:
        return ds.map_batches(documents_batch_to_corpus, batch_format="pyarrow")

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        base = documents_batch_to_corpus(batch)
        parts = []
        for r in range(repeat):
            t = base
            if r > 0:
                paths = pc.binary_join_element_wise(
                    base.column("path"), f".r{r}", ""
                )
                t = base.set_column(1, "path", paths)
            parts.append(t)
        return pa.concat_tables(parts)

    return ds.map_batches(expand, batch_format="pyarrow")


def write_partitioned(
    sf_dir: str, out_dir: str, by: str = "lang"
) -> "ray.data.Dataset":
    """Partitioned-parquet sink (the resumable-output layout): write
    ``documents`` hive-partitioned by ``by`` (``out/lang=en/...``) and
    return per-partition row counts READ BACK FROM THE WRITTEN FILES —
    so the returned table verifies the round trip, not just the plan.

    Ray's ``write_parquet(partition_cols=...)`` is shuffle-free: each
    task splits ITS blocks by key and appends to the right directories,
    so the write streams with backpressure and a failed run can be
    retargeted per-partition.  ``out_dir`` is recreated from scratch
    (parquet appends are not idempotent across retries of the whole
    pipeline; per-partition reruns are).
    """
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    ray.data.read_parquet(f"{sf_dir}/documents.parquet").write_parquet(
        out_dir, partition_cols=[by]
    )

    def norm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                by: pc.cast(batch.column(by), pa.string()),
                "n_docs": pc.cast(batch.column("count()"), pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(out_dir)
        .groupby(by)
        .count()
        .map_batches(norm, batch_format="pyarrow")
    )

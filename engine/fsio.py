"""Filesystem routing for every index data path (pyarrow.fs).

Spec driver: BASELINE.json:6,14 — the build's exchange, segments and
checkpoints must work when the index root is SHARED/OBJECT storage on
a multi-node cluster (``ray job submit``), where POSIX ``os.rename``
does not exist.  All byte traffic for runs, segments, global-terms
shards, manifests and stats flows through these helpers, keyed by a
path string that may be a plain local path or a URI
(``file:///...``, ``s3://...``).

Commit protocol (object-store safe by construction):

- **Write-once content-addressed files** (run files, aggregated
  global-terms shards): existence probe + single write.  On an object
  store a PUT is atomic per key, and a retried task rewrites identical
  bytes under the same key — idempotent.  On a local filesystem the
  write goes through tmp+rename purely so a concurrent reader can
  never observe a partial file; the rename is an OPTIMIZATION of the
  local case, never a correctness requirement (``FORCE_NO_RENAME``
  disables it and the pytest suite asserts the whole
  build+query+resume cycle still yields byte-identical indexes).
- **Segment directories**: data files are written directly to final
  paths and ``manifest.json`` is written LAST as the commit marker —
  resume/readers already treat a segment as committed iff its
  manifest exists AND parses (engine.checkpoint).  No directory
  rename exists anywhere.  Segment bytes are deterministic, so a
  retry racing a winner overwrites files with identical content.
"""

from __future__ import annotations

import json
import os
import posixpath

import pyarrow as pa
import pyarrow.fs as pafs

# Test hook: route local writes through the no-rename (object-store)
# protocol so the suite can prove renames are never load-bearing.
FORCE_NO_RENAME = False


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Path or URI -> (FileSystem, fs-local path)."""
    if "://" in path:
        fs, p = pafs.FileSystem.from_uri(path)
        return fs, p
    return pafs.LocalFileSystem(), path


def _local_fast(path: str) -> bool:
    """True when the LOCAL fast path (mmap reads, tmp+rename writes)
    applies.  Keyed on the PATH FORM, not global state, so the decision
    travels with the path into Ray workers: any URI — including
    ``file://`` — takes the generic object-store protocol (direct
    atomic-PUT-style writes, no rename anywhere), which is exactly what
    the URI-root test suite exercises end to end."""
    return "://" not in path and not FORCE_NO_RENAME


def join(base: str, *parts: str) -> str:
    """Join path components; URI-safe (posix separators)."""
    return posixpath.join(base, *parts)


def exists(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def file_size(path: str) -> int:
    """Size in bytes of an existing file, -1 when absent."""
    fs, p = resolve(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        return -1
    return info.size


def _complete(path: str, expected_size: int) -> bool:
    """True iff ``path`` exists AND its byte length matches.  The
    write-once skip must never trust bare existence on filesystems
    where writes are not atomic per key (local paths, ``file://``
    URIs, FORCE_NO_RENAME): a task that crashed mid-write leaves a
    torn file that a retry would otherwise skip and then commit via
    the manifest marker.  Content is deterministic, so length equality
    is the cheap sufficient completeness check — a short/torn file is
    simply rewritten (idempotent overwrite)."""
    return file_size(path) == expected_size


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def listdir(path: str) -> list[str]:
    """Base names of a directory's entries ([] when absent)."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(posixpath.basename(i.path.rstrip("/")) for i in infos)


def isdir(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def write_bytes(path: str, data: bytes) -> None:
    """Single-file write, never observable partially: tmp+rename on a
    local fs, direct PUT (atomic per key) elsewhere."""
    fs, p = resolve(path)
    if _local_fast(path):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.rename(tmp, p)
        except OSError:
            os.unlink(tmp)
            # POSIX rename REPLACES an existing destination, so a
            # failure is never a benign lost race — it is a real error
            # (EACCES/EXDEV/...) and swallowing it would silently drop
            # writes of MUTABLE files (tombstones, alias, manifests).
            raise
        return
    fs.create_dir(posixpath.dirname(p), recursive=True)
    with fs.open_output_stream(p) as f:
        f.write(data)


def write_chunks(path: str, chunks: list[bytes], once: bool = False) -> None:
    """Like write_bytes but streams several chunks without
    concatenating them (large postings sections)."""
    fs, p = resolve(path)
    if once and _complete(path, sum(len(c) for c in chunks)):
        return
    if _local_fast(path):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
        with open(tmp, "wb") as f:
            for c in chunks:
                f.write(c)
        try:
            os.rename(tmp, p)
        except OSError:
            os.unlink(tmp)
            raise  # see write_bytes: rename failure is never benign
        return
    fs.create_dir(posixpath.dirname(p), recursive=True)
    with fs.open_output_stream(p) as f:
        for c in chunks:
            f.write(c)


def write_bytes_once(path: str, data: bytes) -> None:
    """Write-once commit for content-addressed files: skip only when
    the key already exists COMPLETE (length check, see _complete);
    a retry's bytes are identical by construction so a torn file is
    safely overwritten."""
    if _complete(path, len(data)):
        return
    write_bytes(path, data)


def read_bytes(path: str) -> bytes:
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_json(path: str, obj) -> None:
    write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def read_json(path: str):
    return json.loads(read_bytes(path))


def open_input(path: str):
    """Random-access input file (pa.ipc / pq readers accept it).
    Memory-maps on a local fs (zero-copy block decode), plain
    random-access reads elsewhere."""
    fs, p = resolve(path)
    if _local_fast(path):
        return pa.memory_map(p)
    return fs.open_input_file(p)


def open_output(path: str):
    """Streaming output file handle (caller writes final bytes; use
    only with deterministic content or a manifest-marker commit)."""
    fs, p = resolve(path)
    if _local_fast(path):
        os.makedirs(os.path.dirname(p), exist_ok=True)
    else:
        fs.create_dir(posixpath.dirname(p), recursive=True)
    return fs.open_output_stream(p)


def read_parquet(path: str, **kwargs) -> pa.Table:
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    return pq.read_table(p, filesystem=fs, **kwargs)


def write_parquet(table: pa.Table, path: str, once: bool = False, **kwargs) -> None:
    """Parquet write under the single-file commit protocol."""
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf, **kwargs)
    data = buf.getvalue()
    # Serialize BEFORE the skip check so completeness can be verified
    # by length, not bare existence (torn-file retry safety).
    if once and _complete(path, len(data)):
        return
    write_bytes(path, data)


def parquet_file(path: str):
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    return pq.ParquetFile(fs.open_input_file(p))

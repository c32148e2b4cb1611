"""Fault tolerance: Ray retries a crashed analyze worker and the build
still produces byte-identical segments (the content-addressed run files
make retries idempotent — engine/postings.py)."""

import hashlib
import os

import pyarrow as pa

import ray.data

from engine.build import build_index
from engine.segments import list_segments
from tests.fixtures.gen import gen_corpus


def _hashes(out: str) -> dict:
    res = {}
    for seg in list_segments(out):
        for fname in ("postings.bin", "dict.parquet", "docs.parquet"):
            with open(os.path.join(seg, fname), "rb") as f:
                res[f"{os.path.basename(seg)}/{fname}"] = hashlib.sha256(
                    f.read()
                ).hexdigest()
    return res


def test_build_survives_worker_crash(ray_session, tmp_path, monkeypatch):
    rows = gen_corpus(200, seed=13)
    table = pa.Table.from_pylist(rows)

    clean = str(tmp_path / "clean")
    build_index(ray.data.from_arrow(table), clean, num_parts=5,
                analyzer_concurrency=(1, 2))
    want = _hashes(clean)

    trip = str(tmp_path / "trips")
    os.makedirs(trip)

    from engine.postings import AnalyzeWriteRuns

    # defined INSIDE the test so cloudpickle ships it by value (restarted
    # workers cannot import the test module); kills its worker process
    # once, AFTER writing the run file — a SYSTEM fault Ray retries
    # (plain UDF exceptions are user errors and fail the run)
    class Flaky(AnalyzeWriteRuns):
        def __call__(self, batch: pa.Table) -> pa.Table:
            result = super().__call__(batch)
            marker = os.path.join(trip, "tripped")
            if not os.path.exists(marker):
                try:
                    with open(marker, "x") as f:
                        f.write("x")
                except FileExistsError:
                    return result
                os._exit(1)  # simulate worker crash mid-stage
            return result

    import engine.build as eb

    monkeypatch.setattr(eb, "AnalyzeWriteRuns", Flaky)
    out = str(tmp_path / "faulty")
    build_index(ray.data.from_arrow(table), out, num_parts=5,
                analyzer_concurrency=(1, 2))
    assert os.path.exists(os.path.join(trip, "tripped"))  # fault fired
    assert _hashes(out) == want

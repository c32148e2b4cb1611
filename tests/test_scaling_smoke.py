"""Scale/infra smoke (SURVEY.md §5.2): the index bytes are invariant to
execution parallelism — different actor-pool sizes, batch sizes and
input block counts must produce byte-identical segments (the property
that makes the N vs 4N scaling runs comparable and task retries safe)."""

import hashlib
import os

import pyarrow as pa
import pytest

import ray.data

from engine.build import build_index
from engine.segments import list_segments
from tests.fixtures.gen import gen_corpus


def _hashes(out: str) -> dict:
    res = {}
    for seg in list_segments(out):
        for fname in ("postings.bin", "dict.parquet", "blockmax.parquet", "docs.parquet"):
            with open(os.path.join(seg, fname), "rb") as f:
                res[f"{os.path.basename(seg)}/{fname}"] = hashlib.sha256(
                    f.read()
                ).hexdigest()
    return res


@pytest.mark.parametrize(
    "concurrency,batch_size,blocks",
    [((1, 1), 32, 1), ((2, 4), 16, 7)],
)
def test_parallelism_invariance(ray_session, tmp_path, concurrency, batch_size, blocks):
    rows = gen_corpus(150, seed=3)
    table = pa.Table.from_pylist(rows)
    base = str(tmp_path / "base")
    build_index(
        ray.data.from_arrow(table).repartition(3), base, num_parts=5,
        analyzer_concurrency=(1, 2), analyzer_batch_size=64,
    )
    out = str(tmp_path / "variant")
    build_index(
        ray.data.from_arrow(table).repartition(blocks), out, num_parts=5,
        analyzer_concurrency=concurrency, analyzer_batch_size=batch_size,
    )
    assert _hashes(out) == _hashes(base)

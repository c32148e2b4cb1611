import pytest


@pytest.fixture(scope="session")
def built_index(ray_session, tmp_path_factory):
    """Index built over the fixture corpus + the single-process oracle
    over the same rows (SURVEY.md §5.1: refimpl IS the reference)."""
    import pyarrow as pa
    import ray.data

    from engine.build import build_index
    from engine.refimpl import RefIndex
    from tests.fixtures.gen import gen_corpus, gen_queries

    rows = gen_corpus(300)
    out = str(tmp_path_factory.mktemp("index") / "idx")
    stats = build_index(
        ray.data.from_arrow(pa.Table.from_pylist(rows)),
        out,
        num_parts=8,
        analyzer_concurrency=(1, 2),
    )
    ref = RefIndex(rows)
    return {"out": out, "rows": rows, "ref": ref, "stats": stats,
            "queries": gen_queries()}


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()

"""Table profiling: exact equivalence with a local recompute on mixed
numeric/string/null data, and the unsupported-type guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from engine import profile


@pytest.fixture(scope="module")
def mixed(ray_session):
    t = pa.table({
        "k": pa.array([1, 2, 2, 3, None, 3], pa.int64()),
        "x": pa.array([1.5, None, -2.25, 1.5, 0.0, 7.125], pa.float64()),
        "s": pa.array(["b", "a", None, "c", "a", "b"]),
    })
    return t, ray.data.from_arrow(t)


def test_profile_matches_local(mixed):
    t, ds = mixed
    out = {r["column"]: r for r in
           profile.profile_table("", "", ["k", "x", "s"], docs=ds).to_pylist()}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (6, 1, 3)
    assert (k["min_r"], k["max_r"]) == (1.0, 3.0)
    assert k["sum_micros"] == (1 + 2 + 2 + 3 + 3) * 1_000_000
    x = out["x"]
    assert (x["n_rows"], x["n_nulls"], x["n_distinct"]) == (6, 1, 4)
    assert (x["min_r"], x["max_r"]) == (-2.25, 7.125)
    assert x["sum_micros"] == int(round((1.5 - 2.25 + 1.5 + 0.0 + 7.125) * 1e6))
    s = out["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (6, 1, 3)
    assert (s["min_str"], s["max_str"]) == ("a", "c")
    assert s["min_r"] is None and s["sum_micros"] is None


def test_profile_distinct_exact_across_batches(ray_session):
    """Distinct counting survives per-batch dedup + the groupby merge:
    values repeating ACROSS batches count once."""
    rows = [{"v": i % 7} for i in range(1000)]
    ds = ray.data.from_items(rows).repartition(8)
    nd = profile.distinct_counts("", "", ["v"], docs=ds)
    assert nd == {"v": 7}


def test_profile_unsupported_type_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([1, 2], pa.timestamp("us")),
    }))
    with pytest.raises(Exception, match="int/float/string"):
        profile.profile_table("", "", ["ts"], docs=ds)


def test_profile_constant_and_all_null_columns(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "const": pa.array([7] * 10, pa.int64()),
        "allnull": pa.array([None] * 10, pa.int64()),
    }))
    out = {r["column"]: r for r in
           profile.profile_table("", "", ["const", "allnull"],
                                 docs=ds).to_pylist()}
    assert (out["const"]["n_distinct"], out["const"]["min_r"],
            out["const"]["max_r"]) == (1, 7.0, 7.0)
    a = out["allnull"]
    assert (a["n_rows"], a["n_nulls"], a["n_distinct"]) == (10, 10, 0)
    assert a["min_r"] is None and a["sum_micros"] is None


def test_profile_nan_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([1.0, float("nan")], pa.float64()),
    }))
    with pytest.raises(Exception, match="NaN"):
        profile.profile_table("", "", ["x"], docs=ds)


def test_profile_signed_zero_counts_once(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([0.0, -0.0, 1.0], pa.float64()),
    }))
    nd = profile.distinct_counts("", "", ["x"], docs=ds)
    assert nd == {"x": 2}

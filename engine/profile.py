"""Table profiling (data-quality stats): per-column row/null/distinct
counts, min/max, and an order-independent integer-micros sum for
numeric columns — the first thing a curation pipeline computes over a
new 100-TB drop.

Two bounded stages:
- stats: ONE streaming ``map_batches`` pass emitting a per-(batch,
  column) partial row (count, nulls, min, max, micros-sum) — the
  driver merges columns x batches rows, never data rows.  Sums are
  integer micros (engine.functions.micro_signed), so the merge is
  order-independent and replays exactly in SQL (the lm_doc_scores
  trick).
- distinct: one pass projecting each column to (col, value-string)
  rows deduped per batch, then ONE groupby exchange over both keys;
  the exchange volume is the sum of per-batch distincts, and the
  result is columns-sized.  Casting to string for the shared key space
  is injective for ints and strings; float64's Arrow cast is the
  shortest round-trip representation, also injective.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .functions import micro_signed, round6_signed


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=list(columns)
    )


def profile_table(
    sf_dir: str,
    table: str,
    columns: list[str],
    docs: "ray.data.Dataset | None" = None,
) -> pa.Table:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_r, max_r, sum_micros, min_str, max_str).  Numeric columns
    carry round6 min/max and the micros sum (string fields null);
    string columns carry lexicographic min/max (numeric fields null).
    Output is columns-sized (a driver-side table by construction).

    The input executes ONCE: it is materialized (projected columns
    only, spillable blocks) and shared by the stats pass and the
    distinct-count exchange — an unmaterialized lazy input would
    re-run its whole upstream pipeline for each pass.  NaN in a float
    column raises (NaN min/max/sum/distinct semantics differ between
    engines — filter first); -0.0 and 0.0 count as ONE distinct value
    (SQL equality)."""
    import pyarrow.compute as pc

    ds = (docs if docs is not None
          else _read(sf_dir, table, columns)).materialize()

    def partials(batch: pa.Table) -> pa.Table:
        rows = []
        for name in columns:
            col = batch.column(name)
            n = len(col)
            nulls = col.null_count
            row: dict = {"column": name, "n": n, "nulls": nulls,
                         "mn": None, "mx": None, "sm": None,
                         "mns": None, "mxs": None}
            valid = col.drop_null()
            if len(valid):
                if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                    v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                    if np.isnan(v).any():
                        raise ValueError(
                            f"column {name} contains NaN; profile_table "
                            "requires NaN-free numeric columns (filter "
                            "first) — NaN min/max/sum/distinct semantics "
                            "differ between engines"
                        )
                    row["mn"] = float(v.min())
                    row["mx"] = float(v.max())
                    row["sm"] = int(micro_signed(v).sum())
                elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    mm = pc.min_max(valid)
                    row["mns"] = mm["min"].as_py()
                    row["mxs"] = mm["max"].as_py()
                else:
                    raise TypeError(
                        f"profile_table supports int/float/string columns; "
                        f"{name} is {col.type}"
                    )
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("column", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
             ("mn", pa.float64()), ("mx", pa.float64()), ("sm", pa.int64()),
             ("mns", pa.string()), ("mxs", pa.string())]
        ))

    merged: dict[str, dict] = {
        c: {"n": 0, "nulls": 0, "mn": None, "mx": None, "sm": None,
            "mns": None, "mxs": None}
        for c in columns
    }
    # columns x batches rows — bounded driver merge
    for r in ds.map_batches(partials, batch_format="pyarrow").take_all():
        m = merged[r["column"]]
        m["n"] += r["n"]
        m["nulls"] += r["nulls"]
        for key, red in (("mn", min), ("mx", max), ("mns", min), ("mxs", max)):
            if r[key] is not None:
                m[key] = r[key] if m[key] is None else red(m[key], r[key])
        if r["sm"] is not None:
            m["sm"] = r["sm"] if m["sm"] is None else m["sm"] + r["sm"]

    nd = distinct_counts(sf_dir, table, columns, docs=ds)
    out = []
    for c in columns:
        m = merged[c]
        out.append(
            {
                "column": c,
                "n_rows": m["n"],
                "n_nulls": m["nulls"],
                "n_distinct": nd[c],
                "min_r": None if m["mn"] is None else float(round6_signed(m["mn"])),
                "max_r": None if m["mx"] is None else float(round6_signed(m["mx"])),
                "sum_micros": m["sm"],
                "min_str": m["mns"],
                "max_str": m["mxs"],
            }
        )
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("column", pa.string()), ("n_rows", pa.int64()),
         ("n_nulls", pa.int64()), ("n_distinct", pa.int64()),
         ("min_r", pa.float64()), ("max_r", pa.float64()),
         ("sum_micros", pa.int64()),
         ("min_str", pa.string()), ("max_str", pa.string())]
    ))


def distinct_counts(
    sf_dir: str,
    table: str,
    columns: list[str],
    docs: "ray.data.Dataset | None" = None,
) -> dict[str, int]:
    """EXACT per-column distinct counts (nulls excluded) in ONE
    exchange: every column projects into a shared (col, value-string)
    key space, deduped per batch, then one groupby over both keys;
    per-key rows collapse to a columns-sized count."""
    import pyarrow.compute as pc

    ds = docs if docs is not None else _read(sf_dir, table, columns)

    def explode(batch: pa.Table) -> pa.Table:
        cols_out, vals_out = [], []
        for name in columns:
            col = batch.column(name).drop_null()
            if pa.types.is_floating(col.type):
                # IEEE: -0.0 + 0.0 == +0.0 — collapses the signed-zero
                # pair so the distinct count matches SQL equality
                col = pc.add(col, 0.0)
            vs = pc.unique(pc.cast(col, pa.string()))
            cols_out.append(pa.array([name] * len(vs), pa.string()))
            vals_out.append(vs)
        return pa.table(
            {
                "col": pa.concat_arrays(cols_out),
                "val": pa.concat_arrays(
                    [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                     else v for v in vals_out]
                ),
            }
        )

    def per_col(batch: pa.Table) -> pa.Table:
        import collections

        cnt = collections.Counter(batch.column("col").to_pylist())
        return pa.table(
            {
                "col": pa.array(list(cnt), pa.string()),
                "nd": pa.array([cnt[c] for c in cnt], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["col", "val"])
        .count()
        .map_batches(per_col, batch_format="pyarrow")
        .take_all()
    )
    out = {c: 0 for c in columns}
    for r in rows:
        out[r["col"]] += int(r["nd"])
    return out

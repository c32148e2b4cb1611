"""Simulate the driver's correctness gate: run every queries() entry vs
its oracle_sql() through DuckDB at sf0.01 (row count + sorted-column
schema + order-insensitive value hash), plus the entry() smoke check.

Usage (from /root/repo, nothing else running):
    python tools/driver_sim.py [query_name ...]
"""
import hashlib
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import logging
logging.getLogger("ray.data").setLevel(logging.ERROR)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as e

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def vhash(df: pd.DataFrame) -> str:
    # NO float_format: default full repr keeps dtype drift visible
    # (int64 27165 vs float64 27165.0 must hash differently, like the
    # real driver's compare — %.6g used to mask exactly that bug).
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s = df.to_csv(index=False)
    return hashlib.sha256(s.encode()).hexdigest()[:12]


qs = e.queries()
os_ = e.oracle_sql()
only = sys.argv[1:] or list(qs)
fail = 0
for name in only:
    fn = qs[name]
    try:
        mine = to_pandas(fn(SF))
    except Exception as ex:
        print(f"{name}: RAY FAIL {type(ex).__name__}: {ex}")
        fail += 1
        continue
    if name not in os_:
        print(f"{name}: rows-only, {len(mine)} rows")
        continue
    try:
        orc = con.execute(os_[name]).df()
    except Exception as ex:
        print(f"{name}: SQL FAIL {type(ex).__name__}: {ex}")
        fail += 1
        continue
    rc = len(mine) == len(orc)
    sc = sorted(map(str.lower, mine.columns)) == sorted(map(str.lower, orc.columns))
    vh = vhash(mine) == vhash(orc) if (rc and sc) else False
    ok = rc and sc and vh
    if not ok:
        fail += 1
    print(f"{name}: rows={len(mine)}/{len(orc)} rc={rc} schema={sc} hash={vh} {'OK' if ok else 'MISMATCH'}")
    if not sc:
        print(f"  mine cols: {sorted(mine.columns)}\n  orc cols:  {sorted(orc.columns)}")

print("ENTRY smoke:", end=" ")
r = e.entry()
print(f"{len(r)} rows, cols={list(r.columns)}")
ray.shutdown()
sys.exit(1 if fail else 0)

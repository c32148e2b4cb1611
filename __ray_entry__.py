"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the engine library) calls ``ray.init()`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any

import pyarrow as pa

# Fixed query set for the SQL-replicable BM25 oracle (simple analyzer:
# whitespace split + lowercase, no stemming -> DuckDB can reproduce the
# exact token stream).  Terms listed in analyzed-dedup order.
_BM25_QUERIES = [
    {"query_id": 0, "text": "join hash", "k": 10},
    {"query_id": 1, "text": "scan filter batch", "k": 10},
    {"query_id": 2, "text": "customer order data row", "k": 10},
    {"query_id": 3, "text": "zzz_not_a_term", "k": 10},
    {"query_id": 4, "text": "merge", "k": 10},
]


def _build_simple_index(sf_dir: str) -> str:
    """Build (once per sf_dir per process) a simple-analyzer index over
    the documents-derived corpus; cached under /tmp."""
    from engine.build import build_index
    from engine.corpus import read_corpus_from_documents

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(tempfile.gettempdir(), f"graft_idx_simple_{tag}")
    if not os.path.exists(os.path.join(out, "collection_stats.json")):
        shutil.rmtree(out, ignore_errors=True)
        build_index(
            read_corpus_from_documents(sf_dir),
            out,
            num_parts=8,
            analyzer="simple",
            analyzer_concurrency=(1, 4),
            source=sf_dir,
        )
    return out


def _source_doc_id(path: str) -> int:
    """Invert the corpus mapping (FIXTURES.md F1b): path 'docs/{id}.txt'."""
    return int(path.rsplit("/", 1)[1].split(".")[0])


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the full
    inverted index (code analyzer) over the documents-derived corpus,
    serve BM25 top-k for a small query set, return ranked results."""
    from engine.build import build_index
    from engine.corpus import read_corpus_from_documents
    from engine.query import run_queries

    sf_dir = "/root/testdata/sf0.001"
    out = os.path.join(tempfile.gettempdir(), "graft_idx_entry")
    shutil.rmtree(out, ignore_errors=True)
    build_index(
        read_corpus_from_documents(sf_dir),
        out,
        num_parts=4,
        analyzer="code",
        analyzer_concurrency=(1, 4),
        source=sf_dir,
    )
    queries = [
        {"query_id": 0, "text": "data processing system", "k": 5},
        {"query_id": 1, "text": "training model", "k": 5},
        {"query_id": 2, "text": "query", "k": 5},
    ]
    return run_queries(out, queries, mode="wand", concurrency=(1, 2)).to_pandas()


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------


def _q_doc_lengths(sf_dir: str):
    from engine import textstats

    return textstats.doc_lengths(sf_dir)


def _q_term_df(sf_dir: str):
    from engine import textstats

    return textstats.term_stats(sf_dir).select_columns(["term", "df"])


def _q_term_cf(sf_dir: str):
    from engine import textstats

    return textstats.term_stats(sf_dir).select_columns(["term", "cf"])


def _q_top_terms(sf_dir: str):
    from engine import textstats

    return textstats.top_terms(sf_dir, 20)


def _q_collection_stats(sf_dir: str):
    from engine import textstats

    return textstats.collection_stats(sf_dir)


def _q_bm25_topk_nostem(sf_dir: str):
    from engine.query import run_queries

    out = _build_simple_index(sf_dir)
    res = run_queries(out, _BM25_QUERIES, mode="wand", concurrency=(1, 4))
    t = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "query_id": t.column("query_id").cast(pa.int64()),
            "rank": t.column("rank").cast(pa.int64()),
            "doc_id": pa.array(
                [_source_doc_id(p) for p in t.column("path").to_pylist()],
                pa.int64(),
            ),
            "score_r": pa.array(
                [round(s, 4) for s in t.column("score").to_pylist()], pa.float64()
            ),
        }
    )


def _cents(batch: pa.Table, src: str, dst: str) -> pa.Table:
    """Money double -> exact integer cents (same IEEE double multiply in
    DuckDB and numpy -> deterministic cross-engine comparison)."""
    import pyarrow.compute as pc

    cents = pc.round(pc.multiply(batch.column(src), 100.0)).cast(pa.int64())
    return batch.drop_columns([src]).append_column(dst, cents)


def _q_groupby_lineitem(sf_dir: str):
    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        )
        .map_batches(
            lambda b: _cents(b, "l_extendedprice", "price_cents"),
            batch_format="pyarrow",
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
            ray.data.aggregate.Sum("price_cents", alias_name="sum_price_cents"),
            ray.data.aggregate.Count(alias_name="cnt"),
        )
    )


def _q_topk_orders(sf_dir: str):
    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
    )


def _q_join_customer_orders(sf_dir: str):
    import ray.data

    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(
            lambda b: _cents(b, "o_totalprice", "price_cents"), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(
            ray.data.aggregate.Count(alias_name="num_orders"),
            ray.data.aggregate.Sum("price_cents", alias_name="total_spent_cents"),
        )
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    joined = cust.join(
        orders, join_type="inner", num_partitions=8, on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return joined.select_columns(
        ["c_custkey", "c_name", "num_orders", "total_spent_cents"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_lengths": _q_doc_lengths,
        "term_df": _q_term_df,
        "term_cf": _q_term_cf,
        "top_terms": _q_top_terms,
        "collection_stats": _q_collection_stats,
        "bm25_topk_nostem": _q_bm25_topk_nostem,
        "groupby_lineitem": _q_groupby_lineitem,
        "topk_orders": _q_topk_orders,
        "join_customer_orders": _q_join_customer_orders,
    }


_TOK = (
    "SELECT doc_id, lower(unnest(string_split(text, ' '))) AS term FROM documents"
)
_TOK2 = f"SELECT doc_id, term FROM ({_TOK}) WHERE term <> ''"


def _bm25_sql() -> str:
    vals = []
    for q in _BM25_QUERIES:
        seen = []
        for t in q["text"].split(" "):
            t = t.lower()
            if t and t not in seen:
                seen.append(t)
        for t in seen:
            vals.append(f"({q['query_id']}, '{t}')")
    values = ", ".join(vals)
    return f"""
WITH tok2 AS ({_TOK2}),
dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(query_id, term) AS (VALUES {values}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(
           ln(1.0 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl)))
         ) AS score
  FROM q
  JOIN tf ON q.term = tf.term
  JOIN dft ON q.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scores
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(round(score, 4) AS DOUBLE) AS score_r
FROM ranked WHERE rank <= 10
"""


def oracle_sql() -> dict[str, str]:
    return {
        "doc_lengths": (
            f"SELECT d.doc_id, coalesce(t.c, 0) AS doc_len FROM documents d "
            f"LEFT JOIN (SELECT doc_id, count(*) AS c FROM ({_TOK2}) GROUP BY doc_id) t "
            f"ON d.doc_id = t.doc_id"
        ),
        "term_df": (
            f"SELECT term, count(DISTINCT doc_id) AS df FROM ({_TOK2}) GROUP BY term"
        ),
        "term_cf": f"SELECT term, count(*) AS cf FROM ({_TOK2}) GROUP BY term",
        "top_terms": (
            f"SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf "
            f"FROM ({_TOK2}) GROUP BY term ORDER BY cf DESC, term LIMIT 20"
        ),
        "collection_stats": (
            f"SELECT count(*) AS num_docs, sum(c) AS total_tokens, "
            f"avg(c) AS avg_doc_len FROM "
            f"(SELECT doc_id, count(*) AS c FROM ({_TOK2}) GROUP BY doc_id)"
        ),
        "bm25_topk_nostem": _bm25_sql(),
        "groupby_lineitem": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
            "count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "topk_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
        ),
        "join_customer_orders": (
            "SELECT c.c_custkey, c.c_name, count(*) AS num_orders, "
            "CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_spent_cents "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "GROUP BY c.c_custkey, c.c_name"
        ),
    }

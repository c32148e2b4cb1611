"""CLI entrypoints: ``python -m engine <cmd>`` — the ``ray job submit``
surface (BASELINE.json:6,14: "The same ray job submit entrypoint runs
unchanged on N-node and 4N-node clusters, reporting indexing throughput
... and query latency").

Commands:
  build   — build (or --resume) an index over a Parquet corpus
  merge   — merge existing indexes into one (no re-analysis)
  query   — serve a query file (JSONL/parquet) against an index
  stats   — print an index's collection stats + per-segment metrics
  delete  — tombstone documents (query-time exclusion, O(deleted))
  compact — rewrite without tombstones / fold generations, optionally
            gated on a generation threshold and flipping a serving alias
  bench   — headline build+query benchmark (same code path as bench.py)

The CLI owns the Ray session: it calls ``ray.init(address=...)`` guarded
by ``ray.is_initialized()`` so the same module works under ``ray job
submit`` (session pre-created) and standalone.  Library code never
inits Ray (driver contract, __ray_entry__.py:8-9).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args: argparse.Namespace) -> int:
    _ray_up(args.num_cpus)
    import ray.data

    from .build import build_index
    from .corpus import read_corpus_from_documents
    from .schema import CORPUS

    if args.from_documents:
        corpus = read_corpus_from_documents(args.corpus, repeat=args.repeat)
    else:
        corpus = ray.data.read_parquet(args.corpus, columns=[f.name for f in CORPUS])
    stats = build_index(
        corpus,
        args.out,
        num_parts=args.num_parts,
        analyzer=args.analyzer,
        resume=args.resume,
        analyzer_concurrency=(2, args.num_cpus or 32),
        source=args.corpus,
    )
    print(json.dumps(stats))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    _ray_up(args.num_cpus)
    from .query import latency_profile, run_queries

    queries = _load_queries(args.queries, args.k)
    res = run_queries(args.index, queries, mode=args.mode, match=args.match,
                      msm=args.msm,
                      filter_lang=args.lang, scorer=args.scorer,
                      collapse=args.collapse, slop=args.slop)
    table = res.to_pandas()
    if args.out:
        table.to_parquet(args.out)
    else:
        print(table.to_string(index=False))
    if args.latency:
        print(json.dumps(latency_profile(args.index, queries, mode=args.mode)))
    return 0


def _load_queries(path: str, default_k: int) -> list[dict]:
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        rows = pq.read_table(path).to_pylist()
    else:
        with open(path) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    out = []
    for i, r in enumerate(rows):
        out.append(
            {
                "query_id": int(r.get("query_id", i)),
                "text": r["text"],
                "k": int(r.get("k", default_k)),
            }
        )
    return out


def cmd_merge(args: argparse.Namespace) -> int:
    _ray_up(args.num_cpus)
    from .build import merge_indexes

    stats = merge_indexes(args.indexes, args.out, num_parts=args.num_parts,
                          resume=args.resume)
    print(json.dumps(stats))
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    from .checkpoint import read_collection_stats, read_segment_manifests

    stats = read_collection_stats(args.index)
    stats["segments"] = read_segment_manifests(args.index) if args.verbose else len(
        read_segment_manifests(args.index)
    )
    print(json.dumps(stats, indent=1))
    return 0


def cmd_delete(args: argparse.Namespace) -> int:
    from .maintenance import delete_docs

    ids = [int(x) for x in args.doc_ids]
    total = delete_docs(args.index, ids)
    print(json.dumps({"tombstones": total, "added": len(ids)}))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    _ray_up(args.num_cpus)
    from .maintenance import (auto_compact, compact_index,
                              default_compact_dest, write_alias)

    if args.max_generations is not None:
        live, stats = auto_compact(
            args.index, max_generations=args.max_generations,
            out_dir=args.out, min_tombstones=args.min_tombstones,
        )
        if args.alias:
            write_alias(args.alias, live)
        print(json.dumps({"live": live, "compacted": stats is not None,
                          "stats": stats}))
        return 0
    out = args.out if args.out is not None else default_compact_dest(args.index)
    stats = compact_index(args.index, out)
    if args.alias:
        write_alias(args.alias, out)
    print(json.dumps({"live": out, "compacted": True, "stats": stats}))
    return 0


def cmd_alias(args: argparse.Namespace) -> int:
    from .maintenance import read_alias, write_alias

    if args.set is not None:
        write_alias(args.alias, args.set)
    print(json.dumps({"alias": args.alias, "index_dir": read_alias(args.alias)}))
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import os
    import subprocess

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    cmd = [sys.executable, bench, "--sf-dir", args.sf_dir, "--repeat", str(args.repeat)]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.call(cmd)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="engine", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("corpus", help="Parquet corpus path/dir (repo,path,commit,lang,content)")
    b.add_argument("out", help="index output directory")
    b.add_argument("--num-parts", type=int, default=64)
    b.add_argument("--analyzer", default="code", choices=["code", "code_nostem", "simple"])
    b.add_argument("--resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--from-documents", action="store_true",
                   help="corpus is a testdata sf dir; map documents.parquet to the corpus schema")
    b.add_argument("--repeat", type=int, default=1)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="run BM25 top-k queries")
    q.add_argument("index")
    q.add_argument("queries", help="JSONL or parquet with query_id,text,k")
    q.add_argument("--mode", default="auto", choices=["auto", "wand", "exhaustive"])
    q.add_argument("--match", default="any",
                   choices=["any", "all", "phrase", "near", "not", "bool",
                            "prefix", "fuzzy", "regex", "msm"])
    q.add_argument("--slop", type=int, default=2,
                   help="proximity window slack for --match near")
    q.add_argument("--msm", type=int, default=2,
                   help="minimum distinct matching terms for --match msm")
    q.add_argument("--lang", default=None,
                   help="restrict results to one doc language (match=any)")
    q.add_argument("--scorer", default="bm25", choices=["bm25", "tfidf"])
    q.add_argument("--collapse", default=None, choices=["repo", "lang"],
                   help="field collapsing: at most one (best) doc per value")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--out", default=None, help="write results parquet here")
    q.add_argument("--latency", action="store_true")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    mg = sub.add_parser("merge", help="merge existing indexes (no re-analysis)")
    mg.add_argument("indexes", nargs="+", help="input index dirs")
    mg.add_argument("out", help="output index dir")
    mg.add_argument("--num-parts", type=int, default=None)
    mg.add_argument("--resume", action="store_true")
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    s = sub.add_parser("stats", help="show index stats")
    s.add_argument("index")
    s.add_argument("--verbose", action="store_true")
    s.set_defaults(fn=cmd_stats)

    dl = sub.add_parser("delete", help="tombstone documents (query-time exclusion)")
    dl.add_argument("index")
    dl.add_argument("doc_ids", nargs="+", help="doc_ids to mark deleted")
    dl.set_defaults(fn=cmd_delete)

    cp = sub.add_parser(
        "compact",
        help="rewrite an index without tombstones / fold generations "
             "(out-of-place; optionally flip a serving alias)",
    )
    cp.add_argument("index")
    cp.add_argument("out", nargs="?", default=None,
                    help="output dir (default <index>.compact)")
    cp.add_argument("--max-generations", type=int, default=None,
                    help="only compact when the index exceeds this many "
                         "generations (auto_compact policy)")
    cp.add_argument("--min-tombstones", type=int, default=None,
                    help="with --max-generations: also compact when at "
                         "least this many tombstones have accumulated")
    cp.add_argument("--alias", default=None,
                    help="alias JSON path to flip to the live index")
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    al = sub.add_parser("alias", help="read or flip a serving alias")
    al.add_argument("alias", help="alias JSON path")
    al.add_argument("--set", default=None, metavar="INDEX_DIR",
                    help="point the alias at this index dir")
    al.set_defaults(fn=cmd_alias)

    be = sub.add_parser("bench", help="headline benchmark (delegates to bench.py)")
    be.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    be.add_argument("--repeat", type=int, default=100)
    be.add_argument("--scaling", action="store_true")
    be.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Benchmark entrypoint (driver-run, SURVEY.md §4.4 / BASELINE.md protocol).

Headline pipeline: full inverted-index build (code analyzer: tokenize ->
Porter stem -> postings -> partition shuffle -> compressed segments) over
the documents-derived corpus at $GRAFT_SF_DIR, then BM25 top-k serving:
a distributed query batch through the actor-pool scorer plus a warm
single-process latency profile (p50/p99).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"index_build": sec, "bm25_query_batch": sec, ...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ..., "postings_per_sec": ...,
   "query_p50_ms": ..., "query_p99_ms": ...}

--scaling: runs the SAME pipeline in two fresh subprocesses
(ray.init(num_cpus=8) then num_cpus=32) on the same input and reports
both throughputs + scaling efficiency (T_8 / T_32) / 4 — the sandbox
proxy for the N- vs 4N-node cluster criterion (BASELINE.json:2,14).

Owns its Ray session (ray.init/shutdown) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _sf_tag(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


# Query workload: code-analyzer terms that hit the Zipf head and tail.
BENCH_QUERIES = [
    {"query_id": 0, "text": "data processing pipeline", "k": 10},
    {"query_id": 1, "text": "distributed training model", "k": 10},
    {"query_id": 2, "text": "query engine", "k": 10},
    {"query_id": 3, "text": "index", "k": 10},
    {"query_id": 4, "text": "stream batch window", "k": 10},
    {"query_id": 5, "text": "user event log record", "k": 10},
    {"query_id": 6, "text": "hash join merge sort", "k": 10},
    {"query_id": 7, "text": "read write file system", "k": 10},
]


def prepare_corpus(sf_dir: str, repeat: int) -> str:
    """Materialize the documents-derived corpus (x``repeat``) as a real
    multi-file Parquet directory under /tmp, once per (sf, repeat).

    The benchmark reads THIS, not an on-the-fly expansion: a real corpus
    is many parquet files/row groups, which is what gives the read stage
    its parallelism (an inline expansion fuses with downstream stages
    and serializes the whole pipeline on a handful of tasks).
    """
    from engine.corpus import read_corpus_from_documents

    tag = _sf_tag(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"graft_corpus_{tag}_x{repeat}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    corpus = read_corpus_from_documents(sf_dir, repeat=repeat)
    corpus.write_parquet(out, row_group_size=4096)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def run_bench(sf_dir: str, num_cpus: int, repeat: int, keep_index: bool = False) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from engine.build import build_index
    from engine.corpus import read_corpus_from_documents
    from engine.query import latency_profile, run_queries
    from engine.schema import CORPUS

    corpus_dir = prepare_corpus(sf_dir, repeat)

    # warm-up: a tiny end-to-end build so worker startup / imports are
    # not attributed to the measured run
    warm = tempfile.mkdtemp(prefix="graft_bench_warm_")
    build_index(
        read_corpus_from_documents("/root/testdata/sf0.001"),
        warm, num_parts=4, analyzer="code",
        analyzer_concurrency=(1, max(1, num_cpus - 1)), source="warmup",
    )
    shutil.rmtree(warm, ignore_errors=True)

    out = tempfile.mkdtemp(prefix="graft_bench_idx_")
    # keep per-partition merge size roughly constant (~16k docs) so the
    # merge stage's working set stays cache-friendly at any corpus size
    num_parts = max(64, num_cpus * 2, (repeat * 5000) // 16000)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    corpus = rd.read_parquet(corpus_dir, columns=[f.name for f in CORPUS])
    stats = build_index(
        corpus,
        out,
        num_parts=num_parts,
        analyzer="code",
        analyzer_concurrency=(max(1, num_cpus // 2), max(1, num_cpus - 1)),
        merge_num_cpus=2.0 if num_cpus > 16 else 1.0,
        source=f"{sf_dir} x{repeat}",
    )
    timings["index_build"] = round(time.perf_counter() - t0, 3)

    # distributed query batch through the actor pool (one row per query x
    # segment partial, merged per query_id)
    t0 = time.perf_counter()
    res = run_queries(
        out, BENCH_QUERIES, mode="auto", concurrency=(1, max(1, num_cpus // 2))
    )
    n_results = res.count()
    timings["bm25_query_batch"] = round(time.perf_counter() - t0, 3)

    # warm single-process latency profile (serving-path p50/p99)
    prof = latency_profile(out, BENCH_QUERIES, mode="auto", min_executions=200)

    if not keep_index:
        shutil.rmtree(out, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "index_build+bm25_query wall time (documents-derived corpus)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_tag(sf_dir),
        "num_cpus": num_cpus,
        "num_docs": stats["num_docs"],
        "total_postings": stats["total_postings"],
        "docs_per_sec": round(stats["num_docs"] / timings["index_build"], 1),
        "postings_per_sec": round(stats["total_postings"] / timings["index_build"], 1),
        "n_query_results": n_results,
        "query_p50_ms": prof["p50_ms"],
        "query_p99_ms": prof["p99_ms"],
        "query_qps_single_process": prof["qps_single_process"],
    }


def run_modes_bench(sf_dir: str, num_cpus: int, repeat: int) -> dict:
    """Warm single-process latency per QUERY MODE over the same built
    index (serving-path evidence for the non-default match modes and
    the tfidf scorer)."""
    res = run_bench(sf_dir, num_cpus, repeat, keep_index=True)
    import glob

    from engine.query import latency_profile

    out = sorted(glob.glob(tempfile.gettempdir() + "/graft_bench_idx_*"))[-1]
    derive = {
        "any": (dict(mode="auto"), BENCH_QUERIES),
        "all": (dict(match="all"), BENCH_QUERIES),
        "not": (
            dict(match="not"),
            [dict(q, text=q["text"] + " -data") for q in BENCH_QUERIES],
        ),
        "bool": (
            dict(match="bool"),
            [
                dict(q, text="+" + q["text"].replace(" ", " ", 1))
                for q in BENCH_QUERIES
            ],
        ),
        "near_slop4": (dict(match="near", slop=4), BENCH_QUERIES),
        "prefix": (
            dict(match="prefix"),
            [dict(q, text=q["text"].split()[0][:4] + "*") for q in BENCH_QUERIES],
        ),
        "fuzzy": (
            dict(match="fuzzy"),
            [dict(q, text=q["text"].split()[0] + "~") for q in BENCH_QUERIES],
        ),
        "regex": (
            dict(match="regex"),
            [dict(q, text=q["text"].split()[0][:3] + "[a-z]*") for q in BENCH_QUERIES],
        ),
        "tfidf": (dict(scorer="tfidf"), BENCH_QUERIES),
    }
    # phrase queries must be real sequences: lift bigrams/trigrams from
    # the first corpus doc (the analyzer's own token stream)
    import pyarrow.parquet as _pq

    from engine.analysis import get_analyzer

    first = _pq.read_table(
        sorted(glob.glob(prepare_corpus(sf_dir, repeat) + "/*.parquet"))[0],
        columns=["content"],
    ).column("content")[0].as_py()
    toks = get_analyzer("code")(first)
    derive["phrase"] = (
        dict(match="phrase"),
        [
            {"query_id": 0, "text": " ".join(toks[0:2]), "k": 10},
            {"query_id": 1, "text": " ".join(toks[2:5]), "k": 10},
            {"query_id": 2, "text": " ".join(toks[5:7]), "k": 10},
        ],
    )
    modes = {}
    for name, (kw, qs) in derive.items():
        prof = latency_profile(out, qs, min_executions=100, max_seconds=20.0, **kw)
        modes[name] = {
            "p50_ms": prof["p50_ms"], "p99_ms": prof["p99_ms"],
            "qps": prof["qps_single_process"],
        }
    shutil.rmtree(out, ignore_errors=True)
    res["metric"] = "per-query-mode warm latency (500k-doc index)"
    res["modes"] = modes
    return res


def run_dedup_bench(sf_dir: str, num_cpus: int) -> dict:
    """Wall time of the dedup/near-dup family over sf_dir documents +
    embeddings (each operator consumed with count() — streams, no
    driver materialization)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from engine import dedup

    from engine import encoder

    ops = {
        "exact_dedup": lambda: dedup.exact_dedup(sf_dir),
        "ngram_jaccard_pairs": lambda: dedup.ngram_jaccard_pairs(sf_dir),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(sf_dir),
        "simhash_dup_pairs": lambda: dedup.simhash_dup_pairs(sf_dir),
        "embedding_dup_pairs": lambda: dedup.embedding_dup_pairs(sf_dir, threshold=0.4),
        "duplicate_passages": lambda: dedup.duplicate_passages(sf_dir),
        "near_duplicate_passages": lambda: dedup.near_duplicate_passages(
            sf_dir, width=20, stride=10
        ),
        "encode_documents": lambda: encoder.encode_documents(sf_dir),
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in ops.items():
        fn().count()  # warm-up (worker imports, page cache)
        t0 = time.perf_counter()
        rows[name] = fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)
    return {
        "metric": "dedup family wall time (documents/embeddings tables)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": _sf_tag(sf_dir),
        "num_cpus": num_cpus,
    }


def run_serving_bench(sf_dir: str, num_cpus: int) -> dict:
    """Wall time of the round-5 serving/curation operator family:
    quantization, quantized/PQ ANN, percolation, PII scrub, two-stage
    rerank, minimum_should_match (each consumed with count()/num_rows
    after a warm-up pass)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from engine import percolate, rerank, similarity
    from engine.build import build_index
    from engine.corpus import read_corpus_from_documents
    from engine.query import run_queries
    from engine.textanalysis import scrub_pii

    idx = os.path.join(tempfile.gettempdir(), f"graft_serving_{_sf_tag(sf_dir)}")
    if not os.path.exists(os.path.join(idx, "build_manifest.json")):
        shutil.rmtree(idx, ignore_errors=True)
        build_index(read_corpus_from_documents(sf_dir), idx, num_parts=16,
                    analyzer="simple")
    bank = [{"query_id": i, "text": f"join hash scan filter row {i}",
             "match": "any"} for i in range(100)]
    rq = [{"query_id": i, "text": t, "k": 10} for i, t in enumerate(
        ["join hash scan", "customer order data row", "filter batch merge",
         "scan data group row", "hash join filter customer"])]
    books = similarity.train_pq_codebooks(sf_dir)

    ops = {
        "quantize_embeddings": lambda: similarity.quantize_embeddings(sf_dir).count(),
        "knn_quantized": lambda: similarity.knn_quantized(sf_dir, k=5, n_queries=10).count(),
        "knn_pq_adc": lambda: similarity.knn_pq(sf_dir, k=5, n_queries=10,
                                                codebooks=books).count(),
        "percolate_100q": lambda: percolate.percolate(sf_dir, bank).count(),
        "scrub_pii": lambda: scrub_pii(sf_dir).count(),
        "rerank_topk": lambda: rerank.rerank_topk(idx, rq, k=10, k0=20).num_rows,
        "bm25_msm": lambda: run_queries(idx, rq, match="msm", msm=2,
                                        concurrency=(1, 4)).count(),
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in ops.items():
        fn()  # warm-up
        t0 = time.perf_counter()
        rows[name] = int(fn())
        timings[name] = round(time.perf_counter() - t0, 3)
    return {
        "metric": "serving/curation family wall time (round-5 operators)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": _sf_tag(sf_dir),
        "num_cpus": num_cpus,
    }


def run_scaling(sf_dir: str, repeat: int, cpus_lo: int, cpus_hi: int) -> dict:
    """Same job, two fresh processes at cpus_lo and cpus_hi."""
    runs = {}
    for cpus in (cpus_lo, cpus_hi):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env.pop("RAY_ADDRESS", None)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sf-dir", sf_dir,
             "--repeat", str(repeat)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            raise RuntimeError(f"bench subprocess (cpus={cpus}) failed: {p.stderr[-2000:]}")
        runs[cpus] = json.loads(line[-1])
    lo, hi = runs[cpus_lo], runs[cpus_hi]
    factor = cpus_hi / cpus_lo
    # throughput-based efficiency on the build (the dominant stage)
    eff_build = (lo["queries"]["index_build"] / hi["queries"]["index_build"]) / factor
    eff_total = (lo["value"] / hi["value"]) / factor
    return {
        "metric": f"scaling efficiency {cpus_lo}->{cpus_hi} cpus (fresh processes, same input)",
        "value": round(eff_build, 3),
        "unit": "efficiency",
        "queries": {
            f"index_build_{cpus_lo}cpu": lo["queries"]["index_build"],
            f"index_build_{cpus_hi}cpu": hi["queries"]["index_build"],
            f"total_{cpus_lo}cpu": lo["value"],
            f"total_{cpus_hi}cpu": hi["value"],
        },
        "sf": lo["sf"],
        "num_cpus": cpus_hi,
        "scaling_factor": factor,
        "efficiency_build": round(eff_build, 3),
        "efficiency_total": round(eff_total, 3),
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "postings_per_sec_lo": lo["postings_per_sec"],
        "postings_per_sec_hi": hi["postings_per_sec"],
        "runs": {str(c): runs[c] for c in runs},
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=None,
                    help="deterministic corpus replication factor "
                         "(default: 100 -> 500k docs; 600 -> 3M for --scaling)")
    ap.add_argument("--scaling", action="store_true",
                    help="run at two CPU counts in fresh processes, report efficiency")
    ap.add_argument("--dedup", action="store_true",
                    help="benchmark the dedup/near-dup operator family instead")
    ap.add_argument("--modes", action="store_true",
                    help="benchmark warm latency of every query mode")
    ap.add_argument("--serving", action="store_true",
                    help="benchmark the round-5 serving/curation family")
    ap.add_argument("--cpus-lo", type=int, default=2)
    ap.add_argument("--cpus-hi", type=int, default=8)
    args = ap.parse_args()

    if args.repeat is None:
        args.repeat = int(os.environ.get("GRAFT_BENCH_REPEAT", "600" if args.scaling else "100"))
    if args.scaling:
        result = run_scaling(args.sf_dir, args.repeat, args.cpus_lo, args.cpus_hi)
    elif args.dedup:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        result = run_dedup_bench(args.sf_dir, num_cpus)
        import ray

        ray.shutdown()
    elif args.modes:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        result = run_modes_bench(args.sf_dir, num_cpus, args.repeat)
        import ray

        ray.shutdown()
    elif args.serving:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        result = run_serving_bench(args.sf_dir, num_cpus)
        import ray

        ray.shutdown()
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        result = run_bench(args.sf_dir, num_cpus, args.repeat)
        import ray

        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()

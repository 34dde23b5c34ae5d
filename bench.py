"""Benchmark harness — index-build throughput + query latency (+ scaling).

Default mode (driver contract): runs at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index": {docs, docs_per_sec, build_sec, ...},
   "latency": {p50_sec, p99_sec}}

Scaling mode (BASELINE.md two-cluster-size criterion): SCALING=1 python
bench.py additionally re-runs the same build at local[8] and local[32] on
identical input and reports throughput at both plus efficiency
(T8/T32)/4 — the sandbox stand-in for N vs 4N executors (BASELINE.json:14).

The corpus is the driver's documents.parquet expanded K-fold via the
deterministic ``expand_corpus`` (seeded replication — no external data),
sized so the build measures sustained throughput, not job startup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from sparklucene.build import build_index  # noqa: E402
from sparklucene.corpus import expand_corpus, load_corpus  # noqa: E402
from sparklucene.query import And, Not, Or, Term  # noqa: E402
from sparklucene.search import Index, search  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("SPARKLUCENE_BENCH_EXPAND", "40"))
QUERY_REPS = int(os.environ.get("SPARKLUCENE_BENCH_REPS", "5"))

QUERIES = {
    "q1_term": Term("vector"),
    "q2_and_hi_hi": And((Term("merge"), Term("join"))),
    "q3_and_3": And((Term("hash"), Term("join"), Term("batch"))),
    "q4_or_hi_hi": Or((Term("spark"), Term("merge"), Term("join"))),
    "q5_or_wide": Or((Term("query"), Term("window"), Term("scan"),
                      Term("fast"), Term("column"))),
    "q6_not": Not(Or((Term("spark"), Term("merge"))), Term("slow")),
    "q7_msm2": Or((Term("vector"), Term("stream"), Term("agg")),
                  min_should_match=2),
}


def build_once(cores: int, tag: str) -> dict:
    """Fresh build at a given parallelism; returns timing + size facts."""
    spark = get_spark(app_name=f"sparklucene-bench-{tag}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    try:
        base = load_corpus(spark, SF_DIR)
        n_base = base.count()
        corpus = expand_corpus(base, EXPAND, n_base)
        corpus = corpus.repartition(max(cores * 2, 8)).cache()
        n_docs = corpus.count()  # materialize cache before the clock starts
        index_dir = f"/tmp/sparklucene-bench-{tag}"
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        stats = build_index(spark, corpus, index_dir, resume=False)
        build_sec = time.perf_counter() - t0
        return {"cores": cores, "docs": int(n_docs), "build_sec": build_sec,
                "docs_per_sec": n_docs / build_sec, "index_dir": index_dir,
                "sum_dl": int(stats["sum_dl"]), "spark": spark}
    except Exception:
        spark.stop()
        raise


def run_queries(spark, index_dir: str) -> tuple[dict, dict]:
    idx = Index(spark, index_dir)
    # searcher warm-up (Solr firstSearcher analog): populate the postings
    # cache + Python workers before the timed reps
    search(idx, Term("data"), k=10).collect()
    per_query: dict[str, float] = {}
    samples: list[float] = []
    for name, q in QUERIES.items():
        times = []
        for _ in range(QUERY_REPS):
            t0 = time.perf_counter()
            search(idx, q, k=10, mode="lucene8", prune=True).collect()
            times.append(time.perf_counter() - t0)
        per_query[name] = float(np.median(times))
        samples.extend(times)
    lat = {"p50_sec": float(np.percentile(samples, 50)),
           "p99_sec": float(np.percentile(samples, 99))}
    return per_query, lat


def main() -> None:
    total0 = time.perf_counter()
    b32 = build_once(CPUS, f"c{CPUS}")
    spark = b32.pop("spark")
    per_query, lat = run_queries(spark, b32["index_dir"])

    out = {
        "metric": "index-build docs/sec + BM25 top-10 latency (sf%s corpus x%d)"
                  % (os.path.basename(SF_DIR).lstrip("sf"), EXPAND),
        "unit": "sec",
        "sf": os.path.basename(SF_DIR).lstrip("sf"),
        "queries": {k: round(v, 4) for k, v in per_query.items()},
        "latency": {k: round(v, 4) for k, v in lat.items()},
        "index": {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in b32.items() if k != "index_dir"},
    }
    spark.stop()

    if os.environ.get("SCALING"):
        b8 = build_once(8, "c8")
        b8.pop("spark").stop()
        eff = (b8["build_sec"] / b32["build_sec"]) / (32 / 8)
        out["scaling"] = {
            "build_sec_8": round(b8["build_sec"], 3),
            "build_sec_32": round(b32["build_sec"], 3),
            "docs_per_sec_8": round(b8["docs_per_sec"], 1),
            "docs_per_sec_32": round(b32["docs_per_sec"], 1),
            "efficiency_8_to_32": round(eff, 3),
        }

    out["value"] = round(time.perf_counter() - total0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

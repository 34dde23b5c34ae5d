"""10M-doc scale re-validation (BENCH/BASELINE.md §1/§2 big-corpus rows).

Builds a 10M-doc index (sf0.1 documents x2000 via the deterministic
expand_corpus, drange 32768, local[32] — the exact round-1/2 protocol)
on the CURRENT code and re-runs the round-2 10M query set: dense term,
AND, OR, rare-OR, prefix-clause (incl. dictionary expansion), match-all
count, and a full resume. Prints one JSON line per phase plus a final
summary line. Run on a quiet machine (no concurrent Spark) — host
contention is the dominant noise source (§3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from sparklucene.build import build_index  # noqa: E402
from sparklucene.corpus import expand_corpus, load_corpus  # noqa: E402
from sparklucene.query import And, MatchAllDocs, Or, Prefix, Term  # noqa: E402
from sparklucene.search import Index, search, total_hits  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARKLUCENE_10M_CORES", "32"))
EXPAND = int(os.environ.get("SPARKLUCENE_10M_EXPAND", "2000"))
DRANGE = int(os.environ.get("SPARKLUCENE_10M_DRANGE", "32768"))
IDX = os.environ.get("SPARKLUCENE_10M_DIR", "/tmp/sparklucene-bench-10m")

QUERIES = {
    "and_hi_hi": And((Term("merge"), Term("join"))),
    "or_3": Or((Term("spark"), Term("merge"), Term("join"))),
    "or_rare_common": Or((Term("dup"), Term("slow"))),
    "dense_term": Term("data"),
    "prefix_clause": And((Prefix("sc"), Term("merge"))),
}


def main() -> None:
    out: dict = {"cores": CORES, "expand": EXPAND, "drange": DRANGE}
    spark = get_spark(app_name="sparklucene-10m", cores=CORES,
                      shuffle_partitions=max(CORES, 8))
    from bench import warm_workers
    warm_workers(spark, CORES)
    base = load_corpus(spark, SF_DIR)
    n_base = base.count()
    corpus = expand_corpus(base, EXPAND, n_base)
    corpus = corpus.repartition(CORES * 4).cache()
    n_docs = corpus.count()
    out["docs"] = int(n_docs)
    shutil.rmtree(IDX, ignore_errors=True)

    t0 = time.perf_counter()
    stats = build_index(spark, corpus, IDX, resume=False,
                        drange_size=DRANGE)
    out["build_sec"] = round(time.perf_counter() - t0, 1)
    out["docs_per_sec"] = round(n_docs / out["build_sec"])
    out["n_ranges"] = stats["n_ranges"]
    print(json.dumps({"phase": "build", **out}), flush=True)

    idx = Index(spark, IDX)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    search(idx, Term("vector"), k=10).collect()  # searcher warm-up
    lat: dict[str, float] = {}
    for rep in range(2):  # second rep is the warm number (round-2 protocol)
        for name, q in QUERIES.items():
            t1 = time.perf_counter()
            search(idx, q, k=10, mode="lucene8", prune=True).collect()
            lat[name] = round(time.perf_counter() - t1, 2)
    t1 = time.perf_counter()
    n_all = total_hits(idx, MatchAllDocs()).first()["total_hits"]
    lat["match_all_count"] = round(time.perf_counter() - t1, 2)
    out["match_all"] = int(n_all)
    out["queries_warm_sec"] = lat
    print(json.dumps({"phase": "queries", "queries": lat,
                      "match_all": int(n_all)}), flush=True)

    t2 = time.perf_counter()
    build_index(spark, corpus, IDX, resume=True, drange_size=DRANGE)
    out["resume_sec"] = round(time.perf_counter() - t2, 1)
    print(json.dumps({"phase": "resume", "resume_sec": out["resume_sec"]}),
          flush=True)
    print(json.dumps({"metric": "10M-doc build + warm query set", **out}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

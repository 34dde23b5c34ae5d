"""Routed/distributed serving at 10M docs (BENCH/BASELINE.md routed table).

VERDICT r4 task #7: routed fan-out, distributed facet refinement and
two-phase grouping have correctness evidence (driver entries + the
sharded==unsharded contract tests) but no published latency at scale.
This script builds BOTH an unsharded 10M index and an 8-shard
compositeId-hashed collection over the SAME corpus (sf0.1 documents
x2000 via deterministic expand_corpus, drange 32768, local[32] — the
bench_10m protocol), then times, warm (2 reps, second disclosed):

  - top-10 search: unsharded vs full fan-out (stats local + global)
    vs single-shard doc_key pruning;
  - field facet: unsharded one-pass vs two-phase refinement
    (high-cardinality ``repo`` ~ sources x 2000 for latency; ``lang``
    — which fits every shard's ship window, the documented-exact case
    — for an equality assert);
  - grouped top-k: unsharded window pipeline vs two-phase distributed
    grouping (exactness asserted — the max-score-head proof in
    routing.routed_grouped_topk).

Prints one JSON line per phase + a summary line. Run on a quiet host
(no concurrent Spark) — contention is the dominant noise source (§3).
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparklucene.build import build_index  # noqa: E402
from sparklucene.corpus import expand_corpus, load_corpus  # noqa: E402
from sparklucene.query import And, Term  # noqa: E402
from sparklucene.routing import (build_hashed_index, hashed_search,  # noqa: E402
                                 routed_facet_field, routed_grouped_topk)
from sparklucene.search import Index, matches, search  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARKLUCENE_10M_CORES", "32"))
EXPAND = int(os.environ.get("SPARKLUCENE_10M_EXPAND", "2000"))
DRANGE = int(os.environ.get("SPARKLUCENE_10M_DRANGE", "32768"))
N_SHARDS = int(os.environ.get("SPARKLUCENE_10M_SHARDS", "8"))
BASE = os.environ.get("SPARKLUCENE_ROUTED_DIR", "/tmp/sparklucene-routed-10m")

Q = And((Term("merge"), Term("join")))


def timed(fn, reps: int = 2) -> tuple[float, object]:
    """(warm_sec, last_result): run ``fn`` ``reps`` times, keep the last
    wall time (the warm number — bench_10m's round-2 protocol)."""
    last = None
    t = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        last = fn()
        t = time.perf_counter() - t0
    return round(t, 2), last


def unsharded_facet(idx: Index, attrs, col_alias: str, limit: int):
    m = matches(idx, Q, mode="f64").select("doc_id")
    return (m.join(attrs.select("doc_id",
                                F.col(col_alias).alias("value")), "doc_id")
            .groupBy("value").agg(F.count("*").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value")).limit(limit))


def unsharded_grouped(idx: Index, attrs, group_col: str,
                      n_groups: int, group_limit: int):
    scored = (search(idx, Q, k=None, mode="f64")
              .join(attrs.select("doc_id",
                                 F.col(group_col).cast("string")
                                 .alias("grp")), "doc_id"))
    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id")))
    top = (scored.withColumn("rk", rk.cast("long"))
           .filter(F.col("rk") <= group_limit))
    ghead = (top.groupBy("grp").agg(F.max("score").alias("head"))
             .orderBy(F.desc("head"), F.asc("grp")).limit(n_groups))
    return (top.join(F.broadcast(ghead), "grp")
            .select("grp", "head", "rk", "doc_id", "score")
            .orderBy(F.desc("head"), F.asc("grp"), F.asc("rk")))


def main() -> None:
    out: dict = {"cores": CORES, "expand": EXPAND, "drange": DRANGE,
                 "n_shards": N_SHARDS}
    spark = get_spark(app_name="sparklucene-routed-10m", cores=CORES,
                      shuffle_partitions=max(CORES, 8))
    from bench import warm_workers
    warm_workers(spark, CORES)
    base = load_corpus(spark, SF_DIR)
    n_base = base.count()
    corpus = expand_corpus(base, EXPAND, n_base).repartition(CORES * 4).cache()
    n_docs = corpus.count()
    out["docs"] = int(n_docs)
    attrs = corpus.select("doc_id", "repo", "lang").cache()
    attrs.count()

    un_dir = os.path.join(BASE, "unsharded")
    sh_dir = os.path.join(BASE, "hashed")
    shutil.rmtree(BASE, ignore_errors=True)

    t0 = time.perf_counter()
    build_index(spark, corpus, un_dir, resume=False, drange_size=DRANGE)
    out["build_unsharded_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    build_hashed_index(spark, corpus, sh_dir, n_shards=N_SHARDS,
                       resume=False, drange_size=DRANGE // N_SHARDS)
    out["build_hashed_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({"phase": "build", **out}), flush=True)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    idx = Index(spark, un_dir)
    search(idx, Term("vector"), k=10).collect()  # searcher warm-up
    lat: dict[str, float] = {}

    lat["search_unsharded"], un_top = timed(
        lambda: search(idx, Q, k=10, mode="f64").collect())
    lat["search_fanout_local"], _ = timed(
        lambda: hashed_search(spark, sh_dir, Q, k=10, mode="f64",
                              stats="local").collect())
    lat["search_fanout_global"], sh_top = timed(
        lambda: hashed_search(spark, sh_dir, Q, k=10, mode="f64",
                              stats="global").collect())
    lat["search_one_shard_dockey"], _ = timed(
        lambda: hashed_search(spark, sh_dir, Q, doc_key="12345",
                              k=10, mode="f64").collect())
    # ExactStatsCache makes the fan-out EQUAL the unsharded ranking
    assert [r["doc_id"] for r in un_top] == [r["doc_id"] for r in sh_top], \
        "global-stats fan-out must equal unsharded top-k"
    print(json.dumps({"phase": "search", "lat": lat}), flush=True)

    lat["facet_repo_unsharded"], _ = timed(
        lambda: unsharded_facet(idx, attrs, "repo", 5).collect())
    lat["facet_repo_routed"], _ = timed(
        lambda: routed_facet_field(spark, sh_dir, Q, attrs, "repo",
                                   limit=5).collect())
    lat["facet_lang_unsharded"], un_f = timed(
        lambda: unsharded_facet(idx, attrs, "lang", 5).collect())
    lat["facet_lang_routed"], sh_f = timed(
        lambda: routed_facet_field(spark, sh_dir, Q, attrs, "lang",
                                   limit=5).collect())
    assert [(r["value"], r["cnt"]) for r in un_f] == \
           [(r["value"], r["cnt"]) for r in sh_f], \
        "lang facet (fits every ship window) must match unsharded"
    print(json.dumps({"phase": "facet", "lat": lat}), flush=True)

    lat["group_lang_unsharded"], un_g = timed(
        lambda: unsharded_grouped(idx, attrs, "lang", 3, 2).collect())
    lat["group_lang_routed"], sh_g = timed(
        lambda: routed_grouped_topk(spark, sh_dir, Q, attrs, "lang",
                                    n_groups=3, group_limit=2,
                                    stats="global").collect())
    assert [(r["grp"], r["rk"], r["doc_id"]) for r in un_g] == \
           [(r["grp"], r["rk"], r["doc_id"]) for r in sh_g], \
        "two-phase grouping must equal the unsharded grouped top-k"
    out["lat_warm_sec"] = lat
    print(json.dumps({"metric": "routed vs unsharded serving at 10M",
                      **out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Document routing / sharded collections — Solr's implicit + compositeId
routing surface re-expressed Spark-first.

Reference behavior (public): Solr routes documents to shards by a route
key (``router.field`` / compositeId prefix,
u8:solr/solrj/src/java/org/apache/solr/common/cloud/ImplicitDocRouter.java,
CompositeIdRouter.java); a query carrying ``_route_=`` touches ONLY the
matching shard, while an unrouted query fans out to every shard and
merges per-shard top-k. Solr's DEFAULT distributed scoring uses
**per-shard statistics** (distributed IDF is opt-in,
u8:solr/core/.../search/stats/LocalStatsCache.java) — each shard scores
with its own df/doc_count, and the coordinator merges by (score, id).
This module pins exactly those semantics.

Spark-first shape: one sub-index per route value under
``<base>/route=<value>/`` (hive-style layout), plus a tiny
``routes.json`` manifest. A routed query opens ONE sub-index — at 100 TB
this is the partition-pruning story: the scan reads 1/N of the postings
bytes by directory layout alone, before any Spark filter runs. Fan-out
unions the per-route k-bounded top-k frames (each one the ordinary
two-phase plan) and takes the global top-k — candidate rows shipped to
the driver stay <= n_routes * k.

Route cardinality contract: like Solr shard counts, the number of
distinct route values is operator-scale (10s-1000s), not data-scale —
the build enumerates them with one distinct() and builds per-route
indexes serially (each build is itself fully parallel).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklucene.build import build_index
from sparklucene.search import Index, search


def _routes_path(base_dir: str) -> str:
    return os.path.join(base_dir, "routes.json")


def build_routed_index(spark: SparkSession, corpus: DataFrame,
                       base_dir: str, route_col: str = "lang",
                       **build_kwargs) -> dict:
    """Build one sub-index per distinct ``route_col`` value. Returns the
    route manifest {route: {"n_docs": ..., "dir": ...}}."""
    routes = sorted(r[0] for r in corpus.select(route_col).distinct()
                    .collect() if r[0] is not None)
    if not routes:
        raise ValueError(f"no route values in column {route_col!r}")
    os.makedirs(base_dir, exist_ok=True)
    manifest: dict[str, dict] = {}
    for rt in routes:
        sub_dir = os.path.join(base_dir, f"route={rt}")
        stats = build_index(spark, corpus.filter(F.col(route_col) == rt),
                            sub_dir, **build_kwargs)
        manifest[rt] = {"dir": f"route={rt}", "n_docs": stats["n_docs"]}
    tmp = _routes_path(base_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"route_col": route_col, "routes": manifest}, fh,
                  indent=2, sort_keys=True)
    os.replace(tmp, _routes_path(base_dir))
    return manifest


def load_routes(base_dir: str) -> dict:
    with open(_routes_path(base_dir)) as fh:
        return json.load(fh)


def routed_search(spark: SparkSession, base_dir: str, query,
                  route: str | None = None, k: int = 10,
                  mode: str = "lucene8", prune: bool = True) -> DataFrame:
    """Search a routed collection.

    ``route=<value>`` → ONE sub-index is opened and scanned (shard
    pruning); ``route=None`` → fan-out over every route with PER-SHARD
    statistics (Solr default distributed scoring), merged by
    (score desc, doc_id asc). Result carries a ``route`` column."""
    meta = load_routes(base_dir)
    routes = meta["routes"]
    if route is not None:
        if route not in routes:
            raise KeyError(f"unknown route {route!r}: not one of "
                           f"{sorted(routes)}")
        idx = Index(spark, os.path.join(base_dir, routes[route]["dir"]))
        return (search(idx, query, k=k, mode=mode, prune=prune)
                .withColumn("route", F.lit(route)))
    parts = [
        search(Index(spark, os.path.join(base_dir, info["dir"])), query,
               k=k, mode=mode, prune=prune).withColumn("route", F.lit(rt))
        for rt, info in sorted(routes.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

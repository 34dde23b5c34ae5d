"""Sharded-collection routing: per-route sub-indexes, shard pruning,
per-shard-stats fan-out merge (Solr implicit routing + LocalStatsCache
default distributed scoring)."""

from __future__ import annotations

import os
import shutil

import pytest

from sparklucene.corpus import load_corpus
from sparklucene.query import Or, Term
from sparklucene.routing import build_routed_index, load_routes, routed_search
from sparklucene.search import Index, search

SF = "/root/testdata/sf0.001"
BASE = "/root/repo/.cache/test-routed"


@pytest.fixture(scope="module")
def routed(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    corpus = load_corpus(spark, SF)
    manifest = build_routed_index(spark, corpus, BASE, route_col="lang",
                                  drange_size=128)
    return corpus, manifest


def test_manifest_covers_corpus(spark, routed):
    corpus, manifest = routed
    assert sum(m["n_docs"] for m in manifest.values()) == corpus.count()
    assert set(load_routes(BASE)["routes"]) == set(manifest)


def test_single_shard_equals_subindex_search(spark, routed):
    q = Or((Term("merge"), Term("spark")))
    got = routed_search(spark, BASE, q, route="en", k=10,
                        mode="f64").toPandas()
    sub = Index(spark, os.path.join(BASE, "route=en"))
    want = search(sub, q, k=10, mode="f64").toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()
    assert (got["route"] == "en").all()
    # routed sub-index really is a subset: every hit is an en doc
    corpus, _ = routed
    en_ids = {r.doc_id for r in corpus.filter("lang = 'en'")
              .select("doc_id").collect()}
    assert set(got["doc_id"]) <= en_ids


def test_fanout_merges_per_shard_topk(spark, routed):
    q = Or((Term("merge"), Term("spark")))
    got = routed_search(spark, BASE, q, route=None, k=10,
                        mode="f64").toPandas()
    assert len(got) == 10
    # the merge equals the global top-10 over every shard's full top-10
    frames = []
    for rt in load_routes(BASE)["routes"]:
        sub = search(Index(spark, os.path.join(BASE, f"route={rt}")), q,
                     k=10, mode="f64").toPandas()
        sub["route"] = rt
        frames.append(sub)
    import pandas as pd
    want = (pd.concat(frames)
            .sort_values(["score", "doc_id"], ascending=[False, True],
                         kind="mergesort").head(10).reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["route"].tolist() == want["route"].tolist()


def test_unknown_route_raises(spark, routed):
    with pytest.raises(KeyError, match="unknown route"):
        routed_search(spark, BASE, Term("merge"), route="xx")

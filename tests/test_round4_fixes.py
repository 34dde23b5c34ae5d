"""Regression tests for the round-4 ADVICE findings plus the round-4
routing surface (ExactStatsCache global stats, compositeId hash-range
router, time-routed aliases, parallel route builds)."""

from __future__ import annotations

import os
import shutil
from datetime import date

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparklucene.analysis import AnalyzerConfig, strip_html
from sparklucene.build import build_index
from sparklucene.corpus import load_corpus
from sparklucene.query import Or, Term
from sparklucene.routing import (build_hashed_index, build_routed_index,
                                 build_time_routed_index, composite_hash32,
                                 hash16, hashed_search, load_routes,
                                 route_dirname, routed_search, shard_of,
                                 shards_for_route_key, time_routed_search)
from sparklucene.search import Index, search

SF = "/root/testdata/sf0.001"
CACHE = "/root/repo/.cache"


# --------------------------------------------------------------------------
# ADVICE high: common-grams bigram colliding with a literal token must not
# corrupt postings (appended bigram section breaks per-term doc order)
# --------------------------------------------------------------------------

def test_common_grams_literal_collision(spark, tmp_path):
    # doc 0 generates bigram 'the_who' (adjacent 'the who'); doc 1 holds
    # the LITERAL token 'the_who'. Pre-fix the appended bigram section
    # left term 'the_who' with docs [1, 0] and the delta codec silently
    # corrupted the posting list.
    rows = [
        (0, "the who plays tonight"),
        (1, "classic the_who record"),
        (2, "nothing relevant here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    an = AnalyzerConfig(stopwords=frozenset(),
                        common_grams=frozenset({"the"}))
    d = str(tmp_path / "cgram-collision")
    build_index(spark, corpus, d, drange_size=1024, analyzer=an)
    idx = Index(spark, d)
    got = search(idx, Term("the_who"), k=10, mode="f64").toPandas()
    assert sorted(got["doc_id"].tolist()) == [0, 1]
    ts = idx.termstats().filter(F.col("term") == "the_who").collect()
    assert len(ts) == 1 and ts[0]["df"] == 2 and ts[0]["cf"] == 2


# --------------------------------------------------------------------------
# ADVICE low: entity decoding is a true single pass — never cascades
# --------------------------------------------------------------------------

def test_strip_html_entities_never_cascade():
    s = pd.Series(["&amp;#65;", "&#38;amp;", "&amp;lt;", "&#65;",
                   "&lt;tag&gt;", "&#x41;", "&amp;amp;"])
    got = strip_html(s).tolist()
    assert got == ["&#65;", "&amp;", "&lt;", "A", "<tag>", "A", "&amp;"]


# --------------------------------------------------------------------------
# ADVICE low: incremental per-drange build is deterministic regardless of
# shuffle-partition count (stream consumer sees identical groups)
# --------------------------------------------------------------------------

def test_build_deterministic_across_partitioning(spark, tmp_path):
    corpus = load_corpus(spark, SF)
    shas = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            d = str(tmp_path / f"det-{parts}")
            build_index(spark, corpus, d, drange_size=64)
            from sparklucene.build import IndexPaths, _manifests
            mans = _manifests(IndexPaths(d))
            shas.append([mans[k]["sha"] for k in sorted(mans)])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert shas[0] == shas[1] and len(shas[0]) >= 4


# --------------------------------------------------------------------------
# ADVICE low: route values are data — path-hostile values stay confined
# --------------------------------------------------------------------------

def test_route_dirname_path_safety():
    assert route_dirname("en") == "route=en"
    assert route_dirname("2025-01") == "route=2025-01"
    enc = route_dirname("../evil")
    assert "/" not in enc and ".." not in enc
    assert route_dirname("a/b") != route_dirname("a%2Fb")  # injective
    assert not route_dirname(".hidden").startswith("route=.")
    for bad in ("", None, 42):
        with pytest.raises((ValueError, TypeError)):
            route_dirname(bad)
    # every encoded name is a single, safe path component
    for v in ("a b", "x%y", "ü", "a\\b", "c:d", "route=route"):
        e = route_dirname(v)
        assert os.path.basename(e) == e and e.startswith("route=")


def test_build_routed_index_rejects_hostile_values_safely(spark, tmp_path):
    rows = [(0, "alpha beta", "../esc"), (1, "gamma delta", "ok")]
    corpus = spark.createDataFrame(rows, "doc_id long, content string, lang string")
    base = str(tmp_path / "hostile")
    build_routed_index(spark, corpus, base, route_col="lang",
                       drange_size=64)
    names = sorted(os.listdir(base))
    assert all(n == "routes.json" or n.startswith("route=") for n in names)
    assert not os.path.exists(str(tmp_path / "esc"))
    got = routed_search(spark, base, Term("alpha"), route="../esc",
                        k=5, mode="f64").toPandas()
    assert got["doc_id"].tolist() == [0]


# --------------------------------------------------------------------------
# ExactStatsCache: global-stats fan-out ranking == single unrouted index
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def routed_base(spark):
    base = os.path.join(CACHE, "test-r4-routed")
    shutil.rmtree(base, ignore_errors=True)
    corpus = load_corpus(spark, SF)
    build_routed_index(spark, corpus, base, route_col="lang",
                       drange_size=128, max_workers=4)
    return base


def test_global_stats_fanout_equals_unrouted(spark, routed_base, tmp_path):
    corpus = load_corpus(spark, SF)
    whole = str(tmp_path / "whole")
    build_index(spark, corpus, whole, drange_size=128)
    q = Or((Term("merge"), Term("spark")))
    got = routed_search(spark, routed_base, q, k=10, mode="f64",
                        stats="global").toPandas()
    want = search(Index(spark, whole), q, k=10, mode="f64").toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_local_vs_global_stats_diverge_on_skew(spark, tmp_path):
    # term 'rare' is rare on shard A (df=1 of many) but common on shard B
    # — LocalStatsCache ranks the A hit above B hits; ExactStatsCache
    # scores both shards with the merged df and the ranking changes.
    rows = []
    rows.append((0, "rare gem alpha", "A"))
    for i in range(1, 30):
        rows.append((i, f"filler{i} alpha beta", "A"))
    for i in range(30, 40):
        rows.append((i, "rare rare rare stone", "B"))
    corpus = spark.createDataFrame(rows, "doc_id long, content string, lang string")
    base = str(tmp_path / "skew")
    build_routed_index(spark, corpus, base, route_col="lang",
                       drange_size=1024)
    q = Term("rare")
    loc = routed_search(spark, base, q, k=40, mode="f64",
                        stats="local").toPandas()
    glb = routed_search(spark, base, q, k=40, mode="f64",
                        stats="global").toPandas()
    assert set(loc["doc_id"]) == set(glb["doc_id"])
    a_loc = float(loc.loc[loc["doc_id"] == 0, "score"].iloc[0])
    a_glb = float(glb.loc[glb["doc_id"] == 0, "score"].iloc[0])
    # doc 0's idf under local stats (df=1/30) far exceeds global (df=11/40)
    assert a_loc > a_glb
    assert loc["doc_id"].tolist() != glb["doc_id"].tolist()


# --------------------------------------------------------------------------
# compositeId hash-range router
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hashed_base(spark):
    base = os.path.join(CACHE, "test-r4-hashed")
    shutil.rmtree(base, ignore_errors=True)
    corpus = load_corpus(spark, SF)
    build_hashed_index(spark, corpus, base, n_shards=4,
                       id_col="doc_id", shard_key_col="lang",
                       drange_size=128, max_workers=4)
    return base


def test_hashed_assignment_matches_python_mirror(spark, hashed_base):
    meta = load_routes(hashed_base)
    assert meta["router"] == "compositeId" and meta["n_shards"] == 4
    corpus = load_corpus(spark, SF).select("doc_id", "lang").toPandas()
    want: dict[int, str] = {}
    for r in corpus.itertuples(index=False):
        h = composite_hash32(str(r.doc_id), str(r.lang))
        want[int(r.doc_id)] = f"s{shard_of(h, 4)}"
    total = 0
    for rt, info in meta["routes"].items():
        if info["dir"] is None:
            assert info["n_docs"] == 0
            assert not any(v == rt for v in want.values())
            continue
        idx = Index(spark, os.path.join(hashed_base, info["dir"]))
        ids = [r["doc_id"] for r in idx.docmeta().select("doc_id").collect()]
        total += len(ids)
        assert all(want[int(i)] == rt for i in ids), rt
        lo, hi = info["range"]
        assert all(lo <= composite_hash32(str(i), str(corpus.loc[corpus.doc_id == i, "lang"].iloc[0])) < hi
                   for i in ids[:20])
    assert total == len(corpus)


def test_hashed_route_key_prunes_to_prefix_window(spark, hashed_base):
    meta = load_routes(hashed_base)
    names = shards_for_route_key(meta, "en")
    assert 1 <= len(names) <= 2
    got = hashed_search(spark, hashed_base, Term("merge"), route_key="en",
                        k=10, mode="f64").toPandas()
    assert set(got["route"]) <= set(names)
    # every en doc lives inside the pruned shard set
    w = hash16("en") << 16
    assert {f"s{shard_of(w, 4)}", f"s{shard_of(w | 0xFFFF, 4)}"} == set(names)


def test_hashed_fanout_global_stats_equals_unrouted(spark, hashed_base, tmp_path):
    corpus = load_corpus(spark, SF)
    whole = str(tmp_path / "whole-h")
    build_index(spark, corpus, whole, drange_size=128)
    q = Or((Term("merge"), Term("spark")))
    got = hashed_search(spark, hashed_base, q, k=10, mode="f64",
                        stats="global").toPandas()
    want = search(Index(spark, whole), q, k=10, mode="f64").toPandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


# --------------------------------------------------------------------------
# time-routed alias
# --------------------------------------------------------------------------

def test_time_routed_alias_prunes_buckets(spark, tmp_path):
    corpus = (load_corpus(spark, SF)
              .withColumn("ts", F.expr(
                  "timestampadd(DAY, CAST(doc_id % 90 AS INT), "
                  "timestamp'2025-01-01 00:00:00')")))
    base = str(tmp_path / "tra")
    man = build_time_routed_index(spark, corpus, base, ts_col="ts",
                                  drange_size=128)
    assert sorted(man) == ["2025-01", "2025-02", "2025-03"]
    q = Or((Term("merge"), Term("spark")))
    got = time_routed_search(spark, base, q, date(2025, 2, 1),
                             date(2025, 3, 31), k=10, mode="f64").toPandas()
    assert set(got["route"]) <= {"2025-02", "2025-03"}
    # bucket membership respected: every hit's derived day >= 31
    assert all(int(d) % 90 >= 31 for d in got["doc_id"])
    # out-of-range window returns the typed empty frame
    nothing = time_routed_search(spark, base, q, date(2030, 1, 1),
                                 date(2030, 2, 1), k=10).toPandas()
    assert len(nothing) == 0

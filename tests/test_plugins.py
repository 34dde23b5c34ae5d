"""Plugin registry (SURVEY §2.13): named similarities, analyzers,
qparsers resolved by the engine + manifest compaction scalability."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from sparklucene import plugins
from sparklucene.analysis import AnalyzerConfig
from sparklucene.query import Or, Term, parse


def test_register_and_resolve_similarity():
    def sim(tf, dl, df, cf, doc_count, sum_dl):
        return tf / (tf + 1.0)

    plugins.register_similarity("saturate", sim)
    assert plugins.resolve_mode("saturate") is sim
    assert plugins.resolve_mode("lucene8") == "lucene8"
    with pytest.raises(ValueError, match="unknown similarity"):
        plugins.resolve_mode("nope")
    with pytest.raises(ValueError, match="built-in"):
        plugins.register_similarity("f64", sim)


def test_registered_similarity_through_search(spark, corpus_pdf,
                                              tmp_path_factory):
    from sparklucene.build import build_index
    from sparklucene.search import Index, search

    def sim(tf, dl, df, cf, doc_count, sum_dl):
        return tf / (tf + dl / (sum_dl / doc_count))

    plugins.register_similarity("tf_saturation", sim)
    d = str(tmp_path_factory.mktemp("plug")) + "/idx"
    build_index(spark, spark.createDataFrame(corpus_pdf), d,
                drange_size=256)
    idx = Index(spark, d)
    by_name = search(idx, Or((Term("spark"), Term("merge"))), k=10,
                     mode="tf_saturation").collect()
    direct = search(idx, Or((Term("spark"), Term("merge"))), k=10,
                    mode=sim).collect()
    assert by_name == direct and len(by_name) == 10


def test_register_analyzer_and_qparser():
    plugins.register_analyzer("nostop", AnalyzerConfig(stopwords=frozenset()))
    cfg = plugins.resolve_analyzer("nostop")
    assert cfg.stopwords == frozenset()
    assert plugins.resolve_analyzer(None) is None

    plugins.register_qparser("firstword",
                             lambda text: Term(text.split()[0].lower()))
    q = plugins.parse_with("firstword", "Spark merge join")
    assert q == Term("spark")


def test_manifest_compaction_roundtrip(tmp_path):
    from sparklucene.build import (IndexPaths, _manifests,
                                   compact_manifests)
    import json

    paths = IndexPaths(str(tmp_path))
    os.makedirs(paths.manifest_dir)
    for dr in range(5):
        with open(os.path.join(paths.manifest_dir,
                               f"part-{dr:06d}.json"), "w") as fh:
            json.dump({"drange": dr, "n_docs": 10 + dr, "sum_dl": 100,
                       "n_docs_live": 10 + dr, "batch_id": 0}, fh)
    before = _manifests(paths)
    assert compact_manifests(paths) == 5
    # individual files folded into the log; content identical
    assert [f for f in os.listdir(paths.manifest_dir)
            if f.endswith(".json")] == []
    assert _manifests(paths) == before
    # a NEWER individual manifest overrides the compacted record
    with open(os.path.join(paths.manifest_dir, "part-000002.json"),
              "w") as fh:
        json.dump({"drange": 2, "n_docs": 99, "sum_dl": 1,
                   "n_docs_live": 99, "batch_id": 7}, fh)
    assert _manifests(paths)[2]["n_docs"] == 99
    assert compact_manifests(paths) == 5
    assert _manifests(paths)[2]["batch_id"] == 7

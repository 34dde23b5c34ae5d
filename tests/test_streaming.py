"""NRT incremental indexing: streaming micro-batches must produce exactly
the same searchable index as one batch build (the Solr
distributed-vs-control pattern applied to the time axis)."""

from __future__ import annotations

import os
import shutil

import pytest

from sparklucene.build import build_index, load_stats
from sparklucene.query import parse
from sparklucene.search import Index, search
from sparklucene.streaming import index_stream_once

CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string, doc_id long")


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


def test_streaming_build_equals_batch_build(spark, corpus_df, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("nrt"))
    src = os.path.join(tmp, "incoming")
    # two "arrival waves" as separate parquet drops (append-only ids)
    (corpus_df.filter("doc_id < 250").repartition(2)
     .write.parquet(os.path.join(src, "wave0")))
    (corpus_df.filter("doc_id >= 250").repartition(2)
     .write.parquet(os.path.join(src, "wave1")))
    # flatten the waves into one glob dir for the file source
    flat = os.path.join(tmp, "flat")
    os.makedirs(flat)
    n = 0
    for wave in ("wave0", "wave1"):
        for f in os.listdir(os.path.join(src, wave)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, wave, f),
                            os.path.join(flat, f"{wave}-{f}"))
                n += 1
    assert n >= 2

    stream_idx_dir = os.path.join(tmp, "stream-idx")
    batch_idx_dir = os.path.join(tmp, "batch-idx")
    index_stream_once(spark, flat, CORPUS_SCHEMA, stream_idx_dir,
                      drange_size=128,
                      checkpoint_dir=os.path.join(tmp, "ckpt"))
    build_index(spark, corpus_df, batch_idx_dir, drange_size=128)

    s_stats = load_stats(stream_idx_dir)
    b_stats = load_stats(batch_idx_dir)
    for key in ("n_docs", "doc_count", "sum_dl"):
        assert s_stats[key] == b_stats[key]

    si, bi = Index(spark, stream_idx_dir), Index(spark, batch_idx_dir)
    assert (si.termstats().orderBy("term").collect()
            == bi.termstats().orderBy("term").collect())
    for q in ["spark merge join", '"table hash"', "+hash +batch", "vector -slow"]:
        s = search(si, parse(q), k=10).collect()
        b = search(bi, parse(q), k=10).collect()
        assert s == b, q


def test_streaming_multifield_equals_batch(spark, corpus_df,
                                           tmp_path_factory):
    """Streaming build with extra fields must equal the batch multifield
    build (termstats incl. field-qualified keys + per-field stats)."""
    from sparklucene.analysis import AnalyzerConfig
    from sparklucene.build import Field
    from sparklucene.query import Term
    from sparklucene.search import total_hits

    kw = AnalyzerConfig(tokenizer="keyword", stopwords=frozenset())
    fields = (Field("lang", "lang", kw),)
    tmp = str(tmp_path_factory.mktemp("nrtmf"))
    flat = os.path.join(tmp, "flat")
    corpus_df.coalesce(2).write.parquet(flat)
    s_dir, b_dir = os.path.join(tmp, "s"), os.path.join(tmp, "b")
    index_stream_once(spark, flat, CORPUS_SCHEMA, s_dir, drange_size=128,
                      checkpoint_dir=os.path.join(tmp, "ckpt"),
                      extra_fields=fields)
    build_index(spark, corpus_df, b_dir, drange_size=128,
                extra_fields=fields)
    si, bi = Index(spark, s_dir), Index(spark, b_dir)
    assert si.stats["fields"] == bi.stats["fields"]
    assert (si.termstats().orderBy("term").collect()
            == bi.termstats().orderBy("term").collect())
    q = Term("en", field="lang")
    assert (total_hits(si, q).collect() == total_hits(bi, q).collect())


def test_streaming_resume_skips_done_ranges(spark, corpus_df, tmp_path_factory):
    """Re-running the same data over an existing index recomputes nothing
    (per-partition manifest checkpoints — BASELINE.json resumability)."""
    tmp = str(tmp_path_factory.mktemp("resume"))
    idx_dir = os.path.join(tmp, "idx")
    stats = build_index(spark, corpus_df, idx_dir, drange_size=128)
    assert stats["n_ranges_skipped"] == 0
    stats2 = build_index(spark, corpus_df, idx_dir, drange_size=128)
    assert stats2["n_ranges_skipped"] == stats2["n_ranges"]


def test_delete_docs_persist_and_mask(spark, corpus_df, tmp_path_factory):
    """Live-docs deletions: persisted, unioned, masked before top-k."""
    from sparklucene.search import delete_docs, matches, search

    tmp = str(tmp_path_factory.mktemp("del"))
    idx_dir = tmp + "/idx"
    build_index(spark, corpus_df, idx_dir, drange_size=128)
    idx = Index(spark, idx_dir)
    base = {r["doc_id"] for r in matches(idx, "spark").collect()}
    victims = sorted(base)[:3]
    assert delete_docs(idx, victims[:2]) == 2
    assert delete_docs(idx, victims[1:]) == 3  # union, idempotent overlap
    after = {r["doc_id"] for r in matches(idx, "spark").collect()}
    assert after == base - set(victims)
    top = search(idx, "spark", k=10).collect()
    assert all(r["doc_id"] not in victims for r in top)

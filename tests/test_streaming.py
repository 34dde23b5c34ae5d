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


# ---------------------------------------------------------------------------
# Watermark + windowed aggregation (Structured Streaming late-data policy).
# ---------------------------------------------------------------------------

def _evt(eid, ts, etype, value):
    import datetime as dt
    return (eid, dt.datetime(2026, 1, 1) + dt.timedelta(minutes=ts),
            etype, float(value))


_EVT_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def test_windowed_counts_streaming_equals_batch(spark, tmp_path_factory):
    """With no late data, the availableNow streaming run must equal the
    batch aggregation of the same rows (append mode, closed windows)."""
    from sparklucene.streaming import windowed_event_counts
    src = str(tmp_path_factory.mktemp("evt-src"))
    ck = str(tmp_path_factory.mktemp("evt-ck"))
    rows = [_evt(i, 7 * i, "a" if i % 2 else "b", i) for i in range(40)]
    df = spark.createDataFrame(rows, _EVT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(_EVT_SCHEMA).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour",
                                watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName("winagg1")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ck).start())
    q.awaitTermination()
    got = (spark.table("winagg1")
           .orderBy("win_start", "event_type").toPandas())
    batch = (windowed_event_counts(df, window="1 hour")
             .orderBy("win_start", "event_type").toPandas())
    # append emits only windows the final watermark closed; every emitted
    # row must match the batch result exactly, and the non-final windows
    # are the only ones missing
    assert len(got) > 0
    merged = got.merge(batch, on=["win_start", "win_end", "event_type"],
                       suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (merged["sum_value_s"] == merged["sum_value_b"]).all()
    last_closed = got["win_end"].max()
    missing = batch[~batch["win_start"].isin(got["win_start"])]
    assert (missing["win_end"] > last_closed).all() or len(missing) == 0


def test_windowed_counts_watermark_drops_late_event(spark, tmp_path_factory):
    """An event older than the watermark horizon must NOT reopen or
    change an already-closed window (the late-data drop the batch path
    would have counted)."""
    import time
    from sparklucene.streaming import windowed_event_counts
    src = str(tmp_path_factory.mktemp("evt-late-src"))
    ck = str(tmp_path_factory.mktemp("evt-late-ck"))
    fresh = [_evt(i, i, "a", 1.0) for i in range(30)]          # 00:00-00:30
    advance = [_evt(100 + i, 120 + i, "a", 1.0) for i in range(5)]  # 02:00+
    spark.createDataFrame(fresh + advance, _EVT_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(_EVT_SCHEMA).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour",
                                watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName("winagg2")
         .outputMode("append")
         .option("checkpointLocation", ck)
         .trigger(processingTime="200 milliseconds").start())
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the long-closed 00:00 window plus a
        # fresh one to advance the stream
        late = [_evt(200, 5, "a", 1000.0), _evt(201, 200, "a", 1.0)]
        spark.createDataFrame(late, _EVT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more nudge so the advanced watermark emits closed windows
        spark.createDataFrame([_evt(202, 240, "a", 1.0)], _EVT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("winagg2").toPandas()
    w0 = got[got["win_start"].astype(str).str.contains("00:00:00")]
    assert len(w0) == 1
    # the late 1000.0 value was dropped: the closed window kept n=30
    assert int(w0["n"].iloc[0]) == 30
    assert abs(float(w0["sum_value"].iloc[0]) - 30.0) < 1e-9


def test_sessionize_streaming_equals_batch(spark, tmp_path_factory):
    from sparklucene.streams import sessionize
    src = str(tmp_path_factory.mktemp("sess-src"))
    ck = str(tmp_path_factory.mktemp("sess-ck"))
    import datetime as dt
    base = dt.datetime(2026, 1, 1)
    mk = lambda eid, m, v: (eid, base + dt.timedelta(minutes=m), v, 7)
    rows = ([mk(i, i * 4, 1.0) for i in range(10)]               # one chain
            + [mk(100 + i, 300 + 40 * i, 2.0) for i in range(4)]
            + [mk(500, 900, 5.0)])                               # advance wm
    schema = "event_id long, ts timestamp, value double, user_id long"
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = sessionize(stream, gap="10 minutes", watermark="1 minute")
    q = (agg.writeStream.format("memory").queryName("sessagg")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ck).start())
    q.awaitTermination()
    got = (spark.table("sessagg")
           .orderBy("user_id", "session_start").toPandas())
    batch = (sessionize(spark.read.parquet(src), gap="10 minutes")
             .orderBy("user_id", "session_start").toPandas())
    merged = got.merge(batch, on=["user_id", "session_start",
                                  "session_end"], suffixes=("_s", "_b"))
    assert len(got) > 1 and len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_detect_followups_streaming_equals_batch(spark, tmp_path_factory):
    """applyInPandasWithState sequence detector == batch window detector
    on the real events table (one availableNow batch: in-batch ordering
    is handled by the operator itself)."""
    from sparklucene.streaming import detect_followups, detect_followups_stream
    src = str(tmp_path_factory.mktemp("fu-src"))
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(src, "events.parquet"))
    ck = str(tmp_path_factory.mktemp("fu-ck"))
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).parquet(src)
    q = (detect_followups_stream(stream).writeStream
         .format("memory").queryName("fuagg").outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", ck).start())
    q.awaitTermination()
    got = (spark.table("fuagg")
           .orderBy("user_id", "purchase_ts", "view_ts").toPandas())
    want = (detect_followups(spark.read.parquet(src))
            .orderBy("user_id", "purchase_ts", "view_ts").toPandas())
    assert len(want) > 10
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)


def test_delete_by_query_masks_matches(spark, corpus_df, tmp_path_factory):
    """deleteByQuery: the match set is hidden distributed-side (never
    collected); composes with prior id deletes; non-matching docs
    survive."""
    from sparklucene.query import Term
    from sparklucene.search import (Index, delete_by_query, delete_docs,
                                    matches)

    tmp = str(tmp_path_factory.mktemp("dbq"))
    idx_dir = tmp + "/idx"
    build_index(spark, corpus_df, idx_dir, drange_size=128)
    idx = Index(spark, idx_dir)
    merge_ids = {r["doc_id"] for r in matches(idx, "merge").collect()}
    spark_ids = {r["doc_id"] for r in matches(idx, "spark").collect()}
    survivor = sorted(spark_ids - merge_ids)
    assert merge_ids and survivor
    delete_docs(idx, [survivor[0]])            # id delete first
    n = delete_by_query(idx, Term("merge"))    # then query delete
    assert n == len(merge_ids | {survivor[0]})
    assert matches(idx, "merge").count() == 0
    after = {r["doc_id"] for r in matches(idx, "spark").collect()}
    assert after == spark_ids - merge_ids - {survivor[0]}
    # idempotent replay: same query again adds nothing
    assert delete_by_query(idx, Term("merge")) == n

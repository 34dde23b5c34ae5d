"""Round-2 robustness fixes (ADVICE.md): quoted-phrase parsing, packed-key
domain guards, streaming range-straddle enforcement, ANN dim inference,
stale index-build locks."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from sparklucene.query import Phrase, parse


# ---------------------------------------------------------------------------
# parse(): operator rewrites must not corrupt quoted phrases
# ---------------------------------------------------------------------------

def test_parse_operators_inside_quotes_keep_stop_gaps():
    q = parse('"fast AND key"')
    assert isinstance(q, Phrase)
    # 'and' is a stopword: the phrase keeps its position gap — the old
    # rewrite turned the quoted text into "fast +key" (adjacent slots)
    assert q.slots == ((0, "fast"), (2, "key"))
    assert parse('"fast AND key"') == parse('"fast and key"')
    assert parse('"spark OR merge"').slots == ((0, "spark"), (2, "merge"))


def test_parse_operators_outside_quotes_still_rewrite():
    assert parse("spark AND merge") == parse("spark +merge")
    q = parse('vector AND "fast and key"')
    # ' AND ' before the quote makes the phrase a MUST clause
    assert q == parse('vector +"fast and key"')


def test_parse_sloppy_quoted_not_rewritten():
    q = parse('"spark OR merge"~3')
    assert isinstance(q, Phrase)
    assert q.slop == 3
    assert q.slots == ((0, "spark"), (2, "merge"))


# ---------------------------------------------------------------------------
# scorer: packed (doc, pos) uint64 keys guard their 32-bit domains
# ---------------------------------------------------------------------------

def _scorer_for(pdf: pd.DataFrame, deleted=None):
    from sparklucene.build import _invert_one_range
    from sparklucene.scorer import (GlobalStats, RangeCell, RangeScorer,
                                    TermStats)

    postings, docmeta, man = _invert_one_range(pdf, 0, frozenset())
    cells = {}
    tstats = {}
    for row in postings.to_pylist():
        cells[row["term"]] = RangeCell(
            doc_bytes=row["doc_bytes"], tf_bytes=row["tf_bytes"],
            norm_bytes=row["norm_bytes"],
            block_last=np.asarray(row["block_last"], dtype=np.int64),
            block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
            block_min_norm=np.frombuffer(row["block_min_norm"], dtype=np.uint8),
            pos_bytes=row["pos_bytes"])
        tstats[row["term"]] = TermStats(df=row["df_part"], cf=row["cf_part"])
    gs = GlobalStats(doc_count=len(pdf), sum_dl=int(man["sum_dl"]),
                     term_stats=tstats)
    return RangeScorer(cells, gs, deleted=deleted)


def test_phrase_packed_key_guard_rejects_huge_doc_ids():
    pdf = pd.DataFrame({"doc_id": [1 << 32, (1 << 32) + 1],
                        "content": ["spark merge join", "spark merge scan"]})
    scorer = _scorer_for(pdf)
    with pytest.raises(ValueError, match="doc_id < 2\\^32"):
        scorer.topk(parse('"spark merge"'), k=5)


def test_phrase_ok_below_the_guard():
    pdf = pd.DataFrame({"doc_id": [5, 9],
                        "content": ["spark merge join", "spark scan merge"]})
    scorer = _scorer_for(pdf)
    docs, scores = scorer.topk(parse('"spark merge"'), k=5)
    assert docs.tolist() == [5]


# ---------------------------------------------------------------------------
# searchAfter: cursor evaluated inside the scorer, k-bounded, still pruned
# ---------------------------------------------------------------------------

def test_cursor_topk_equals_offset_slice_all_query_shapes(corpus_pdf):
    from sparklucene.query import And, Or, Phrase, Term

    pdf = corpus_pdf[["doc_id", "content"]]
    queries = [Term("merge"),
               Or((Term("query"), Term("scan"))),
               And((Term("table"), Term("scan"))),
               Phrase(((0, "merge"), (1, "join"))),
               Phrase(((0, "table"), (1, "scan")), slop=2)]
    for q in queries:
        ex = _scorer_for(pdf)
        ex.prune = False
        fd, fs = ex.topk(q, len(pdf))  # full sorted ranking
        if fd.size < 12:
            continue
        after = (float(fs[9]), int(fd[9]))
        pr = _scorer_for(pdf)
        d2, s2 = pr.topk(q, 10, after=after)
        assert d2.tolist() == fd[10:20].tolist(), q
        assert s2.tolist() == fs[10:20].tolist(), q


def test_pruned_single_term_with_deletes_matches_exhaustive():
    from sparklucene.query import Term

    n = 3000
    # tiered tf so block upper bounds differ (low-tf tail blocks are
    # skippable once θ is established)
    content = ["spark " * 5 if i < 1280 else "spark" for i in range(n)]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "content": content})
    deleted = np.arange(0, n, 13, dtype=np.int64)  # every 13th doc
    ex = _scorer_for(pdf, deleted=deleted)
    ex.prune = False
    fd, fs = ex.topk(Term("spark"), 20)
    pr = _scorer_for(pdf, deleted=deleted)
    d2, s2 = pr.topk(Term("spark"), 20)
    assert d2.tolist() == fd.tolist()
    assert s2.tolist() == fs.tolist()
    assert np.intersect1d(d2, deleted).size == 0
    # deletions no longer force the exhaustive path
    assert pr.metrics.blocks_skipped > 0


def test_cursor_single_term_pruning_skips_blocks():
    from sparklucene.query import Term

    n = 3000
    content = ["spark " * 5 if i < 1280 else "spark" for i in range(n)]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "content": content})
    ex = _scorer_for(pdf)
    ex.prune = False
    fd, fs = ex.topk(Term("spark"), n)
    after = (float(fs[9]), int(fd[9]))
    pr = _scorer_for(pdf)
    d2, s2 = pr.topk(Term("spark"), 10, after=after)
    assert d2.tolist() == fd[10:20].tolist()
    assert s2.tolist() == fs[10:20].tolist()
    # the low-tf tail blocks fall under the qualified θ and are skipped
    assert pr.metrics.blocks_skipped > 0
    assert pr.metrics.docs_scored < ex.metrics.docs_scored


# ---------------------------------------------------------------------------
# search_batch: one job for N queries == N serial jobs, bit-for-bit
# ---------------------------------------------------------------------------

def test_search_batch_equals_serial(spark):
    from sparklucene.driver_queries import index_for
    from sparklucene.query import And, Not, Or, Phrase, Prefix, Term
    from sparklucene.search import search, search_batch

    idx = index_for(spark, "/root/testdata/sf0.001")
    qs = {"t": Term("vector"),
          "and": And((Term("hash"), Term("join"))),
          "or": Or((Term("spark"), Term("merge"), Term("join"))),
          "not": Not(Or((Term("spark"), Term("merge"))), Term("slow")),
          "ph": Phrase(((0, "fast"), (1, "merge"))),
          "px": And((Prefix("sc"), Term("merge"))),
          "gone": Term("zzz_absent")}
    rows = search_batch(idx, qs, k=10, mode="f64").collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append((r["doc_id"], r["score"]))
    for n, q in qs.items():
        want = [(r["doc_id"], r["score"])
                for r in search(idx, q, k=10, mode="f64").collect()]
        assert by_q.get(n, []) == want, n


# ---------------------------------------------------------------------------
# streaming: a batch straddling a completed doc-range fails fast
# ---------------------------------------------------------------------------

def test_streaming_straddling_range_fails_fast(spark, corpus_pdf,
                                               tmp_path_factory):
    from sparklucene.streaming import index_stream_once

    corpus_df = spark.createDataFrame(corpus_pdf)
    tmp = str(tmp_path_factory.mktemp("straddle"))
    flat = os.path.join(tmp, "flat")
    schema = ("repo string, path string, commit string, lang string, "
              "content string, doc_id long")
    # wave 0: docs 0..199 -> ranges 0 and 1 (drange_size=128; range 1 is
    # only partially covered)
    (corpus_df.filter("doc_id < 200").coalesce(1)
     .write.mode("overwrite").parquet(flat))
    idx_dir = os.path.join(tmp, "idx")
    index_stream_once(spark, flat, schema, idx_dir, drange_size=128,
                      checkpoint_dir=os.path.join(tmp, "ckpt"))
    # wave 1: docs 200.. straddle range 1, which batch 0 marked complete
    (corpus_df.filter("doc_id >= 200").coalesce(1)
     .write.mode("append").parquet(flat))
    with pytest.raises(Exception, match="already built by an earlier batch"):
        index_stream_once(spark, flat, schema, idx_dir, drange_size=128,
                          checkpoint_dir=os.path.join(tmp, "ckpt"))


# ---------------------------------------------------------------------------
# ANN: embedding dim inferred from data; mismatched rows fail fast
# ---------------------------------------------------------------------------

def test_hyperplane_dim_inferred(spark):
    from sparklucene.similarity import hyperplane_buckets

    df = spark.createDataFrame(
        [(1, [0.5] * 16), (2, [-0.5] * 16), (3, [0.25] * 16)],
        "vec_id long, embedding array<float>")
    rows = hyperplane_buckets(df).select("vec_id", "bucket").collect()
    assert len(rows) == 3
    assert all(r["bucket"] is not None for r in rows)
    # identical vectors share a bucket; negated vector lands elsewhere
    by_id = {r["vec_id"]: r["bucket"] for r in rows}
    assert by_id[1] == by_id[3]
    assert by_id[1] != by_id[2]


def test_hyperplane_dim_mismatch_raises(spark):
    from sparklucene.similarity import hyperplane_buckets

    df = spark.createDataFrame(
        [(1, [0.5] * 16), (2, [0.5] * 8)],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="dim mismatch"):
        hyperplane_buckets(df).collect()


# ---------------------------------------------------------------------------
# index_for: stale build locks are taken over, not spun on forever
# ---------------------------------------------------------------------------

def test_stale_lock_takeover(spark, tmp_path_factory):
    import shutil

    from sparklucene import driver_queries as dq

    tmp = str(tmp_path_factory.mktemp("lockttl"))
    sf_dir = os.path.join(tmp, "sf")
    os.makedirs(sf_dir)
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                os.path.join(sf_dir, "documents.parquet"))
    # pre-create a stale lock (holder "died" long ago, no index progress)
    import hashlib
    key = os.path.realpath(sf_dir)
    tag = hashlib.sha256(key.encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "sparklucene-idx",
                             f"{os.path.basename(key)}-{tag}")
    shutil.rmtree(index_dir, ignore_errors=True)
    lock = index_dir + ".lock"
    os.makedirs(lock, exist_ok=True)
    old = 1.0e9  # 2001 — far beyond any TTL
    os.utime(lock, (old, old))
    idx = dq.index_for(spark, sf_dir)
    assert idx.stats["doc_count"] > 0
    assert not os.path.isdir(lock)

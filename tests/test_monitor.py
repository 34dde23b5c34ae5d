"""Reverse search (lucene/monitor): presearcher anchor extraction and
exact match verification — SURVEY.md §2 monitor slice."""

from __future__ import annotations

import pytest

from sparklucene.monitor import ANYTOKEN, anchor_terms, monitor_match
from sparklucene.query import (And, ConstantScore, DisMax, Filtered,
                               MatchAllDocs, MatchNoDocs, Not, Or, Phrase,
                               Prefix, Term)


def test_anchor_extraction_pinned_spec():
    # Term -> itself
    assert anchor_terms(Term("spark")) == {"spark"}
    # Phrase -> longest slot term, tie lexicographic
    assert anchor_terms(Phrase(((0, "ab"), (1, "abc")))) == {"abc"}
    assert anchor_terms(Phrase(((0, "xy"), (1, "ab")))) == {"ab"}
    # And -> smallest child anchor set (any conjunct suffices)
    q = And((Or((Term("a"), Term("b"))), Term("c")))
    assert anchor_terms(q) == {"c"}
    # Or -> union of children
    assert anchor_terms(Or((Term("a"), Term("b")))) == {"a", "b"}
    # Not -> positive side only
    assert anchor_terms(Not(Term("a"), Term("b"))) == {"a"}
    # ConstantScore unwraps; DisMax unions
    assert anchor_terms(ConstantScore(Term("z"))) == {"z"}
    assert anchor_terms(DisMax((Term("a"), Term("b")))) == {"a", "b"}
    # MatchAll -> ANYTOKEN; MatchNo -> empty; And prefers real terms
    assert anchor_terms(MatchAllDocs()) == {ANYTOKEN}
    assert anchor_terms(MatchNoDocs()) == frozenset()
    assert anchor_terms(And((MatchAllDocs(), Term("k")))) == {"k"}
    # Filtered behaves like And
    assert anchor_terms(Filtered(MatchAllDocs(), Term("f"))) == {"f"}
    # MultiTermQuery is rejected (no dictionary at registration time)
    with pytest.raises(ValueError, match="MultiTermQuery"):
        anchor_terms(Prefix("mer"))


def test_monitor_match_semantics(spark):
    docs = spark.createDataFrame([
        (1, "the merge join runs fast"),     # phrase spans a stopword-free gap
        (2, "hash scan without parallel"),   # q_not killed by 'parallel'
        (3, "merge of the join"),            # terms present, not adjacent
        (4, ""),                             # empty: only match-all
        (5, "fast the hash"),                # stop-gap phrase target
    ], "doc_id long, text string")
    qs = {
        "q_term": Term("merge"),
        "q_and": And((Term("merge"), Term("join"))),
        "q_not": Not(Or((Term("hash"), Term("scan"))), Term("parallel")),
        "q_phrase": Phrase(((0, "merge"), (1, "join"))),
        "q_gap": Phrase(((0, "fast"), (2, "hash"))),  # 'fast the hash'
        "q_all": MatchAllDocs(),
        "q_none": MatchNoDocs(),
        "q_msm": Or((Term("merge"), Term("hash"), Term("fast")),
                    min_should_match=2),
    }
    got = sorted((r["doc_id"], r["query_id"])
                 for r in monitor_match(docs, qs).collect())
    assert got == sorted([
        (1, "q_term"), (1, "q_and"), (1, "q_phrase"), (1, "q_all"),
        (1, "q_msm"),                       # merge + fast
        (2, "q_all"),
        (3, "q_term"), (3, "q_and"), (3, "q_all"),
        (4, "q_all"),
        (5, "q_not"), (5, "q_gap"), (5, "q_all"),
        (5, "q_msm"),                       # hash + fast
    ])


def test_monitor_empty_query_set(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    assert monitor_match(docs, {}).count() == 0


def test_monitor_stream_equals_batch(spark, tmp_path):
    """Streaming firehose alerts == one batch pass over the same docs
    (the monitor's streaming==batch contract)."""
    import shutil
    from sparklucene.monitor import monitor_match_stream
    from sparklucene.query import And, Or, Phrase, Term

    src = str(tmp_path / "src")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    # two part-files so availableNow sees multiple batches with
    # maxFilesPerTrigger=1
    docs.repartition(2).write.parquet(src)
    qs = {"q_merge": Term("merge"),
          "q_and": And((Term("spark"), Term("join"))),
          "q_phrase": Phrase(("fast", "merge")),
          "q_or": Or((Term("vector"), Term("window")))}
    out = str(tmp_path / "alerts")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = monitor_match_stream(stream, qs, out, str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {(r["doc_id"], r["query_id"])
           for r in spark.read.parquet(out).collect()}
    from sparklucene.monitor import monitor_match
    want = {(r["doc_id"], r["query_id"])
            for r in monitor_match(docs, qs).collect()}
    assert got == want and len(want) > 0

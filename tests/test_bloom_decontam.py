"""Bloom-prefiltered decontamination — exactness + filter contracts.

contamination_scores_bloom must return IDENTICAL rows to
contamination_scores (the Bloom only prunes the exact semi-join's
input; false positives are verified away, false negatives cannot occur
by the no-false-negative property of the filter).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparklucene.textops import (bloom_bitset, bloom_might_contain_sql,
                                 contamination_scores,
                                 contamination_scores_bloom)


def _rows(df):
    return sorted((r["doc_id"], r["n_grams"], r["n_hits"],
                   r["contamination"]) for r in df.collect())


def test_bloom_equals_exact_small_fixture(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c a b c a b c",
                 "one two three four five",
                 "x y",
                 "one two three four five"],
    }))
    bench = docs.filter(F.col("doc_id") == 1)
    exact = contamination_scores(docs, bench, n=3)
    bloom = contamination_scores_bloom(docs, bench, n=3)
    assert exact.columns == bloom.columns
    assert _rows(exact) == _rows(bloom)
    got = {r[0]: r[3] for r in _rows(bloom)}
    assert got[1] == 1.0 and got[3] == 1.0 and got[0] == 0.0


def test_bloom_equals_exact_corpus_slice(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    bench = docs.filter(F.col("doc_id") % 7 == 3)
    for fp in (0.01, 0.3):  # a sloppy filter must still be exact
        assert _rows(contamination_scores(docs, bench, n=5)) == \
            _rows(contamination_scores_bloom(docs, bench, n=5, fp_rate=fp))


def test_bloom_empty_bench_scores_zero(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d", "e f g h"]}))
    out = contamination_scores_bloom(docs, docs.limit(0), n=2)
    assert out.columns == ["doc_id", "n_grams", "n_hits", "contamination"]
    for r in out.collect():
        assert r["n_hits"] == 0 and r["contamination"] == 0.0


def test_bloom_filter_no_false_negatives_and_fp_bounded(spark):
    members = spark.range(1000).select(
        (F.col("id") * 2654435761).alias("h"))
    m_bits, k = 9600, 7  # ~1% design point for 1000 items
    bits = bloom_bitset(members, m_bits, k)
    probe_members = members.crossJoin(F.broadcast(bits))
    pred = bloom_might_contain_sql("h", "bits", m_bits, k)
    assert probe_members.where(F.expr(pred)).count() == 1000
    non_members = (spark.range(2000)
                   .select((F.col("id") * 2654435761 + 1).alias("h"))
                   .crossJoin(F.broadcast(bits)))
    fp = non_members.where(F.expr(pred)).count() / 2000.0
    assert fp < 0.05


def test_bloom_fp_rate_validated(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "text": ["a b c"]}))
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError, match="fp_rate"):
            contamination_scores_bloom(docs, docs, n=2, fp_rate=bad)


def test_bloom_bitset_validates_size(spark):
    members = spark.range(4).select(F.col("id").alias("h"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitset(members, 100, 3)

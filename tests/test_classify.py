"""Classification module (classify.py) — semantics unit tests.

Tiny hand-computable fixtures so every probability is checkable by hand;
the sf-scale parity runs live in test_driver_contract.py
(classify_naive_bayes / classify_knn_vote vs full SQL re-derivations).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparklucene.classify import knn_classify, naive_bayes_classify


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_prefers_class_with_matching_vocabulary(spark):
    train = _docs(spark, [
        (1, "merge merge join", "db"),
        (2, "join scan", "db"),
        (3, "tensor tensor gradient", "ml"),
        (4, "gradient descent", "ml"),
    ])
    test = _docs(spark, [(10, "merge join scan", "?"),
                         (11, "gradient tensor", "?")])
    got = {r["doc_id"]: r["label"]
           for r in naive_bayes_classify(train, test).collect()}
    assert got == {10: "db", 11: "ml"}


def test_nb_hand_computed_score(spark):
    # one class, one test doc -> score checkable by hand
    train = _docs(spark, [(1, "alpha alpha beta", "x")])
    test = _docs(spark, [(9, "alpha gamma", "?")])
    row = naive_bayes_classify(train, test).collect()[0]
    # vocab = {alpha, beta} -> V=2, tokens_x = 3, prior = ln(1/1) = 0
    # matched: alpha tf=1 * ln(2+1); gamma unseen -> 0
    # missing mass: dl=2 * ln(3+2)
    want = math.fsum([0.0]) + float(
        __import__("numpy").float32(1.0 * math.log(3.0))) - 2.0 * math.log(5.0)
    assert row["label"] == "x"
    assert abs(row["score"] - want) < 1e-6


def test_nb_all_unseen_doc_still_classified_by_prior(spark):
    train = _docs(spark, [(1, "alpha", "big"), (2, "alpha", "big"),
                          (3, "beta", "small")])
    test = _docs(spark, [(9, "zzz_unseen", "?")])
    rows = naive_bayes_classify(train, test).collect()
    assert len(rows) == 1
    # matched mass 0 for both; 'big' wins on prior (2/3 vs 1/3) net of
    # the missing-mass term: big = ln(2/3) - ln(2+2), small = ln(1/3)
    # - ln(1+2) -> big ≈ -1.79, small ≈ -2.19
    assert rows[0]["label"] == "big"


def test_knn_majority_vote_and_tie_break(spark):
    train = _docs(spark, [
        (1, "rust cargo borrow", "rs"),
        (2, "rust trait macro", "rs"),
        (3, "python pandas numpy", "py"),
        (4, "python asyncio", "py"),
    ])
    test = _docs(spark, [(10, "rust borrow trait", "?")])
    rows = knn_classify(train, test, k=2).collect()
    assert rows[0]["label"] == "rs" and rows[0]["votes"] == 2


def test_knn_no_shared_terms_absent(spark):
    train = _docs(spark, [(1, "alpha", "a")])
    test = _docs(spark, [(9, "omega", "?")])
    assert knn_classify(train, test, k=1).count() == 0


def test_nb_layout_invariance(spark):
    # class stats are aggregates -> result invariant under repartition
    train = _docs(spark, [(i, f"tok{i % 3} shared", f"c{i % 2}")
                          for i in range(1, 21)])
    test = _docs(spark, [(100, "shared tok1", "?"), (101, "tok2", "?")])
    a = naive_bayes_classify(train, test).collect()
    b = naive_bayes_classify(train.repartition(7), test.repartition(3)
                             ).collect()
    assert [(r["doc_id"], r["label"], r["score"]) for r in a] == \
           [(r["doc_id"], r["label"], r["score"]) for r in b]


def test_naive_bayes_classifies_tokenless_doc_by_priors(spark):
    """A test doc whose text tokenizes to nothing (all stopwords) must
    still classify — by class priors alone (dl=0), like the reference's
    SimpleNaiveBayesClassifier; it was silently absent before round 5
    (fuzz seed 150111)."""
    import math

    import numpy as np

    from sparklucene.classify import naive_bayes_classify

    train = spark.createDataFrame(
        [(0, "a", "spark spark"), (1, "a", "merge"), (2, "b", "scan")],
        "doc_id long, lang string, text string")
    test = spark.createDataFrame(
        [(10, "the of and"), (11, "spark")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["label"], r["score"])
           for r in naive_bayes_classify(train, test).collect()}
    assert set(out) == {10, 11}
    # doc 10: pure priors -> argmax is 'a' (2 of 3 train docs)
    assert out[10][0] == "a"
    assert out[10][1] == float(np.float32(math.log(2 / 3)))

"""train() / TextLogitStream — logistic-regression semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparklucene.streams import train_logit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_discriminative_term_gets_positive_weight(spark):
    rows = [(i, "positive_marker filler", "en") for i in range(10)]
    rows += [(100 + i, "negative_marker filler", "de") for i in range(10)]
    out = {r["feature"]: r["weight"] for r in
           train_logit(_docs(spark, rows), F.col("lang") == "en",
                       ["positive_marker", "negative_marker"],
                       iterations=5, lr=1.0).collect()}
    assert out["positive_marker"] > 0 > out["negative_marker"]
    assert set(out) == {"__intercept__", "positive_marker",
                        "negative_marker"}


def test_first_iteration_matches_hand_gradient(spark):
    # 2 docs, 1 term, 1 iteration: w starts 0 -> sigma = 0.5 everywhere
    # grad_intercept = (1-0.5) + (0-0.5) = 0        -> w0 = 0
    # grad_term      = (1-0.5)*1 + (0-0.5)*0 = 0.5  -> w1 = lr/2 * 0.5
    docs = _docs(spark, [(1, "marker", "en"), (2, "other", "de")])
    out = {r["feature"]: r["weight"] for r in
           train_logit(docs, F.col("lang") == "en", ["marker"],
                       iterations=1, lr=0.8).collect()}
    assert out["__intercept__"] == 0.0
    assert abs(out["marker"] - 0.8 / 2.0 * 0.5) < 1e-7


def test_layout_invariance(spark):
    rows = [(i, f"tok{i % 4} shared marker{'_a' if i % 3 else ''}",
             "en" if i % 3 else "zz") for i in range(60)]
    docs = _docs(spark, rows)
    a = train_logit(docs, F.col("lang") == "en", ["shared", "marker_a"],
                    iterations=3, lr=0.5).collect()
    b = train_logit(docs.repartition(13), F.col("lang") == "en",
                    ["shared", "marker_a"], iterations=3, lr=0.5).collect()
    assert [(r["feature"], r["weight"]) for r in a] == \
           [(r["feature"], r["weight"]) for r in b]


def test_more_iterations_reduce_log_loss(spark):
    rows = [(i, "yes_marker pad", "en") for i in range(8)]
    rows += [(50 + i, "no_marker pad", "fr") for i in range(8)]
    docs = _docs(spark, rows)

    def loss(iters):
        w = {r["feature"]: r["weight"] for r in
             train_logit(docs, F.col("lang") == "en",
                         ["yes_marker", "no_marker"],
                         iterations=iters, lr=1.0).collect()}
        tot = 0.0
        for y, z in [(1.0, w["__intercept__"] + w["yes_marker"]),
                     (0.0, w["__intercept__"] + w["no_marker"])]:
            p = 1.0 / (1.0 + math.exp(-z))
            tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return tot

    assert loss(6) < loss(2)

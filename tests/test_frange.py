"""FunctionRangeQuery (frange) — doc-set filter context inside the range
scorer: equivalence vs brute force, bound semantics, pruning safety."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparklucene.query import MatchAllDocs, Not, Or, Phrase, Term
from sparklucene.search import frange_docs, search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark):
    from sparklucene.driver_queries import index_for
    return index_for(spark, SF)


def _attrs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars")


def _brute(idx, q, allowed_ids: set, k: int) -> pd.DataFrame:
    """Full match set, python-side filter, re-sorted top-k."""
    full = search(idx, q, k=None, mode="f64").toPandas()
    full = full[full["doc_id"].isin(allowed_ids)]
    return (full.sort_values(["score", "doc_id"],
                             ascending=[False, True])
            .head(k).reset_index(drop=True))


def test_frange_equals_bruteforce(spark, idx):
    attrs = _attrs(spark)
    flt = frange_docs(attrs, F.col("n_chars"), lower=500, upper=2500,
                      incl=True, incu=False)
    allowed = {r["doc_id"] for r in flt.collect()}
    for q in (Or((Term("join"), Term("merge"))),
              Term("merge"),
              Phrase(((0, "merge"), (1, "join"))),
              Not(Or((Term("hash"), Term("scan"))), Term("parallel"))):
        got = search(idx, q, k=10, mode="f64", doc_filter=flt).toPandas()
        want = _brute(idx, q, allowed, 10)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), str(q)
        assert got["score"].tolist() == want["score"].tolist(), str(q)
        assert set(got["doc_id"]) <= allowed


def test_frange_bound_semantics(spark):
    attrs = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, v double")
    def ids(**kw):
        return sorted(r["doc_id"]
                      for r in frange_docs(attrs, F.col("v"), **kw).collect())
    assert ids(lower=3, upper=6) == [3, 4, 5, 6]
    assert ids(lower=3, upper=6, incl=False) == [4, 5, 6]
    assert ids(lower=3, upper=6, incu=False) == [3, 4, 5]
    assert ids(lower=7) == [7, 8, 9]
    assert ids(upper=2) == [0, 1, 2]
    # function expression, not just a raw field
    got = sorted(r["doc_id"] for r in
                 frange_docs(attrs, F.col("v") * 2, lower=10).collect())
    assert got == [5, 6, 7, 8, 9]


def test_frange_prune_invariance_and_excludes(spark, idx):
    attrs = _attrs(spark)
    flt = frange_docs(attrs, F.col("n_chars"), lower=200, upper=3000)
    q = Or((Term("join"), Term("merge"), Term("spark")))
    a = search(idx, q, k=10, mode="f64", prune=True,
               doc_filter=flt).toPandas()
    b = search(idx, q, k=10, mode="f64", prune=False,
               doc_filter=flt).toPandas()
    assert a.values.tolist() == b.values.tolist()
    # exclude_docs composes with the filter (both masks apply)
    top = int(a["doc_id"].iloc[0])
    c = search(idx, q, k=10, mode="f64", doc_filter=flt,
               exclude_docs=[top]).toPandas()
    assert top not in set(c["doc_id"])
    assert c["doc_id"].iloc[0] == a["doc_id"].iloc[1]


def test_frange_matchall(spark, idx):
    attrs = _attrs(spark)
    flt = frange_docs(attrs, F.col("n_chars") % 10, lower=0, upper=2)
    got = search(idx, MatchAllDocs(), k=15, mode="f64",
                 doc_filter=flt).toPandas()
    want = sorted(r["doc_id"] for r in flt.collect())[:15]
    assert got["doc_id"].tolist() == want
    assert (got["score"] == 1.0).all()


def test_frange_empty_filter(spark, idx):
    attrs = _attrs(spark)
    flt = frange_docs(attrs, F.col("n_chars"), lower=10**9)
    assert search(idx, Term("merge"), k=10, mode="f64",
                  doc_filter=flt).count() == 0


# ---------------------------------------------------------------------------
# FeatureField (u8:lucene/core/.../document/FeatureField.java) — additive
# static-rank clauses: log / saturation / sigmoid, clamping, missing docs.
# ---------------------------------------------------------------------------

def _feature_brute(idx, q, feats: dict, fn, weight: float, k: int) -> pd.DataFrame:
    full = search(idx, q, k=None, mode="f64").toPandas()
    full["score"] = full.apply(
        lambda r: r["score"] + weight * fn(max(feats.get(int(r["doc_id"]), 0.0), 0.0)),
        axis=1)
    return (full.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))


@pytest.mark.parametrize("kind,fn,kw", [
    ("log", lambda f: __import__("math").log(1.0 + f), {}),
    ("saturation", lambda f: f / (f + 500.0), {"pivot": 500.0}),
    ("sigmoid", lambda f: f**2 / (f**2 + 800.0**2),
     {"pivot": 800.0, "exponent": 2.0}),
])
def test_feature_query_kinds(spark, idx, kind, fn, kw):
    from sparklucene.search import feature_query
    attrs = _attrs(spark)
    feats = {int(r["doc_id"]): float(r["n_chars"])
             for r in attrs.collect()}
    q = Or((Term("join"), Term("merge")))
    got = feature_query(idx, q, attrs, F.col("n_chars"), kind=kind,
                        weight=1.5, k=12, mode="f64", **kw).toPandas()
    want = _feature_brute(idx, q, feats, fn, 1.5, 12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_exact=False, rtol=1e-12)


def test_feature_query_missing_and_negative_clamped(spark, idx):
    """Docs absent from attrs contribute 0; negative features clamp to 0."""
    from sparklucene.search import feature_query
    q = Or((Term("join"), Term("merge")))
    base = search(idx, q, k=None, mode="f64").toPandas()
    some_id = int(base["doc_id"].iloc[0])
    attrs = spark.createDataFrame([(some_id, -42.0)], "doc_id long, f double")
    got = feature_query(idx, q, attrs, F.col("f"), kind="saturation",
                        weight=9.0, pivot=1.0, k=10, mode="f64").toPandas()
    want = (base.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_exact=False, rtol=1e-12)


def test_feature_query_unknown_kind(spark, idx):
    from sparklucene.search import feature_query
    attrs = _attrs(spark)
    with pytest.raises(ValueError):
        feature_query(idx, Term("join"), attrs, F.col("n_chars"),
                      kind="nope")

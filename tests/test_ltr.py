"""LTR rerank (solr/contrib/ltr analog): feature extraction shapes and
model-score determinism — SURVEY.md §2 rerank/LTR slice."""

from __future__ import annotations

import pytest

from sparklucene.ltr import (FieldValue, LinearModel, OriginalScore,
                             TermMatch, extract_features, ltr_rerank)
from sparklucene.query import Or, Term

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark):
    from sparklucene.driver_queries import index_for
    return index_for(spark, SF)


def _attrs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars")


def test_feature_extraction(spark, idx):
    feats = (OriginalScore("orig"),
             FieldValue("len_norm", norm=(0.0, 5000.0), col="n_chars"),
             TermMatch("has_fast", term="fast"))
    out = extract_features(idx, Or((Term("join"), Term("merge"))), feats,
                           rerank_k=20, attrs=_attrs(spark)).toPandas()
    assert len(out) == 20
    assert set(out.columns) == {"doc_id", "orig_score", "orig", "len_norm",
                                "has_fast"}
    # OriginalScore passes the first-pass score through unchanged
    assert (out["orig"] == out["orig_score"]).all()
    # normalizer constants, not data-derived: 0 <= len_norm (docs <= 5000
    # chars in the fixture keeps it <= 1, but the bound is NOT clamped)
    assert (out["len_norm"] >= 0).all()
    # term-match flag is exactly 0/1 and agrees with a direct probe
    assert set(out["has_fast"].unique()) <= {0.0, 1.0}
    from sparklucene.search import matches
    fast_ids = {r["doc_id"]
                for r in matches(idx, Term("fast")).collect()}
    for _, r in out.iterrows():
        assert (r["has_fast"] == 1.0) == (r["doc_id"] in fast_ids)


def test_linear_rerank_changes_order_deterministically(spark, idx):
    q = Or((Term("join"), Term("merge")))
    feats = (OriginalScore("orig"),
             FieldValue("len_norm", norm=(0.0, 5000.0), col="n_chars"))
    # weight that punishes length hard enough to reorder
    model = LinearModel((("orig", 1.0), ("len_norm", -2.0)))
    a = ltr_rerank(idx, q, feats, model, k=10, rerank_k=50,
                   attrs=_attrs(spark)).toPandas()
    assert len(a) == 10
    # ltr_score equals the model applied to the feature columns
    expect = 1.0 * a["orig"] + (-2.0) * a["len_norm"]
    assert (a["ltr_score"] == expect).all()
    # deterministic across a repartitioned attrs input
    b = ltr_rerank(idx, q, feats, model, k=10, rerank_k=50,
                   attrs=_attrs(spark).repartition(7)).toPandas()
    assert a.values.tolist() == b.values.tolist()
    # the rerank window bound matters: identity model == first pass
    ident = LinearModel((("orig", 1.0),))
    c = ltr_rerank(idx, q, (OriginalScore("orig"),), ident, k=10,
                   rerank_k=50).toPandas()
    from sparklucene.search import search
    d = search(idx, q, k=10, mode="f64").toPandas()
    assert c["doc_id"].tolist() == d["doc_id"].tolist()


def test_model_validation(spark, idx):
    with pytest.raises(ValueError, match="undeclared"):
        ltr_rerank(idx, Term("merge"), (OriginalScore("orig"),),
                   LinearModel((("nope", 1.0),)), k=5, rerank_k=10)
    with pytest.raises(ValueError, match="attrs"):
        extract_features(idx, Term("merge"),
                         (FieldValue("f", col="n_chars"),), 5)


def _demo_trees():
    from sparklucene.ltr import AdditiveTreesModel, TreeNode
    t1 = TreeNode(feature="len_norm", threshold=0.3,
                  left=TreeNode(feature="has_fast", threshold=0.5,
                                left=TreeNode(value=0.1),
                                right=TreeNode(value=0.6)),
                  right=TreeNode(feature="orig", threshold=2.0,
                                 left=TreeNode(value=-0.2),
                                 right=TreeNode(value=0.3)))
    t2 = TreeNode(feature="orig", threshold=1.5,
                  left=TreeNode(value=0.0),
                  right=TreeNode(feature="len_norm", threshold=0.45,
                                 left=TreeNode(value=0.8),
                                 right=TreeNode(value=0.2)))
    return AdditiveTreesModel(((1.0, t1), (0.5, t2)))


def _route(node, row):
    # independent pandas-side mirror of RegressionTreeNode routing
    while node.value is None:
        node = node.left if row[node.feature] <= node.threshold \
            else node.right
    return node.value


def test_additive_trees_rerank(spark, idx):
    q = Or((Term("join"), Term("merge")))
    feats = (OriginalScore("orig"),
             FieldValue("len_norm", norm=(0.0, 5000.0), col="n_chars"),
             TermMatch("has_fast", term="fast"))
    model = _demo_trees()
    out = ltr_rerank(idx, q, feats, model, k=10, rerank_k=50,
                     attrs=_attrs(spark)).toPandas()
    assert len(out) == 10
    # ensemble score == weight-summed leaf values routed per row
    for _, r in out.iterrows():
        expect = sum(w * _route(root, r) for w, root in model.trees)
        assert r["ltr_score"] == expect
    # sorted by (ltr_score desc, doc_id asc) with ties broken by id
    keys = list(zip(-out["ltr_score"], out["doc_id"]))
    assert keys == sorted(keys)
    # determinism across attrs layout
    again = ltr_rerank(idx, q, feats, model, k=10, rerank_k=50,
                       attrs=_attrs(spark).repartition(5)).toPandas()
    assert out.values.tolist() == again.values.tolist()


def test_tree_node_validation(spark, idx):
    from sparklucene.ltr import AdditiveTreesModel, TreeNode
    with pytest.raises(ValueError, match="leaf"):
        AdditiveTreesModel(
            ((1.0, TreeNode(value=1.0, feature="x")),))._feature_names()
    with pytest.raises(ValueError, match="split"):
        AdditiveTreesModel(
            ((1.0, TreeNode(feature="x", threshold=1.0,
                            left=TreeNode(value=0.0))),))._feature_names()
    # a tree referencing an undeclared feature is rejected at rerank time
    bad = AdditiveTreesModel(((1.0, TreeNode(feature="nope", threshold=0.0,
                                             left=TreeNode(value=0.0),
                                             right=TreeNode(value=1.0))),))
    with pytest.raises(ValueError, match="undeclared"):
        ltr_rerank(idx, Term("merge"), (OriginalScore("orig"),), bad,
                   k=5, rerank_k=10)


def test_model_json_roundtrip_scores_equal(spark):
    """A Solr LTR model JSON loads into the same rerank scores as the
    directly-constructed model (the /schema/model-store surface)."""
    import json
    from sparklucene.ltr import (AdditiveTreesModel, LinearModel, TreeNode,
                                 load_model_json)
    direct = LinearModel((("a", 0.5), ("b", 2.0)), intercept=0.25)
    loaded, names = load_model_json(json.dumps({
        "class": "org.apache.solr.ltr.model.LinearModel",
        "name": "m", "features": [{"name": "a"}, {"name": "b"}],
        "params": {"weights": {"a": 0.5, "b": 2.0}, "intercept": 0.25}}))
    assert loaded == direct and set(names) == {"a", "b"}
    droot = TreeNode(feature="a", threshold=1.5,
                     left=TreeNode(value=-1.0), right=TreeNode(value=3.0))
    dtrees = AdditiveTreesModel(((0.7, droot),))
    ltrees, _ = load_model_json({
        "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
        "features": [{"name": "a"}],
        "params": {"trees": [{"weight": 0.7, "root": {
            "feature": "a", "threshold": 1.5,
            "left": {"value": -1.0}, "right": {"value": 3.0}}}]}})
    assert ltrees == dtrees
    import pytest
    with pytest.raises(ValueError, match="unsupported"):
        load_model_json({"class": "x.NeuralModel", "params": {}})

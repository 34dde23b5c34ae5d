"""Learning-to-rank rerank — Solr's LTR contrib on DataFrames.

The reference ships a rerank plugin (public knowledge:
``u8:solr/contrib/ltr/.../LTRScoringQuery.java``, ``LTRRescorer.java``,
``feature/OriginalScoreFeature.java``, ``feature/FieldValueFeature.java``,
``feature/SolrFeature.java``, ``model/LinearModel.java``,
``norm/MinMaxNormalizer.java``): the main query retrieves a first-pass
top-N, declared features are extracted per candidate, and a trained model
re-scores the window; only the top-k of the re-scored window is returned.

This engine pins the same three-stage shape:

1. **First pass** — the engine's normal distributed top-k (``search`` in
   f64 parity mode), bounded by ``rerank_k`` (Solr's ``reRankDocs``).
2. **Feature extraction** — each feature is a Catalyst expression or a
   k-bounded broadcast join; nothing data-proportional:
   * ``OriginalScore``  — the first-pass score (OriginalScoreFeature).
   * ``FieldValue``     — a stored doc attribute from a caller-supplied
     attributes relation, ``default`` when absent (FieldValueFeature).
   * ``TermMatch``      — 1.0 if the doc matches a term, else 0.0 (the
     degenerate SolrFeature ``fq=term``; resolved via the index's
     postings, k-bounded semi-join).
   Features may carry a MinMax normalizer ``norm=(lo, hi)`` — CONSTANTS
   stored with the model exactly as the reference serializes normalizer
   params in the model JSON, never derived from the data at query time.
3. **Model scoring** — ``LinearModel``: score = sum(weight_i * f_i) in
   declaration order + intercept, evaluated in float64 with a fixed
   expression tree (cross-engine bit-reproducible); ties break by doc_id
   asc (the reference's tie on equal rerank score is the original doc
   order, which for this engine's deterministic first pass is doc_id).

Scale shape: the rerank window is an operator constant — every stage
after the first pass touches <= rerank_k rows, so feature joins broadcast
the hit side and the final sort is a TakeOrderedAndProject, never a
global sort. The first pass keeps all of the engine's pruning (WAND /
MAXSCORE) because model scoring never changes WHICH docs are candidates,
only their order — same contract as LTRRescorer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparklucene.query import Query, Term
from sparklucene.search import Index, matches, search


@dataclass(frozen=True)
class Feature:
    name: str
    #: optional MinMax normalizer constants (lo, hi) — applied to the raw
    #: value as (v - lo) / (hi - lo) BEFORE the model weight, matching
    #: the reference's MinMaxNormalizer
    norm: tuple[float, float] | None = None

    def _normed(self, col: Column) -> Column:
        if self.norm is None:
            return col
        lo, hi = float(self.norm[0]), float(self.norm[1])
        return (col - F.lit(lo)) / F.lit(hi - lo)


@dataclass(frozen=True)
class OriginalScore(Feature):
    pass


@dataclass(frozen=True)
class FieldValue(Feature):
    col: str = ""
    default: float = 0.0


@dataclass(frozen=True)
class TermMatch(Feature):
    term: str = ""
    field: str | None = None


@dataclass(frozen=True)
class LinearModel:
    """model/LinearModel.java: weighted sum of (normalized) features.
    ``weights`` maps feature name -> weight; every weight must reference
    a declared feature. Features without a weight contribute 0 (the
    reference requires full coverage; the relaxation is documented)."""
    weights: tuple[tuple[str, float], ...]
    intercept: float = 0.0

    def _feature_names(self) -> set[str]:
        return {n for n, _ in self.weights}

    def _score(self) -> Column:
        score: Column = F.lit(float(self.intercept))
        for name, w in self.weights:
            score = score + F.lit(float(w)) * F.col(name)
        return score


@dataclass(frozen=True)
class TreeNode:
    """One node of a regression tree (the reference's
    ``model/MultipleAdditiveTreesModel.java`` RegressionTreeNode): a LEAF
    carries ``value``; a SPLIT routes ``feature <= threshold`` to
    ``left``, else to ``right`` — exactly the reference's branching
    predicate, so a value equal to the threshold goes left."""
    value: float | None = None
    feature: str | None = None
    threshold: float | None = None
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None

    def _validate(self) -> None:
        if self.value is not None:
            if (self.feature is not None or self.left is not None
                    or self.right is not None):
                raise ValueError("leaf nodes carry only a value")
            return
        if (self.feature is None or self.threshold is None
                or self.left is None or self.right is None):
            raise ValueError("split nodes need feature, threshold, left "
                             "and right")
        self.left._validate()
        self.right._validate()

    def _features(self) -> set[str]:
        if self.value is not None:
            return set()
        return ({self.feature} | self.left._features()
                | self.right._features())

    def _col(self) -> Column:
        # the whole tree folds into ONE nested CASE expression — pure
        # Catalyst, evaluated inside whole-stage codegen on the k-bounded
        # rerank window; no Python per row
        if self.value is not None:
            return F.lit(float(self.value))
        return F.when(F.col(self.feature) <= F.lit(float(self.threshold)),
                      self.left._col()).otherwise(self.right._col())


@dataclass(frozen=True)
class AdditiveTreesModel:
    """model/MultipleAdditiveTreesModel.java (the reference LTR contrib's
    GBDT/LambdaMART ensemble format): ``score = sum_t weight_t * leaf_t``
    where ``leaf_t`` is the value reached by routing the (normalized)
    feature vector down tree ``t``. Trees are summed in declaration order
    with float64 arithmetic — a fixed expression tree, cross-engine
    bit-reproducible like LinearModel."""
    trees: tuple[tuple[float, TreeNode], ...]

    def _feature_names(self) -> set[str]:
        names: set[str] = set()
        for _, root in self.trees:
            root._validate()
            names |= root._features()
        return names

    def _score(self) -> Column:
        score: Column = F.lit(0.0)
        for w, root in self.trees:
            score = score + F.lit(float(w)) * root._col()
        return score


def extract_features(index: Index, query: str | Query,
                     features: tuple[Feature, ...], rerank_k: int,
                     attrs: DataFrame | None = None) -> DataFrame:
    """First-pass top-``rerank_k`` plus one float64 column per feature.

    ``attrs`` supplies FieldValue columns, keyed by doc_id (the stored-
    fields relation; the engine's two-phase hydration shape)."""
    hits = search(index, query, k=rerank_k, mode="f64") \
        .select("doc_id", F.col("score").alias("_ltr_orig"))
    field_cols = [f.col for f in features if isinstance(f, FieldValue)]
    if field_cols:
        if attrs is None:
            raise ValueError("FieldValue features require an attrs "
                             "DataFrame keyed by doc_id")
        hits = (hits.hint("broadcast")
                .join(attrs.select("doc_id", *dict.fromkeys(field_cols)),
                      "doc_id", "left"))
    out_cols: list[Column] = []
    for f in features:
        if isinstance(f, OriginalScore):
            raw = F.col("_ltr_orig")
        elif isinstance(f, FieldValue):
            raw = F.coalesce(F.col(f.col).cast("double"),
                             F.lit(float(f.default)))
        elif isinstance(f, TermMatch):
            # the term's full match set is df-sized; shrink it to the
            # rerank window (broadcast the k-bounded hit ids INTO the
            # postings scan) before the flag join, so nothing df-sized
            # is ever broadcast
            tm = (matches(index, Term(f.term, field=f.field))
                  .select("doc_id")
                  .join(F.broadcast(hits.select("doc_id")), "doc_id",
                        "left_semi")
                  .withColumn(f"_tm_{f.name}", F.lit(1.0)))
            hits = hits.join(F.broadcast(tm), "doc_id", "left")
            raw = F.coalesce(F.col(f"_tm_{f.name}"), F.lit(0.0))
        else:
            raise ValueError(f"unknown feature type {type(f).__name__}")
        out_cols.append(f._normed(raw.cast("double")).alias(f.name))
    return hits.select("doc_id", F.col("_ltr_orig").alias("orig_score"),
                       *out_cols)


def ltr_rerank(index: Index, query: str | Query,
               features: tuple[Feature, ...],
               model: LinearModel | AdditiveTreesModel,
               k: int, rerank_k: int,
               attrs: DataFrame | None = None) -> DataFrame:
    """LTRRescorer: rerank the first-pass top-``rerank_k`` with the model
    (LinearModel or AdditiveTreesModel), return top-``k`` by
    (ltr_score desc, doc_id asc) with the feature vector attached (Solr's
    ``fl=[features]`` debug shape)."""
    names = {f.name for f in features}
    unknown = sorted(model._feature_names() - names)
    if unknown:
        raise ValueError(f"model weights reference undeclared features: "
                         f"{unknown}")
    feats = extract_features(index, query, features, rerank_k, attrs)
    return (feats.withColumn("ltr_score", model._score().cast("double"))
            .orderBy(F.desc("ltr_score"), F.asc("doc_id"))
            .limit(k))


def load_model_json(payload: "str | dict"):
    """Parse a Solr LTR model JSON document into an engine model —
    the store format users PUT to ``/schema/model-store`` (public
    knowledge: u8:solr/contrib/ltr/.../store/rest/ManagedModelStore.java
    and the reference guide's model JSON examples).

    Supported classes:
    * ``...ltr.model.LinearModel`` — ``params.weights`` {feature: w};
      an optional non-standard ``params.intercept`` is honored (0.0
      default, matching the reference which has none).
    * ``...ltr.model.MultipleAdditiveTreesModel`` — ``params.trees``:
      [{weight, root}] where a node is either a split
      {feature, threshold, left, right} or a leaf {value}.

    The ``features`` list is returned as declared names so callers can
    check coverage against their Feature declarations; normalizers
    travel WITH features in Solr's store, so they stay on the engine's
    Feature objects, not the model.
    """
    import json as _json

    doc = _json.loads(payload) if isinstance(payload, str) else payload
    cls = doc.get("class", "")
    params = doc.get("params", {})
    names = tuple(f["name"] for f in doc.get("features", ()))
    if cls.endswith("LinearModel"):
        weights = tuple(sorted(
            (str(k), float(v))
            for k, v in params.get("weights", {}).items()))
        model = LinearModel(weights,
                            intercept=float(params.get("intercept", 0.0)))
        return model, names
    if cls.endswith("MultipleAdditiveTreesModel"):
        def node(d: dict) -> TreeNode:
            if "value" in d:
                return TreeNode(value=float(d["value"]))
            return TreeNode(feature=str(d["feature"]),
                            threshold=float(d["threshold"]),
                            left=node(d["left"]), right=node(d["right"]))
        trees = tuple((float(t["weight"]), node(t["root"]))
                      for t in params.get("trees", ()))
        model = AdditiveTreesModel(trees)
        return model, names
    raise ValueError(f"unsupported LTR model class: {cls!r}")

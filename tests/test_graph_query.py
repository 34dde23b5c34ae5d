"""{!graph} fixpoint traversal (streams.graph_query) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklucene.streams import graph_query


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, parent long")


def _got(df):
    return [(r["id"], r["level"]) for r in df.collect()]


def test_tree_descendants_to_fixpoint(spark):
    # 1 -> {2,3}, 2 -> {4}, 3 -> {5}; 9 is an unrelated island
    docs = _docs(spark, [(1, 0), (2, 1), (3, 1), (4, 2), (5, 3), (9, 8)])
    out = graph_query(docs, F.col("id") == 1, "id", "id", "parent")
    assert _got(out) == [(1, 0), (2, 1), (3, 1), (4, 2), (5, 2)]


def test_max_depth_caps_traversal(spark):
    docs = _docs(spark, [(1, 0), (2, 1), (3, 2), (4, 3)])
    out = graph_query(docs, F.col("id") == 1, "id", "id", "parent",
                      max_depth=2)
    assert _got(out) == [(1, 0), (2, 1), (3, 2)]


def test_cycle_terminates_with_min_levels(spark):
    # 1 -> 2 -> 3 -> 1 (cycle back to the root)
    docs = _docs(spark, [(1, 3), (2, 1), (3, 2)])
    out = graph_query(docs, F.col("id") == 1, "id", "id", "parent")
    assert _got(out) == [(1, 0), (2, 1), (3, 2)]


def test_diamond_keeps_minimal_level(spark):
    # 1 -> {2, 3}; both 2 and 3 -> 4 (two rows for doc 4, one per parent
    # link — multi-valued 'to' field flattened); 4 first reached at 2
    docs = _docs(spark, [(1, 0), (2, 1), (3, 1), (4, 2), (4, 3)])
    out = graph_query(docs, F.col("id") == 1, "id", "id", "parent")
    assert _got(out) == [(1, 0), (2, 1), (3, 1), (4, 2)]


def test_no_roots_empty(spark):
    docs = _docs(spark, [(1, 0)])
    assert graph_query(docs, F.col("id") == 99, "id", "id",
                       "parent").count() == 0

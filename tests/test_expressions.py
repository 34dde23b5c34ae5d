"""Expressions compiler (expressions.py) — grammar, validation, sort."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparklucene.expressions import (ExpressionError, compile_expression,
                                     expression_sort)


B = {"_score", "x", "n_chars"}


def test_canonical_emission_pins_precedence():
    c = compile_expression("_score + ln(1.0 + n_chars) * 0.25", B)
    assert c.sql == ("(_score + (ln((CAST(1.0 AS DOUBLE) + n_chars)) * "
                     "CAST(0.25 AS DOUBLE)))")
    assert c.variables == ("_score", "n_chars")


def test_unary_minus_integer_promotion_and_nesting():
    c = compile_expression("-x * (2 + 3.5) / greatest(x, 1)", B)
    assert c.sql == ("(((- x) * (CAST(2.0 AS DOUBLE) + CAST(3.5 AS DOUBLE)))"
                     " / greatest(x, CAST(1.0 AS DOUBLE)))")


def test_unknown_variable_rejected():
    with pytest.raises(ExpressionError, match="unbound variable 'evil'"):
        compile_expression("evil + 1", B)


def test_unknown_function_rejected():
    with pytest.raises(ExpressionError, match="unknown function"):
        compile_expression("system(x)", B)


def test_bad_syntax_rejected():
    for bad in ["x +", "(x", "x)", "x ; drop", "1 2", "x ** 2"]:
        with pytest.raises(ExpressionError):
            compile_expression(bad, B)


def test_compiled_column_evaluates(spark):
    df = spark.createDataFrame([(1, 4.0)], "doc_id long, x double")
    c = compile_expression("sqrt(x) + pow(x, 2.0) - abs(-x)", {"x"})
    got = df.select(c.column().alias("v")).collect()[0]["v"]
    assert got == 2.0 + 16.0 - 4.0


def test_expression_sort_reorders_by_attribute(spark):
    from sparklucene.driver_queries import index_for
    idx = index_for(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    attrs = docs.select("doc_id", "n_chars")
    # attribute-only sort ignores relevance entirely: top hit must be the
    # longest matching doc
    out = expression_sort(idx, "merge", attrs, "1.0 * n_chars", k=3,
                          mode="f64").collect()
    lens = {r["doc_id"]: r["n_chars"] for r in attrs.collect()}
    from sparklucene.search import matches
    matched = [r["doc_id"] for r in
               matches(idx, "merge", mode="f64").collect()]
    want = sorted(matched, key=lambda d: (-lens[d], d))[:3]
    assert [r["doc_id"] for r in out] == want


def test_constant_subtree_stays_float64(spark):
    """Bare decimal literals parse as DECIMAL in Spark SQL, so an
    unpinned constant division (100.0/3.25) would constant-fold in
    scale-limited decimal arithmetic (30.269231) instead of IEEE f64
    (30.269230769230766...) — the CAST(... AS DOUBLE) literal pinning
    keeps every engine on the same float64 tree (fuzz seed 99102)."""
    c = compile_expression("100 / 3.25 - 0.5", B)
    got = spark.range(1).select(c.column().alias("v")).collect()[0]["v"]
    assert got == 100.0 / 3.25 - 0.5

"""Multi-select faceting (facets.multiselect_facets) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparklucene.facets import multiselect_facets


def _base(spark):
    return spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "fr", "a"), (4, "de", "a"),
         (5, "de", "b")],
        "doc_id long, lang string, source string")


def test_each_facet_lifts_only_its_own_filter(spark):
    base = _base(spark)
    out = multiselect_facets(
        base,
        filters={"L": F.col("lang") == "en", "S": F.col("source") == "a"},
        facets={"lang": {"L"}, "source": {"S"}})
    rows = [(r["facet_field"], r["value"], r["cnt"]) for r in out.collect()]
    # lang facet: source='a' applied, lang filter lifted -> en:1 fr:1 de:1
    # source facet: lang='en' applied, source filter lifted -> a:1 b:1
    assert rows == [("lang", "de", 1), ("lang", "en", 1), ("lang", "fr", 1),
                    ("source", "a", 1), ("source", "b", 1)]


def test_facet_with_no_exclusions_applies_all_filters(spark):
    base = _base(spark)
    out = multiselect_facets(
        base, filters={"L": F.col("lang") == "en"},
        facets={"source": set()})
    rows = [(r["value"], r["cnt"]) for r in out.collect()]
    assert rows == [("a", 1), ("b", 1)]


def test_no_filters_counts_everything(spark):
    out = multiselect_facets(_base(spark), filters={},
                             facets={"lang": set()})
    rows = [(r["value"], r["cnt"]) for r in out.collect()]
    assert rows == [("de", 2), ("en", 2), ("fr", 1)]

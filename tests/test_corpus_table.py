"""load_corpus_table — the catalog-table (Iceberg-shape) corpus source.

BASELINE.json input_hint pins the production input as an Iceberg table
(repo, path, commit, lang, content); `spark.read.table` is the identical
code path with an Iceberg catalog configured, so these tests exercise it
against temp views (the sandbox ships no Iceberg jars).
"""

import pytest

from sparklucene.corpus import CORPUS_COLS, load_corpus, load_corpus_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_view(spark):
    load_corpus(spark, SF).createOrReplaceTempView("corpus_tbl")
    yield "corpus_tbl"
    spark.catalog.dropTempView("corpus_tbl")


def test_table_load_preserves_corpus(spark, corpus_view):
    via_table = load_corpus_table(spark, corpus_view)
    via_path = load_corpus(spark, SF)
    assert via_table.columns == CORPUS_COLS
    assert via_table.schema == via_path.schema
    assert via_table.exceptAll(via_path).count() == 0
    assert via_path.exceptAll(via_table).count() == 0


def test_table_load_assigns_dense_ids(spark, corpus_view):
    spark.sql(
        "SELECT repo, path, commit, lang, content FROM corpus_tbl"
    ).createOrReplaceTempView("corpus_tbl_noid")
    try:
        df = load_corpus_table(spark, "corpus_tbl_noid")
        n = df.count()
        ids = [r.doc_id for r in df.select("doc_id").collect()]
        assert sorted(ids) == list(range(n))
        again = [r.doc_id for r in
                 load_corpus_table(spark, "corpus_tbl_noid")
                 .select("doc_id").collect()]
        assert sorted(again) == sorted(ids)
    finally:
        spark.catalog.dropTempView("corpus_tbl_noid")


def test_table_load_prunes_extra_columns(spark, corpus_view):
    spark.sql(
        "SELECT *, length(content) AS extra_len FROM corpus_tbl"
    ).createOrReplaceTempView("corpus_tbl_extra")
    try:
        df = load_corpus_table(spark, "corpus_tbl_extra")
        assert df.columns == CORPUS_COLS
    finally:
        spark.catalog.dropTempView("corpus_tbl_extra")


def test_table_load_missing_column_raises(spark, corpus_view):
    spark.sql(
        "SELECT repo, path, lang, content FROM corpus_tbl"
    ).createOrReplaceTempView("corpus_tbl_bad")
    try:
        with pytest.raises(ValueError, match="commit"):
            load_corpus_table(spark, "corpus_tbl_bad")
    finally:
        spark.catalog.dropTempView("corpus_tbl_bad")

"""Index-time sort + early-terminating top-k (sorted_index module):
equality vs full sort, file-prefix pruning, boundary-tie exactness."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparklucene.sorted_index import build_sorted_view, plan_files, sorted_topk

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "n_chars", "lang"))


def _brute(spark, k, ascending=True):
    key = F.col("n_chars").asc() if ascending else F.col("n_chars").desc()
    return (_docs(spark).orderBy(key, F.col("doc_id").asc())
            .limit(k).toPandas().reset_index(drop=True))


@pytest.mark.parametrize("ascending", [True, False])
def test_sorted_topk_matches_full_sort(spark, tmp_path, ascending):
    d = str(tmp_path / f"view-{ascending}")
    build_sorted_view(_docs(spark), d, "n_chars", ascending=ascending,
                      n_partitions=8)
    got = sorted_topk(spark, d, 25).toPandas().reset_index(drop=True)
    want = _brute(spark, 25, ascending)
    pd.testing.assert_frame_equal(got, want)


def test_early_termination_reads_file_prefix(spark, tmp_path):
    d = str(tmp_path / "view")
    m = build_sorted_view(_docs(spark), d, "n_chars", n_partitions=8)
    n_files = len(m["files"])
    assert n_files >= 4  # range partitioning actually spread the view
    chosen, _ = plan_files(d, 10)
    assert len(chosen) < n_files  # k=10 must not read the whole view
    # and k > total rows degrades to reading everything, still correct
    total = m["total_rows"]
    chosen_all, _ = plan_files(d, total + 5)
    assert len(chosen_all) == n_files
    got = sorted_topk(spark, d, total + 5).toPandas()
    assert len(got) == total


def test_boundary_ties_stay_exact(spark, tmp_path):
    """Duplicate sort keys straddling file boundaries: the doc_id
    tiebreak must stay global, so cutoff-sharing files are included."""
    rows = [(i, i // 40) for i in range(400)]  # 40-doc runs per key
    df = spark.createDataFrame(rows, "doc_id long, key long")
    d = str(tmp_path / "ties")
    build_sorted_view(df, d, "key", n_partitions=16)
    for k in (1, 39, 40, 41, 95):
        got = sorted_topk(spark, d, k).toPandas().reset_index(drop=True)
        want = (df.orderBy(F.col("key").asc(), F.col("doc_id").asc())
                .limit(k).toPandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_null_sort_key_rejected(spark, tmp_path):
    df = spark.createDataFrame([(0, 1), (1, None)], "doc_id long, key long")
    with pytest.raises(ValueError, match="null"):
        build_sorted_view(df, str(tmp_path / "n"), "key")


def test_string_sort_key(spark, tmp_path):
    d = str(tmp_path / "s")
    build_sorted_view(_docs(spark), d, "lang", n_partitions=4)
    got = sorted_topk(spark, d, 15).toPandas().reset_index(drop=True)
    want = (_docs(spark).orderBy(F.col("lang").asc(), F.col("doc_id").asc())
            .limit(15).toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert os.path.exists(os.path.join(d, "manifest.json"))


def test_filtered_topk_matches_full_sort_and_rare_filter(spark, tmp_path):
    from sparklucene.sorted_index import build_sorted_view, sorted_topk_filtered
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "n_chars", "lang"))
    d = str(tmp_path / "fview")
    build_sorted_view(docs, d, "n_chars", n_partitions=8)
    for pred, k in [(F.col("lang") == "en", 15),
                    (F.col("doc_id") % 97 == 0, 4),   # rare: forces growth
                    (F.col("doc_id") < 0, 3)]:        # empty survivor set
        got = (sorted_topk_filtered(spark, d, k, pred)
               .toPandas().reset_index(drop=True))
        want = (docs.filter(pred)
                .orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
                .limit(k).toPandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

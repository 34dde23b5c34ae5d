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


# --------------------------------------------------------------------------
# date range facet (facets.range_facet_date) — gap / hardend / other
# --------------------------------------------------------------------------

def _events(spark):
    rows = [(i, f"2024-01-{d:02d} 12:00:00") for i, d in enumerate(
        [1, 2, 3, 3, 8, 9, 14, 20, 23, 25, 28, 30])]
    return spark.createDataFrame(rows, "event_id long, ts_s string") \
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))


def test_date_range_hardend_false_extends_last_bucket(spark):
    from sparklucene.facets import range_facet_date
    out = {r["bucket"]: r["cnt"] for r in range_facet_date(
        _events(spark), "ts", "2024-01-03 00:00:00",
        "2024-01-24 00:00:00", 6, hardend=False).collect()}
    # buckets: 01-03, 01-09, 01-15, 01-21 (last is FULL width -> ends
    # 01-27, so the 01-25 event is INSIDE it and `after` starts 01-27)
    assert out["2024-01-03 00:00:00"] == 3   # days 3, 3, 8
    assert out["2024-01-09 00:00:00"] == 2   # 9, 14
    assert out["2024-01-15 00:00:00"] == 1   # 20
    assert out["2024-01-21 00:00:00"] == 2   # 23, 25
    assert out["before"] == 2 and out["after"] == 2  # 1,2 | 28,30
    assert out["between"] == 8


def test_date_range_hardend_true_clips_at_end(spark):
    from sparklucene.facets import range_facet_date
    out = {r["bucket"]: r["cnt"] for r in range_facet_date(
        _events(spark), "ts", "2024-01-03 00:00:00",
        "2024-01-24 00:00:00", 6, hardend=True).collect()}
    # hardend: range ends at 01-24 exactly; the 01-25 event is `after`
    assert out["2024-01-21 00:00:00"] == 1   # 23 only
    assert out["after"] == 3                 # 25, 28, 30
    assert out["between"] == 7


def test_date_range_zero_count_buckets_present(spark):
    from sparklucene.facets import range_facet_date
    df = _events(spark).filter(F.col("event_id") == 0)  # one event, day 1
    out = {r["bucket"]: r["cnt"] for r in range_facet_date(
        df, "ts", "2024-01-03 00:00:00", "2024-01-24 00:00:00", 6).collect()}
    assert out["2024-01-03 00:00:00"] == 0
    assert out["2024-01-15 00:00:00"] == 0
    assert out["before"] == 1 and out["between"] == 0


def test_date_range_counts_partition_total(spark):
    """other=all partitions the table: before + between + after == rows,
    and the bucket spine sums to between — for arbitrary gap/ends."""
    from sparklucene.facets import range_facet_date
    ev = _events(spark)
    total = ev.count()
    for gap, end in ((2, "2024-01-20 00:00:00"), (5, "2024-01-29 12:00:00")):
        out = {r["bucket"]: r["cnt"] for r in range_facet_date(
            ev, "ts", "2024-01-02 06:00:00", end, gap).collect()}
        others = out["before"] + out["between"] + out["after"]
        assert others == total
        bucket_sum = sum(v for k, v in out.items()
                         if k not in ("before", "between", "after"))
        assert bucket_sum == out["between"]


def _pct_corpus(spark):
    # 2 groups x 500 rows with a known value ladder (value == rank), so
    # exact percentiles are analytic: qP(g) == P * 499 (+ offset).
    rows = [(g * 1000 + i, "g%d" % g, g * 10000 + i)
            for g in (0, 1) for i in range(500)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long")


def test_percentile_sketch_native_tracks_exact(spark):
    from sparklucene.facets import percentile_sketch
    docs = _pct_corpus(spark)
    out = {r["lang"]: r for r in percentile_sketch(
        docs, "n_chars", by="lang", probs=(0.5,),
        method="native").collect()}
    for g in (0, 1):
        exact = g * 10000 + 0.5 * 499
        # GK sketch at accuracy=10000 on 500 rows is near-exact: the
        # estimate must land within one rank of the true median.
        assert abs(out["g%d" % g]["q50_est"] - exact) <= 1.0
        assert out["g%d" % g]["sample_n"] == 500


def test_percentile_sketch_sampled_is_partition_invariant(spark):
    from sparklucene.facets import percentile_sketch
    docs = _pct_corpus(spark)
    a = percentile_sketch(docs.repartition(1), "n_chars", by="lang",
                          fraction=0.3).collect()
    b = percentile_sketch(docs.repartition(16), "n_chars", by="lang",
                          fraction=0.3).collect()
    # membership is a pure function of md5(salt || doc_id): identical
    # estimates and sample sizes under any partitioning
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    n = {r["lang"]: r["sample_n"] for r in a}
    for g in ("g0", "g1"):  # ~30% of 500, binomial 3-sigma bounds
        assert 100 <= n[g] <= 200


def test_percentile_sketch_rejects_unknown_method(spark):
    import pytest
    from sparklucene.facets import percentile_sketch
    with pytest.raises(ValueError):
        percentile_sketch(_pct_corpus(spark), "n_chars", by="lang",
                          method="tdigest")


# ---------------------------------------------------------------------------
# mergeable HLL distinct sketch (Solr HLLAgg shard-merge parity)
# ---------------------------------------------------------------------------

def _hll_corpus(spark, n=3000, card=400):
    # value v_i repeats: true distinct = card per group, split 2 groups
    rows = [(i, f"g{i % 2}", f"v{i % card}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, grp string, val string")


def test_hll_estimate_within_error_bound(spark):
    from sparklucene.facets import hll_sketch_distinct
    df = _hll_corpus(spark)
    out = {r["grp"]: r["distinct_est"]
           for r in hll_sketch_distinct(df, "val", by="grp").collect()}
    exact = {r["grp"]: r["cnt"] for r in
             df.groupBy("grp").agg(
                 F.countDistinct("val").alias("cnt")).collect()}
    assert set(out) == set(exact)
    for g, est in out.items():
        # lg_k=12 -> RSE ~1.6 %; 5 sigma-ish bound, generous + stable
        assert abs(est - exact[g]) <= max(3, int(0.08 * exact[g])), \
            (g, est, exact[g])


def test_hll_shard_merge_equals_single_pass(spark):
    """Union of per-shard sketches == whole-corpus sketch estimate —
    the distributed-merge invariant (shard count/order irrelevant)."""
    from sparklucene.facets import (hll_sketch_distinct,
                                    hll_sketch_merge, hll_sketch_partial)
    df = _hll_corpus(spark)
    whole = {r["grp"]: r["distinct_est"]
             for r in hll_sketch_distinct(df, "val", by="grp").collect()}
    # 3 deliberately skewed "shards"
    shards = [df.filter(F.col("doc_id") % 7 < 2),
              df.filter(F.col("doc_id") % 7 == 2),
              df.filter(F.col("doc_id") % 7 > 2)]
    parts = [hll_sketch_partial(s, "val", by="grp") for s in shards]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = {r["grp"]: r["distinct_est"]
              for r in hll_sketch_merge(u, by="grp").collect()}
    assert merged == whole
    # shard order must not matter (register-wise max is commutative)
    u2 = parts[2].unionByName(parts[0]).unionByName(parts[1])
    merged2 = {r["grp"]: r["distinct_est"]
               for r in hll_sketch_merge(u2, by="grp").collect()}
    assert merged2 == whole


def test_hll_partition_invariance_and_ungrouped(spark):
    from sparklucene.facets import hll_sketch_distinct
    df = _hll_corpus(spark, n=1000, card=137)
    a = hll_sketch_distinct(df.repartition(13), "val").collect()[0]
    b = hll_sketch_distinct(df.coalesce(1), "val").collect()[0]
    assert a["distinct_est"] == b["distinct_est"]


def test_hll_empty_and_null_input(spark):
    from sparklucene.facets import hll_sketch_distinct
    empty = spark.createDataFrame([], "doc_id long, grp string, val string")
    assert hll_sketch_distinct(empty, "val", by="grp").collect() == []
    nulls = spark.createDataFrame(
        [(1, "g", None), (2, "g", "x")],
        "doc_id long, grp string, val string")
    out = hll_sketch_distinct(nulls, "val", by="grp").collect()
    # nulls don't count (Solr hll ignores missing values)
    assert [(r["grp"], r["distinct_est"]) for r in out] == [("g", 1)]

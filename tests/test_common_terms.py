"""CommonTermsQuery — df-split semantics at the engine surface."""

from __future__ import annotations

from sparklucene.driver_queries import index_for
from sparklucene.query import And, Or, Term
from sparklucene.search import common_terms_query, search

SF = "/root/testdata/sf0.001"


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_split_requires_rare_terms_only(spark):
    idx = index_for(spark, SF)
    q = common_terms_query(idx, ["dup", "merge", "scan"], max_doc_freq=0.5)
    hits = search(idx, q, k=100, mode="f64")
    # every hit must contain the rare term 'dup' (df ~5%): identical doc
    # set to the pure And(dup), which only requires dup
    only_dup = search(idx, And((Term("dup"),)), k=100, mode="f64")
    assert set(_ids(hits)) == set(_ids(only_dup))
    # but common terms still score: at least one hit outranks its
    # dup-only score (merge/scan contributions added)
    s_ct = {r["doc_id"]: r["score"] for r in hits.collect()}
    s_dup = {r["doc_id"]: r["score"] for r in only_dup.collect()}
    assert any(s_ct[d] > s_dup[d] for d in s_ct)


def test_all_high_falls_back_to_disjunction(spark):
    idx = index_for(spark, SF)
    q = common_terms_query(idx, ["merge", "scan"], max_doc_freq=0.5)
    want = search(idx, Or((Term("merge"), Term("scan")), 1), k=10,
                  mode="f64").collect()
    got = search(idx, q, k=10, mode="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]


def test_all_low_falls_back_to_conjunction(spark):
    idx = index_for(spark, SF)
    # fraction cutoff 1.0 -> every term is below doc_count -> all required
    q = common_terms_query(idx, ["merge", "scan"], max_doc_freq=1.0)
    want = search(idx, And((Term("merge"), Term("scan"))), k=10,
                  mode="f64").collect()
    got = search(idx, q, k=10, mode="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]


def test_absent_term_is_required_and_kills_matches(spark):
    idx = index_for(spark, SF)
    q = common_terms_query(idx, ["zz_not_a_term", "merge"],
                           max_doc_freq=0.5)
    assert search(idx, q, k=10, mode="f64").count() == 0


def test_absolute_cutoff_knob(spark):
    idx = index_for(spark, SF)
    # absolute cutoff 30 docs: dup (df=25) low, merge high — same split
    # as the 0.5 fraction; results must agree
    a = search(idx, common_terms_query(idx, ["dup", "merge"], 30),
               k=10, mode="f64").collect()
    b = search(idx, common_terms_query(idx, ["dup", "merge"], 0.5),
               k=10, mode="f64").collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]

"""Brute-force oracle sanity + query algebra laws (SURVEY.md §5.2.4)."""

import numpy as np

from sparklucene.oracle import build_oracle_index, search_oracle
from sparklucene.query import And, MatchNoDocs, Not, Or, Term, parse, rewrite


def test_parse_and_rewrite():
    q = parse("spark merge join")
    assert isinstance(q, Or) and len(q.clauses) == 3
    q = parse("+spark +merge")
    assert isinstance(q, And)
    q = parse("spark -merge")
    assert isinstance(q, Not)
    assert parse("the and of") == MatchNoDocs() or isinstance(parse("the and of"), MatchNoDocs)
    # single-clause unwrap + dedup + flatten
    assert rewrite(Or((Term("x"), Term("x")))) == Term("x")
    assert rewrite(And((And((Term("a"),)), Term("b")))) == And((Term("a"), Term("b")))
    assert isinstance(rewrite(And((Term("a"), MatchNoDocs()))), MatchNoDocs)


def test_oracle_on_corpus(corpus_pdf):
    idx = build_oracle_index(corpus_pdf)
    assert idx.doc_count > 0
    assert idx.sum_dl == int(idx.dl.sum())
    # FIXTURES.md §6.2: sum(df) == distinct (term, doc) pairs
    assert len(idx.tf) == idx.tf[["term", "doc_id"]].drop_duplicates().shape[0]

    r = search_oracle(idx, parse("merge"), k=10)
    assert 0 < len(r) <= 10
    assert (np.diff(r["score"].to_numpy()) <= 0).all()

    # equivalence laws: AND subset of term; term subset of OR
    t = set(search_oracle(idx, Term("merge"), k=10**9)["doc_id"])
    a = set(search_oracle(idx, And((Term("merge"), Term("join"))), k=10**9)["doc_id"])
    o = set(search_oracle(idx, Or((Term("merge"), Term("join"))), k=10**9)["doc_id"])
    assert a <= t <= o
    n = set(search_oracle(idx, Not(Term("merge"), Term("join")), k=10**9)["doc_id"])
    j = set(search_oracle(idx, Term("join"), k=10**9)["doc_id"])
    assert n == t - j

    # msm=2 on a 3-term OR: docs matching >= 2 of the terms
    msm = search_oracle(idx, Or((Term("merge"), Term("join"), Term("scan")),
                                min_should_match=2), k=10**9)
    s = set(search_oracle(idx, Term("scan"), k=10**9)["doc_id"])
    want = {d for d in o | s if (d in t) + (d in j) + (d in s) >= 2}
    assert set(msm["doc_id"]) == want

    # absent term and all-stopword query -> empty
    assert len(search_oracle(idx, Term("zzzznotaterm"), 10)) == 0
    assert len(search_oracle(idx, parse("the of and"), 10)) == 0


def test_modes_rank_identical_on_corpus(corpus_pdf):
    idx = build_oracle_index(corpus_pdf)
    for qs in ["merge", "merge join", "+merge +join", "merge -join",
               "table scan filter window"]:
        a = search_oracle(idx, parse(qs), 10, mode="lucene8")
        b = search_oracle(idx, parse(qs), 10, mode="f64")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert np.allclose(a["score"], b["score"], rtol=1e-4)

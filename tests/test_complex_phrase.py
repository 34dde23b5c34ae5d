"""ComplexPhrase (wildcard/prefix/fuzzy inside a phrase): rewrite into
MultiPhrase must be exact, empty expansions must yield MatchNoDocs."""

from __future__ import annotations

import pandas as pd
import pytest

from sparklucene.query import Fuzzy, MatchNoDocs, MultiPhrase, Prefix, Wildcard
from sparklucene.search import complex_phrase, search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark):
    from sparklucene.driver_queries import index_for
    return index_for(spark, SF)


def test_prefix_slot_equals_expanded_multiphrase(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("jo")))
    assert isinstance(q, MultiPhrase)
    exp = tuple(sorted(idx.expand_terms(Prefix("jo"))))
    assert q.slots == ((0, ("fast",)), (1, exp))
    got = search(idx, q, k=10, mode="f64").toPandas()
    want = search(idx, MultiPhrase(((0, ("fast",)), (1, exp))),
                  k=10, mode="f64").toPandas()
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0  # "fast join" exists in the corpus


def test_wildcard_and_fuzzy_slots(spark, idx):
    q = complex_phrase(idx, (Wildcard("f?st"), Fuzzy("jon", max_edits=1)))
    assert isinstance(q, MultiPhrase)
    got = search(idx, q, k=10, mode="f64").toPandas()
    assert len(got) > 0


def test_empty_expansion_is_matchnodocs(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("zzzzqqqq")))
    assert isinstance(q, MatchNoDocs)
    assert search(idx, q, k=10).count() == 0


def test_bad_slot_type_raises(idx):
    with pytest.raises(TypeError):
        complex_phrase(idx, ("fast", 42))


def test_max_expansions_cap(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("j")), max_expansions=2)
    assert isinstance(q, MultiPhrase)
    assert len(q.slots[1][1]) <= 2


# ---------------------------------------------------------------------------
# FuzzyQuery transpositions=True (Lucene default) — Damerau expansion.
# ---------------------------------------------------------------------------

def test_fuzzy_transpositions_expansion(spark, idx):
    from sparklucene.query import Fuzzy
    from sparklucene.search import _damerau_distance
    plain = set(idx.expand_terms(Fuzzy("sprak", max_edits=1)))
    transp = set(idx.expand_terms(Fuzzy("sprak", max_edits=1,
                                        transpositions=True)))
    assert "spark" in transp and "spark" not in plain
    assert plain <= transp  # damerau <= levenshtein, so strictly wider
    for t in transp:
        assert _damerau_distance(t, "sprak") <= 1


def test_damerau_distance_textbook_cases():
    from sparklucene.search import _damerau_distance as d
    assert d("ca", "abc") == 2      # unrestricted: transpose then insert
    assert d("ab", "ba") == 1
    assert d("spark", "sprak") == 1
    assert d("", "abc") == 3 and d("abc", "") == 3
    assert d("same", "same") == 0


def test_top_terms_fuzzy_transpositions_boost(spark, idx):
    """TOP_TERMS over a transpositions fuzzy uses the Damerau distance
    in the FuzzyTermsEnum boost, so the swapped term gets the top boost."""
    from sparklucene.query import Fuzzy, TopTerms
    from sparklucene.search import _expand_top_terms
    from sparklucene.query import Term
    q = TopTerms(Fuzzy("sprak", max_edits=1, transpositions=True), n=5)
    expanded = _expand_top_terms(q, idx, 1024)
    clauses = ((expanded,) if isinstance(expanded, Term)
               else expanded.clauses)  # single-clause Or folds to Term
    terms = {t.term: t.boost for t in clauses}
    assert "spark" in terms
    assert terms["spark"] == max(terms.values())  # d=1 over m=5


# ---------------------------------------------------------------------------
# IndexSearcher.explain — per-term decomposition must reassemble the score.
# ---------------------------------------------------------------------------

def test_explain_contributions_sum_to_search_score(spark, idx):
    from sparklucene.corpus import load_corpus
    from sparklucene.query import Or, Term
    from sparklucene.search import explain_terms, search
    corpus = load_corpus(spark, SF)
    full = search(idx, Or((Term("join"), Term("merge"))), k=None,
                  mode="f64").toPandas()
    ids = tuple(int(d) for d in full["doc_id"].head(5))
    exp = explain_terms(idx, corpus, ("join", "merge"), ids).toPandas()
    assert set(exp.columns) == {"doc_id", "term", "tf", "df", "dl", "dlq",
                                "idf", "contribution"}
    got = exp.groupby("doc_id")["contribution"].sum()
    want = dict(zip(full["doc_id"], full["score"]))
    for d in ids:
        assert abs(got[d] - want[d]) <= 1e-6 * abs(want[d])
    # tf/df are exact positives and dlq quantizes dl downward
    assert (exp["tf"] >= 1).all() and (exp["df"] >= 1).all()
    assert (exp["dlq"] <= exp["dl"]).all()


def test_collation_keeps_dictionary_words(spark, idx):
    """A word already in the dictionary is NOT 'corrected' (Solr only
    collates corrections for misspelled tokens)."""
    from sparklucene.suggest import collate
    out = collate(idx, ("spark", "mrge")).collect()[0]
    assert out["collation"].startswith("spark ")
    assert out["collation"].split()[1] != "mrge"  # second word corrected
    assert out["hits"] >= 0


def test_collation_uncorrectable_word_kept(spark, idx):
    from sparklucene.suggest import collate
    out = collate(idx, ("zzqqxx", "spark")).collect()[0]
    assert out["collation"] == "zzqqxx spark"
    assert out["hits"] == 0  # conjunction with an absent term matches nothing


def test_term_positions_roundtrip_vs_forward_analysis(spark, idx):
    """Index-decoded positions == forward-analyzed pre-stop positions
    (gaps preserved), with and without the doc filter."""
    import numpy as np
    from sparklucene.analysis import ENGLISH_STOP_WORDS, TOKEN_RE
    from sparklucene.search import term_positions
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    term = "query"
    want = []
    for r in docs:
        toks = TOKEN_RE.findall(r["text"].lower())
        want += [(r["doc_id"], p) for p, t in enumerate(toks) if t == term]
    got = term_positions(idx, term).toPandas()
    assert sorted(map(tuple, got.to_numpy().tolist())) == sorted(want)
    some = sorted({d for d, _ in want})[:3]
    sub = term_positions(idx, term, tuple(some)).toPandas()
    assert set(sub["doc_id"]) <= set(some)
    assert len(sub) == sum(1 for d, _ in want if d in set(some))

"""SynonymQuery + query-time synonym-graph expansion semantics."""

from __future__ import annotations

import numpy as np
import pytest

from sparklucene.oracle import build_oracle_index, search_oracle
from sparklucene.query import (MatchNoDocs, Or, Phrase, Synonym, Term,
                               apply_synonyms, parse, prune_missing,
                               rewrite)


@pytest.fixture(scope="module")
def oidx(corpus_pdf):
    return build_oracle_index(corpus_pdf)


def test_blended_tf_saturates_like_single_term(oidx):
    # a doc with merge:2 + join:1 must score EXACTLY like tf=3 of a
    # pseudo-term with df = max(df_merge, df_join)
    q = Synonym(("merge", "join"))
    got = search_oracle(oidx, q, k=5)
    tf = oidx.tf
    m = tf[tf["term"].isin(["merge", "join"])].groupby("doc_id")["tf"].sum()
    df = max(oidx.df_of("merge"), oidx.df_of("join"))
    from sparklucene import bm25
    top = got.iloc[0]
    d = int(top["doc_id"])
    pos = int(np.searchsorted(oidx.doc_ids, d))
    want = bm25.score_lucene8(np.array([m.loc[d]]),
                              oidx.norm_bytes[pos:pos + 1], df,
                              oidx.doc_count, oidx.sum_dl)[0]
    assert np.float32(top["score"]) == want


def test_synonym_differs_from_plain_or(oidx):
    syn = search_oracle(oidx, Synonym(("merge", "join")), k=10)
    orq = search_oracle(oidx, Or((Term("merge"), Term("join"))), k=10)
    # same candidate docs, different scoring model (blended vs summed)
    assert not np.array_equal(syn["score"].to_numpy(),
                              orq["score"].to_numpy())


def test_rewrite_and_prune():
    assert rewrite(Synonym(())) == MatchNoDocs()
    assert rewrite(Synonym(("only",), boost=2.0)) == Term("only", 2.0)
    pruned = prune_missing(Synonym(("a", "gone")), {"a", "b"})
    assert pruned == Term("a")  # single survivor degenerates to TermQuery
    assert prune_missing(Synonym(("gone", "also_gone")), {"a"}) \
        == MatchNoDocs()


def test_apply_synonyms_shapes():
    rules = {"ny": ("nyc", ("new", "york"))}
    q = apply_synonyms(parse("ny river"), rules)
    assert isinstance(q, Or)
    syn_branch = q.clauses[0]
    assert isinstance(syn_branch, Or)
    assert Synonym(("ny", "nyc")) in syn_branch.clauses
    assert Phrase(((0, "new"), (1, "york"))) in syn_branch.clauses
    assert Term("river") in q.clauses
    # no rule -> untouched
    assert apply_synonyms(Term("x"), rules) == Term("x")


def test_engine_matches_oracle_on_synonym_tree(spark, corpus_pdf, oidx):
    from sparklucene.driver_queries import index_for
    from sparklucene.search import search
    idx = index_for(spark, "/root/testdata/sf0.001")
    q = Or((Synonym(("merge", "join")), Term("scan")))
    got = search(idx, q, k=10, mode="lucene8").toPandas()
    want = search_oracle(oidx, q, k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy().astype(np.float32)
            == want["score"].to_numpy().astype(np.float32)).all()


def test_blended_fuzzy_rewrite_shape(spark):
    from sparklucene.driver_queries import index_for
    from sparklucene.query import DisMax, Fuzzy, TopTerms
    from sparklucene.search import _expand_top_terms
    idx = index_for(spark, "/root/testdata/sf0.001")
    # 'bath' expands to {batch, data, hash} at this SF — 3 clauses
    q = _expand_top_terms(TopTerms(Fuzzy("bath", max_edits=2), n=3,
                                   blended=True), idx, cap=1000)
    assert isinstance(q, DisMax) and q.tiebreak == 0.01
    dfs = {c.members[0]: c.blend_df for c in q.clauses}
    assert len(set(dfs.values())) == 1  # one blended df across clauses
    assert all(isinstance(c, Synonym) and len(c.members) == 1
               for c in q.clauses)


def test_blend_df_survives_rewrite_and_prune():
    q = Synonym(("alpha",), blend_df=77)
    assert rewrite(q) == q  # must NOT degenerate to Term (df override)
    assert prune_missing(q, {"alpha"}) == q
    assert prune_missing(q, set()) == MatchNoDocs()

"""Multi-field indexing + per-field queries (edismax shape): per-field
norms/stats, field-qualified term keys, cross-field DisMax, field phrases."""

from __future__ import annotations

import os

import pytest

from sparklucene.analysis import AnalyzerConfig
from sparklucene.build import Field, build_index
from sparklucene.query import (DisMax, Phrase, Prefix, Term, field_key,
                               qualify)
from sparklucene.search import Index, edismax_query, search, total_hits

KW = AnalyzerConfig(tokenizer="keyword", stopwords=frozenset())
PATH_AN = AnalyzerConfig(stopwords=frozenset())


@pytest.fixture(scope="module")
def mf_index(spark, corpus_pdf, tmp_path_factory):
    corpus_df = spark.createDataFrame(corpus_pdf)
    d = str(tmp_path_factory.mktemp("mf")) + "/idx"
    build_index(spark, corpus_df, d, drange_size=128, extra_fields=(
        Field("lang", "lang", KW),
        Field("repo", "repo", KW),
        Field("path", "path", PATH_AN, store_positions=True)))
    return Index(spark, d), corpus_pdf


def test_field_stats_recorded(mf_index):
    idx, pdf = mf_index
    fs = idx.stats["fields"]
    n = len(pdf)
    assert fs["lang"] == {"doc_count": n, "sum_dl": n}
    assert fs["repo"] == {"doc_count": n, "sum_dl": n}
    # path "doc/<id>.txt" tokenizes to [doc, <id>, txt]
    assert fs["path"] == {"doc_count": n, "sum_dl": 3 * n}


def test_keyword_field_counts(mf_index):
    idx, pdf = mf_index
    for lang in sorted(pdf["lang"].unique()):
        got = total_hits(idx, Term(lang, field="lang")).collect()[0][0]
        assert got == int((pdf["lang"] == lang).sum()), lang


def test_field_key_qualification():
    q = qualify(Term("en", field="lang"))
    assert q == Term(field_key("lang", "en"))
    assert qualify(Term("spark")) == Term("spark")
    assert qualify(Term("spark", field="content")) == Term("spark")


def test_field_phrase_positions(mf_index):
    idx, pdf = mf_index
    some_id = int(pdf["doc_id"].iloc[7])
    q = Phrase(((0, "doc"), (1, str(some_id))), field="path")
    rows = search(idx, q, k=5).collect()
    assert [r["doc_id"] for r in rows] == [some_id]


def test_prefix_on_keyword_field(mf_index):
    idx, pdf = mf_index
    got = total_hits(idx, Prefix("src1", field="repo")).collect()[0][0]
    want = int(pdf["repo"].str.startswith("src1").sum())
    assert got == want > 0


def test_default_field_prefix_ignores_other_fields(mf_index):
    idx, pdf = mf_index
    # 's*' on content must NOT sweep up repo\x1fsrcN keys
    terms = idx.expand_terms(Prefix("s"))
    assert all("\x1f" not in t for t in terms)
    assert "spark" in terms


def test_cross_field_dismax_max_semantics(mf_index):
    idx, _ = mf_index
    a = {r["doc_id"]: r["score"]
         for r in search(idx, Term("spark"), k=1000, mode="f64").collect()}
    b = {r["doc_id"]: r["score"]
         for r in search(idx, Term("en", field="lang"), k=1000,
                         mode="f64").collect()}
    got = search(idx, DisMax((Term("spark"), Term("en", field="lang"))),
                 k=1000, mode="f64").collect()
    import numpy as np
    for r in got:
        want = np.float32(max(a.get(r["doc_id"], -np.inf),
                              b.get(r["doc_id"], -np.inf)))
        assert np.float32(r["score"]) == want


def test_edismax_query_shape():
    q = edismax_query("spark merge", {"content": 1.0, "path": 2.0},
                      tie=0.1)
    # two terms, each a DisMax over (content, path)
    from sparklucene.query import Or
    assert isinstance(q, Or) and len(q.clauses) == 2
    for c in q.clauses:
        assert isinstance(c, DisMax)
        fields = {t.field for t in c.clauses}
        assert fields == {"content", "path"}
        boosts = {t.field: t.boost for t in c.clauses}
        assert boosts["path"] == 2.0


def test_edismax_pf_shape_and_scores(spark):
    """pf adds a boosted whole-query phrase as a score-only SHOULD:
    Filtered(Or((main, phrase)), main) — matching == main alone; a
    phrase-matching doc scores main + boost*phrase (verified against the
    brute-force oracle); one-token pf is a no-op."""
    import numpy as np

    from sparklucene.corpus import load_corpus
    from sparklucene.driver_queries import index_for
    from sparklucene.oracle import build_oracle_index, search_oracle
    from sparklucene.query import Filtered, Or, Phrase

    q = edismax_query("hash the query", {"content": 1.0},
                      pf={"content": 2.0})
    assert isinstance(q, Filtered) and isinstance(q.positive, Or)
    ph = [c for c in q.positive.clauses if isinstance(c, Phrase)]
    assert len(ph) == 1 and ph[0].boost == 2.0
    assert ph[0].slots == ((0, "hash"), (2, "query"))  # stop gap kept

    sf = "/root/testdata/sf0.001"
    idx = index_for(spark, sf)
    got = search(idx, q, k=1000, mode="f64").toPandas()
    oidx = build_oracle_index(load_corpus(spark, sf).toPandas())
    want = search_oracle(oidx, q, k=1000, mode="f64")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].to_numpy()
            == want["score"].to_numpy().astype("float64")).all()

    # match set identical to the plain OR main query
    main = edismax_query("hash the query", {"content": 1.0})
    base = search(idx, main, k=1000, mode="f64").toPandas()
    assert set(got["doc_id"]) == set(base["doc_id"])
    # phrase-matching docs gained score; at least one exists at sf0.001
    gained = {int(d) for d, s in zip(got["doc_id"], got["score"])
              if not np.isclose(
                  s, float(base.set_index("doc_id")["score"].get(int(d))))}
    assert gained, "expected at least one phrase match in the corpus"

    # one-token query: pf is a no-op
    assert edismax_query("hash", {"content": 1.0}, pf={"content": 2.0}) \
        == edismax_query("hash", {"content": 1.0})

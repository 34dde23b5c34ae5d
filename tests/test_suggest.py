"""Suggester + spell-check (suggest.py) — behavior + oracle parity.

The driver-contract mirror (test_driver_contract) already value-checks
the two registry entries vs DuckDB; these tests pin the API semantics:
prefix filtering, popularity ranking, k bound, exact-word exclusion,
minPrefix narrowing, and field qualification.
"""

import shutil

import pytest

from sparklucene.analysis import AnalyzerConfig
from sparklucene.build import Field, build_index
from sparklucene.corpus import load_corpus
from sparklucene.search import Index
from sparklucene.suggest import spellcheck, suggest_prefix

SF = "/root/testdata/sf0.001"
IDX_DIR = "/root/repo/.cache/test-suggest-index"


@pytest.fixture(scope="module")
def idx(spark):
    shutil.rmtree(IDX_DIR, ignore_errors=True)
    corpus = load_corpus(spark, SF)
    kw = AnalyzerConfig(tokenizer="keyword", stopwords=frozenset())
    build_index(spark, corpus, IDX_DIR, drange_size=128,
                extra_fields=(Field("lang", "lang", kw),))
    return Index(spark, IDX_DIR)


def test_suggest_prefix_ranking_and_k(idx):
    rows = suggest_prefix(idx, "s", k=4).collect()
    assert 0 < len(rows) <= 4
    assert all(r["term"].startswith("s") for r in rows)
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    # k bound respected vs the full expansion
    all_rows = suggest_prefix(idx, "s", k=1000).collect()
    assert [r["term"] for r in rows] == [r["term"] for r in all_rows[:4]]


def test_suggest_prefix_no_match_and_field(idx):
    assert suggest_prefix(idx, "zzzz", k=5).count() == 0
    # field-qualified dictionary: lang keyword terms, qualifier stripped
    rows = suggest_prefix(idx, "", k=100, field="lang").collect()
    terms = {r["term"] for r in rows}
    assert terms and all("\x1f" not in t for t in terms)
    # default-field suggestions never leak qualified keys
    d_rows = suggest_prefix(idx, "", k=10000).collect()
    assert all("\x1f" not in r["term"] for r in d_rows)


def test_spellcheck_excludes_word_and_ranks_by_distance(idx):
    rows = spellcheck(idx, "sprk", k=5, max_edits=2).collect()
    assert rows, "expected at least one correction for 'sprk'"
    assert rows[0]["term"] == "spark" and rows[0]["distance"] == 1
    ds = [r["distance"] for r in rows]
    assert ds == sorted(ds)
    # a correctly spelled word is not suggested as its own correction
    rows = spellcheck(idx, "spark", k=5, max_edits=2).collect()
    assert all(r["term"] != "spark" for r in rows)


def test_spellcheck_min_prefix_narrows(idx):
    # min_prefix=1 keeps only same-initial candidates
    with_guard = {r["term"] for r in
                  spellcheck(idx, "sprk", k=50, max_edits=2,
                             min_prefix=1).collect()}
    without = {r["term"] for r in
               spellcheck(idx, "sprk", k=50, max_edits=2,
                          min_prefix=0).collect()}
    assert with_guard <= without
    assert all(t.startswith("s") for t in with_guard)


def test_suggest_infix_contains_anywhere(idx):
    from sparklucene.suggest import suggest_infix, suggest_prefix

    rows = suggest_infix(idx, "ar", k=20).collect()
    assert rows and all("ar" in r["term"] for r in rows)
    # ranked by popularity then term, like the prefix suggester
    keys = [(-r["cf"], r["term"]) for r in rows]
    assert keys == sorted(keys)
    # infix is a strict superset surface: prefix hits are infix hits
    pre = {r["term"] for r in suggest_prefix(idx, "ar", k=50).collect()}
    inf = {r["term"] for r in suggest_infix(idx, "ar", k=1000).collect()}
    assert pre <= inf
    # and it finds mid-word matches a prefix lookup cannot
    assert any(not t.startswith("ar") for t in inf)


def test_free_text_suggest_bigram_and_backoff(spark):
    from sparklucene.suggest import free_text_suggest

    rows = [(0, "alpha beta alpha beta alpha gamma"),
            (1, "alpha beta delta"),
            (2, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = free_text_suggest(df, ("alpha", "nope"), k=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["context"], []).append(r)
    # bigram branch: 'alpha beta' x3 beats 'alpha gamma' x1
    a = sorted(by["alpha"], key=lambda r: (-r["cnt"], r["suggestion"]))
    assert [r["suggestion"] for r in a] == ["beta", "gamma"]
    assert a[0]["cnt"] == 3 and all(r["grams"] == 2 for r in a)
    # backoff branch: unseen context falls back to corpus top unigrams
    b = by["nope"]
    assert all(r["grams"] == 1 for r in b)
    assert {r["suggestion"] for r in b} == {"alpha", "beta"}
    # the final token of a doc opens no bigram ('solo' only unigram);
    # a context that only appears doc-final also backs off
    out2 = free_text_suggest(df, ("solo",), k=1).collect()
    assert len(out2) == 1 and out2[0]["grams"] == 1


def test_word_break_split_and_rank(idx):
    from sparklucene.suggest import word_break

    rows = word_break(idx, "mergejoin", k=5, min_break_length=2).collect()
    assert [(r["left_part"], r["right_part"]) for r in rows] \
        == [("merge", "join")]
    # combined frequency is the MIN of the parts' df
    from sparklucene.suggest import _dict_body
    dfs = {r["term"]: r["df"] for r in
           _dict_body(idx, None)
           .filter("term IN ('merge', 'join')").collect()}
    assert rows[0]["freq"] == min(dfs["merge"], dfs["join"])
    # min_break_length guards sub-length parts; a 3-char word with
    # min 2 has exactly len-3 split points, none valid here
    assert word_break(idx, "abc", k=5, min_break_length=2).count() == 0
    # too-short word yields an empty frame, not an error
    assert word_break(idx, "ab", k=5, min_break_length=2).count() == 0


def test_word_combine_adjacent_pairs(idx):
    from sparklucene.suggest import word_combine

    rows = word_combine(idx, ("mer", "ge", "join"), k=5).collect()
    assert len(rows) == 1
    assert rows[0]["left_word"] == "mer" and rows[0]["term"] == "merge"
    assert rows[0]["df"] > 0
    # no adjacent pair concatenates to a term -> empty
    assert word_combine(idx, ("zz", "qq"), k=5).count() == 0
    # single word has no pairs
    assert word_combine(idx, ("merge",), k=5).count() == 0

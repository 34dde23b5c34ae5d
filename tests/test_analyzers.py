"""Pluggable analyzer chain (SURVEY.md §2.2 v2 operators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparklucene.analysis import (ENGLISH_STOP_WORDS, AnalyzerConfig,
                                  analyze_flat, analyze_text)


def toks(text: str, cfg: AnalyzerConfig) -> list[str]:
    return analyze_text(text, cfg)


def test_standard_matches_default_chain():
    cfg = AnalyzerConfig()
    assert toks("The quick_brown Fox-2 jumps!", cfg) == \
        ["quick_brown", "fox", "2", "jumps"]


def test_word_delimiter_splits_camel_and_snake():
    cfg = AnalyzerConfig(split_word_delims=True)
    assert toks("getUserName snake_case HTTPServer2", cfg) == \
        ["get", "user", "name", "snake", "case", "httpserver", "2"]


def test_ascii_folding():
    cfg = AnalyzerConfig(ascii_fold=True)
    assert toks("café naïve Zürich", cfg) == ["cafe", "naive", "zurich"]


def test_whitespace_and_keyword_tokenizers():
    ws = AnalyzerConfig(tokenizer="whitespace", stopwords=frozenset())
    assert toks("foo-bar baz.qux", ws) == ["foo-bar", "baz.qux"]
    kw = AnalyzerConfig(tokenizer="keyword", stopwords=frozenset())
    assert toks("One Whole String", kw) == ["one whole string"]


def test_pattern_tokenizer_and_min_len():
    cfg = AnalyzerConfig(tokenizer="pattern", pattern=r"[a-z]+",
                         min_len=3, stopwords=frozenset())
    assert toks("ab abc abcd x12y", cfg) == ["abc", "abcd"]


def test_positions_keep_stop_gaps():
    cfg = AnalyzerConfig()
    t, d, p = analyze_flat(pd.Series(["fast the key"]), np.array([7]), cfg)
    assert list(t) == ["fast", "key"]
    assert list(p) == [0, 2]
    assert set(d) == {7}


def test_engine_with_word_delimiter_analyzer(spark, tmp_path):
    """End-to-end: camelCase corpus indexed with the word-delimiter
    analyzer is searchable by subword."""
    from sparklucene.build import build_index
    from sparklucene.search import Index, search

    rows = [(i, f"r{i}", f"p{i}", f"c{i}", "py",
             "getUserName parseJsonFast" if i % 2 == 0 else "plain words only")
            for i in range(50)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, "
              "lang string, content string")
    cfg = AnalyzerConfig(split_word_delims=True)
    d = str(tmp_path / "wd-idx")
    build_index(spark, corpus, d, drange_size=16, analyzer=cfg)
    idx = Index(spark, d)
    hits = search(idx, '"user name"', k=50).collect()
    assert len(hits) == 25
    assert all(r["doc_id"] % 2 == 0 for r in hits)
    # standard analyzer would have kept 'getusername' whole: no subword hit
    assert search(idx, "getusername", k=5).count() == 0


def test_term_map_synonym_normalization(spark, tmp_path):
    """SynonymFilter / dictionary-stemmer slot: tokens normalized at index
    time; queries analyzed with the same map find both surface forms."""
    from sparklucene.build import build_index
    from sparklucene.search import Index, search

    cfg = AnalyzerConfig(term_map=(("joins", "join"), ("joined", "join"),
                                   ("quick", "fast")))
    assert toks("joins joined join quick", cfg) == ["join", "join", "join", "fast"]

    rows = [(0, "r", "p0", "c", "py", "spark joins tables"),
            (1, "r", "p1", "c", "py", "spark joined tables"),
            (2, "r", "p2", "c", "py", "spark join tables"),
            (3, "r", "p3", "c", "py", "nothing relevant here")]
    corpus = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, "
              "lang string, content string")
    d = str(tmp_path / "syn-idx")
    build_index(spark, corpus, d, drange_size=8, analyzer=cfg)
    hits = {r["doc_id"] for r in search(Index(spark, d), "join", k=10).collect()}
    assert hits == {0, 1, 2}


def test_html_strip_char_filter():
    """HTMLStripCharFilter (u8:.../charfilter/HTMLStripCharFilter.java):
    comments/script/style content dropped, tags become gaps (no word
    joining), entities decoded AFTER tag removal and &amp; decoded LAST
    (no double-decode cascade)."""
    from sparklucene.analysis import strip_html

    cfg = AnalyzerConfig(html_strip=True)
    assert toks('<p class="x">Hello <b>world</b></p>', cfg) == \
        ["hello", "world"]
    # script/style/comment CONTENT is dropped, not just the tags
    assert toks('aa<script>var hidden = 1;</script>bb'
                '<style>p{color:red}</style>cc<!-- secret -->dd', cfg) == \
        ["aa", "bb", "cc", "dd"]
    # tags are gaps: "a<b>b" must not merge into "ab"
    assert toks("one<br>two", cfg) == ["one", "two"]
    # entities: named + numeric (dec and hex), decoded post-tag-removal
    assert toks("d&#111;ne &#x41;BC &lt;tag&gt;", cfg) == \
        ["done", "abc", "tag"]
    # &amp; decodes last: "&amp;lt;" is literal "&lt;", never "<"
    s = strip_html(pd.Series(["x &amp;lt; y"]))
    assert s[0] == "x &lt; y"
    # decoded "<" is literal text, never re-parsed as a tag
    assert strip_html(pd.Series(["&lt;b&gt;bold&lt;/b&gt;"]))[0] == \
        "<b>bold</b>"
    # plain text untouched ("no" is a stop word)
    assert toks("plain markup here", cfg) == ["plain", "markup", "here"]


def test_common_grams_filter():
    """CommonGramsFilter: 'a_b' bigrams where either member is common,
    at the first member's position, pre-stop (stop unigrams drop, the
    bigrams survive); no cross-doc pairs."""
    import numpy as np
    import pandas as pd

    from sparklucene.analysis import (ENGLISH_STOP_WORDS, AnalyzerConfig,
                                      analyze_flat, analyze_text)

    cfg = AnalyzerConfig(common_grams=ENGLISH_STOP_WORDS)
    toks, docs, pos = analyze_flat(
        pd.Series(["hash the query", "the end"]), np.array([3, 9]), cfg)
    got = sorted(zip(docs.tolist(), pos.tolist(), toks.tolist()))
    assert got == [(3, 0, "hash"), (3, 0, "hash_the"), (3, 1, "the_query"),
                   (3, 2, "query"), (9, 0, "the_end"), (9, 1, "end")]
    # pair of two NON-common words emits no bigram
    assert analyze_text("fast query", cfg) == ["fast", "query"]
    # with stopword removal disabled, common unigrams also survive
    cfg2 = AnalyzerConfig(common_grams=frozenset({"the"}),
                          stopwords=frozenset())
    assert analyze_text("hash the query", cfg2) == \
        ["hash", "the", "query", "hash_the", "the_query"]


def test_path_hierarchy_tokenizer_prefixes():
    """PathHierarchyTokenizer pinned spec: every ancestor prefix, all at
    position 0; empty segments collapse; empty input emits nothing."""
    import numpy as np
    from sparklucene.analysis import AnalyzerConfig, analyze_flat
    import pandas as pd
    cfg = AnalyzerConfig(tokenizer="path_hierarchy", stopwords=frozenset())
    toks, docs, pos = analyze_flat(
        pd.Series(["a/b/c", "", "x//y/"]), np.array([1, 2, 3]), cfg)
    got = list(zip(docs.tolist(), toks.tolist(), pos.tolist()))
    assert got == [(1, "a", 0), (1, "a/b", 0), (1, "a/b/c", 0),
                   (3, "x", 0), (3, "x/y", 0)]

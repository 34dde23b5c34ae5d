"""Analyzer parity: python == pandas-vectorized == DuckDB SQL (oracle)."""

import duckdb
import numpy as np
import pandas as pd

from sparklucene.analysis import (ENGLISH_STOP_WORDS, flat_tokens,
                                  stoplist_sql, tokenize_series, tokenize_sql,
                                  tokenize_text)


def test_stopword_list_is_the_classic_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "and", "of", "will", "such"} <= ENGLISH_STOP_WORDS
    assert "you" not in ENGLISH_STOP_WORDS


def test_tokenize_text_basics():
    assert tokenize_text("The QUICK brown-fox; jumps_over 42 the lazy dog!") == [
        "quick", "brown", "fox", "jumps_over", "42", "lazy", "dog"]
    assert tokenize_text("THE AND OF") == []
    assert tokenize_text("") == []
    assert tokenize_text("camelCase snake_case x1y2") == ["camelcase", "snake_case", "x1y2"]


def test_series_matches_scalar(corpus_pdf):
    texts = corpus_pdf["content"].head(200)
    vec = tokenize_series(texts)
    for t, lst in zip(texts, vec):
        assert lst == tokenize_text(t)


def test_flat_tokens_matches(corpus_pdf):
    texts = corpus_pdf["content"].head(100)
    ids = corpus_pdf["doc_id"].head(100).to_numpy()
    toks, docs, pos = flat_tokens(texts, ids)
    per_doc = {}
    per_doc_pos = {}
    for tk, d, p in zip(toks, docs, pos):
        per_doc.setdefault(d, []).append(tk)
        per_doc_pos.setdefault(d, []).append(p)
    import re
    for t, d in zip(texts, ids):
        assert per_doc.get(d, []) == tokenize_text(t)
        # positions carry stopword gaps: they index the pre-filter stream
        pre = re.findall(r"[a-z0-9_]+", t.lower())
        expect = [i for i, tk in enumerate(pre) if tk not in ENGLISH_STOP_WORDS]
        assert per_doc_pos.get(d, []) == expect


def test_duckdb_oracle_parity(corpus_pdf):
    df = pd.DataFrame({"doc_id": corpus_pdf["doc_id"], "text": corpus_pdf["content"]})
    con = duckdb.connect()
    con.register("docs", df)
    sql = f"""
      select doc_id, u.tok from docs,
        unnest({tokenize_sql('text')}) as u(tok)
      where u.tok not in {stoplist_sql()}
      order by doc_id
    """
    got = con.execute(sql).df()
    rows = []
    for d, t in zip(df["doc_id"], df["text"]):
        rows += [(d, tk) for tk in tokenize_text(t)]
    want = pd.DataFrame(rows, columns=["doc_id", "tok"]).sort_values("doc_id", kind="stable")
    assert got["tok"].tolist() == want["tok"].tolist()
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()


def test_flat_token_codes_parity(corpus_pdf):
    """Arrow-native tokenizer == pandas tokenizer + factorize(sort=True)."""
    import pyarrow as pa

    from sparklucene.analysis import flat_token_codes

    texts = corpus_pdf["content"].head(300)
    ids = corpus_pdf["doc_id"].head(300).to_numpy()
    toks, docs, pos = flat_tokens(texts, ids)
    ref_codes, ref_uniq = pd.factorize(pd.Series(toks), sort=True)
    codes, uniq, adocs, apos = flat_token_codes(
        pa.array(texts, type=pa.string()), ids)
    assert np.array_equal(codes, ref_codes)
    assert list(uniq) == list(ref_uniq)
    assert np.array_equal(adocs, docs)
    assert np.array_equal(apos, pos)


def test_flat_token_codes_fuzz_unicode():
    """Seeded fuzz incl. unicode edge chars, empty docs, nulls, stop runs."""
    import pyarrow as pa

    from sparklucene.analysis import flat_token_codes

    rng = np.random.default_rng(42)
    alphabet = list("ab1_ -.\tZéİKß中 the and")
    docs = []
    for _ in range(400):
        n = int(rng.integers(0, 60))
        docs.append("".join(rng.choice(alphabet, size=n)))
    docs += ["", "   ", "the and of", "_", "a" * 500, None]
    ids = np.arange(len(docs), dtype=np.int64)
    pds = pd.Series(docs)
    toks, tdocs, tpos = flat_tokens(pds, ids)
    ref_codes, ref_uniq = pd.factorize(pd.Series(toks), sort=True)
    codes, uniq, adocs, apos = flat_token_codes(
        pa.array(docs, type=pa.string()), ids)
    assert np.array_equal(adocs, tdocs)
    assert np.array_equal(apos, tpos)
    assert list(uniq) == list(ref_uniq)
    assert np.array_equal(codes, ref_codes)


def test_flat_token_codes_empty_and_no_stop():
    import pyarrow as pa

    from sparklucene.analysis import flat_token_codes

    c, u, d, p = flat_token_codes(pa.array([], type=pa.string()),
                                  np.array([], dtype=np.int64))
    assert c.size == u.size == d.size == p.size == 0
    c, u, d, p = flat_token_codes(pa.array(["the quick fox"]),
                                  np.array([7]), frozenset())
    assert list(u[c]) == ["the", "quick", "fox"]
    assert list(d) == [7, 7, 7] and list(p) == [0, 1, 2]


def test_token_stream_df_matches_analyze_flat(spark):
    """Distributed token-stream table == in-process analyze_flat."""
    import numpy as np
    import pandas as pd
    from sparklucene.analysis import (AnalyzerConfig, analyze_flat,
                                      token_stream_df)

    rows = [(0, "The Quick brown_fox jumps the fence"),
            (1, ""), (2, "MERGE merge the JOIN")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (token_stream_df(df, "text").orderBy("doc_id", "pos", "term")
           .toPandas())
    cfg = AnalyzerConfig()
    texts = pd.Series([r[1] for r in rows])
    flat, docs, pos = analyze_flat(texts, np.array([r[0] for r in rows]), cfg)
    want = (pd.DataFrame({"doc_id": docs, "pos": pos, "term": flat})
            .sort_values(["doc_id", "pos", "term"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype({"doc_id": "int64",
                                                    "pos": "int64"}))
    assert 1 not in set(got["doc_id"])  # empty doc emits nothing
    # stop positions leave gaps: "the" at pos 0 and 4 are dropped
    d0 = got[got["doc_id"] == 0]["pos"].tolist()
    assert d0 == [1, 2, 3, 5]


def test_token_stream_df_null_text_emits_nothing(spark):
    from sparklucene.analysis import token_stream_df
    df = spark.createDataFrame([(0, None), (1, "real text here")],
                               "doc_id long, text string")
    got = token_stream_df(df, "text").toPandas()
    assert set(got["doc_id"]) == {1}
    assert "none" not in set(got["term"])

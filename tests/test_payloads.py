"""PayloadScoreQuery tests — payload assignment, postings alignment, and
engine-vs-brute-force score equality (SURVEY.md §2.4 payload queries;
u8:lucene/queries/.../payloads/PayloadScoreQuery.java + PayloadFunction,
u8:lucene/analysis/common/.../payloads/DelimitedPayloadTokenFilter.java).

Pinned spec under test (documented on query.PayloadScore /
build._apply_payloads):
  * one payload byte per stored occurrence, aligned with the position
    stream of the UNFILTERED posting list;
  * per-doc factor = fn in {max,min,avg,sum} over the term's payload
    bytes in that doc;
  * score = float32(factor_f64 * BM25_f64) when include_span_score
    (Lucene's default mode), else the raw factor;
  * 'position_mix' assigner: 1 + ((pre-stop position * 31 + len(term)) % 8);
  * 'delimited:<c>' assigner: token "foo<c>7" indexes term "foo" with
    payload 7; non-conforming suffixes keep the spelling with payload 1.
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from sparklucene import bm25
from sparklucene.analysis import AnalyzerConfig
from sparklucene.build import (_apply_payloads, _invert_stream, build_index,
                               int_to_byte4)
from sparklucene.corpus import load_corpus
from sparklucene.norms import quantize_length
from sparklucene.oracle import build_oracle_index
from sparklucene.query import (MatchNoDocs, Or, PayloadScore, Term, parse,
                               prune_missing, qualify)
from sparklucene.search import Index, search

SF = "/root/testdata/sf0.001"
PAY_DIR = "/root/repo/.cache/test-payload-index"
DELIM_DIR = "/root/repo/.cache/test-payload-delim-index"


# ---------------------------------------------------------------- unit: assigners

def test_position_mix_formula():
    uniques = np.array(["ab", "xyz"], dtype=object)
    codes = np.array([0, 1, 0, 1, 1], dtype=np.int64)
    tpos = np.array([0, 1, 5, 7, 100], dtype=np.int64)
    c2, u2, pay = _apply_payloads(codes, uniques, tpos, "position_mix")
    assert c2 is codes and u2 is uniques  # no re-factorization
    lens = np.array([2, 3])[codes]
    want = 1 + ((tpos * 31 + lens) % 8)
    assert pay.dtype == np.uint8
    assert pay.tolist() == want.tolist()
    assert pay.min() >= 1 and pay.max() <= 8


def test_delimited_split_collision_and_fallbacks():
    # vocabulary: conforming, colliding literal, >255, non-integer,
    # delimiter-leading (empty head keeps spelling), conforming again
    uniques = np.array(["foo|7", "foo", "bar|300", "baz|x", "|5", "qux|12"],
                       dtype=object)
    codes = np.arange(6, dtype=np.int64)
    tpos = np.zeros(6, dtype=np.int64)
    c2, u2, pay = _apply_payloads(codes, uniques, tpos, "delimited:|")
    spell = [u2[c] for c in c2]
    assert spell == ["foo", "foo", "bar|300", "baz|x", "|5", "qux"]
    assert pay.tolist() == [7, 1, 1, 1, 1, 12]
    # "foo|7" and literal "foo" re-factorized into ONE term code
    assert c2[0] == c2[1]
    assert sorted(u2) == list(u2)  # uniques stay sorted (factorize sort=True)


def test_unknown_payload_mode_rejected():
    z = np.array([], dtype=np.int64)
    with pytest.raises(ValueError, match="payload mode"):
        _apply_payloads(z, np.array([], dtype=object), z, "delimited:")
    with pytest.raises(ValueError, match="payload mode"):
        _apply_payloads(z, np.array([], dtype=object), z, "nope")


def test_payload_fn_validated():
    with pytest.raises(ValueError, match="payload fn"):
        PayloadScore("t", fn="median")


# ------------------------------------------------- unit: postings alignment

def test_invert_stream_payload_segments_align_with_positions():
    # two docs, interleaved terms; stream is doc-major so stream_sorted=True
    uniques = np.array(["a", "b"], dtype=object)
    #            doc0: a(p0) b(p1) a(p2)   doc1: b(p0) a(p1)
    codes = np.array([0, 1, 0, 1, 0], dtype=np.int64)
    tdocs = np.array([0, 0, 0, 1, 1], dtype=np.int64)
    tpos = np.array([0, 1, 2, 0, 1], dtype=np.int64)
    doc_ids = np.array([0, 1], dtype=np.int64)
    nb = int_to_byte4(np.array([3, 2], dtype=np.int64))
    pay = np.array([10, 20, 30, 40, 50], dtype=np.uint8)
    tbl, _, _ = _invert_stream(codes, uniques, tdocs, tpos, doc_ids, nb,
                               drange=0, store_positions=True,
                               payloads=pay)
    by_term = {t: i for i, t in enumerate(tbl.column("term").to_pylist())}
    pays = tbl.column("pay_bytes").to_pylist()
    # term a: doc0 occurrences (pos 0,2 -> pay 10,30) then doc1 (pos 1 -> 50)
    assert list(pays[by_term["a"]]) == [10, 30, 50]
    # term b: doc0 pos1 -> 20, doc1 pos0 -> 40
    assert list(pays[by_term["b"]]) == [20, 40]
    # payload bytes count == sum(tf) per term (position-stream alignment)
    tfs = tbl.column("tf_bytes").to_pylist()
    from sparklucene.codec import decode_tfs
    for t, i in by_term.items():
        assert len(pays[i]) == int(decode_tfs(bytes(tfs[i])).sum())


def test_no_payload_mode_writes_empty_bytes():
    uniques = np.array(["a"], dtype=object)
    codes = np.array([0], dtype=np.int64)
    z = np.array([0], dtype=np.int64)
    tbl, _, _ = _invert_stream(codes, uniques, z, z,
                               np.array([0], dtype=np.int64),
                               int_to_byte4(np.array([1], dtype=np.int64)),
                               drange=0, store_positions=True)
    assert bytes(tbl.column("pay_bytes")[0].as_py()) == b""


# ------------------------------------------------------ unit: query algebra

def test_qualify_and_prune():
    q = PayloadScore("merge", fn="sum", include_span_score=False,
                     field="title")
    fq = qualify(q)
    assert fq.term != "merge" and "merge" in fq.term  # field-key prefixed
    assert fq.fn == "sum" and not fq.include_span_score
    assert qualify(PayloadScore("merge")) == PayloadScore("merge")
    assert prune_missing(PayloadScore("zzz"), {"merge"}) == MatchNoDocs()
    assert prune_missing(PayloadScore("merge"), {"merge"}) == \
        PayloadScore("merge")


# --------------------------------------------------------------- engine e2e

@pytest.fixture(scope="module")
def pay_built(spark):
    shutil.rmtree(PAY_DIR, ignore_errors=True)
    corpus = load_corpus(spark, SF)
    stats = build_index(spark, corpus, PAY_DIR, drange_size=128,
                        payloads="position_mix")
    return Index(spark, PAY_DIR), stats


@pytest.fixture(scope="module")
def oidx(corpus_pdf):
    return build_oracle_index(corpus_pdf)


def _expected_payload_topk(oidx, term: str, fn: str, include: bool,
                           k: int = 10) -> pd.DataFrame:
    """Brute-force recomputation of the pinned spec from the oracle
    index's raw (term, doc, pre-stop position) stream."""
    tp = oidx.tp[oidx.tp["term"] == term]
    pay = 1 + ((tp["pos"].to_numpy(np.int64) * 31 + len(term)) % 8)
    g = pd.DataFrame({"doc_id": tp["doc_id"].to_numpy(np.int64),
                      "pay": pay.astype(np.float64)}).groupby("doc_id")["pay"]
    factor = {"max": g.max, "min": g.min, "avg": g.mean, "sum": g.sum}[fn]()
    docs = factor.index.to_numpy(np.int64)
    if include:
        tf = g.count().to_numpy(np.float64)
        df = docs.size
        w = bm25.idf(df, oidx.doc_count)
        dlq = oidx.dlq[np.searchsorted(oidx.doc_ids, docs)].astype(np.float64)
        denom = tf + bm25.K1 * (1.0 - bm25.B
                                + bm25.B * dlq / (oidx.sum_dl
                                                  / float(oidx.doc_count)))
        score = (factor.to_numpy(np.float64) * (w * tf / denom)
                 ).astype(np.float32)
    else:
        score = factor.to_numpy(np.float64).astype(np.float32)
    out = pd.DataFrame({"doc_id": docs, "score": score.astype(np.float64)})
    return (out.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))


@pytest.mark.parametrize("fn", ["max", "min", "avg", "sum"])
@pytest.mark.parametrize("include", [True, False])
def test_payload_score_matches_bruteforce(pay_built, oidx, fn, include):
    idx, _ = pay_built
    term = "merge"
    got = (search(idx, PayloadScore(term, fn=fn, include_span_score=include),
                  k=10, mode="f64").toPandas()
           .sort_values(["score", "doc_id"], ascending=[False, True])
           .reset_index(drop=True))
    want = _expected_payload_topk(oidx, term, fn, include)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()  # bit-exact


def test_payload_composes_in_boolean(pay_built):
    """PayloadScore is an ordinary scoring clause: OR(payload, term)
    equals the per-doc sum of its clause scores (BooleanQuery SHOULD
    semantics), doc set = union."""
    idx, _ = pay_built
    pq = PayloadScore("merge", fn="avg")
    tq = Term("join")
    full = search(idx, Or((pq, tq)), k=None, mode="f64").toPandas()
    a = search(idx, pq, k=None, mode="f64").toPandas()
    b = search(idx, tq, k=None, mode="f64").toPandas()
    comb = (pd.concat([a, b]).groupby("doc_id")["score"].agg(
        lambda s: float(np.float32(np.float32(s.iloc[0]) + np.float32(s.iloc[1]))
                        if len(s) == 2 else s.iloc[0])))
    got = full.set_index("doc_id")["score"].sort_index()
    assert sorted(full["doc_id"]) == sorted(comb.index)
    assert np.allclose(got.to_numpy(), comb.sort_index().to_numpy(),
                       rtol=1e-6, atol=0)


def test_payload_requires_payload_index(spark):
    """Searching PayloadScore against an index built without payloads
    fails loudly (no silent constant factors)."""
    idx_dir = "/root/repo/.cache/test-index"
    import os
    if not os.path.isdir(idx_dir):
        pytest.skip("base test index not built in this session")
    idx = Index(spark, idx_dir)
    with pytest.raises(Exception, match="payload"):
        search(idx, PayloadScore("merge"), k=5, mode="f64").toPandas()


def test_payload_stats_flag_recorded(pay_built):
    _, stats = pay_built
    assert stats["payloads"] == "position_mix"


# ------------------------------------------------------------ delimited e2e

def test_delimited_end_to_end(spark):
    """In-band payloads: whitespace tokenizer keeps 'term|N' intact, the
    delimited filter strips the suffix into the payload byte, and the
    stripped spelling merges with literal occurrences of the same term."""
    shutil.rmtree(DELIM_DIR, ignore_errors=True)
    rows = [
        (0, "alpha|3 beta alpha|7 gamma|2 beta|5"),
        (1, "alpha beta|4 alpha|200 delta"),
        (2, "gamma gamma|9"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    ana = AnalyzerConfig(tokenizer="whitespace", stopwords=frozenset())
    build_index(spark, corpus, DELIM_DIR, drange_size=128, analyzer=ana,
                payloads="delimited:|")
    idx = Index(spark, DELIM_DIR)
    # alpha: doc0 pays [3,7]; doc1 pays [1, 200] (bare alpha -> 1)
    got = (search(idx, PayloadScore("alpha", fn="max",
                                    include_span_score=False),
                  k=10, mode="f64").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1]
    assert got["score"].tolist() == [7.0, 200.0]
    got = (search(idx, PayloadScore("beta", fn="sum",
                                    include_span_score=False),
                  k=10, mode="f64").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["score"].tolist() == [6.0, 4.0]  # doc0: 1+5, doc1: 4
    # gamma: doc2 has bare (1) + suffixed (9) -> min is 1
    got = (search(idx, PayloadScore("gamma", fn="min",
                                    include_span_score=False),
                  k=10, mode="f64").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 2]
    assert got["score"].tolist() == [2.0, 1.0]
    # term dictionary holds the STRIPPED spellings only
    terms = set(idx.termstats().toPandas()["term"])
    assert "alpha" in terms and "alpha|3" not in terms

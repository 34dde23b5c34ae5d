"""Nested span algebra: unit tests of every combinator on hand-built
position streams, engine-vs-oracle equality on the fixture corpus, and a
dedicated seeded fuzz loop over pure span trees (the boolean fuzzer in
test_fuzz_queries mixes Span in probabilistically; this one guarantees
coverage of Near/Or/Not nesting)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from sparklucene.oracle import build_oracle_index, search_oracle
from sparklucene.query import (MatchNoDocs, Span, Term, prune_missing,
                               rewrite)
from sparklucene.spans import (SpanContainingNode, SpanFirstNode,
                               SpanPositionRangeNode,
                               SpanNearNode, SpanNotNode, SpanOrNode,
                               SpanTerm, SpanWithinNode, empty_spans,
                               eval_spans, leaf_terms, prune, simplify)


def _leaf_from(doc_positions: dict[str, dict[int, list[int]]]):
    """leaf callback over {term: {doc: [pos...]}} (canonical order)."""
    def leaf(t):
        per = doc_positions.get(t)
        if not per:
            return empty_spans()
        d, s = [], []
        for doc in sorted(per):
            for p in sorted(per[doc]):
                d.append(doc)
                s.append(p)
        d = np.asarray(d, np.int64)
        s = np.asarray(s, np.int64)
        return d, s, s + 1
    return leaf


def _spans(node, positions):
    d, s, e = eval_spans(node, _leaf_from(positions))
    return list(zip(d.tolist(), s.tolist(), e.tolist()))


T, N, O, X = SpanTerm, SpanNearNode, SpanOrNode, SpanNotNode


def test_span_term_and_or():
    pos = {"a": {1: [0, 5], 3: [2]}, "b": {1: [5]}}
    assert _spans(T("a"), pos) == [(1, 0, 1), (1, 5, 6), (3, 2, 3)]
    # union dedups the shared (1, 5, 6) span
    assert _spans(O((T("a"), T("b"))), pos) == [
        (1, 0, 1), (1, 5, 6), (3, 2, 3)]


def test_near_ordered_gap_and_slop():
    pos = {"a": {1: [0, 10]}, "b": {1: [3, 11]}}
    # anchor 0: chase b at 3 (gap 2) -> only slop >= 2 matches;
    # anchor 10: chase b at 11 (gap 0)
    assert _spans(N((T("a"), T("b")), slop=0), pos) == [(1, 10, 12)]
    assert _spans(N((T("a"), T("b")), slop=2), pos) == [
        (1, 0, 4), (1, 10, 12)]


def test_near_ordered_requires_order():
    pos = {"a": {1: [5]}, "b": {1: [2]}}  # b before a only
    assert _spans(N((T("a"), T("b")), slop=9), pos) == []
    assert _spans(N((T("b"), T("a")), slop=9), pos) == [(1, 2, 6)]


def test_near_unordered_either_order():
    pos = {"a": {1: [5]}, "b": {1: [2]}}
    got = _spans(N((T("a"), T("b")), slop=2, in_order=False), pos)
    assert got == [(1, 2, 6)]  # covering (2, 6), gap = 4 - 2 = 2


def test_near_unordered_nearest_tie_smaller_start():
    # b at distance 2 on both sides of anchor a@5 -> pinned tie: smaller
    pos = {"a": {1: [5]}, "b": {1: [3, 7]}}
    assert _spans(N((T("a"), T("b")), slop=1, in_order=False), pos) == [
        (1, 3, 6)]


def test_span_not_overlap_and_survive():
    inc = N((T("a"), T("b")), slop=3)
    pos = {"a": {1: [0], 2: [0]}, "b": {1: [2], 2: [2]}, "x": {1: [1]}}
    # doc 1's span (0,3) contains x@1 -> excluded; doc 2 has no x
    assert _spans(X(inc, T("x")), pos) == [(2, 0, 3)]
    # non-overlapping exclude (x at 5) survives
    pos2 = {**pos, "x": {1: [5]}}
    assert _spans(X(inc, T("x")), pos2) == [(1, 0, 3), (2, 0, 3)]


def test_span_not_edge_touching_is_not_overlap():
    # end-exclusive: exclude starting exactly at include.end doesn't kill
    pos = {"a": {1: [0]}, "x": {1: [1]}}
    assert _spans(X(T("a"), T("x")), pos) == [(1, 0, 1)]
    # but same position does
    pos2 = {"a": {1: [0]}, "x": {1: [0]}}
    assert _spans(X(T("a"), T("x")), pos2) == []


def test_nested_or_inside_near():
    pos = {"a": {1: [0]}, "b": {2: [0]}, "c": {1: [2], 2: [2]}}
    node = N((O((T("a"), T("b"))), T("c")), slop=1)
    assert _spans(node, pos) == [(1, 0, 3), (2, 0, 3)]


def test_near_over_near_widths():
    # inner near produces a wide span; outer unordered subtracts widths
    pos = {"a": {1: [0]}, "b": {1: [2]}, "c": {1: [4]}}
    inner = N((T("a"), T("b")), slop=1)        # span (0, 3), width 3
    outer = N((inner, T("c")), slop=1, in_order=False)
    # covering (0,5) width 5; widths 3 + 1 = 4; gap 1 <= 1
    assert _spans(outer, pos) == [(1, 0, 5)]
    assert _spans(N((inner, T("c")), slop=0, in_order=False), pos) == []


def test_span_first_over_subspan():
    # SpanFirst over a Near: only matches whose END is inside the limit
    pos = {"a": {1: [0, 10]}, "b": {1: [1, 11]}}
    near = N((T("a"), T("b")), slop=0)
    assert _spans(near, pos) == [(1, 0, 2), (1, 10, 12)]
    assert _spans(SpanFirstNode(near, 5), pos) == [(1, 0, 2)]
    assert _spans(SpanFirstNode(near, 2), pos) == [(1, 0, 2)]  # inclusive
    assert _spans(SpanFirstNode(near, 1), pos) == []
    # and over an Or, nested inside a Not
    tree = X(SpanFirstNode(O((T("a"), T("b"))), 2), T("b"))
    # first-2 spans: a@0 (0,1), b@1 (1,2); exclude overlaps b spans
    assert _spans(tree, pos) == [(1, 0, 1)]
    assert simplify(SpanFirstNode(T("a"), 0)) is None
    assert prune(SpanFirstNode(T("gone"), 5), {"a"}) is None
    assert leaf_terms(SpanFirstNode(N((T("a"), T("b")), 1), 4)) == ["a", "b"]


def test_span_containing_and_within():
    C, W = SpanContainingNode, SpanWithinNode
    # big = ordered near a..b windows; little = c occurrences
    pos = {"a": {1: [0, 10], 2: [0]}, "b": {1: [4, 14], 2: [4]},
           "c": {1: [2, 20], 2: [8]}}
    big = N((T("a"), T("b")), slop=4)
    assert _spans(big, pos) == [(1, 0, 5), (1, 10, 15), (2, 0, 5)]
    # doc 1: window (0,5) contains c@2; (10,15) has no c inside;
    # doc 2: c@8 is outside (0,5)
    assert _spans(C(big, T("c")), pos) == [(1, 0, 5)]
    # Within is the mirror: which c occurrences fall inside a window
    assert _spans(W(T("c"), big), pos) == [(1, 2, 3)]
    # boundary: containment is inclusive on both edges
    pos2 = {"a": {1: [0]}, "b": {1: [2]}, "c": {1: [0, 2]}}
    big2 = N((T("a"), T("b")), slop=2)
    assert _spans(big2, pos2) == [(1, 0, 3)]
    assert _spans(C(big2, T("c")), pos2) == [(1, 0, 3)]
    assert _spans(W(T("c"), big2), pos2) == [(1, 0, 1), (1, 2, 3)]
    # a little span straddling the big end does NOT count
    pos3 = {"a": {1: [0]}, "b": {1: [1]}, "c": {1: [1]}}
    w2 = N((T("a"), T("c")), slop=0)  # (1, 0, 2) — ends past big (0, 2)?
    assert _spans(C(N((T("a"), T("b")), slop=0), w2), pos3) == [(1, 0, 2)]
    # structural: both sides required
    assert prune(C(T("a"), T("gone")), {"a"}) is None
    assert prune(W(T("gone"), T("a")), {"a"}) is None
    assert simplify(C(O(()), T("a"))) is None
    assert leaf_terms(C(N((T("a"), T("b")), 0), T("c"))) == ["a", "b", "c"]
    assert leaf_terms(W(T("c"), T("a"))) == ["c", "a"]


def test_span_containing_multi_doc_vectorized():
    """Exercise the packed suffix-min / prefix-max paths across doc
    boundaries (the dominance-reset trick must not leak across docs)."""
    C, W = SpanContainingNode, SpanWithinNode
    rng = random.Random(42)
    docs = list(range(12))
    pos = {"a": {}, "b": {}, "c": {}}
    for d in docs:
        pos["a"][d] = sorted(rng.sample(range(30), 4))
        pos["b"][d] = sorted(rng.sample(range(30), 4))
        pos["c"][d] = sorted(rng.sample(range(30), 3))
    big = N((T("a"), T("b")), slop=6)
    for tree in (C(big, T("c")), W(T("c"), big)):
        got = _spans(tree, pos)
        # brute-force mirror per doc
        want = []
        for d in docs:
            per = {t: {d: pos[t][d]} for t in pos}
            want.extend((d, s, e) for d2, s, e in _spans(tree, per))
        assert got == sorted(set(want)), tree


def test_simplify_and_prune():
    node = N((O((T("a"),)), T("b")), slop=1)
    assert simplify(node) == N((T("a"), T("b")), slop=1)
    assert simplify(O(())) is None
    assert prune(N((T("a"), T("gone")), slop=1), {"a"}) is None
    assert prune(O((T("a"), T("gone"))), {"a"}) == T("a")
    assert prune(X(T("a"), T("gone")), {"a"}) == T("a")
    assert leaf_terms(X(N((T("a"), T("b")), 0), T("c"))) == ["a", "b", "c"]
    assert leaf_terms(X(N((T("a"), T("b")), 0), T("c")),
                      include_only=True) == ["a", "b"]


def test_rewrite_degenerate_span():
    assert rewrite(Span(O(()))) == MatchNoDocs()
    assert rewrite(Span(O((T("a"),)))) == Term("a")
    assert isinstance(prune_missing(rewrite(Span(N((T("a"), T("b")), 1))),
                                    {"a"}), MatchNoDocs)


@pytest.fixture(scope="module")
def oidx(corpus_pdf):
    return build_oracle_index(corpus_pdf)


VOCAB = ["spark", "merge", "join", "scan", "filter", "window", "table",
         "hash", "batch", "vector", "stream", "agg"]


def _rand_node(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 2 or r < 0.35:
        return T(rng.choice(VOCAB + ["zzz_absent"]))
    if r < 0.6:
        kids = tuple(_rand_node(rng, depth + 1)
                     for _ in range(rng.randint(2, 3)))
        return N(kids, slop=rng.choice([0, 1, 3, 8, 15]),
                 in_order=rng.random() < 0.5)
    if r < 0.8:
        kids = tuple(_rand_node(rng, depth + 1)
                     for _ in range(rng.randint(2, 3)))
        return O(kids)
    if r < 0.84:
        return SpanFirstNode(_rand_node(rng, depth + 1),
                             rng.choice([1, 3, 10, 50]))
    if r < 0.86:
        lo = rng.choice([0, 2, 5])
        return SpanPositionRangeNode(_rand_node(rng, depth + 1), lo,
                                     lo + rng.choice([1, 5, 30]))
    if r < 0.91:
        return SpanContainingNode(_rand_node(rng, depth + 1),
                                  _rand_node(rng, depth + 1))
    if r < 0.96:
        return SpanWithinNode(_rand_node(rng, depth + 1),
                              _rand_node(rng, depth + 1))
    return X(_rand_node(rng, depth + 1), _rand_node(rng, depth + 1))


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("mode", ["lucene8", "f64"])
def test_fuzzed_span_trees_vs_oracle(oidx, seed, mode):
    from tests.test_scorer import _scorer_from_oracle

    present = set(oidx.tf["term"].unique())
    rng = random.Random(7000 + seed)
    n_checked = 0
    for _ in range(20):
        q = prune_missing(rewrite(Span(_rand_node(rng))), present)
        if isinstance(q, MatchNoDocs):
            continue
        for k in (3, 10):
            sp = _scorer_from_oracle(oidx, mode, prune=True)
            dp, vp = sp.topk(q, k)
            want = search_oracle(oidx, q, k, mode=mode)
            assert dp.tolist() == want["doc_id"].tolist(), f"ids {q}"
            assert (vp == want["score"].to_numpy()).all(), f"scores {q}"
            n_checked += 1
    assert n_checked >= 12


@pytest.fixture(scope="module")
def engine_idx(spark):
    from sparklucene.driver_queries import index_for

    return index_for(spark, "/root/testdata/sf0.001")


def test_span_multi_term_expansion_shapes(engine_idx):
    """SpanMultiTermQueryWrapper rewrite: multi -> sorted SpanOr,
    single -> bare SpanTerm, none -> None, cap respected."""
    from sparklucene.query import Prefix, Wildcard
    from sparklucene.search import span_multi_term

    node = span_multi_term(engine_idx, Wildcard("s*a*"))
    assert isinstance(node, O)
    assert [c.term for c in node.clauses] == ["scan", "small", "spark",
                                              "stream"]
    assert span_multi_term(engine_idx, Prefix("gro")) == T("group")
    assert span_multi_term(engine_idx, Prefix("zzz")) is None
    # over-cap expansion raises, Lucene's TooManyClauses analog
    with pytest.raises(ValueError, match="max_expansions"):
        span_multi_term(engine_idx, Prefix("s"), max_expansions=2)


def test_span_multi_term_fuzzed_vs_oracle(engine_idx, oidx):
    """Wildcard/prefix/fuzzy-wrapped leaves embedded in random span
    trees: the engine's span path must equal the brute-force oracle on
    the rewritten tree for every seed."""
    from tests.test_scorer import _scorer_from_oracle

    from sparklucene.query import Fuzzy, Prefix, Wildcard
    from sparklucene.search import span_multi_term

    mtqs = [Wildcard("s*a*"), Prefix("s"), Prefix("ha"), Wildcard("*dow"),
            Fuzzy("marge", max_edits=1), Prefix("jo")]
    present = set(oidx.tf["term"].unique())
    rng = random.Random(5150)
    n_checked = 0
    for _ in range(24):
        wrapped = span_multi_term(engine_idx, rng.choice(mtqs))
        assert wrapped is not None
        lit = T(rng.choice(VOCAB))
        pair = (lit, wrapped) if rng.random() < 0.5 else (wrapped, lit)
        tree = N(pair, slop=rng.choice([0, 2, 5, 12]),
                 in_order=rng.random() < 0.5)
        if rng.random() < 0.3:
            tree = X(tree, T(rng.choice(VOCAB)))
        q = prune_missing(rewrite(Span(tree)), present)
        if isinstance(q, MatchNoDocs):
            continue
        sp = _scorer_from_oracle(oidx, "f64", prune=True)
        dp, vp = sp.topk(q, 10)
        want = search_oracle(oidx, q, 10, mode="f64")
        assert dp.tolist() == want["doc_id"].tolist(), f"ids {q}"
        assert (vp == want["score"].to_numpy()).all(), f"scores {q}"
        n_checked += 1
    assert n_checked >= 20


def test_span_position_range():
    """SpanPositionRangeQuery: spans fully inside [start, end); SpanFirst
    == start=0; simplify/prune traversals handle the node."""
    pos = {"a": {1: [0, 5, 10]}, "b": {1: [1, 6, 11]}}
    P = SpanPositionRangeNode
    assert _spans(P(T("a"), 0, 6), pos) == [(1, 0, 1), (1, 5, 6)]
    assert _spans(P(T("a"), 3, 11), pos) == [(1, 5, 6), (1, 10, 11)]
    # over a sub-span: the whole near span must sit inside the window
    near = N((T("a"), T("b")), slop=0)
    assert _spans(P(near, 4, 8), pos) == [(1, 5, 7)]
    assert _spans(P(near, 4, 7), pos) == [(1, 5, 7)]
    assert _spans(P(near, 6, 8), pos) == []
    # SpanFirst equivalence at start=0
    assert _spans(P(near, 0, 7), pos) == _spans(SpanFirstNode(near, 7), pos)
    # structural traversals
    assert simplify(P(T("a"), 5, 5)) is None
    assert prune(P(T("gone"), 0, 5), {"a"}) is None
    assert leaf_terms(P(N((T("a"), T("b")), 1), 0, 4)) == ["a", "b"]

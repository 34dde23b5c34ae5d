"""query.Within — minimal intervals (ordered / unordered within window).

Reference surface: u8:lucene/queries/.../intervals/ (Intervals.ordered /
Intervals.unordered under Intervals.maxwidth). The pinned anchor-count
matching spec is documented on the Within dataclass; these tests pin it
with hand-checked fixtures plus composition/edge behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparklucene.query import (MatchNoDocs, Or, Term, Within, prune_missing,
                               rewrite)
from tests.test_round2_fixes import _scorer_for

FIXTURE = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "content": [
    "alpha beta gamma",         # 0: ordered+unordered width 2
    "beta alpha gamma",         # 1: unordered width 2; no beta after alpha
    "alpha x x x beta",         # 2: width 5
    "alpha x beta alpha beta",  # 3: anchors 0 (w3) and 3 (w2)
    "gamma delta",              # 4: no members
    "beta x x alpha",           # 5: unordered width 4, not ordered
]})


def _hits(q, pdf=FIXTURE):
    s = _scorer_for(pdf)
    docs, scores = s.topk(q, k=10)
    return dict(zip(docs.tolist(), scores.tolist()))


def test_unordered_window_sweep():
    assert set(_hits(Within(("alpha", "beta"), 2))) == {0, 1, 3}
    assert set(_hits(Within(("alpha", "beta"), 3))) == {0, 1, 3}
    assert set(_hits(Within(("alpha", "beta"), 4))) == {0, 1, 3, 5}
    assert set(_hits(Within(("alpha", "beta"), 5))) == {0, 1, 2, 3, 5}


def test_ordered_requires_order():
    assert set(_hits(Within(("alpha", "beta"), 2, ordered=True))) == {0, 3}
    assert set(_hits(Within(("alpha", "beta"), 5, ordered=True))) == {0, 2, 3}
    # beta-then-alpha direction
    assert set(_hits(Within(("beta", "alpha"), 4, ordered=True))) == {1, 3, 5}


def test_anchor_count_scales_score():
    # doc 3 has ONE matching anchor at window 2 but TWO at window 3 —
    # freq doubles, score strictly increases
    s2 = _hits(Within(("alpha", "beta"), 2))[3]
    s3 = _hits(Within(("alpha", "beta"), 3))[3]
    assert s3 > s2


def test_three_member_ordered_chase():
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "content": [
        "one two three",        # chase 0->1->2, width 3
        "one three two",        # two after one, but three not after two
        "one x two x three",    # width 5
    ]})
    assert set(_hits(Within(("one", "two", "three"), 3, ordered=True),
                     pdf)) == {0}
    assert set(_hits(Within(("one", "two", "three"), 5, ordered=True),
                     pdf)) == {0, 2}


def test_unordered_nearest_tie_prefers_smaller_position():
    # anchor 'mid' at pos 2; 'edge' at 0 and 4 — equidistant, the pinned
    # spec picks pos 0, span [0..2] width 3
    pdf = pd.DataFrame({"doc_id": [0],
                        "content": ["edge x mid x edge"]})
    assert set(_hits(Within(("mid", "edge"), 3), pdf)) == {0}


def test_rewrite_and_prune():
    assert rewrite(Within((), 5)) == MatchNoDocs()
    assert rewrite(Within(("a",), 5)) == Term("a")
    assert rewrite(Within(("a", "b"), 0)) == MatchNoDocs()
    assert prune_missing(Within(("alpha", "zzz"), 5),
                         {"alpha"}) == MatchNoDocs()


def test_within_composes_in_boolean():
    q = Or((Within(("alpha", "beta"), 2, ordered=True), Term("delta")))
    hits = _hits(q)
    assert set(hits) == {0, 3, 4}


def test_duplicate_members_rejected():
    s = _scorer_for(FIXTURE)
    with pytest.raises(ValueError, match="distinct"):
        s.topk(Within(("alpha", "alpha"), 3), k=5)


def test_within_through_search_engine(spark):
    """Full engine path == direct scorer union (single-range fixture) and
    the documented search() surface accepts Within."""
    from sparklucene.driver_queries import index_for
    from sparklucene.search import search

    idx = index_for(spark, "/root/testdata/sf0.001")
    out = search(idx, Within(("merge", "join"), 6), k=10,
                 mode="f64").collect()
    assert len(out) == 10
    assert all(r["score"] > 0 for r in out)


# ---- SpanFirst (minimal SpanFirstQuery slice) ---------------------------

def test_spanfirst_position_cutoff():
    from sparklucene.query import SpanFirst
    # 'beta' at pos 0 (docs 1, 5), 1 (doc 0), 2 (doc 3), 4 (docs 2, 3)
    assert set(_hits(SpanFirst("beta", 1))) == {1, 5}
    assert set(_hits(SpanFirst("beta", 2))) == {0, 1, 5}
    assert set(_hits(SpanFirst("beta", 3))) == {0, 1, 3, 5}
    assert set(_hits(SpanFirst("beta", 5))) == {0, 1, 2, 3, 5}


def test_spanfirst_freq_counts_qualifying_positions():
    from sparklucene.query import SpanFirst
    # doc 3 has beta at pos 2 and 4: freq 2 under end=5, freq 1 under
    # end=3 -> strictly larger score with the larger window
    h5 = _hits(SpanFirst("beta", 5))
    h3 = _hits(SpanFirst("beta", 3))
    assert h5[3] > h3[3]


def test_spanfirst_unbounded_equals_term():
    from sparklucene.query import SpanFirst
    a = _hits(SpanFirst("beta", 10**6))
    b = _hits(Term("beta"))
    assert a == b


def test_spanfirst_rewrite_and_prune():
    from sparklucene.query import SpanFirst
    assert rewrite(SpanFirst("a", 0)) == MatchNoDocs()
    assert rewrite(SpanFirst("a", -3)) == MatchNoDocs()
    assert prune_missing(SpanFirst("zzz", 5), {"alpha"}) == MatchNoDocs()
    assert prune_missing(SpanFirst("alpha", 5),
                         {"alpha"}) == SpanFirst("alpha", 5)


def test_spanfirst_composes_and_respects_not():
    from sparklucene.query import Not, SpanFirst
    assert set(_hits(Or((SpanFirst("beta", 1), Term("delta"))))) == {1, 4, 5}
    assert set(_hits(Not(SpanFirst("beta", 5), Term("gamma")))) == {2, 3, 5}


# ---------------------------------------------------------------------------
# Surround query language parser -> span trees.
# ---------------------------------------------------------------------------

def test_surround_parser_shapes():
    import pytest as _pt
    from sparklucene.spans import (SpanNearNode, SpanNotNode, SpanOrNode,
                                   SpanTerm, parse_surround)
    q = parse_surround("3W(OR(Fast, slow), NOT(join, merge))")
    assert q == SpanNearNode(
        (SpanOrNode((SpanTerm("fast"), SpanTerm("slow"))),
         SpanNotNode(SpanTerm("join"), SpanTerm("merge"))),
        slop=2, in_order=True)
    assert parse_surround("N(a, b)") == SpanNearNode(
        (SpanTerm("a"), SpanTerm("b")), slop=0, in_order=False)
    assert parse_surround("w") == SpanTerm("w")  # bare word, not an op
    for bad in ("AND(a, b)", "OR(a)", "NOT(a, b, c)", "0W(a, b)",
                "2W(a, b", "2W(a b)", "2W(a, b) extra"):
        with _pt.raises(ValueError):
            parse_surround(bad)


def test_surround_parse_equals_hand_built(spark):
    from sparklucene.driver_queries import index_for
    from sparklucene.query import Span
    from sparklucene.search import search
    from sparklucene.spans import (SpanNearNode, SpanOrNode, SpanTerm,
                                   parse_surround)
    idx = index_for(spark, "/root/testdata/sf0.001")
    parsed = parse_surround("2W(fast, OR(join, merge))")
    hand = SpanNearNode((SpanTerm("fast"),
                         SpanOrNode((SpanTerm("join"), SpanTerm("merge")))),
                        slop=1, in_order=True)
    assert parsed == hand
    a = search(idx, Span(parsed), k=10, mode="f64").collect()
    b = search(idx, Span(hand), k=10, mode="f64").collect()
    assert a == b


def test_surround_roundtrip_fuzz():
    """Random span trees serialize to surround syntax and parse back to
    the identical tree (parser totality over the generatable subset)."""
    import random

    from sparklucene.spans import (SpanNearNode, SpanNotNode, SpanOrNode,
                                   SpanTerm, parse_surround)

    WORDS = ["fast", "slow", "join", "merge", "hash", "scan", "key",
             "w", "n", "or2", "x_1"]

    def rand_tree(rng, depth=0):
        r = rng.random()
        if depth >= 3 or r < 0.4:
            return SpanTerm(rng.choice(WORDS))
        kids = tuple(rand_tree(rng, depth + 1)
                     for _ in range(rng.randint(2, 3)))
        if r < 0.6:
            return SpanNearNode(kids, slop=rng.randint(0, 7),
                                in_order=rng.random() < 0.5)
        if r < 0.8:
            return SpanOrNode(kids)
        return SpanNotNode(kids[0], kids[1])

    def to_surround(t):
        if isinstance(t, SpanTerm):
            return t.term
        if isinstance(t, SpanNearNode):
            op = "W" if t.in_order else "N"
            args = ", ".join(to_surround(c) for c in t.clauses)
            return f"{t.slop + 1}{op}({args})"
        if isinstance(t, SpanOrNode):
            return "OR(" + ", ".join(to_surround(c) for c in t.clauses) + ")"
        return f"NOT({to_surround(t.include)}, {to_surround(t.exclude)})"

    for seed in range(200):
        rng = random.Random(4200 + seed)
        t = rand_tree(rng)
        assert parse_surround(to_surround(t)) == t, to_surround(t)

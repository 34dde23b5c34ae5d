"""Nested span algebra — composable positional queries over posting
positions.

The PySpark-native counterpart of Lucene's span family (public knowledge:
``u8:lucene/core/.../search/spans/{SpanTermQuery,SpanNearQuery,SpanOrQuery,
SpanNotQuery}.java`` and the intervals surface
``u8:lucene/queries/.../intervals/Intervals.java``). Round 3 shipped only
the flat slices (``query.Within``, ``query.SpanFirst``); this module adds
the *composable* tree: SpanNear over SpanOr, SpanNot exclusion windows —
what code-search proximity users actually write.

A **span set** is three aligned int64 numpy arrays ``(docs, starts,
ends)`` — end-exclusive token intervals on the pre-stop position stream
(the same stream Phrase/Within use) — lexsorted by (doc, start, end) with
exact-duplicate triples removed. Every combinator consumes and produces
this representation, fully vectorized across all docs of a doc range at
once (no per-doc Python in the engine path; the brute-force per-doc
mirror lives in ``oracle.py``).

Pinned matching spec (this docstring is the oracle contract, like the
sloppy-phrase and Within specs):

* ``SpanTerm(t)`` — one span ``(p, p+1)`` per position ``p`` of ``t``.
* ``SpanOrNode(clauses)`` — set union of the clause span sets.
* ``SpanNearNode(clauses, slop, in_order=True)`` — every span of
  ``clauses[0]`` is an ANCHOR. Greedy ordered chase: for each later
  clause take its (start, end)-lexicographically smallest span with
  ``start >= prev_end`` in the same doc; the gap ``start - prev_end``
  accumulates. The anchor matches when the chase completes with total
  gap <= ``slop``; the result span is ``(anchor_start, last_end)``.
* ``SpanNearNode(clauses, slop, in_order=False)`` — for each anchor
  span of ``clauses[0]``, every other clause contributes its span
  nearest by ``|start - anchor_start|`` (ties -> smaller start, then
  smaller end). With covering interval ``(lo, hi)`` over all chosen
  spans (anchor included), the anchor matches when
  ``(hi - lo) - sum(span widths) <= slop``; the result span is the
  covering ``(lo, hi)``.
* ``SpanNotNode(include, exclude, pre=0, post=0)`` — an include span
  survives iff no exclude span in the same doc overlaps its widened
  window (``x.start < i.end + post and x.end > i.start - pre`` —
  SpanNotQuery's pre/post exclusion distances; pre = post = 0 is the
  plain overlap test).
* ``SpanFirstNode(match, limit)`` — spans of ``match`` with
  ``end <= limit`` (SpanFirstQuery over an arbitrary sub-span).
* ``SpanContainingNode(big, little)`` — spans of ``big`` that enclose
  at least one ``little`` span (``little.start >= big.start`` and
  ``little.end <= big.end``, same doc); result spans come from ``big``.
* ``SpanWithinNode(little, big)`` — spans of ``little`` enclosed by at
  least one ``big`` span; result spans come from ``little``.

Scoring of a ``query.Span`` wrapper: freq = |root span set| per doc,
weighted with the summed-idf phrase weight over the include-side leaf
terms (pre-order, first-occurrence dedup, terms absent from the index
contribute no idf) — SpanWeight builds its simScorer from the positive
terms only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Union

import numpy as np

SpanSet = tuple[np.ndarray, np.ndarray, np.ndarray]

#: positions are < 2^31 (codec contract), so start/end fit 32 bits and
#: (doc << 32 | start) packs into uint64 for searchsorted probes
_POS_BITS = np.uint64(32)


@dataclass(frozen=True)
class SpanTerm:
    term: str


@dataclass(frozen=True)
class SpanNearNode:
    clauses: tuple
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanOrNode:
    clauses: tuple


@dataclass(frozen=True)
class SpanNotNode:
    include: "SpanNode"
    exclude: "SpanNode"
    #: SpanNotQuery's pre/post exclusion distances
    #: (u8:lucene/core/.../search/spans/SpanNotQuery.java): the include
    #: span dies when an exclude span overlaps the WIDENED window
    #: [start - pre, end + post).
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirstNode:
    """SpanFirstQuery over an arbitrary sub-span (Lucene wraps any
    SpanQuery, not just a term — ``u8:lucene/core/.../search/spans/
    SpanFirstQuery.java``): keep spans with ``end <= limit``."""

    match: "SpanNode"
    limit: int


@dataclass(frozen=True)
class SpanPositionRangeNode:
    """SpanPositionRangeQuery (``u8:lucene/core/.../search/spans/
    SpanPositionRangeQuery.java`` — SpanFirstQuery's parent class): keep
    spans fully inside the position window [start, end): ``span.start >=
    start`` and ``span.end <= end``. SpanFirst == start=0."""

    match: "SpanNode"
    start: int
    end: int


@dataclass(frozen=True)
class SpanContainingNode:
    """SpanContainingQuery (``u8:lucene/core/.../search/spans/
    SpanContainingQuery.java``): keep spans of ``big`` that contain at
    least one span of ``little`` (``little.start >= big.start`` and
    ``little.end <= big.end``, same doc). The result spans — and hence
    freq — come from the ``big`` side; both sides are required, so both
    sides' leaf terms weigh."""

    big: "SpanNode"
    little: "SpanNode"


@dataclass(frozen=True)
class SpanWithinNode:
    """SpanWithinQuery (``u8:lucene/core/.../search/spans/
    SpanWithinQuery.java``): keep spans of ``little`` that are enclosed
    by at least one span of ``big``. Result spans come from the
    ``little`` side; both sides required and weighted."""

    little: "SpanNode"
    big: "SpanNode"


SpanNode = Union[SpanTerm, SpanNearNode, SpanOrNode, SpanNotNode,
                 SpanFirstNode, SpanPositionRangeNode, SpanContainingNode,
                 SpanWithinNode]


def leaf_terms(node: SpanNode, include_only: bool = False) -> list[str]:
    """Leaf terms in pre-order, first occurrence kept. With
    ``include_only`` the exclude side of SpanNot is skipped (those terms
    match but never weigh — SpanNotQuery scores from the include side)."""
    out: list[str] = []
    seen: set[str] = set()

    def walk(n: SpanNode) -> None:
        if isinstance(n, SpanTerm):
            if n.term not in seen:
                seen.add(n.term)
                out.append(n.term)
        elif isinstance(n, (SpanNearNode, SpanOrNode)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, SpanNotNode):
            walk(n.include)
            if not include_only:
                walk(n.exclude)
        elif isinstance(n, (SpanFirstNode, SpanPositionRangeNode)):
            walk(n.match)
        elif isinstance(n, SpanContainingNode):
            walk(n.big)
            walk(n.little)
        elif isinstance(n, SpanWithinNode):
            walk(n.little)
            walk(n.big)
        else:
            raise TypeError(f"not a span node: {n!r}")

    walk(node)
    return out


def map_terms(node: SpanNode, fn: Callable[[str], str]) -> SpanNode:
    """Structure-preserving leaf-term rewrite (field qualification)."""
    if isinstance(node, SpanTerm):
        return SpanTerm(fn(node.term))
    if isinstance(node, SpanNearNode):
        return SpanNearNode(tuple(map_terms(c, fn) for c in node.clauses),
                            node.slop, node.in_order)
    if isinstance(node, SpanOrNode):
        return SpanOrNode(tuple(map_terms(c, fn) for c in node.clauses))
    if isinstance(node, SpanNotNode):
        return SpanNotNode(map_terms(node.include, fn),
                           map_terms(node.exclude, fn),
                           node.pre, node.post)
    if isinstance(node, SpanFirstNode):
        return SpanFirstNode(map_terms(node.match, fn), node.limit)
    if isinstance(node, SpanPositionRangeNode):
        return SpanPositionRangeNode(map_terms(node.match, fn),
                                     node.start, node.end)
    if isinstance(node, SpanContainingNode):
        return SpanContainingNode(map_terms(node.big, fn),
                                  map_terms(node.little, fn))
    if isinstance(node, SpanWithinNode):
        return SpanWithinNode(map_terms(node.little, fn),
                              map_terms(node.big, fn))
    raise TypeError(f"not a span node: {node!r}")


def simplify(node: SpanNode) -> SpanNode | None:
    """Structural rewrite: unwrap single-clause Near/Or, drop empty
    branches. Returns None when the node can never match (empty clause
    list, or a Near with an unmatchable clause)."""
    if isinstance(node, SpanTerm):
        return node
    if isinstance(node, SpanOrNode):
        kids = [simplify(c) for c in node.clauses]
        kids = [c for c in kids if c is not None]
        if not kids:
            return None
        return kids[0] if len(kids) == 1 else SpanOrNode(tuple(kids))
    if isinstance(node, SpanNearNode):
        if node.slop < 0:
            return None
        kids = [simplify(c) for c in node.clauses]
        if not kids or any(c is None for c in kids):
            return None  # every Near clause is required
        return kids[0] if len(kids) == 1 else SpanNearNode(
            tuple(kids), node.slop, node.in_order)
    if isinstance(node, SpanNotNode):
        inc = simplify(node.include)
        if inc is None:
            return None
        exc = simplify(node.exclude)
        return inc if exc is None else SpanNotNode(inc, exc, node.pre,
                                                   node.post)
    if isinstance(node, SpanFirstNode):
        if node.limit <= 0:
            return None
        m = simplify(node.match)
        return None if m is None else SpanFirstNode(m, node.limit)
    if isinstance(node, SpanPositionRangeNode):
        if node.end <= node.start:
            return None
        m = simplify(node.match)
        return None if m is None else SpanPositionRangeNode(
            m, node.start, node.end)
    if isinstance(node, SpanContainingNode):
        big, little = simplify(node.big), simplify(node.little)
        if big is None or little is None:  # both sides required
            return None
        return SpanContainingNode(big, little)
    if isinstance(node, SpanWithinNode):
        little, big = simplify(node.little), simplify(node.big)
        if big is None or little is None:
            return None
        return SpanWithinNode(little, big)
    raise TypeError(f"not a span node: {node!r}")


def prune(node: SpanNode, present: set[str]) -> SpanNode | None:
    """Drop leaves absent from the index (their span sets are empty, so
    this is a pure optimization with identical semantics): a Near loses
    the whole tree, an Or drops the branch, a Not losing its exclude
    keeps the include. Returns None when nothing can match."""
    if isinstance(node, SpanTerm):
        return node if node.term in present else None
    if isinstance(node, SpanOrNode):
        kids = [prune(c, present) for c in node.clauses]
        kids = [c for c in kids if c is not None]
        if not kids:
            return None
        return kids[0] if len(kids) == 1 else SpanOrNode(tuple(kids))
    if isinstance(node, SpanNearNode):
        kids = [prune(c, present) for c in node.clauses]
        if not kids or any(c is None for c in kids):
            return None
        return kids[0] if len(kids) == 1 else SpanNearNode(
            tuple(kids), node.slop, node.in_order)
    if isinstance(node, SpanNotNode):
        inc = prune(node.include, present)
        if inc is None:
            return None
        exc = prune(node.exclude, present)
        return inc if exc is None else SpanNotNode(inc, exc, node.pre,
                                                   node.post)
    if isinstance(node, SpanFirstNode):
        m = prune(node.match, present)
        return None if m is None else SpanFirstNode(m, node.limit)
    if isinstance(node, SpanPositionRangeNode):
        m = prune(node.match, present)
        return None if m is None else SpanPositionRangeNode(
            m, node.start, node.end)
    if isinstance(node, SpanContainingNode):
        big, little = prune(node.big, present), prune(node.little, present)
        if big is None or little is None:
            return None
        return SpanContainingNode(big, little)
    if isinstance(node, SpanWithinNode):
        little, big = prune(node.little, present), prune(node.big, present)
        if big is None or little is None:
            return None
        return SpanWithinNode(little, big)
    raise TypeError(f"not a span node: {node!r}")


# ---------------------------------------------------------------------------
# vectorized span-set machinery
# ---------------------------------------------------------------------------

def empty_spans() -> SpanSet:
    z = np.empty(0, np.int64)
    return z, z.copy(), z.copy()


def _canon(docs: np.ndarray, starts: np.ndarray, ends: np.ndarray
           ) -> SpanSet:
    """Lexsort by (doc, start, end) + exact-duplicate removal."""
    if docs.size == 0:
        return empty_spans()
    order = np.lexsort((ends, starts, docs))
    d, s, e = docs[order], starts[order], ends[order]
    keep = np.empty(d.size, dtype=bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1]) | (e[1:] != e[:-1])
    return d[keep], s[keep], e[keep]


def _pack(docs: np.ndarray, vals: np.ndarray) -> np.ndarray:
    return (docs.astype(np.uint64) << _POS_BITS) | vals.astype(np.uint64)


def _eval_or(sets: list[SpanSet]) -> SpanSet:
    live = [x for x in sets if x[0].size]
    if not live:
        return empty_spans()
    return _canon(np.concatenate([x[0] for x in live]),
                  np.concatenate([x[1] for x in live]),
                  np.concatenate([x[2] for x in live]))


def _eval_near_ordered(sets: list[SpanSet], slop: int) -> SpanSet:
    ad, as_, ae = sets[0]
    if ad.size == 0:
        return empty_spans()
    alive = np.ones(ad.size, dtype=bool)
    prev_end = ae.astype(np.int64).copy()
    gap = np.zeros(ad.size, dtype=np.int64)
    for d_i, s_i, e_i in sets[1:]:
        if d_i.size == 0:
            return empty_spans()
        key_i = _pack(d_i, s_i)
        j = np.searchsorted(key_i, _pack(ad, prev_end), side="left")
        ok = j < d_i.size
        jc = np.minimum(j, d_i.size - 1)
        ok &= d_i[jc] == ad  # landed in the same doc
        alive &= ok
        # among same-(doc, start) ties searchsorted('left') lands on the
        # smallest end (canonical lexsort) — the pinned greedy choice
        gap = np.where(ok, gap + (s_i[jc] - prev_end), gap)
        prev_end = np.where(ok, e_i[jc], prev_end)
    m = alive & (gap <= slop)
    if not m.any():
        return empty_spans()
    return _canon(ad[m], as_[m], prev_end[m])


def _eval_near_unordered(sets: list[SpanSet], slop: int) -> SpanSet:
    ad, as_, ae = sets[0]
    if ad.size == 0:
        return empty_spans()
    alive = np.ones(ad.size, dtype=bool)
    lo = as_.astype(np.int64).copy()
    hi = ae.astype(np.int64).copy()
    width_sum = (ae - as_).astype(np.int64)
    for d_i, s_i, e_i in sets[1:]:
        if d_i.size == 0:
            return empty_spans()
        key_i = _pack(d_i, s_i)
        seg_lo = np.searchsorted(d_i, ad, side="left")
        seg_hi = np.searchsorted(d_i, ad, side="right")
        ok = seg_lo < seg_hi  # the clause has a span in this doc
        alive &= ok
        j = np.searchsorted(key_i, _pack(ad, as_), side="left")
        seg_last = np.maximum(seg_lo, seg_hi - 1)
        jc = np.minimum(np.clip(j, seg_lo, seg_last), d_i.size - 1)
        jl = np.minimum(np.clip(j - 1, seg_lo, seg_last), d_i.size - 1)
        dc = np.abs(s_i[jc] - as_)
        dl = np.abs(s_i[jl] - as_)
        qs = np.where(dl <= dc, s_i[jl], s_i[jc])  # nearest; tie -> smaller
        # smallest end among the chosen start's run: re-probe 'left'
        j2 = np.searchsorted(key_i, _pack(ad, qs), side="left")
        j2 = np.clip(j2, 0, d_i.size - 1)
        qe = e_i[j2]
        lo = np.where(ok, np.minimum(lo, qs), lo)
        hi = np.where(ok, np.maximum(hi, qe), hi)
        width_sum = np.where(ok, width_sum + (qe - qs), width_sum)
    m = alive & ((hi - lo) - width_sum <= slop)
    if not m.any():
        return empty_spans()
    return _canon(ad[m], lo[m], hi[m])


def _eval_not(inc: SpanSet, exc: SpanSet, pre: int = 0,
              post: int = 0) -> SpanSet:
    d, s, e = inc
    if d.size == 0 or exc[0].size == 0:
        return inc
    xd, xs, xe = exc
    # segmented running max of exclude ends over (doc, start) order: the
    # packed key (doc << 32 | end) is dominated by the doc field, so a
    # plain cumulative max restarts per doc segment (ends < 2^31)
    acc = np.maximum.accumulate(_pack(xd, xe))
    prefmax_end = (acc & np.uint64((1 << 32) - 1)).astype(np.int64)
    key_x = _pack(xd, xs)
    jr = np.searchsorted(key_x, _pack(d, e + np.int64(post)), side="left")
    lo_d = np.searchsorted(xd, d, side="left")
    # some exclude in this doc starts before the widened window's end
    has_prior = jr > lo_d
    pm = prefmax_end[np.maximum(jr, 1) - 1]
    overlap = has_prior & (pm > s - np.int64(pre))
    keep = ~overlap
    if keep.all():
        return inc
    return d[keep], s[keep], e[keep]


def _eval_containing(big: SpanSet, little: SpanSet) -> SpanSet:
    """Big spans that enclose >= 1 little span. Containment needs
    ``little.start >= big.start`` and ``little.end <= big.end`` (the
    implied ``little.start < big.end`` follows from start < end on int
    positions). Vectorized: suffix-min of little ends per doc in
    (doc, start) order — packing ``(2^31 - doc)`` as the dominant field
    of the REVERSED array makes np.maximum.accumulate restart per doc
    (the mirror of _eval_not's prefix-max trick)."""
    d, s, e = big
    xd, xs, xe = little
    if d.size == 0 or xd.size == 0:
        return empty_spans()
    mask = np.uint64((1 << 32) - 1)
    revd = xd[::-1].astype(np.uint64)
    reve = xe[::-1].astype(np.uint64)
    pk = ((np.uint64(1 << 31) - revd) << _POS_BITS) | (mask - reve)
    acc = np.maximum.accumulate(pk)
    sufmin_end = (mask - (acc & mask)).astype(np.int64)[::-1]
    j = np.searchsorted(_pack(xd, xs), _pack(d, s), side="left")
    ok = j < xd.size
    jc = np.minimum(j, xd.size - 1)
    ok &= (xd[jc] == d) & (sufmin_end[jc] <= e)
    if ok.all():
        return big
    return d[ok], s[ok], e[ok]


def _eval_within(little: SpanSet, big: SpanSet) -> SpanSet:
    """Little spans enclosed by >= 1 big span: exists big with
    ``big.start <= little.start`` and ``big.end >= little.end`` in the
    same doc — prefix-max of big ends per doc (same packed accumulate
    as _eval_not), probed at the last big span with start <= s."""
    d, s, e = little
    bd, bs, be = big
    if d.size == 0 or bd.size == 0:
        return empty_spans()
    acc = np.maximum.accumulate(_pack(bd, be))
    prefmax_end = (acc & np.uint64((1 << 32) - 1)).astype(np.int64)
    j = np.searchsorted(_pack(bd, bs), _pack(d, s), side="right") - 1
    lo_d = np.searchsorted(bd, d, side="left")
    ok = (j >= lo_d) & (prefmax_end[np.maximum(j, 0)] >= e)
    if ok.all():
        return little
    return d[ok], s[ok], e[ok]


def eval_spans(node: SpanNode, leaf: Callable[[str], SpanSet]) -> SpanSet:
    """Evaluate a span tree to its canonical span set. ``leaf`` maps a
    term to its SpanSet (``(p, p+1)`` per posting position, canonical
    order — posting docs and per-doc positions are stored sorted)."""
    if isinstance(node, SpanTerm):
        return leaf(node.term)
    if isinstance(node, SpanOrNode):
        return _eval_or([eval_spans(c, leaf) for c in node.clauses])
    if isinstance(node, SpanNearNode):
        sets = [eval_spans(c, leaf) for c in node.clauses]
        if len(sets) == 1:
            return sets[0]
        if node.in_order:
            return _eval_near_ordered(sets, node.slop)
        return _eval_near_unordered(sets, node.slop)
    if isinstance(node, SpanNotNode):
        return _eval_not(eval_spans(node.include, leaf),
                         eval_spans(node.exclude, leaf),
                         node.pre, node.post)
    if isinstance(node, SpanFirstNode):
        d, st, en = eval_spans(node.match, leaf)
        keep = en <= node.limit
        return (d, st, en) if keep.all() else (d[keep], st[keep], en[keep])
    if isinstance(node, SpanPositionRangeNode):
        d, st, en = eval_spans(node.match, leaf)
        keep = (st >= node.start) & (en <= node.end)
        return (d, st, en) if keep.all() else (d[keep], st[keep], en[keep])
    if isinstance(node, SpanContainingNode):
        return _eval_containing(eval_spans(node.big, leaf),
                                eval_spans(node.little, leaf))
    if isinstance(node, SpanWithinNode):
        return _eval_within(eval_spans(node.little, leaf),
                            eval_spans(node.big, leaf))
    raise TypeError(f"not a span node: {node!r}")


# ---------------------------------------------------------------------------
# Surround query language parser
# ---------------------------------------------------------------------------

def parse_surround(s: str) -> SpanNode:
    """Parse Lucene's surround query language into a span tree (public
    knowledge: ``u8:lucene/queryparser/.../surround/parser/QueryParser.jj``
    and the surround package docs):

        3W(a, b)   ordered near, max distance 3  -> SpanNear in_order
        4N(a, b)   unordered near                -> SpanNear unordered
        W/N        distance defaults to 1
        OR(a, b)   / AND(...) -> AND maps to W with infinite-ish slop is
                   NOT surround's meaning; surround AND is boolean — out
                   of span scope, rejected here (use the boolean algebra)
        NOT(a, b)  -> SpanNot(include=a, exclude=b)
        bare word  -> SpanTerm (lowercased, the standard chain's view)

    Distance k means "within k positions" — surround's W(n) allows n-1
    gaps, mapping to slop = n - 1. Operators nest arbitrarily.
    """
    toks = _sur_lex(s)
    node, pos = _sur_parse(toks, 0)
    if pos != len(toks):
        raise ValueError(f"surround: trailing input at token {pos}: "
                         f"{toks[pos:]!r}")
    return node


def _sur_lex(s: str) -> list[str]:
    import re
    out = re.findall(r"\(|\)|,|[0-9]*[WwNn]\b|OR\b|AND\b|NOT\b|[A-Za-z0-9_]+",
                     s.replace("\t", " "))
    # the alternation can split '3w' from a word like 'w3'? no: \b guards;
    # but plain words matching the op pattern (e.g. 'w', 'n') only count
    # as ops when followed by '(' — resolved in the parser.
    return out


def _sur_parse(toks: list[str], i: int):
    import re
    t = toks[i]
    m = re.fullmatch(r"([0-9]*)([WwNn])", t)
    is_call = i + 1 < len(toks) and toks[i + 1] == "("
    if t in ("OR", "NOT") and is_call:
        args, j = _sur_args(toks, i + 1)
        if t == "OR":
            if len(args) < 2:
                raise ValueError("surround OR needs >= 2 clauses")
            return SpanOrNode(tuple(args)), j
        if len(args) != 2:
            raise ValueError("surround NOT takes exactly 2 clauses")
        return SpanNotNode(args[0], args[1]), j
    if t == "AND" and is_call:
        raise ValueError("surround AND is boolean, not positional — "
                         "compose with the boolean query algebra instead")
    if m and is_call:
        n = int(m.group(1)) if m.group(1) else 1
        if n < 1:
            raise ValueError(f"surround distance must be >= 1: {t!r}")
        args, j = _sur_args(toks, i + 1)
        if len(args) < 2:
            raise ValueError(f"surround {t!r} needs >= 2 clauses")
        return SpanNearNode(tuple(args), slop=n - 1,
                            in_order=m.group(2) in ("W", "w")), j
    if re.fullmatch(r"[a-z0-9_]+", t.lower()) and t not in ("(", ")", ","):
        return SpanTerm(t.lower()), i + 1
    raise ValueError(f"surround: unexpected token {t!r} at {i}")


def _sur_args(toks: list[str], i: int):
    assert toks[i] == "("
    args, i = [], i + 1
    while True:
        node, i = _sur_parse(toks, i)
        args.append(node)
        if i >= len(toks):
            raise ValueError("surround: unterminated argument list")
        if toks[i] == ",":
            i += 1
            continue
        if toks[i] == ")":
            return args, i + 1
        raise ValueError(f"surround: expected ',' or ')' at {toks[i]!r}")

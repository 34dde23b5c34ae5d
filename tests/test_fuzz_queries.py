"""Seeded random query-tree fuzzing: pruned == exhaustive == oracle for
randomly composed boolean trees over the corpus vocabulary (the
generative analog of test_scorer's hand-written QUERIES list)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from sparklucene.oracle import build_oracle_index, search_oracle
from sparklucene.query import (And, ConstantScore, DisMax, Filtered,
                               MatchNoDocs, MultiPhrase, Not, Or, Phrase,
                               Span, SpanFirst, Synonym, Term, Within,
                               prune_missing, rewrite)
from sparklucene.spans import (SpanNearNode, SpanNotNode, SpanOrNode,
                               SpanTerm)

VOCAB = ["spark", "merge", "join", "scan", "filter", "window", "table",
         "hash", "batch", "vector", "stream", "agg", "query", "fast",
         "slow", "dup", "key", "row", "value", "zzz_absent"]


def _rand_term(rng: random.Random) -> Term:
    boost = rng.choice([1.0, 1.0, 1.0, 0.5, 2.0])
    return Term(rng.choice(VOCAB), boost=boost)


def _rand_phrase(rng: random.Random):
    n = rng.randint(2, 3)
    toks = [rng.choice(VOCAB[:12]) for _ in range(n)]
    slots = tuple((i + (1 if rng.random() < 0.2 and i > 0 else 0), t)
                  for i, t in enumerate(toks))
    boost = rng.choice([1.0, 1.0, 1.0, 0.5, 2.0])
    if rng.random() < 0.3:
        return Phrase(slots, slop=rng.randint(1, 3), boost=boost)
    if rng.random() < 0.3:
        # alternative-set sizes up to 4 mimic complex_phrase's
        # dictionary expansions (prefix/wildcard slots inside a phrase)
        alts = tuple(
            (off, tuple(sorted({t, *rng.sample(VOCAB[:12],
                                               rng.randint(1, 3))})))
            for off, t in slots)
        return MultiPhrase(alts)
    return Phrase(slots, boost=boost)


def _rand_positional(rng: random.Random):
    r = rng.random()
    if r < 0.45:
        n = rng.randint(2, 3)
        members = tuple(rng.sample(VOCAB[:12], n))
        return Within(members, window=rng.randint(2, 9),
                      ordered=rng.random() < 0.5)
    if r < 0.6:
        return SpanFirst(rng.choice(VOCAB[:12]),
                         end=rng.choice([1, 2, 5, 20]))
    return Span(_rand_span_node(rng))


def _rand_span_node(rng: random.Random, depth: int = 0):
    """Random nested span tree over the corpus vocabulary (includes the
    absent term so missing-leaf pruning is exercised)."""
    r = rng.random()
    if depth >= 2 or r < 0.4:
        return SpanTerm(rng.choice(VOCAB[:12] + ["zzz_absent"]))
    if r < 0.6:
        kids = tuple(_rand_span_node(rng, depth + 1)
                     for _ in range(rng.randint(2, 3)))
        return SpanNearNode(kids, slop=rng.choice([0, 1, 3, 8]),
                            in_order=rng.random() < 0.5)
    if r < 0.85:
        kids = tuple(_rand_span_node(rng, depth + 1)
                     for _ in range(rng.randint(2, 3)))
        return SpanOrNode(kids)
    return SpanNotNode(_rand_span_node(rng, depth + 1),
                       _rand_span_node(rng, depth + 1),
                       pre=rng.choice([0, 0, 1, 2]),
                       post=rng.choice([0, 0, 1, 3]))


def _rand_synonym(rng: random.Random) -> Synonym:
    n = rng.randint(2, 3)
    members = tuple(rng.sample(VOCAB[:12] + ["zzz_absent"], n))
    return Synonym(members, boost=rng.choice([1.0, 1.0, 0.5, 2.0]))


def _rand_query(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 3 or r < 0.32:
        return _rand_term(rng)
    if r < 0.38:
        return _rand_synonym(rng)
    if r < 0.44:
        return _rand_phrase(rng)
    if r < 0.5:
        return _rand_positional(rng)
    kids = tuple(_rand_query(rng, depth + 1)
                 for _ in range(rng.randint(2, 4)))
    kind = rng.randint(0, 5)
    if kind == 0:
        return And(kids)
    if kind == 1:
        msm = rng.randint(1, min(2, len(kids)))
        return Or(kids, min_should_match=msm)
    if kind == 2:
        return DisMax(kids, tiebreak=rng.choice([0.0, 0.1, 0.3]))
    if kind == 3:
        return Not(kids[0], kids[1])
    if kind == 4:
        return ConstantScore(kids[0], boost=rng.choice([1.0, 0.5, 2.0]))
    return Filtered(kids[0], kids[1])


@pytest.fixture(scope="module")
def oidx(corpus_pdf):
    return build_oracle_index(corpus_pdf)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("mode", ["lucene8", "f64"])
def test_fuzzed_trees_pruned_exhaustive_oracle(oidx, seed, mode):
    from tests.test_scorer import _scorer_from_oracle

    present = set(oidx.tf["term"].unique())
    rng = random.Random(1000 + seed)
    n_checked = 0
    for _ in range(25):
        try:
            q = rewrite(_rand_query(rng))
        except ValueError:
            continue  # e.g. MatchAll-in-OR rejection — not generated here
        # the scorer's contract: unindexed terms are pruned by search()
        # (Lucene null-scorer planning) before any scorer runs — mirror it
        q = prune_missing(q, present)
        if isinstance(q, MatchNoDocs):
            continue
        for k in (3, 10):
            sp = _scorer_from_oracle(oidx, mode, prune=True)
            se = _scorer_from_oracle(oidx, mode, prune=False)
            dp, vp = sp.topk(q, k)
            de, ve = se.topk(q, k)
            assert dp.tolist() == de.tolist(), f"prune ids {q}"
            assert (vp == ve).all(), f"prune scores {q}"
            want = search_oracle(oidx, q, k, mode=mode)
            assert dp.tolist() == want["doc_id"].tolist(), f"oracle ids {q}"
            assert (vp == want["score"].to_numpy()).all(), \
                f"oracle scores {q}"
            n_checked += 1
    assert n_checked >= 30  # the generator must produce real queries


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_trees_with_include_filter(oidx, seed):
    """doc_filter (frange include-set) path: for random query trees and
    random allowed sets, the filtered scorer (pruned AND exhaustive)
    equals brute force (unfiltered full ranking -> python-side include
    filter -> re-top-k), and composes with deletions."""
    from tests.test_scorer import _scorer_from_oracle

    present = set(oidx.tf["term"].unique())
    all_docs = sorted(int(d) for d in oidx.doc_ids)
    rng = random.Random(2000 + seed)
    n_checked = 0
    for _ in range(15):
        try:
            q = rewrite(_rand_query(rng))
        except ValueError:
            continue
        q = prune_missing(q, present)
        if isinstance(q, MatchNoDocs):
            continue
        size = rng.choice([1, len(all_docs) // 4, len(all_docs) // 2,
                           len(all_docs) - 1])
        allowed = np.array(sorted(rng.sample(all_docs, size)),
                           dtype=np.int64)
        deleted = (np.array(sorted(rng.sample(all_docs, 3)), np.int64)
                   if rng.random() < 0.5 else None)
        k = rng.choice([3, 10])
        sp = _scorer_from_oracle(oidx, "f64", prune=True,
                                 deleted=deleted, allowed=allowed)
        se = _scorer_from_oracle(oidx, "f64", prune=False,
                                 deleted=deleted, allowed=allowed)
        dp, vp = sp.topk(q, k)
        de, ve = se.topk(q, k)
        assert dp.tolist() == de.tolist(), f"filter+prune ids {q}"
        assert (vp == ve).all(), f"filter+prune scores {q}"
        # brute force: full unfiltered ranking -> include filter -> top-k
        full = _scorer_from_oracle(oidx, "f64", prune=False,
                                   deleted=deleted)
        df_, vf = full.topk(q, 1 << 20)
        ok = np.isin(df_, allowed)
        df_, vf = df_[ok][:k], vf[ok][:k]
        assert dp.tolist() == df_.tolist(), f"filter vs brute ids {q}"
        assert (vp == vf).all(), f"filter vs brute scores {q}"
        n_checked += 1
    assert n_checked >= 10

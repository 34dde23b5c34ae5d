"""Randomized monitor (reverse search / percolator) fuzz vs a Python
brute-force matcher (round-5).

`monitor_match` routes each doc through an anchor-term presearch join
and verifies survivors with the span-capable matcher. This campaign
registers random standing query trees (terms, AND/OR with
minimum-should-match, NOT, exact phrases with stopword gaps, absent
terms) over random doc batches and compares the full (doc, query) alert
set against a from-scratch Python matcher over the same token stream
(regex tokenize + stopword drop with PRE-stop positions). Catches both
false alerts (verify too loose) and MISSED alerts (anchor presearch too
aggressive — the classic percolator failure mode).

Usage: python scripts/monitor_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import os
import random
import re
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparklucene.analysis import ENGLISH_STOP_WORDS  # noqa: E402
from sparklucene.monitor import monitor_match  # noqa: E402
from sparklucene.query import (And, MatchAllDocs, Not, Or, Phrase,  # noqa: E402
                               Term)
from sparklucene.session import get_spark  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 130_000

VOC = ["spark", "merge", "join", "scan", "filter", "window", "table",
       "hash", "batch", "vector", "the", "a", "fast", "slow",
       "zzz_absent"]
TOKEN_RE = re.compile(r"[a-z0-9_]+")


def tokenize(text: str):
    all_toks = TOKEN_RE.findall(text.lower())
    kept = [(t, i) for i, t in enumerate(all_toks)
            if t not in ENGLISH_STOP_WORDS]
    return kept


def py_match(q, kept) -> bool:
    tset = {t for t, _ in kept}
    if isinstance(q, MatchAllDocs):
        return True
    if isinstance(q, Term):
        return q.term in tset
    if isinstance(q, Phrase):
        pos_of = {}
        for t, p in kept:
            pos_of.setdefault(t, set()).add(p)
        base = q.slots[0]
        for p in pos_of.get(base[1], ()):
            if all(p + (off - base[0]) in pos_of.get(t, set())
                   for off, t in q.slots[1:]):
                return True
        return False
    if isinstance(q, And):
        return all(py_match(c, kept) for c in q.clauses)
    if isinstance(q, Or):
        n = sum(py_match(c, kept) for c in q.clauses)
        return n >= max(1, q.min_should_match)
    if isinstance(q, Not):
        return py_match(q.positive, kept) and not py_match(q.negative,
                                                           kept)
    raise TypeError(type(q))


def rand_query(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 2 or r < 0.4:
        if rng.random() < 0.2:
            toks = [rng.choice(VOC[:10]) for _ in range(rng.randint(2, 3))]
            return Phrase(tuple((i, t) for i, t in enumerate(toks)))
        return Term(rng.choice(VOC))
    kids = tuple(rand_query(rng, depth + 1)
                 for _ in range(rng.randint(2, 3)))
    kind = rng.randint(0, 2)
    if kind == 0:
        return And(kids)
    if kind == 1:
        return Or(kids, min_should_match=rng.randint(1, 2))
    return Not(kids[0], kids[1])


def main() -> None:
    spark = get_spark(app_name="monitor-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        queries = {f"q{i}": rand_query(rng)
                   for i in range(rng.randint(3, 12))}
        n = rng.choice([30, 100])
        texts = [" ".join(rng.choice(VOC[:-1])
                          for _ in range(rng.randint(0, 25)))
                 for _ in range(n)]
        pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                            "text": texts})
        docs = spark.createDataFrame(pdf).repartition(4)
        got = {(r["doc_id"], r["query_id"]) for r in
               monitor_match(docs, queries).collect()}
        want = set()
        for did, text in enumerate(texts):
            kept = tokenize(text)
            for qid, q in queries.items():
                if py_match(q, kept):
                    want.add((did, qid))
        if got != want:
            missed, extra = want - got, got - want
            print(f"MONITOR FUZZ FAILURE seed={seed}: missed={missed} "
                  f"extra={extra}\nqueries={queries}", flush=True)
            sys.exit(1)
        if (seed - SEED0 + 1) % 5 == 0:
            print(f"seed {seed}: green ({len(want)} alerts)", flush=True)
    print(f"MONITOR CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Randomized multi-passage highlighting fuzz vs a Python mirror
(round-5).

`highlight_passages` has a fully pinned spec (fixed window tilings,
idf-sum passage score f64→f32, top n_passages by score desc / start
asc, winners-only decode). This campaign re-derives it in plain Python
from the raw fixture text (re-tokenized in-process) + math.log idf, and
fuzzes random term sets, k, window sizes and passage counts.

Usage: python scripts/highlight_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import math
import os
import random
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from sparklucene.analysis import AnalyzerConfig, analyze_flat  # noqa: E402
from sparklucene.driver_queries import index_for  # noqa: E402
from sparklucene.query import Or, Term  # noqa: E402
from sparklucene.search import highlight_passages, search  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 25
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
SF = os.environ.get("FUZZ_SF", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="hl-fuzz", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx = index_for(spark, SF)
    stats = {r["term"]: int(r["df"]) for r in idx.termstats().collect()}
    N = int(idx.stats["doc_count"])
    vocab = sorted(stats)

    pdf = duckdb.sql(f"select doc_id, text from read_parquet("
                     f"'{SF}/documents.parquet') order by doc_id").df()
    flat, docs, pos = analyze_flat(pdf["text"], pdf["doc_id"].to_numpy(),
                                   AnalyzerConfig())
    positions: dict = {}
    for t, d, p in zip(flat, docs, pos):
        positions.setdefault(int(d), []).append((t, int(p)))

    def mirror(terms, winners, window, n_passages):
        idf = {t: math.log(1.0 + (N - stats[t] + 0.5) / (stats[t] + 0.5))
               for t in terms}
        out = []
        for did in winners:
            buckets: dict = {}
            for t, p in positions.get(did, ()):
                if t in idf:
                    w0 = (p // window) * window
                    sc, nm = buckets.get(w0, (0.0, 0))
                    buckets[w0] = (sc + idf[t], nm + 1)
            ranked = sorted(((np.float32(sc), w0, nm)
                             for w0, (sc, nm) in buckets.items()),
                            key=lambda x: (-x[0], x[1]))[:n_passages]
            out += [(did, w0, nm, float(sc)) for sc, w0, nm in ranked]
        return out

    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        terms = rng.sample(vocab, rng.randint(1, 3))
        q = (Term(terms[0]) if len(terms) == 1
             else Or(tuple(Term(t) for t in terms)))
        k = rng.choice([3, 5, 10])
        window = rng.choice([4, 8, 16, 32])
        n_passages = rng.choice([1, 2, 3])
        got = [(r["doc_id"], r["window_start"], r["n_matches"],
                r["passage_score"]) for r in
               highlight_passages(idx, q, k=k, window=window,
                                  n_passages=n_passages).collect()]
        winners = [r["doc_id"] for r in search(idx, q, k=k,
                                               mode="f64").collect()]
        want = mirror(terms, winners, window, n_passages)
        got_s = sorted(got)
        want_s = sorted(want)
        if got_s != want_s:
            print(f"HL FUZZ FAILURE seed={seed} terms={terms} k={k} "
                  f"window={window} np={n_passages}\n got={got_s[:6]}"
                  f"\nwant={want_s[:6]}", flush=True)
            sys.exit(1)
        if (seed - SEED0 + 1) % 10 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"HL CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1} on {SF}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

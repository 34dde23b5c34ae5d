"""Randomized ANN fuzz vs numpy mirrors (round-5).

Brute-force exact cosine, int8-quantized cosine, and 1-bit binary
Hamming top-k are pinned integer/float64 expression trees; this
campaign draws random embedding sets (random dims incl. non-multiples
of 32, duplicate vectors, zero vectors, antipodal pairs) and re-derives
each surface in numpy with the same pinned quantization rules:

  - cosine_topk: floor(x*4096 + 0.5) integer grid, exact long
    dot/norms, f64 cosine, ties vec_id asc
  - cosine_topk_int8: absmax scale=max|x|/127, floor(x/scale+0.5)
    clamp ±127, integer dot/norms
  - hamming_topk: sign bits (x > 0) packed 32/word, XOR popcount

Usage: python scripts/ann_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import os
import random
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparklucene.session import get_spark  # noqa: E402
from sparklucene.similarity import (cosine_topk, cosine_topk_int8,  # noqa: E402
                                    hamming_topk)

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000


def main() -> None:
    spark = get_spark(app_name="ann-fuzz", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        npr = np.random.default_rng(seed)
        n = rng.choice([30, 100])
        dim = rng.choice([8, 17, 32, 50])
        emb = npr.normal(0, 1, (n, dim)).astype(np.float32)
        emb[1] = emb[0]          # duplicate
        emb[2] = -emb[0]         # antipodal
        if rng.random() < 0.5:
            emb[3] = 0.0         # zero vector
        pdf = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.tolist() for row in emb]})
        df = spark.createDataFrame(pdf).repartition(4)
        qids = rng.sample(range(4, n), rng.randint(1, 3))
        k = rng.choice([3, 7])

        # exact grid cosine mirror
        qg = np.floor(emb.astype(np.float64) * 4096 + 0.5).astype(np.int64)
        n2 = (qg * qg).sum(axis=1)
        got = [(r["qid"], r["rank"], r["vec_id"], r["cosine"]) for r in
               cosine_topk(df, qids, k=k).orderBy("qid", "rank").collect()]
        want = []
        for qid in sorted(qids):
            if n2[qid] == 0:
                continue  # zero-norm query: excluded by the engine
            dots = qg @ qg[qid]
            denom = np.sqrt(float(n2[qid])) * np.sqrt(n2.astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / denom
            # zero-norm candidates have undefined cosine: excluded
            cand = [(float(cos[i]), int(i)) for i in range(n)
                    if i != qid and n2[i] > 0]
            cand.sort(key=lambda x: (-x[0], x[1]))
            want += [(qid, r + 1, vid, c)
                     for r, (c, vid) in enumerate(cand[:k])]
        want_cmp = want
        got_cmp = got
        if got_cmp != want_cmp:
            print(f"ANN FUZZ FAILURE [cosine] seed={seed} dim={dim}\n"
                  f" got={got_cmp[:8]}\nwant={want_cmp[:8]}", flush=True)
            sys.exit(1)

        # int8 mirror
        amax = np.abs(emb.astype(np.float64)).max(axis=1)
        scale = amax / 127.0
        with np.errstate(divide="ignore", invalid="ignore"):
            q8 = np.floor(emb.astype(np.float64)
                          / scale[:, None] + 0.5)
        q8 = np.clip(np.where(scale[:, None] == 0, 0, q8), -127, 127) \
            .astype(np.int64)
        n28 = (q8 * q8).sum(axis=1)
        got8 = [(r["qid"], r["rank"], r["vec_id"]) for r in
                cosine_topk_int8(df, qids, k=k)
                .orderBy("qid", "rank").collect()]
        want8 = []
        for qid in sorted(qids):
            if n28[qid] == 0:
                continue
            dots = q8 @ q8[qid]
            denom = np.sqrt(float(n28[qid])) * np.sqrt(n28.astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / denom
            cand = [(float(cos[i]), int(i)) for i in range(n)
                    if i != qid and n28[i] > 0]
            cand.sort(key=lambda x: (-x[0], x[1]))
            want8 += [(qid, r + 1, vid)
                      for r, (_c, vid) in enumerate(cand[:k])]
        if got8 != want8:
            print(f"ANN FUZZ FAILURE [int8] seed={seed} dim={dim}\n"
                  f" got={got8[:8]}\nwant={want8[:8]}", flush=True)
            sys.exit(1)

        # binary hamming mirror
        qid = qids[0]
        bits = (emb > 0)
        got_h = [(r["vec_id"], r["hamming"]) for r in
                 hamming_topk(df, qid, dim, k=k).collect()]
        ham = (bits ^ bits[qid]).sum(axis=1)
        cand = sorted((int(ham[i]), int(i))
                      for i in range(n) if i != qid)
        want_h = [(i, h) for h, i in cand[:k]]
        if got_h != want_h:
            print(f"ANN FUZZ FAILURE [hamming] seed={seed} dim={dim}\n"
                  f" got={got_h}\nwant={want_h}", flush=True)
            sys.exit(1)
        if (seed - SEED0 + 1) % 5 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"ANN CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

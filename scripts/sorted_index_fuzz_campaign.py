"""Randomized index-time-sort / early-termination fuzz (round-5).

`build_sorted_view` + `sorted_topk[_filtered]` promise: the
envelope-pruned, adaptively-grown file-prefix read returns EXACTLY the
rows a full sort of the whole view would — for any data distribution
(duplicated keys straddling file boundaries, constant keys, skewed
keys), ascending or descending, any k (0 < k, k == n, k >> n), and any
filter selectivity (including 0 survivors). This campaign draws random
key distributions and checks both against a full-shuffle orderBy of the
raw DataFrame.

Usage: python scripts/sorted_index_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import os
import random
import shutil
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sparklucene.session import get_spark  # noqa: E402
from sparklucene.sorted_index import (build_sorted_view, sorted_topk,  # noqa: E402
                                      sorted_topk_filtered)

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 95_000
SCRATCH = os.path.join(REPO, ".cache", "sorted-fuzz")


def fail(tag: str, seed: int, detail: str) -> None:
    print(f"SORTED FUZZ FAILURE [{tag}] seed={seed}: {detail}", flush=True)
    sys.exit(1)


def main() -> None:
    spark = get_spark(app_name="sorted-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        npr = np.random.default_rng(seed)
        n = rng.choice([50, 200, 1000])
        dist = rng.choice(["uniform", "dupes", "constant", "zipf"])
        if dist == "uniform":
            keys = npr.integers(0, 10 * n, n)
        elif dist == "dupes":
            keys = npr.integers(0, max(2, n // 20), n)  # heavy ties
        elif dist == "constant":
            keys = np.full(n, 7)
        else:
            keys = np.minimum(npr.zipf(1.3, n), 10_000)
        pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                            "key": keys.astype(np.int64),
                            "grp": npr.integers(0, 5, n)})
        df = spark.createDataFrame(pdf).repartition(rng.choice([2, 8]))
        asc = rng.random() < 0.5
        d = os.path.join(SCRATCH, f"view-{seed}")
        shutil.rmtree(d, ignore_errors=True)
        build_sorted_view(df, d, by="key", ascending=asc,
                          n_partitions=rng.choice([2, 4, 8]))

        order = [F.col("key").asc() if asc else F.col("key").desc(),
                 F.col("doc_id").asc()]
        for k in (1, rng.randint(2, max(2, n // 3)), n, n + 50):
            got = [tuple(r) for r in
                   sorted_topk(spark, d, k,
                               columns=["key", "doc_id"]).collect()]
            want = [tuple(r) for r in
                    df.orderBy(*order).select("key", "doc_id")
                    .limit(k).collect()]
            if got != want:
                fail("topk", seed, f"dist={dist} asc={asc} k={k}")

        for _ in range(2):
            gv = rng.randrange(5)
            sel = rng.choice([F.col("grp") == gv,            # ~20 %
                              F.col("grp") < 0,              # empty
                              F.col("doc_id") % 2 == 0])     # 50 %
            k = rng.choice([3, 10, n])
            got = [tuple(r) for r in
                   sorted_topk_filtered(spark, d, k, sel,
                                        columns=["key", "doc_id"])
                   .collect()]
            want = [tuple(r) for r in
                    df.filter(sel).orderBy(*order)
                    .select("key", "doc_id").limit(k).collect()]
            if got != want:
                fail("filtered", seed, f"dist={dist} asc={asc} k={k}")
        shutil.rmtree(d, ignore_errors=True)
        if (seed - SEED0 + 1) % 5 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"SORTED CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Randomized streaming==batch build equivalence campaign (round-5).

NRT/streaming indexing must converge to the SAME index the batch build
produces regardless of how the corpus is sliced into micro-batch file
drops. The pytest version pins one 2-wave split; this campaign draws a
random corpus, a random number of arrival waves with random (possibly
EMPTY or single-doc) slices, a random drange_size, and a random
analyzer, drains the stream with availableNow, and asserts:

  - stats (n_docs, doc_count, sum_dl) equal the batch build's
  - the full term dictionary (term, df, cf) is identical
  - top-k results for random queries are identical (docs AND scores)
  - verify_index is clean on the streamed index

Usage: python scripts/streaming_fuzz_campaign.py [n_seeds] [seed0]
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

from sparklucene.analysis import AnalyzerConfig  # noqa: E402
from sparklucene.build import build_index, load_stats  # noqa: E402
from sparklucene.checkindex import verify_index  # noqa: E402
from sparklucene.query import Or, Term  # noqa: E402
from sparklucene.search import Index, search  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402
from sparklucene.streaming import index_stream_once  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000
SCRATCH = os.path.join(REPO, ".cache", "streaming-fuzz")
SCHEMA = ("repo string, path string, commit string, lang string, "
          "content string, doc_id long")

VOC = ["spark", "merge", "join", "scan", "filter", "window", "table",
       "hash", "batch", "vector", "stream", "agg", "the", "a"]


def main() -> None:
    spark = get_spark(app_name="streaming-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        tmp = os.path.join(SCRATCH, str(seed))
        shutil.rmtree(tmp, ignore_errors=True)
        n = rng.choice([30, 80, 150])
        texts = [" ".join(rng.choice(VOC)
                          for _ in range(rng.randint(0, 25)))
                 for _ in range(n)]
        pdf = pd.DataFrame({
            "repo": "r", "path": [f"p{i}" for i in range(n)],
            "commit": "c", "lang": "en", "content": texts,
            "doc_id": np.arange(n, dtype=np.int64)})
        corpus = spark.createDataFrame(pdf)
        drange = rng.choice([7, 16, 64])
        analyzer = rng.choice([None, AnalyzerConfig(shingle=(2, 2)),
                               AnalyzerConfig(stem="porter")])

        # random wave slicing: contiguous doc_id cuts, some waves empty
        n_waves = rng.randint(1, 5)
        cuts = sorted(rng.sample(range(n + 1), n_waves - 1)) \
            if n_waves > 1 else []
        bounds = [0] + cuts + [n]
        flat = os.path.join(tmp, "flat")
        os.makedirs(flat)
        for w in range(n_waves):
            lo, hi = bounds[w], bounds[w + 1]
            wave = corpus.filter((corpus.doc_id >= lo)
                                 & (corpus.doc_id < hi))
            wdir = os.path.join(tmp, f"wave{w}")
            wave.repartition(rng.choice([1, 2])).write.parquet(wdir)
            for f in os.listdir(wdir):
                if f.endswith(".parquet"):
                    shutil.copy(os.path.join(wdir, f),
                                os.path.join(flat, f"w{w}-{f}"))

        sdir = os.path.join(tmp, "stream-idx")
        bdir = os.path.join(tmp, "batch-idx")
        index_stream_once(spark, flat, SCHEMA, sdir, drange_size=drange,
                          checkpoint_dir=os.path.join(tmp, "ckpt"),
                          analyzer=analyzer)
        build_index(spark, corpus, bdir, drange_size=drange,
                    analyzer=analyzer)
        ss, bs = load_stats(sdir), load_stats(bdir)
        for key in ("n_docs", "doc_count", "sum_dl"):
            if ss[key] != bs[key]:
                print(f"FAIL stats seed={seed} {key}: {ss[key]} != "
                      f"{bs[key]} (waves={bounds})", flush=True)
                sys.exit(1)
        si, bi = Index(spark, sdir), Index(spark, bdir)
        if (si.termstats().orderBy("term").collect()
                != bi.termstats().orderBy("term").collect()):
            print(f"FAIL termstats seed={seed} waves={bounds}", flush=True)
            sys.exit(1)
        for _ in range(3):
            terms = rng.sample(VOC, rng.randint(1, 3))
            q = Or(tuple(Term(t) for t in terms))
            s = search(si, q, k=10, mode="f64").collect()
            b = search(bi, q, k=10, mode="f64").collect()
            if s != b:
                print(f"FAIL search seed={seed} q={q!r}", flush=True)
                sys.exit(1)
        if verify_index(si).count():
            print(f"FAIL checkindex seed={seed}", flush=True)
            sys.exit(1)
        shutil.rmtree(tmp, ignore_errors=True)
        if (seed - SEED0 + 1) % 5 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"STREAMING CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Randomized atomic-update fuzz vs a pure-Python merge mirror
(round-5).

`apply_atomic_updates` implements Solr's AtomicUpdateDocumentMerger op
set (set / inc / add / add-distinct / remove) as Catalyst expressions.
This campaign draws random corpora and random SEQUENCES of update
batches (overlapping doc sets, NULL per-field skips, unknown doc_ids,
duplicate values inside one update array, empty arrays) and replays the
same sequence through a dict-based Python mirror implementing the
reference semantics directly; the final relations must match exactly.

Usage: python scripts/updates_fuzz_campaign.py [n_seeds] [seed0]
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
from sparklucene.updates import apply_atomic_updates  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 25
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 97_000

WORDS = ["x", "y", "z", "w", "common", "extra"]


def mirror_batch(state: dict, batch: list, ops: dict) -> None:
    for row in batch:
        did = row["doc_id"]
        if did not in state:
            continue  # unknown doc ids ignored
        for col, op in ops.items():
            v = row[col]
            if v is None:
                continue
            cur = state[did][col]
            if op == "set":
                state[did][col] = v
            elif op == "inc":
                state[did][col] = cur + v
            elif op == "add":
                state[did][col] = list(cur) + list(v)
            elif op == "add-distinct":
                out = list(cur)
                for item in v:  # incremental check as the list grows
                    if item not in out:
                        out.append(item)
                state[did][col] = out
            elif op == "remove":
                state[did][col] = [e for e in cur if e not in set(v)]


def main() -> None:
    spark = get_spark(app_name="updates-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        n = rng.choice([20, 60])
        state = {i: {"title": f"t{i}", "views": i % 7,
                     "tags": [rng.choice(WORDS)
                              for _ in range(rng.randint(0, 3))]}
                 for i in range(n)}
        corpus_pdf = pd.DataFrame(
            [{"doc_id": i, **state[i]} for i in range(n)])
        cur = spark.createDataFrame(corpus_pdf).repartition(4)

        for _ in range(rng.randint(1, 4)):  # a sequence of batches
            scalar_op = rng.choice([("title", "set"), ("views", "inc"),
                                    ("views", "set")])
            mv_op = rng.choice(["add", "add-distinct", "remove"])
            ops = {scalar_op[0]: scalar_op[1], "tags": mv_op}
            batch = []
            ids = rng.sample(range(-3, n + 5),
                             rng.randint(1, n))  # unique ids, some unknown
            for did in ids:
                row = {"doc_id": did, "title": None, "views": None,
                       "tags": None}
                if rng.random() < 0.8:
                    row[scalar_op[0]] = (f"s{rng.randrange(9)}"
                                         if scalar_op[0] == "title"
                                         else rng.randint(-2, 5))
                if rng.random() < 0.8:
                    row["tags"] = [rng.choice(WORDS) for _ in
                                   range(rng.randint(0, 4))]  # dupes ok
                batch.append(row)
            schema = ("doc_id long, title string, views long, "
                      "tags array<string>")
            updf = spark.createDataFrame(
                pd.DataFrame(batch)[["doc_id", "title", "views", "tags"]],
                schema)
            cur = apply_atomic_updates(cur, updf, ops).localCheckpoint()
            mirror_batch(state, batch, ops)

        got = {r["doc_id"]: (r["title"], r["views"], list(r["tags"]))
               for r in cur.collect()}
        want = {i: (state[i]["title"], state[i]["views"],
                    list(state[i]["tags"])) for i in range(n)}
        if got != want:
            diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
            print(f"UPDATES FUZZ FAILURE seed={seed}: {diffs}", flush=True)
            sys.exit(1)
        if (seed - SEED0 + 1) % 10 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"UPDATES CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

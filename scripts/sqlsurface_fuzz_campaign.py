"""Seeded SQL-surface fuzz campaign (round-5 endgame).

`sparklucene.sqlsurface` (SURVEY.md §2.10 — the reference's Parallel
SQL handler, solr/core/.../handler/sql, re-expressed as one plain
``spark.sql`` statement with Catalyst in Calcite's seat) had a driver
entry on the fixture corpus but no randomized campaign. For each seed
this draws a RANDOM corpus (doc count, lengths, empty docs, duplicate
docs, stopword-only docs, mixed case / punctuation / digits to exercise
the `[a-z0-9_]+` tokenizer) and random term-set queries (1-4 distinct
terms, or/and mode, msm 1-3, k in {3, 10, 100}, with deliberately
missing terms mixed in), then checks THREE independent evaluations of
the same query against each other:

  1. the pure-SQL plan (`bm25_topk_sparksql` over a `documents` view —
     zero engine code, whole-stage codegen only);
  2. the packed-postings engine (`build_index` + `search(mode="f64")`
     after `prune_missing`, the serving path);
  3. the brute-force pandas oracle (`search_oracle(mode="f64")`).

Every check demands identical doc-id sequences AND bit-equal float32
scores across all three (ties broken score desc, doc_id asc — a total
order, so sequence equality is the strongest possible check). Edge
assertions per seed: an all-missing-terms query and an msm-exceeds-
matches query must come back empty from all three.

Usage: python scripts/sqlsurface_fuzz_campaign.py [n_seeds] [seed0]
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

from sparklucene.build import build_index  # noqa: E402
from sparklucene.oracle import build_oracle_index, search_oracle  # noqa: E402
from sparklucene.query import And, Or, Term, prune_missing, rewrite  # noqa: E402
from sparklucene.search import Index, search  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402
from sparklucene.sqlsurface import bm25_topk_sparksql  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 230_000
SCRATCH = os.path.join(REPO, ".cache", "sqlsurface-fuzz")

VOC = ["fast", "slow", "join", "merge", "hash", "scan", "key", "data",
       "index", "block", "term", "codec", "sort_2", "x9", "zz"]
#: words that are NEVER indexed (stopwords or absent) — exercise pruning
MISSING = ["qqqq", "absent_term", "the", "of"]
#: decorations the [a-z0-9_]+ tokenizer must strip/split on
NOISE = ["", ",", ".", "!", "-", "é", ";"]


def rand_corpus(rng: random.Random) -> pd.DataFrame:
    n = rng.choice([6, 20, 60])
    texts = []
    for _ in range(n):
        words = []
        for _ in range(rng.randint(0, 25)):
            w = rng.choice(VOC + ["the", "a", "of"])
            if rng.random() < 0.3:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w + rng.choice(NOISE))
        texts.append(" ".join(words))
    texts[0] = ""                               # empty doc
    texts[1] = "the of a the"                   # stopword-only doc
    if n >= 20:
        texts[3] = texts[5]                     # exact duplicates
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def rand_query(rng: random.Random) -> tuple[list[str], str, int, int]:
    n_terms = rng.randint(1, 4)
    terms = rng.sample(VOC, n_terms)
    if rng.random() < 0.3:                      # mix in a missing term
        terms[rng.randrange(n_terms)] = rng.choice(MISSING)
    mode = rng.choice(["or", "or", "or", "and"])
    msm = rng.randint(1, min(3, len(terms))) if mode == "or" else 1
    k = rng.choice([3, 10, 100])
    return sorted(set(terms)), mode, msm, k


def as_f32(df: pd.DataFrame) -> tuple[list[int], list[np.float32]]:
    return (df["doc_id"].astype(np.int64).tolist(),
            [np.float32(s) for s in df["score"].tolist()])


def fail(seed: int, what: str, detail: str) -> None:
    print(f"FAIL seed={seed} {what}: {detail}", flush=True)
    sys.exit(1)


def check_triple(seed: int, tag: str, sql_df: pd.DataFrame,
                 eng_df: pd.DataFrame, ora_df: pd.DataFrame) -> int:
    sql_ids, sql_sc = as_f32(sql_df)
    eng_ids, eng_sc = as_f32(eng_df)
    ora_ids, ora_sc = as_f32(ora_df)
    if not (sql_ids == ora_ids == eng_ids):
        fail(seed, tag, f"doc ids diverge: sql={sql_ids} "
                        f"engine={eng_ids} oracle={ora_ids}")
    if not (sql_sc == ora_sc == eng_sc):
        fail(seed, tag, f"scores diverge: sql={sql_sc} "
                        f"engine={eng_sc} oracle={ora_sc}")
    return 3 if sql_ids else 1                   # empty counts once


def main() -> None:
    spark = get_spark(app_name="sqlsurface-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    total = 0
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        pdf = rand_corpus(rng)
        oidx = build_oracle_index(pdf, text_col="text")
        present = set(oidx.tf["term"].unique())
        sdf = spark.createDataFrame(pdf)
        sdf.createOrReplaceTempView("documents")
        d = os.path.join(SCRATCH, f"idx-{seed}")
        build_index(spark, sdf.withColumnRenamed("text", "content"), d,
                    drange_size=rng.choice([8, 64]))
        idx = Index(spark, d)

        queries = [rand_query(rng) for _ in range(6)]
        # pinned edges: all terms missing; msm above any possible match
        queries.append((sorted(MISSING[:2]), "or", 1, 10))
        queries.append((sorted(rng.sample(VOC, 2)), "or", 2, 10))
        for terms, mode, msm, k in queries:
            sql_df = spark.sql(
                bm25_topk_sparksql(terms, k=k, msm=msm, mode=mode)
            ).toPandas()
            tree = (And(tuple(Term(t) for t in terms)) if mode == "and"
                    else Or(tuple(Term(t) for t in terms),
                            min_should_match=msm))
            q_eng = prune_missing(rewrite(tree), present)
            eng_df = search(idx, q_eng, k=k, mode="f64").toPandas()
            ora_df = search_oracle(oidx, q_eng, k=k, mode="f64")
            total += check_triple(
                seed, f"{mode}/msm={msm}/k={k}/terms={terms}",
                sql_df, eng_df, ora_df)
        shutil.rmtree(d, ignore_errors=True)
        print(f"seed {seed}: ok ({total} cumulative checks)", flush=True)
    print(f"PASS {N_SEEDS} seeds, {total} three-way checks", flush=True)
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Extended seeded fuzz campaign (round-5 endgame hardening).

Reuses the generators from tests/test_fuzz_queries.py and
tests/test_spans.py with THOUSANDS of fresh seeds (the pytest suite pins
8/4/6 seeds for CI cost) and runs the same three invariants:

  1. boolean trees : pruned == exhaustive == brute-force oracle
                     (lucene8 + f64 + classic + boolean, k in {3, 10})
  2. include-filter: filtered scorer == brute-force (full rank ->
                     python include filter -> re-top-k), +/- deletes
  3. span trees    : engine span path == oracle (lucene8 + f64)
  4. cursor paging : topk(k, after=rank-k key) == ranks k+1..2k of
                     the full ranking (searchAfter keyset invariant)

No Spark: the scorer runs on oracle-encoded cells (numpy), so a seed
costs milliseconds. Corpus defaults to sf0.001; set FUZZ_SF to try the
sf0.01 vocabulary/df distribution (different rounding boundaries).

Usage: python scripts/fuzz_campaign.py [n_seeds] [seed0]
Exits non-zero printing the failing (invariant, seed, query repr).
"""
from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparklucene.oracle import build_oracle_index, search_oracle  # noqa: E402
from sparklucene.query import MatchNoDocs, Span, prune_missing, rewrite  # noqa: E402

from tests.test_fuzz_queries import _rand_query  # noqa: E402
from tests.test_scorer import _scorer_from_oracle  # noqa: E402
from tests.test_spans import _rand_node  # noqa: E402

SF = os.environ.get("FUZZ_SF", "/root/testdata/sf0.001")
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 500
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def load_corpus_pdf(sf: str) -> pd.DataFrame:
    pdf = duckdb.sql(
        f"select * from read_parquet('{sf}/documents.parquet') order by doc_id"
    ).df()
    return pd.DataFrame({
        "repo": pdf["source"],
        "path": "doc/" + pdf["doc_id"].astype(str) + ".txt",
        "commit": pdf["doc_id"].astype(str),
        "lang": pdf["lang"],
        "content": pdf["text"],
        "doc_id": pdf["doc_id"].astype("int64"),
    })


def fail(tag: str, seed: int, q, detail: str) -> None:
    print(f"FUZZ FAILURE [{tag}] seed={seed} detail={detail}\n  q={q!r}",
          flush=True)
    sys.exit(1)


def main() -> None:
    oidx = build_oracle_index(load_corpus_pdf(SF))
    present = set(oidx.tf["term"].unique())
    all_docs = sorted(int(d) for d in oidx.doc_ids)
    n_q = n_span = n_flt = 0

    for seed in range(SEED0, SEED0 + N_SEEDS):
        # --- 1. boolean trees, pruned == exhaustive == oracle ---------
        rng = random.Random(seed)
        modes = ("lucene8", "f64", "classic", "boolean")
        scorers = {(m, p): _scorer_from_oracle(oidx, m, prune=p)
                   for m in modes for p in (True, False)}
        for _ in range(10):
            try:
                q = rewrite(_rand_query(rng))
            except ValueError:
                continue
            q = prune_missing(q, present)
            if isinstance(q, MatchNoDocs):
                continue
            for mode in modes:
                for k in (3, 10):
                    dp, vp = scorers[(mode, True)].topk(q, k)
                    de, ve = scorers[(mode, False)].topk(q, k)
                    if dp.tolist() != de.tolist() or not (vp == ve).all():
                        fail("bool/prune", seed, q, mode)
                    want = search_oracle(oidx, q, k, mode=mode)
                    if dp.tolist() != want["doc_id"].tolist() or \
                            not (vp == want["score"].to_numpy()).all():
                        fail("bool/oracle", seed, q, f"{mode} k={k}")
                    n_q += 1
            # cursor paging: page 2 via after == ranks k+1..2k (f64)
            k = 5
            full_d, full_v = scorers[("f64", False)].topk(q, 2 * k)
            if full_d.size > k:
                after = (float(full_v[k - 1]), int(full_d[k - 1]))
                pd_, pv = scorers[("f64", True)].topk(q, k, after=after)
                if pd_.tolist() != full_d[k:2 * k].tolist() or \
                        not (pv == full_v[k:2 * k]).all():
                    fail("cursor", seed, q, f"after={after}")

        # --- 2. include-filter (frange doc-set) + deletes -------------
        rng_f = random.Random(seed ^ 0x5F5F)
        for _ in range(3):
            try:
                q = prune_missing(rewrite(_rand_query(rng_f)), present)
            except ValueError:
                continue
            if isinstance(q, MatchNoDocs):
                continue
            size = rng_f.choice([1, len(all_docs) // 4, len(all_docs) - 1])
            allowed = np.array(sorted(rng_f.sample(all_docs, size)),
                               dtype=np.int64)
            deleted = (np.array(sorted(rng_f.sample(all_docs, 3)), np.int64)
                       if rng_f.random() < 0.5 else None)
            k = rng_f.choice([3, 10])
            sp = _scorer_from_oracle(oidx, "f64", prune=True,
                                     deleted=deleted, allowed=allowed)
            dp, vp = sp.topk(q, k)
            full = _scorer_from_oracle(oidx, "f64", prune=False,
                                       deleted=deleted)
            df_, vf = full.topk(q, 1 << 20)
            ok = np.isin(df_, allowed)
            df_, vf = df_[ok][:k], vf[ok][:k]
            if dp.tolist() != df_.tolist() or not (vp == vf).all():
                fail("filter", seed, q, f"k={k} |allowed|={size}")
            n_flt += 1

        # --- 3. span trees --------------------------------------------
        rng_s = random.Random(seed ^ 0xA5A5)
        for _ in range(6):
            q = prune_missing(rewrite(Span(_rand_node(rng_s))), present)
            if isinstance(q, MatchNoDocs):
                continue
            for mode in ("lucene8", "f64"):
                sp = scorers[(mode, True)]
                for k in (3, 10):
                    dp, vp = sp.topk(q, k)
                    want = search_oracle(oidx, q, k, mode=mode)
                    if dp.tolist() != want["doc_id"].tolist() or \
                            not (vp == want["score"].to_numpy()).all():
                        fail("span", seed, q, f"{mode} k={k}")
                    n_span += 1

        if (seed - SEED0 + 1) % 50 == 0:
            print(f"seed {seed}: {n_q} bool + {n_flt} filter + "
                  f"{n_span} span checks green", flush=True)

    print(f"CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1} on {SF} — "
          f"{n_q} bool, {n_flt} filter, {n_span} span checks", flush=True)


if __name__ == "__main__":
    main()

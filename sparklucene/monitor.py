"""Reverse search — Lucene's monitor module (Luwak) on DataFrames.

The reference ships a "monitor" that inverts the search problem: a set of
queries is REGISTERED up front, documents stream through, and each doc is
annotated with every registered query it matches (public knowledge:
``u8:lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java``,
``TermFilteredPresearcher.java``, ``QueryMatcher``). The classic use is
alerting / classification: thousands of standing queries, a firehose of
documents.

The reference's two-phase design maps 1:1 onto Spark relations:

1. **Presearch** — every registered query is decomposed into a small set
   of ANCHOR terms such that a document can only match the query if it
   contains at least one anchor (TermFilteredPresearcher's query-term
   index). Queries that cannot be term-anchored (e.g. MatchAllDocs)
   register the reference's ANYTOKEN, which every document carries.
   The anchor relation is (anchor_term, query_id) — query-set-scale,
   tiny next to the corpus.
2. **Verify** — candidate (doc, query) pairs from the anchor join are
   re-evaluated EXACTLY (the reference runs the real query against a
   one-doc in-memory index; here a vectorized evaluator over the doc's
   analyzed token stream applies the same Query-tree semantics the main
   engine scores with, including Phrase's pre-stop position gaps).

Pinned anchor-selection spec (the reference's TermWeightor is pluggable;
this engine pins a deterministic instance):
  * Term        -> {term}
  * Phrase      -> the longest slot term (ties: lexicographically
                   smallest) — the reference's default TokenLengthNorm
                   weighting picks longer ≈ rarer terms.
  * And/Filtered-> the child anchor set of SMALLEST size (ties: the
                   lexicographically smallest sorted tuple): any single
                   conjunct's anchors are sufficient, smaller is more
                   selective.
  * Or/DisMax   -> union of child anchor sets (every disjunct must be
                   reachable).
  * Not         -> anchors of the positive side.
  * ConstantScore -> anchors of the wrapped query.
  * MatchAllDocs  -> {ANYTOKEN}; MatchNoDocs -> {} (never a candidate).
  * MultiTermQuery (prefix/wildcard/...) is rejected: anchoring a term
    EXPANSION needs the reference's specialised presearcher components
    and an index-time dictionary; register the expanded Or instead.

Scale shape (the 100 TB story): documents are tokenized once
(Arrow-vectorized), anchor matching is one equi-join of the exploded
distinct doc terms against the broadcast anchor relation, and the exact
verify touches only presearch survivors — never |docs| x |queries|. The
registered query set itself lives on the driver and in task closures,
which is the reference's contract too (Monitor holds all queries in RAM
on every node).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklucene.analysis import ENGLISH_STOP_WORDS, TOKEN_RE, _LOWER_SPECIAL
from sparklucene.query import (And, ConstantScore, DisMax, Filtered,
                               MatchAllDocs, MatchNoDocs, MultiTermQuery,
                               Not, Or, Phrase, Query, Term)

#: the reference's ANYTOKEN — a term no analyzer can produce (the
#: tokenizer only emits [a-z0-9_]+ runs, never a leading '{')
ANYTOKEN = "{ANY}"


def anchor_terms(q: Query) -> frozenset[str]:
    """Presearcher term extraction — see the pinned spec in the module
    docstring. Returns the anchor set; empty means 'never a candidate'
    (MatchNoDocs)."""
    if isinstance(q, Term):
        return frozenset((q.term,))
    if isinstance(q, Phrase):
        best = min(q.slots, key=lambda s: (-len(s[1]), s[1]))[1]
        return frozenset((best,))
    if isinstance(q, (And, Filtered)):
        children = (q.clauses if isinstance(q, And)
                    else (q.positive, q.filter))
        sets = [anchor_terms(c) for c in children]
        sets = [s for s in sets if s]  # a MatchNoDocs conjunct -> others
        if not sets:
            return frozenset()
        # ANYTOKEN anchors are the least selective conjunct: prefer any
        # real-term set over one containing ANYTOKEN
        real = [s for s in sets if ANYTOKEN not in s]
        pool = real if real else sets
        return min(pool, key=lambda s: (len(s), tuple(sorted(s))))
    if isinstance(q, (Or, DisMax)):
        out: set[str] = set()
        for c in q.clauses:
            s = anchor_terms(c)
            if not s:
                continue  # MatchNoDocs disjunct contributes nothing
            out.update(s)
        return frozenset(out)
    if isinstance(q, Not):
        return anchor_terms(q.positive)
    if isinstance(q, ConstantScore):
        return anchor_terms(q.child)
    if isinstance(q, MatchAllDocs):
        return frozenset((ANYTOKEN,))
    if isinstance(q, MatchNoDocs):
        return frozenset()
    if isinstance(q, MultiTermQuery):
        raise ValueError(
            "monitor cannot term-anchor a MultiTermQuery (prefix/wildcard/"
            "regexp/fuzzy/range): register its dictionary expansion as an "
            "Or of Terms instead")
    raise ValueError(f"monitor does not support {type(q).__name__} queries")


def _matches(q: Query, tset: frozenset[str],
             tpos: dict[str, np.ndarray]) -> bool:
    """Exact per-doc boolean evaluation of a Query tree — the same match
    semantics the main engine scores with (Phrase positions index the
    PRE-stop token stream, so stopword gaps survive)."""
    if isinstance(q, Term):
        return q.term in tset
    if isinstance(q, And):
        return all(_matches(c, tset, tpos) for c in q.clauses)
    if isinstance(q, Or):
        n = sum(_matches(c, tset, tpos) for c in q.clauses)
        return n >= q.min_should_match
    if isinstance(q, DisMax):
        return any(_matches(c, tset, tpos) for c in q.clauses)
    if isinstance(q, Not):
        return (_matches(q.positive, tset, tpos)
                and not _matches(q.negative, tset, tpos))
    if isinstance(q, Filtered):
        return (_matches(q.positive, tset, tpos)
                and _matches(q.filter, tset, tpos))
    if isinstance(q, ConstantScore):
        return _matches(q.child, tset, tpos)
    if isinstance(q, MatchAllDocs):
        return True
    if isinstance(q, MatchNoDocs):
        return False
    if isinstance(q, Phrase):
        if q.slop != 0:
            raise ValueError("monitor verify supports exact phrases only")
        off0, t0 = q.slots[0]
        base = tpos.get(t0)
        if base is None:
            return False
        ok = np.ones(len(base), dtype=bool)
        for off, t in q.slots[1:]:
            p = tpos.get(t)
            if p is None:
                return False
            ok &= np.isin(base + (off - off0), p)
            if not ok.any():
                return False
        return True
    raise ValueError(f"monitor does not support {type(q).__name__} queries")


def _doc_token_udfs(stopwords: frozenset[str]):
    """pandas_udfs producing the analyzed token array and its pre-stop
    position array (aligned), Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    stop_arr = np.array(sorted(stopwords), dtype=object)

    def _both(content: pd.Series) -> tuple[list, list]:
        lowered = content.fillna("").str.translate(_LOWER_SPECIAL).str.lower()
        toks = lowered.str.findall(TOKEN_RE)
        out_t, out_p = [], []
        for lst in toks.to_numpy():
            arr = np.asarray(lst, dtype=object)
            if arr.size == 0:
                out_t.append([]); out_p.append([])
                continue
            keep = ~np.isin(arr, stop_arr)
            out_t.append(arr[keep].tolist())
            out_p.append(np.nonzero(keep)[0].astype("int64").tolist())
        return out_t, out_p

    @pandas_udf("array<string>")
    def tok_udf(content: pd.Series) -> pd.Series:
        return pd.Series(_both(content)[0], index=content.index)

    @pandas_udf("array<long>")
    def pos_udf(content: pd.Series) -> pd.Series:
        return pd.Series(_both(content)[1], index=content.index)

    return tok_udf, pos_udf


def monitor_match(docs: DataFrame, queries: dict[str, Query],
                  text_col: str = "text", id_col: str = "doc_id",
                  stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                  ) -> DataFrame:
    """Match every document against every registered query; returns
    (doc_id, query_id) rows sorted by (doc_id, query_id).

    ``queries`` maps query_id -> Query tree (Term/And/Or/Not/DisMax/
    Filtered/ConstantScore/Phrase/MatchAllDocs/MatchNoDocs — the
    monitor-supported algebra; see module docstring)."""
    spark = docs.sparkSession
    anchors = []
    for qid, q in queries.items():
        for t in anchor_terms(q):
            anchors.append((t, qid))
    if not anchors:
        return spark.createDataFrame(
            [], f"{id_col} long, query_id string")
    anchor_df = spark.createDataFrame(anchors, "term string, query_id string")

    tok_udf, pos_udf = _doc_token_udfs(stopwords)
    toks = docs.select(F.col(id_col),
                       tok_udf(F.col(text_col)).alias("_m_toks"),
                       pos_udf(F.col(text_col)).alias("_m_pos"))

    cand = (toks.select(
                id_col, "_m_toks", "_m_pos",
                F.explode(F.array_union(F.array_distinct("_m_toks"),
                                        F.array(F.lit(ANYTOKEN))))
                .alias("term"))
            .join(F.broadcast(anchor_df), "term")
            .drop("term")
            .dropDuplicates([id_col, "query_id"]))

    qmap = dict(queries)  # task-closure copy (query-set-scale)

    def verify(batches):
        for pdf in batches:
            keep = np.zeros(len(pdf), dtype=bool)
            cache: dict[object, tuple] = {}
            for i, (did, tok, pos, qid) in enumerate(zip(
                    pdf[id_col], pdf["_m_toks"], pdf["_m_pos"],
                    pdf["query_id"])):
                ent = cache.get(did)
                if ent is None:
                    tarr = np.asarray(tok, dtype=object)
                    parr = np.asarray(pos, dtype="int64")
                    tpos = {t: parr[tarr == t] for t in set(tok)}
                    ent = (frozenset(tok), tpos)
                    cache[did] = ent
                keep[i] = _matches(qmap[qid], ent[0], ent[1])
            yield pdf.loc[keep, [id_col, "query_id"]]

    out_schema = f"{id_col} long, query_id string"
    return (cand.mapInPandas(verify, schema=out_schema)
            .orderBy(id_col, "query_id"))


def monitor_match_stream(stream_docs: DataFrame, queries: dict[str, Query],
                         out_dir: str, checkpoint_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                         trigger: dict | None = None):
    """Streaming alerting — the monitor's firehose deployment (Luwak's
    classic use; u8:lucene/monitor/.../Monitor.java): standing queries
    registered once, documents arriving as a stream, every micro-batch
    annotated with the queries it matches.

    Each micro-batch runs the SAME two-phase presearch+verify plan as
    the batch surface (:func:`monitor_match` — anchor broadcast join +
    exact vectorized verify), so streaming alerts are definitionally
    identical to a batch pass over the same documents (asserted in
    tests). Idempotent replay: a batch writes its alerts to its own
    ``batch=<id>`` partition with overwrite, so checkpoint recovery
    never duplicates rows.
    """
    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = monitor_match(batch_df, queries, text_col=text_col,
                            id_col=id_col, stopwords=stopwords)
        (out.write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    w = (stream_docs.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir))
    w = w.trigger(**(trigger or {"availableNow": True}))
    return w.start()

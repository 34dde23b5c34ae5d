"""Brute-force BM25 oracle — the engine's independent correctness reference.

~120 LoC of auditable pandas/numpy: tokenize every doc, score every doc,
sort. No inverted index, no compression, no pruning. The Spark engine must
be rank-identical to this (SURVEY.md §5.2.2 — the Solr
distributed-vs-control pattern, BaseDistributedSearchTestCase analog).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from sparklucene import bm25
from sparklucene.analysis import ENGLISH_STOP_WORDS, flat_tokens, tokenize_series
from sparklucene.norms import LENGTH_TABLE, int_to_byte4, quantize_length
from sparklucene.query import (And, ConstantScore, DisMax, Filtered,
                               MatchAllDocs, MatchNoDocs, MultiPhrase, Not,
                               Or, Phrase, Query, Span, SpanFirst, Synonym,
                               Term, Within)
from sparklucene.spans import (SpanContainingNode, SpanFirstNode,
                               SpanNearNode, SpanNotNode, SpanOrNode,
                               SpanPositionRangeNode, SpanTerm,
                               SpanWithinNode, leaf_terms)


@dataclass
class OracleIndex:
    doc_ids: np.ndarray          # int64, sorted
    dl: np.ndarray               # int64 true post-stop token counts
    norm_bytes: np.ndarray       # uint8
    dlq: np.ndarray              # int64 quantized lengths
    tf: pd.DataFrame             # columns: term, doc_id, tf
    tp: pd.DataFrame             # columns: term, doc_id, pos (pre-stop gaps)
    doc_count: int               # docs with dl >= 1
    sum_dl: int

    def df_of(self, term: str) -> int:
        return int((self.tf["term"] == term).sum())

    def postings(self, term: str) -> pd.DataFrame:
        return self.tf[self.tf["term"] == term]


def build_oracle_index(docs: pd.DataFrame, text_col: str = "content",
                       id_col: str = "doc_id",
                       stopwords=ENGLISH_STOP_WORDS) -> OracleIndex:
    docs = docs.sort_values(id_col).reset_index(drop=True)
    doc_ids = docs[id_col].to_numpy(dtype=np.int64)
    toks = tokenize_series(docs[text_col], stopwords)
    lengths = toks.str.len().to_numpy(dtype=np.int64)
    norm_bytes = int_to_byte4(lengths)
    rows = []
    for did, tl in zip(doc_ids, toks):
        if tl:
            terms, counts = np.unique(np.asarray(tl, dtype=object), return_counts=True)
            rows.append(pd.DataFrame({"term": terms, "doc_id": did, "tf": counts}))
    tf = (pd.concat(rows, ignore_index=True) if rows
          else pd.DataFrame({"term": [], "doc_id": [], "tf": []}))
    ftoks, fdocs, fpos = flat_tokens(docs[text_col], doc_ids, stopwords)
    tp = pd.DataFrame({"term": ftoks, "doc_id": fdocs, "pos": fpos})
    return OracleIndex(
        doc_ids=doc_ids, dl=lengths, norm_bytes=norm_bytes,
        dlq=quantize_length(lengths), tf=tf, tp=tp,
        doc_count=int((lengths >= 1).sum()), sum_dl=int(lengths.sum()),
    )


def _term_scores(idx: OracleIndex, term: str, mode: str,
                 boost: float = 1.0) -> pd.Series:
    """Series doc_id -> float32 score for one term."""
    p = idx.postings(term)
    if p.empty:
        return pd.Series(dtype=np.float32)
    d = p["doc_id"].to_numpy(dtype=np.int64)
    t = p["tf"].to_numpy(dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, d)
    df = len(p)
    if mode == "boolean":
        return pd.Series(np.full(d.size, np.float32(boost),
                                 dtype=np.float32), index=d)
    if callable(mode):
        cf = int(p["tf"].sum())
        s = np.asarray(mode(t, idx.dlq[pos], df, cf, idx.doc_count,
                            idx.sum_dl), dtype=np.float64)
        return pd.Series((np.float64(boost) * s).astype(np.float32), index=d)
    if mode == "lucene8":
        s = bm25.score_lucene8(t, idx.norm_bytes[pos], df, idx.doc_count,
                               idx.sum_dl, boost=boost)
    elif mode == "classic":
        s = bm25.score_classic(t, idx.dlq[pos], df, idx.doc_count, boost=boost)
    else:
        s = bm25.score_f64(t, idx.dlq[pos], df, idx.doc_count, idx.sum_dl,
                           boost=boost)
    return pd.Series(s, index=d)


def _synonym_scores(idx: OracleIndex, q: Synonym, mode: str) -> pd.Series:
    """SynonymQuery: one pseudo-term — freq = sum of member tfs,
    df = max member df (the pinned spec on the Synonym dataclass)."""
    parts = [idx.postings(t) for t in sorted(set(q.members))]
    parts = [p for p in parts if not p.empty]
    if not parts:
        return pd.Series(dtype=np.float32)
    if callable(mode):
        raise NotImplementedError(
            "synonym scoring under a user-supplied similarity")
    merged = pd.concat(parts, ignore_index=True)
    agg = merged.groupby("doc_id", sort=True)["tf"].sum()
    d = agg.index.to_numpy(dtype=np.int64)
    t = agg.to_numpy(dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, d)
    df = q.blend_df if q.blend_df is not None else max(len(p) for p in parts)
    if mode == "boolean":
        return pd.Series(np.full(d.size, np.float32(q.boost),
                                 dtype=np.float32), index=d)
    if mode == "lucene8":
        s = bm25.score_lucene8(t, idx.norm_bytes[pos], df, idx.doc_count,
                               idx.sum_dl, boost=q.boost)
    elif mode == "classic":
        s = bm25.score_classic(t, idx.dlq[pos], df, idx.doc_count,
                               boost=q.boost)
    else:
        s = bm25.score_f64(t, idx.dlq[pos], df, idx.doc_count, idx.sum_dl,
                           boost=q.boost)
    return pd.Series(s, index=d)


def _sloppy_freqs(idx: OracleIndex, q: Phrase) -> dict[int, float]:
    """Naive proximity matcher implementing the pinned slop spec
    (scorer._sloppy_scores): per slot-0 anchor, nearest-position
    displacement per other slot, D <= slop matches with weight 2^-D."""
    per_term: dict[str, dict[int, list[int]]] = {}
    for _, t in q.slots:
        rows = idx.tp[idx.tp["term"] == t]
        by_doc: dict[int, list[int]] = {}
        for d, p in zip(rows["doc_id"], rows["pos"]):
            by_doc.setdefault(int(d), []).append(int(p))
        per_term[t] = {d: sorted(ps) for d, ps in by_doc.items()}
    (off0, t0), rest = q.slots[0], q.slots[1:]
    docs = set(per_term[t0])
    for _, t in rest:
        docs &= set(per_term[t])
    freqs: dict[int, float] = {}
    for d in sorted(docs):
        total = 0.0
        for p0 in per_term[t0][d]:
            base = p0 - off0
            dist = 0
            for off, t in rest:
                dist += min(abs(p - off - base) for p in per_term[t][d])
            if dist <= q.slop:
                total += 2.0 ** (-dist)
        if total > 0:
            freqs[d] = total
    return freqs


def _phrase_weighted(idx: OracleIndex, q: "Phrase | MultiPhrase | Within | SpanFirst",
                     tfs: np.ndarray, pos: np.ndarray, mode: str
                     ) -> np.ndarray:
    qboost = float(getattr(q, "boost", 1.0))
    if mode == "boolean":
        return np.full(tfs.size, np.float32(qboost), dtype=np.float32)
    if isinstance(q, MultiPhrase):
        slot_terms = [t for _, alts in q.slots for t in alts]
    elif isinstance(q, Within):
        slot_terms = list(q.members)
    elif isinstance(q, SpanFirst):
        slot_terms = [q.match]
    elif isinstance(q, Span):
        # include-side leaves; absent terms contribute no idf (the engine
        # filters by term_stats presence, where df >= 1 by construction)
        slot_terms = [t for t in q.weight_terms() if idx.df_of(t) > 0]
    else:
        slot_terms = [t for _, t in q.slots]
    idf_fn = bm25.idf_classic if mode == "classic" else bm25.idf
    idf_total = qboost * sum(idf_fn(idx.df_of(t), idx.doc_count)
                             for t in slot_terms)
    if mode == "lucene8":
        return bm25.score_lucene8_w(idf_total, tfs, idx.norm_bytes[pos],
                                    idx.doc_count, idx.sum_dl)
    if mode == "classic":
        return bm25.score_classic_w(idf_total, tfs,
                                    LENGTH_TABLE[idx.norm_bytes[pos]])
    return bm25.score_f64_w(idf_total, tfs, LENGTH_TABLE[idx.norm_bytes[pos]],
                            idx.doc_count, idx.sum_dl)


def _phrase_scores(idx: OracleIndex, q: Phrase, mode: str) -> pd.Series:
    """Naive exact-phrase: intersect per-slot (doc, pos-offset) sets;
    tf = phrase frequency, idf = sum of slot-term idfs."""
    if q.slop > 0:
        freqs = _sloppy_freqs(idx, q)
        if not freqs:
            return pd.Series(dtype=np.float32)
        docs = np.array(sorted(freqs), dtype=np.int64)
        tfs = np.array([freqs[d] for d in docs], dtype=np.float64)
        pos = np.searchsorted(idx.doc_ids, docs)
        return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=docs)
    keys: set[tuple[int, int]] | None = None
    for off, t in q.slots:
        rows = idx.tp[idx.tp["term"] == t]
        s = {(int(d), int(p) - off) for d, p in zip(rows["doc_id"], rows["pos"])
             if int(p) >= off}
        keys = s if keys is None else keys & s
        if not keys:
            return pd.Series(dtype=np.float32)
    freq: dict[int, int] = {}
    for d, _base in keys:
        freq[d] = freq.get(d, 0) + 1
    docs = np.array(sorted(freq), dtype=np.int64)
    tfs = np.array([freq[d] for d in docs], dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, docs)
    return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=docs)


def _multiphrase_scores(idx: OracleIndex, q: MultiPhrase,
                        mode: str) -> pd.Series:
    """Naive MultiPhraseQuery: per slot, union the alternatives' (doc,
    pos - offset) sets; intersect across slots; idf sums over every
    alternative (mirrors scorer._multiphrase_scores)."""
    keys: set[tuple[int, int]] | None = None
    for off, alts in q.slots:
        s: set[tuple[int, int]] = set()
        for t in alts:
            rows = idx.tp[idx.tp["term"] == t]
            s |= {(int(d), int(p) - off)
                  for d, p in zip(rows["doc_id"], rows["pos"])
                  if int(p) >= off}
        keys = s if keys is None else keys & s
        if not keys:
            return pd.Series(dtype=np.float32)
    freq: dict[int, int] = {}
    for d, _base in keys:
        freq[d] = freq.get(d, 0) + 1
    docs = np.array(sorted(freq), dtype=np.int64)
    tfs = np.array([freq[d] for d in docs], dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, docs)
    return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=docs)


def _within_scores(idx: OracleIndex, q: Within, mode: str) -> pd.Series:
    """Naive interval matcher implementing the pinned Within spec (see
    query.Within): anchor enumeration over members[0], ordered greedy
    chase / unordered nearest-position with smaller-position ties, freq =
    matching anchors, summed-idf phrase weight."""
    per: dict[str, dict[int, list[int]]] = {}
    for t in q.members:
        rows = idx.tp[idx.tp["term"] == t]
        by: dict[int, list[int]] = {}
        for d, p in zip(rows["doc_id"], rows["pos"]):
            by.setdefault(int(d), []).append(int(p))
        per[t] = {d: sorted(ps) for d, ps in by.items()}
    docs = set(per[q.members[0]])
    for t in q.members[1:]:
        docs &= set(per[t])
    freqs: dict[int, int] = {}
    for d in sorted(docs):
        cnt = 0
        for p0 in per[q.members[0]][d]:
            if q.ordered:
                prev, ok = p0, True
                for t in q.members[1:]:
                    nxt = [p for p in per[t][d] if p > prev]
                    if not nxt:
                        ok = False
                        break
                    prev = nxt[0]
                if ok and prev - p0 + 1 <= q.window:
                    cnt += 1
            else:
                lo = hi = p0
                for t in q.members[1:]:
                    best = min(per[t][d], key=lambda p: (abs(p - p0), p))
                    lo, hi = min(lo, best), max(hi, best)
                if hi - lo + 1 <= q.window:
                    cnt += 1
        if cnt:
            freqs[d] = cnt
    if not freqs:
        return pd.Series(dtype=np.float32)
    dd = np.array(sorted(freqs), dtype=np.int64)
    tfs = np.array([freqs[d] for d in dd], dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, dd)
    return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=dd)


def _span_eval_doc(node, pos_of: dict[str, list[int]]) -> list[tuple[int, int]]:
    """Per-doc naive span-tree evaluation mirroring the pinned spec in
    sparklucene/spans.py (module docstring = the contract): returns the
    sorted, deduped list of (start, end) spans for one document."""
    if isinstance(node, SpanTerm):
        return [(p, p + 1) for p in pos_of.get(node.term, [])]
    if isinstance(node, SpanOrNode):
        out: set[tuple[int, int]] = set()
        for c in node.clauses:
            out.update(_span_eval_doc(c, pos_of))
        return sorted(out)
    if isinstance(node, SpanNotNode):
        inc = _span_eval_doc(node.include, pos_of)
        exc = _span_eval_doc(node.exclude, pos_of)
        return [(s, e) for s, e in inc
                if not any(xs < e + node.post and xe > s - node.pre
                           for xs, xe in exc)]
    if isinstance(node, SpanFirstNode):
        return [(s, e) for s, e in _span_eval_doc(node.match, pos_of)
                if e <= node.limit]
    if isinstance(node, SpanPositionRangeNode):
        return [(s, e) for s, e in _span_eval_doc(node.match, pos_of)
                if s >= node.start and e <= node.end]
    if isinstance(node, SpanContainingNode):
        big = _span_eval_doc(node.big, pos_of)
        little = _span_eval_doc(node.little, pos_of)
        return [(s, e) for s, e in big
                if any(ls >= s and le <= e for ls, le in little)]
    if isinstance(node, SpanWithinNode):
        little = _span_eval_doc(node.little, pos_of)
        big = _span_eval_doc(node.big, pos_of)
        return [(s, e) for s, e in little
                if any(bs <= s and be >= e for bs, be in big)]
    if isinstance(node, SpanNearNode):
        sets = [_span_eval_doc(c, pos_of) for c in node.clauses]
        if len(sets) == 1:
            return sets[0]
        if any(not s for s in sets):
            return []
        out = set()
        for s0, e0 in sets[0]:
            if node.in_order:
                prev, gap, ok = e0, 0, True
                for spans in sets[1:]:
                    nxt = [(s, e) for s, e in spans if s >= prev]
                    if not nxt:
                        ok = False
                        break
                    s, e = min(nxt)  # lexicographic: min start, then end
                    gap += s - prev
                    prev = e
                if ok and gap <= node.slop:
                    out.add((s0, prev))
            else:
                lo, hi, wsum = s0, e0, e0 - s0
                for spans in sets[1:]:
                    s, e = min(spans, key=lambda x: (abs(x[0] - s0),
                                                     x[0], x[1]))
                    lo, hi = min(lo, s), max(hi, e)
                    wsum += e - s
                if (hi - lo) - wsum <= node.slop:
                    out.add((lo, hi))
        return sorted(out)
    raise TypeError(f"not a span node: {node!r}")


def _span_scores(idx: OracleIndex, q: Span, mode: str) -> pd.Series:
    """Naive nested-span matcher: per candidate doc, evaluate the tree
    with _span_eval_doc; freq = number of root spans; weight = summed idf
    over include-side leaves present in the index (pre-order dedup)."""
    terms = leaf_terms(q.root)
    per: dict[str, dict[int, list[int]]] = {}
    for t in terms:
        rows = idx.tp[idx.tp["term"] == t]
        by: dict[int, list[int]] = {}
        for d, p in zip(rows["doc_id"], rows["pos"]):
            by.setdefault(int(d), []).append(int(p))
        per[t] = {d: sorted(ps) for d, ps in by.items()}
    docs = sorted(set().union(*(set(per[t]) for t in terms)) if terms
                  else set())
    freqs: dict[int, int] = {}
    for d in docs:
        pos_of = {t: per[t].get(d, []) for t in terms}
        spans = _span_eval_doc(q.root, pos_of)
        if spans:
            freqs[d] = len(spans)
    if not freqs:
        return pd.Series(dtype=np.float32)
    dd = np.array(sorted(freqs), dtype=np.int64)
    tfs = np.array([freqs[d] for d in dd], dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, dd)
    return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=dd)


def _spanfirst_scores(idx: OracleIndex, q: SpanFirst, mode: str) -> pd.Series:
    """Naive SpanFirst: freq = positions of ``match`` strictly below
    ``end``, single-term summed-idf phrase weight."""
    rows = idx.tp[(idx.tp["term"] == q.match) & (idx.tp["pos"] < q.end)]
    if rows.empty:
        return pd.Series(dtype=np.float32)
    g = rows.groupby("doc_id").size().sort_index()
    dd = g.index.to_numpy(dtype=np.int64)
    tfs = g.to_numpy(dtype=np.int64)
    pos = np.searchsorted(idx.doc_ids, dd)
    return pd.Series(_phrase_weighted(idx, q, tfs, pos, mode), index=dd)


def _eval(idx: OracleIndex, q: Query, mode: str) -> pd.Series:
    """doc_id -> total score (float64 accumulator, sorted-term order)."""
    if isinstance(q, MatchNoDocs):
        return pd.Series(dtype=np.float64)
    if isinstance(q, MatchAllDocs):
        return pd.Series(np.full(idx.doc_ids.size, np.float32(q.boost),
                                 dtype=np.float64), index=idx.doc_ids)
    if isinstance(q, MultiPhrase):
        return _multiphrase_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, Within):
        return _within_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, SpanFirst):
        return _spanfirst_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, Span):
        return _span_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, Phrase):
        return _phrase_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, Term):
        return _term_scores(idx, q.term, mode, q.boost).astype(np.float64)
    if isinstance(q, Synonym):
        return _synonym_scores(idx, q, mode).astype(np.float64)
    if isinstance(q, ConstantScore):
        child = _eval(idx, q.child, mode)
        return pd.Series(np.full(len(child), np.float32(q.boost),
                                 dtype=np.float64), index=child.index)
    if isinstance(q, Filtered):
        pos = _eval(idx, q.positive, mode)
        flt = set(_eval(idx, q.filter, mode).index)
        return pos[pos.index.isin(sorted(flt))]
    if isinstance(q, DisMax):
        # per-clause f32 scores (engine clause boundary), f64 combination
        parts = [_eval(idx, c, mode).astype(np.float32).astype(np.float64)
                 for c in q.clauses]
        parts = [p for p in parts if not p.empty]
        if not parts:
            return pd.Series(dtype=np.float64)
        df = pd.concat(parts, axis=1)
        mx = df.max(axis=1)
        total = df.sum(axis=1)
        out = (mx + q.tiebreak * (total - mx)).sort_index()
        return out.astype(np.float32).astype(np.float64)
    if isinstance(q, Not):
        pos = _eval(idx, q.positive, mode)
        # excluded set by MATCH semantics (a negative phrase excludes only
        # phrase-matching docs — ReqExclScorer behavior)
        neg_docs = set(_eval(idx, q.negative, mode).index)
        return pos[~pos.index.isin(sorted(neg_docs))]
    assert isinstance(q, (And, Or))
    # MatchAllDocs MUST clauses restrict nothing; their constant boost is
    # added LAST (mirrors scorer._and_generic / SQL `sum(...) + c`)
    ma_boost = 0.0
    clauses = q.clauses
    if isinstance(q, And):
        ma_boost = sum(float(np.float32(c.boost)) for c in clauses
                       if isinstance(c, MatchAllDocs))
        clauses = tuple(c for c in clauses
                        if not isinstance(c, MatchAllDocs))
    # clause results are float32 at the clause boundary (engine behavior),
    # combined in a float64 accumulator in repr-sorted order
    parts = [_eval(idx, c, mode).astype(np.float32).astype(np.float64)
             for c in sorted(clauses, key=repr)]
    if not parts:
        return pd.Series(dtype=np.float64)
    total = None
    count = None
    for p in parts:
        if total is None:
            total, count = p.copy(), pd.Series(1, index=p.index)
        else:
            total = total.add(p, fill_value=0.0)
            count = count.add(pd.Series(1, index=p.index), fill_value=0)
    if isinstance(q, And):
        out = total[count == len(parts)]
        return out + ma_boost if ma_boost else out
    return total[count >= q.min_should_match]


def search_oracle(idx: OracleIndex, q: Query, k: int = 10,
                  mode: str = "lucene8") -> pd.DataFrame:
    """Top-k (doc_id, score float32), score desc then doc_id asc."""
    totals = _eval(idx, q, mode)
    if totals.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float32)})
    score32 = totals.astype(np.float32)
    out = pd.DataFrame({"doc_id": score32.index.to_numpy(dtype=np.int64),
                        "score": score32.to_numpy()})
    out = out.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)

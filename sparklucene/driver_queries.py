"""Driver-contract query registry — Spark builders paired with DuckDB oracles.

Every implemented operator from SURVEY.md §2 gets one entry here:
  * ``spark``  — Callable[(SparkSession, sf_dir)] -> DataFrame, running the
    REAL engine path (inverted index + BM25/WAND for search ops, DataFrame
    ops for relational ops).
  * ``sql``    — an equivalent DuckDB query over the driver's pre-registered
    parquet views (documents, embeddings, orders, ...), or None for ops that
    are not SQL-expressible (the driver then records a rows-only check).

Parity discipline (SURVEY.md §4.3, bm25.py): driver-facing BM25 queries run
the engine in ``f64`` precision mode whose float op order is mirrored
term-for-term by ``bm25.score_sql``; per-term float32 scores are summed in
float64 where the sum is exact (score spread << 2^29), so Spark and DuckDB
agree bit-for-bit. Integer/string ops are exact by construction; the few
derived doubles (avgdl, ratios) use identical expression trees both sides.

The inverted index for a given sf_dir is built once and cached on disk
(/tmp) across queries() calls — the driver calls each entry separately.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklucene import bm25
from sparklucene.analysis import TOKEN_RE_SQL, stoplist_sql
from sparklucene.build import FORMAT_VERSION, build_index, load_stats
from sparklucene.corpus import load_corpus
from sparklucene.norms import LENGTH_TABLE, quantize_length_sql
from sparklucene.query import (And, DisMax, MatchAllDocs, Not, Or, Phrase,
                               Query, SpanFirst, Term, Within,
                               analyze_phrase, parse)
from sparklucene.search import Index, matches, search, search_after, total_hits

# ---------------------------------------------------------------------------
# shared corpus analysis CTEs (DuckDB side)
# ---------------------------------------------------------------------------

#: tables the driver pre-registers as DuckDB views (TESTDATA.md)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def corpus_ctes() -> str:
    """WITH-clause body reproducing the engine's analysis chain in SQL:
    tokenize (lower + [a-z0-9_]+ runs + stop filter) -> tf -> doc meta
    (dl + SmallFloat-quantized dlq) -> global + per-term stats."""
    stop = stoplist_sql()
    return f"""
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop}
  GROUP BY doc_id, term
),
doclen AS (
  SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS dl
             FROM tok WHERE term NOT IN {stop} GROUP BY doc_id) t
  USING (doc_id)
),
meta AS (
  SELECT doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq FROM doclen
),
gstats AS (
  SELECT count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl,
         count(*)::BIGINT AS n_docs
  FROM meta
),
tstats AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
)"""


def _terms_in(terms: list[str]) -> str:
    return "(" + ", ".join(f"'{t}'" for t in sorted(terms)) + ")"


def bm25_topk_sql(pos_terms: list[str], k: int = 10, mode: str = "or",
                  msm: int = 1, neg_terms: list[str] | None = None,
                  exclude_docs: list[int] | None = None) -> str:
    """Brute-force BM25 top-k in DuckDB, float-op-for-float-op identical to
    the engine's f64 scoring mode (bm25.score_f64 / score_sql)."""
    score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count", "g.sum_dl")
    having = {"or": f"count(*) >= {msm}",
              "and": f"count(*) = {len(set(pos_terms))}"}[mode]
    neg = ""
    if neg_terms:
        neg = (f" AND tf.doc_id NOT IN (SELECT doc_id FROM tf "
               f"WHERE term IN {_terms_in(neg_terms)})")
    if exclude_docs:
        ids = ", ".join(str(int(d)) for d in sorted(exclude_docs))
        neg += f" AND tf.doc_id NOT IN ({ids})"
    return f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN {_terms_in(pos_terms)}{neg}
)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores
GROUP BY doc_id
HAVING {having}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def phrase_ctes_and_score(slots: list[tuple[int, str]],
                          boost: float = 1.0, name: str = "pf",
                          with_tokp: bool = True) -> tuple[str, str]:
    """(extra CTEs, score expression) for an exact PhraseQuery oracle.

    Positional semantics mirror the engine: positions index the PRE-stop
    token stream, so stopword gaps survive; tf = phrase frequency; weight
    = sum of slot-term idfs in slot order (PhraseWeight behavior).
    ``name``/``with_tokp`` let one query host SEVERAL phrase relations
    (pf2/pf3 shingles) sharing a single ``tokp`` CTE.
    """
    off0 = slots[0][0]
    conds = [f"t0.term = '{slots[0][1]}'"]
    joins = []
    for i, (off, term) in enumerate(slots[1:], start=1):
        joins.append(f"JOIN tokp t{i} ON t{i}.doc_id = t0.doc_id "
                     f"AND t{i}.pos = t0.pos + {off - off0}")
        conds.append(f"t{i}.term = '{term}'")
    tokp = f"""
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),""" if with_tokp else "\n"
    ctes = f"""{tokp}
{name} AS (
  SELECT t0.doc_id, count(*)::BIGINT AS tfp
  FROM tokp t0
  {' '.join(joins)}
  WHERE {' AND '.join(conds)}
  GROUP BY t0.doc_id
)"""
    idf_sum = " + ".join(
        f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
        f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5))"
        for _, t in slots)
    avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom = f"({name}.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl}))"
    w = f"({idf_sum})"
    if boost != 1.0:
        # BoostQuery fold: one f64 multiply on the summed idf, exactly
        # where the engine applies Phrase.boost (scorer._phrase_weighted)
        w = f"(CAST({float(boost)!r} AS DOUBLE) * {w})"
    score = f"CAST(({w} * {name}.tfp) / {denom} AS REAL)"
    return ctes, score


def phrase_topk_sql(slots: list[tuple[int, str]], k: int = 10) -> str:
    ctes, score = phrase_ctes_and_score(slots)
    return f"""WITH {corpus_ctes()},{ctes}
SELECT pf.doc_id AS doc_id, CAST({score} AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def _span_node_sql(node, ctr: list[int], ctes: list[str]) -> str:
    """Emit DuckDB CTEs computing the DISTINCT (doc_id, s, e) span set of
    a spans.SpanNode — a faithful SQL re-derivation of the pinned span
    spec (sparklucene/spans.py module docstring): greedy ordered chase
    via min-(s, e) QUALIFY, unordered nearest-by-start with the
    (abs distance, start, end) tie order, overlap NOT EXISTS for SpanNot.
    Returns the name of the CTE holding the node's span set."""
    from sparklucene.spans import (SpanContainingNode, SpanFirstNode,
                                   SpanNearNode, SpanNotNode, SpanOrNode,
                                   SpanTerm, SpanWithinNode)

    ctr[0] += 1
    me = f"sp{ctr[0]}"
    if isinstance(node, SpanFirstNode):
        m = _span_node_sql(node.match, ctr, ctes)
        ctes.append(f"""
{me} AS (SELECT doc_id, s, e FROM {m} WHERE e <= {node.limit})""")
        return me
    if isinstance(node, SpanContainingNode):
        big = _span_node_sql(node.big, ctr, ctes)
        little = _span_node_sql(node.little, ctr, ctes)
        ctes.append(f"""
{me} AS (SELECT b.doc_id, b.s, b.e FROM {big} b
  WHERE EXISTS (SELECT 1 FROM {little} l
    WHERE l.doc_id = b.doc_id AND l.s >= b.s AND l.e <= b.e))""")
        return me
    if isinstance(node, SpanWithinNode):
        little = _span_node_sql(node.little, ctr, ctes)
        big = _span_node_sql(node.big, ctr, ctes)
        ctes.append(f"""
{me} AS (SELECT l.doc_id, l.s, l.e FROM {little} l
  WHERE EXISTS (SELECT 1 FROM {big} b
    WHERE b.doc_id = l.doc_id AND b.s <= l.s AND b.e >= l.e))""")
        return me
    if isinstance(node, SpanTerm):
        ctes.append(f"""
{me} AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM tokp
  WHERE term = '{node.term}')""")
        return me
    if isinstance(node, SpanOrNode):
        kids = [_span_node_sql(c, ctr, ctes) for c in node.clauses]
        union = " UNION ".join(f"SELECT doc_id, s, e FROM {k}"
                               for k in kids)
        ctes.append(f"\n{me} AS ({union})")
        return me
    if isinstance(node, SpanNotNode):
        inc = _span_node_sql(node.include, ctr, ctes)
        exc = _span_node_sql(node.exclude, ctr, ctes)
        ctes.append(f"""
{me} AS (SELECT i.doc_id, i.s, i.e FROM {inc} i
  WHERE NOT EXISTS (SELECT 1 FROM {exc} x
    WHERE x.doc_id = i.doc_id AND x.s < i.e + {node.post}
      AND x.e > i.s - {node.pre}))""")
        return me
    if isinstance(node, SpanNearNode):
        kids = [_span_node_sql(c, ctr, ctes) for c in node.clauses]
        if node.in_order:
            prev = f"{me}_0"
            ctes.append(f"""
{prev} AS (SELECT doc_id, s AS s0, e AS pe, 0 AS gap FROM {kids[0]})""")
            for j, kid in enumerate(kids[1:], start=1):
                nxt = f"{me}_{j}"
                ctes.append(f"""
{nxt} AS (
  SELECT a.doc_id, a.s0, c.e AS pe, a.gap + (c.s - a.pe) AS gap
  FROM {prev} a JOIN {kid} c
    ON c.doc_id = a.doc_id AND c.s >= a.pe
  QUALIFY row_number() OVER (PARTITION BY a.doc_id, a.s0, a.pe, a.gap
                             ORDER BY c.s, c.e) = 1)""")
                prev = nxt
            ctes.append(f"""
{me} AS (SELECT DISTINCT doc_id, s0 AS s, pe AS e FROM {prev}
  WHERE gap <= {node.slop})""")
        else:
            anch = f"{me}_a"
            ctes.append(f"""
{anch} AS (SELECT doc_id, s AS s0, e AS e0 FROM {kids[0]})""")
            for j, kid in enumerate(kids[1:], start=1):
                ctes.append(f"""
{me}_{j} AS (
  SELECT a.doc_id, a.s0, a.e0, c.s AS qs, c.e AS qe
  FROM {anch} a JOIN {kid} c ON c.doc_id = a.doc_id
  QUALIFY row_number() OVER (PARTITION BY a.doc_id, a.s0, a.e0
                             ORDER BY abs(c.s - a.s0), c.s, c.e) = 1)""")
            n = len(kids) - 1
            joins = " ".join(
                f"JOIN {me}_{j} q{j} ON q{j}.doc_id = a.doc_id "
                f"AND q{j}.s0 = a.s0 AND q{j}.e0 = a.e0"
                for j in range(1, n + 1))
            lo = ", ".join(["a.s0"] + [f"q{j}.qs" for j in range(1, n + 1)])
            hi = ", ".join(["a.e0"] + [f"q{j}.qe" for j in range(1, n + 1)])
            wsum = " + ".join(["(a.e0 - a.s0)"]
                              + [f"(q{j}.qe - q{j}.qs)"
                                 for j in range(1, n + 1)])
            ctes.append(f"""
{me} AS (SELECT DISTINCT a.doc_id, least({lo}) AS s, greatest({hi}) AS e
  FROM {anch} a {joins}
  WHERE (greatest({hi}) - least({lo})) - ({wsum}) <= {node.slop})""")
        return me
    raise TypeError(f"not a span node: {node!r}")


def span_topk_sql(root, k: int = 10) -> str:
    """Oracle for query.Span — nested span trees re-derived from raw
    token positions entirely in SQL; freq = root spans per doc, summed
    include-side idf phrase weight (pre-order dedup; every leaf term is
    assumed present in the fixture corpus)."""
    from sparklucene.spans import leaf_terms

    ctes: list[str] = [f"""
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
)"""]
    root_name = _span_node_sql(root, [0], ctes)
    ctes.append(f"""
pf AS (SELECT doc_id, count(*)::BIGINT AS tfp FROM {root_name}
  GROUP BY doc_id)""")
    idf_sum = " + ".join(
        f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
        f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5))"
        for t in leaf_terms(root, include_only=True))
    avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom = f"(pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl}))"
    return f"""WITH {corpus_ctes()},{",".join(ctes)}
SELECT pf.doc_id AS doc_id,
       CAST(CAST((({idf_sum}) * pf.tfp) / {denom} AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def within_topk_sql(members: tuple[str, ...], window: int, ordered: bool,
                    k: int = 10) -> str:
    """Oracle for query.Within — mirrors the pinned interval spec
    (anchor enumeration over members[0], ordered greedy chase / unordered
    nearest-position with smaller-position ties, freq = matching anchors,
    summed-idf phrase weight in members order)."""
    m0, rest = members[0], members[1:]
    ctes = [f"""
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
anchors AS (SELECT doc_id, pos AS p0 FROM tokp WHERE term = '{m0}')"""]
    if ordered:
        prev_cte, prev_col, carry = "anchors", "p0", ["p0"]
        for i, t in enumerate(rest, start=1):
            cols = ", ".join(f"s.{c}" for c in carry)
            ctes.append(f"""
s{i} AS (
  SELECT s.doc_id, {cols}, min(t.pos) AS p{i}
  FROM {prev_cte} s JOIN tokp t
    ON t.doc_id = s.doc_id AND t.term = '{t}' AND t.pos > s.{prev_col}
  GROUP BY s.doc_id, {cols})""")
            prev_cte, prev_col = f"s{i}", f"p{i}"
            carry.append(f"p{i}")
        ctes.append(f"""
matched AS (
  SELECT doc_id, p0 FROM {prev_cte}
  WHERE {prev_col} - p0 + 1 <= {window})""")
    else:
        for i, t in enumerate(rest, start=1):
            ctes.append(f"""
d{i} AS (
  SELECT a.doc_id, a.p0, min(abs(t.pos - a.p0)) AS d
  FROM anchors a JOIN tokp t
    ON t.doc_id = a.doc_id AND t.term = '{t}'
  GROUP BY a.doc_id, a.p0),
q{i} AS (
  SELECT n.doc_id, n.p0, min(t.pos) AS q{i}
  FROM d{i} n JOIN tokp t
    ON t.doc_id = n.doc_id AND t.term = '{t}'
       AND abs(t.pos - n.p0) = n.d
  GROUP BY n.doc_id, n.p0)""")
        joins = " ".join(
            f"JOIN q{i} ON q{i}.doc_id = a.doc_id AND q{i}.p0 = a.p0"
            for i in range(1, len(rest) + 1))
        allpos = ", ".join(["a.p0"] + [f"q{i}.q{i}"
                                       for i in range(1, len(rest) + 1)])
        ctes.append(f"""
matched AS (
  SELECT a.doc_id, a.p0 FROM anchors a {joins}
  WHERE greatest({allpos}) - least({allpos}) + 1 <= {window})""")
    ctes.append("""
pf AS (SELECT doc_id, count(*)::BIGINT AS tfp FROM matched GROUP BY doc_id)""")
    idf_sum = " + ".join(
        f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
        f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5))"
        for t in members)
    avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom = f"(pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl}))"
    return f"""WITH {corpus_ctes()},{",".join(ctes)}
SELECT pf.doc_id AS doc_id,
       CAST(CAST((({idf_sum}) * pf.tfp) / {denom} AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


# ---------------------------------------------------------------------------
# engine plumbing (Spark side)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, Index] = {}


def index_for(spark: SparkSession, sf_dir: str, variant: str = "",
              analyzer=None, extra_fields: tuple = (),
              transform=None, payloads: str | None = None) -> Index:
    """Build-once-per-corpus index handle (disk-cached across processes).

    ``variant``/``analyzer`` build alternate-analyzer indexes (stemmed,
    shingled, ...) cached under their own directories. ``transform``
    (DataFrame -> DataFrame) derives an alternate corpus before indexing
    — callers MUST pair it with a unique ``variant`` (the cache key)."""
    key = os.path.realpath(sf_dir) + ("#" + variant if variant else "")
    idx = _INDEX_CACHE.get(key)
    if idx is not None:
        return idx
    tag = hashlib.sha256(key.encode()).hexdigest()[:12]
    index_dir = os.path.join(
        "/tmp", "sparklucene-idx",
        f"{os.path.basename(os.path.realpath(sf_dir))}-{tag}")

    def _fresh() -> bool:
        return (os.path.exists(os.path.join(index_dir, "stats.json"))
                and load_stats(index_dir).get("format") == FORMAT_VERSION)

    if not _fresh():
        import shutil
        import threading
        import time as _time

        # cross-process lock: queries may be invoked concurrently. The
        # holder writes lock/owner.json (pid) and a daemon thread touches
        # it as a heartbeat, so takeover requires BOTH a stale heartbeat
        # AND a dead pid — a live builder in a long no-write phase (big
        # shuffle before the first partial lands) keeps its lock. Release
        # verifies ownership so a thief's lock is never removed by the
        # original holder's cleanup.
        LOCK_TTL = 180.0
        HEARTBEAT = 20.0
        lock = index_dir + ".lock"
        owner = os.path.join(lock, "owner.json")

        def _heartbeat_age() -> float:
            """Seconds since the freshest sign of life: the heartbeat
            file, the lock dir, or any write under the index dir."""
            newest = 0.0
            for p in (owner, lock, index_dir):
                try:
                    newest = max(newest, os.path.getmtime(p))
                except OSError:
                    continue
            if os.path.isdir(index_dir):
                for root, _dirs, files in os.walk(index_dir):
                    for f in files:
                        try:
                            newest = max(newest, os.path.getmtime(
                                os.path.join(root, f)))
                        except OSError:
                            pass
            return _time.time() - newest

        def _holder_dead() -> bool:
            """True only when the recorded holder pid provably no longer
            exists. Unreadable/missing owner file → not provably dead."""
            try:
                with open(owner) as fh:
                    pid = int(json.load(fh)["pid"])
            except (OSError, ValueError, KeyError):
                return False
            try:
                os.kill(pid, 0)
                return False
            except ProcessLookupError:
                return True
            except PermissionError:
                return False

        def _owned_by_me() -> bool:
            try:
                with open(owner) as fh:
                    return int(json.load(fh)["pid"]) == os.getpid()
            except (OSError, ValueError, KeyError):
                return False

        os.makedirs(os.path.dirname(index_dir), exist_ok=True)
        got = False
        deadline = _time.time() + 1200
        while not got and not _fresh():
            try:
                os.mkdir(lock)
                with open(owner, "w") as fh:
                    json.dump({"pid": os.getpid()}, fh)
                got = True
            except FileExistsError:
                stale = _heartbeat_age() > LOCK_TTL
                if stale and (_holder_dead()
                              # no owner record at all (pre-heartbeat
                              # crash): fall back to a doubled TTL
                              or (not os.path.exists(owner)
                                  and _heartbeat_age() > 2 * LOCK_TTL)):
                    try:
                        os.unlink(owner)
                    except OSError:
                        pass
                    try:
                        os.rmdir(lock)  # dead-holder takeover
                    except OSError:
                        pass
                    continue
                if _time.time() > deadline:
                    break
                _time.sleep(1)
        if got:
            stop = threading.Event()

            def _beat() -> None:
                while not stop.wait(HEARTBEAT):
                    try:
                        os.utime(owner)
                    except OSError:
                        return

            beat = threading.Thread(target=_beat, daemon=True)
            beat.start()
            try:
                if not _fresh():
                    shutil.rmtree(index_dir, ignore_errors=True)
                    corpus = load_corpus(spark, sf_dir)
                    if transform is not None:
                        corpus = transform(corpus)
                    build_index(spark, corpus, index_dir, analyzer=analyzer,
                                extra_fields=extra_fields, payloads=payloads)
            finally:
                stop.set()
                beat.join(timeout=1.0)
                if _owned_by_me():  # never remove a thief's lock
                    try:
                        os.unlink(owner)
                    except OSError:
                        pass
                    try:
                        os.rmdir(lock)
                    except OSError:
                        pass
        if not _fresh():
            raise RuntimeError(
                f"index at {index_dir} is not complete after waiting for a "
                "concurrent builder (stale lock taken over or builder "
                "failed) — remove the directory and retry")
    idx = Index(spark, index_dir)
    _INDEX_CACHE[key] = idx
    return idx


def _bm25(q: Query, k: int = 10) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return search(index_for(spark, sf_dir), q, k=k, mode="f64", prune=True)
    return run


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _search_entries() -> dict[str, tuple[Callable, str | None]]:
    """BM25 query algebra (SURVEY.md §2.4-2.6): Term/AND/OR/NOT/msm top-k
    through the full engine path — postings scan + WAND/MAXSCORE + two-phase
    merge — against a brute-force SQL oracle."""
    e: dict[str, tuple[Callable, str | None]] = {}

    e["bm25_term"] = (
        _bm25(Term("vector"), k=10),
        bm25_topk_sql(["vector"], k=10))

    e["bm25_or_flagship"] = (
        _bm25(Or((Term("spark"), Term("merge"), Term("join"))), k=10),
        bm25_topk_sql(["spark", "merge", "join"], k=10))

    e["bm25_or_wide"] = (
        _bm25(Or((Term("query"), Term("window"), Term("scan"), Term("fast"),
                  Term("column"))), k=15),
        bm25_topk_sql(["query", "window", "scan", "fast", "column"], k=15))

    e["bm25_and"] = (
        _bm25(And((Term("hash"), Term("join"), Term("batch"))), k=10),
        bm25_topk_sql(["hash", "join", "batch"], k=10, mode="and"))

    e["bm25_not"] = (
        _bm25(Not(Or((Term("spark"), Term("merge"))), Term("slow")), k=10),
        bm25_topk_sql(["spark", "merge"], k=10, neg_terms=["slow"]))

    e["bm25_msm2"] = (
        _bm25(Or((Term("vector"), Term("stream"), Term("agg")),
                 min_should_match=2), k=10),
        bm25_topk_sql(["vector", "stream", "agg"], k=10, msm=2))

    # -- Solr mm SPEC (round 4; u8:solr/core/.../util/
    # SolrPluginUtils.java calculateMinShouldMatch): the edismax mm
    # grammar — "2<75%" over 4 optional clauses resolves to
    # 4*75/100 = 3 (Java integer truncation); the oracle hardcodes the
    # independently-computed 3.
    from sparklucene.query import parse_min_should_match
    _MM_TERMS = ("vector", "stream", "agg", "window")
    _mm_val = parse_min_should_match("2<75%", len(_MM_TERMS))
    assert _mm_val == 3
    e["bm25_msm_percent"] = (
        _bm25(Or(tuple(Term(t) for t in _MM_TERMS),
                 min_should_match=_mm_val), k=10),
        bm25_topk_sql(list(_MM_TERMS), k=10, msm=3))

    e["bm25_and_missing_term"] = (
        # AND with an unindexed term -> empty (Lucene null-scorer semantics)
        _bm25(And((Term("spark"), Term("zzz_not_in_corpus"))), k=10),
        bm25_topk_sql(["spark", "zzz_not_in_corpus"], k=10, mode="and"))

    # live-docs deletions: masked before any top-k heap; term stats stay
    # index-wide (Lucene keeps docFreq of deleted docs until merge)
    _DELETED = [1, 7, 42, 99, 123]

    def with_deletes(spark, sf):
        return search(index_for(spark, sf), Or((Term("spark"), Term("merge"))),
                      k=10, mode="f64", prune=True, exclude_docs=_DELETED)
    e["bm25_with_deletes"] = (
        with_deletes,
        bm25_topk_sql(["spark", "merge"], k=10, exclude_docs=_DELETED))

    # pluggable similarity: ClassicSimilarity (TF-IDF) over the same index
    def classic(spark, sf):
        return search(index_for(spark, sf),
                      Or((Term("spark"), Term("merge"), Term("join"))),
                      k=10, mode="classic", prune=True)
    cscore = bm25.classic_score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count")
    e["classic_similarity_or"] = (classic, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {cscore} AS s
  FROM tf JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge', 'spark'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # MoreLikeThis: top tf*idf terms of seed doc 42 -> OR, seed excluded
    def mlt(spark, sf):
        from sparklucene.mlt import more_like_this
        return more_like_this(index_for(spark, sf), load_corpus(spark, sf),
                              doc_id=42, max_terms=5, k=10, mode="f64")
    mlt_score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count",
                               "g.sum_dl")
    e["more_like_this"] = (mlt, f"""WITH {corpus_ctes()},
doc_tf AS (SELECT term, tf FROM tf WHERE doc_id = 42),
term_weight AS (
  SELECT d.term,
         d.tf * ln(1.0 + (g.doc_count - s.df + 0.5) / (s.df + 0.5)) AS w
  FROM doc_tf d JOIN tstats s ON d.term = s.term CROSS JOIN gstats g),
top_terms AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY w DESC, term ASC) AS rn
    FROM term_weight) WHERE rn <= 5),
term_scores AS (
  SELECT tf.doc_id, {mlt_score} AS s
  FROM tf JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN (SELECT term FROM top_terms) AND tf.doc_id != 42)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # mlt.interestingTerms=details (round 4; u8:solr/core/.../handler/
    # MoreLikeThisHandler.java): the MLT-selected terms with weights.
    def mlt_terms(spark, sf):
        from sparklucene.mlt import interesting_terms
        return interesting_terms(index_for(spark, sf),
                                 load_corpus(spark, sf),
                                 doc_id=42, max_terms=8)
    e["mlt_interesting_terms"] = (mlt_terms, f"""WITH {corpus_ctes()},
doc_tf AS (SELECT term, tf FROM tf WHERE doc_id = 42),
term_weight AS (
  SELECT d.term, d.tf, s.df,
         d.tf * ln(1.0 + (g.doc_count - s.df + 0.5) / (s.df + 0.5)) AS w
  FROM doc_tf d JOIN tstats s ON d.term = s.term CROSS JOIN gstats g)
SELECT term, tf, df, CAST(CAST(w AS REAL) AS DOUBLE) AS weight
FROM (SELECT *, row_number() OVER (ORDER BY w DESC, term ASC) AS rn
      FROM term_weight)
WHERE rn <= 8""")

    e["bm25_phrase"] = (
        _bm25(Phrase(((0, "table"), (1, "hash"))), k=10),
        phrase_topk_sql([(0, "table"), (1, "hash")], k=10))

    # analyzer drops "the" but keeps its position gap (StopFilter
    # position increments): matches hash <any stopword slot> query
    gap = analyze_phrase("hash the query")
    assert isinstance(gap, Phrase) and gap.slots == ((0, "hash"), (2, "query"))
    e["bm25_phrase_stopword_gap"] = (
        _bm25(gap, k=10), phrase_topk_sql([(0, "hash"), (2, "query")], k=10))

    # sloppy phrase (pinned proximity spec: nearest-displacement sum <=
    # slop per slot-0 anchor, dyadic 2^-D weights -> exact float parity)
    slop_q = Phrase(((0, "merge"), (1, "join")), slop=2)
    idf2 = ("(ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = 'merge') + 0.5)"
            " / ((SELECT df FROM tstats WHERE term = 'merge') + 0.5))"
            " + ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = 'join') + 0.5)"
            " / ((SELECT df FROM tstats WHERE term = 'join') + 0.5)))")
    avgdl_s = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom_s = f"(pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl_s}))"
    e["bm25_phrase_sloppy"] = (_bm25(slop_q, k=10), f"""WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
anchors AS (SELECT doc_id, pos - 0 AS base FROM tokp WHERE term = 'merge'),
dists AS (
  SELECT a.doc_id, a.base, min(abs(t.pos - 1 - a.base))::BIGINT AS d
  FROM anchors a JOIN tokp t ON t.doc_id = a.doc_id AND t.term = 'join'
  GROUP BY a.doc_id, a.base),
pf AS (
  SELECT doc_id, sum(1.0 / (1::BIGINT << d)) AS tfp
  FROM dists WHERE d <= 2 GROUP BY doc_id)
SELECT pf.doc_id AS doc_id,
       CAST(CAST((({idf2}) * pf.tfp) / {denom_s} AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # mixed boolean: phrase clause OR term clause, scores summed per doc
    mixed = Or((Phrase(((0, "merge"), (1, "group"))), Term("vector")))
    ph_ctes, ph_score = phrase_ctes_and_score([(0, "merge"), (1, "group")])
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count", "g.sum_dl")
    e["bm25_phrase_or_term"] = (_bm25(mixed, k=10), f"""WITH {corpus_ctes()},{ph_ctes},
phrase_scores AS (
  SELECT pf.doc_id, {ph_score} AS s
  FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector'),
allscores AS (
  SELECT * FROM phrase_scores UNION ALL SELECT * FROM term_scores)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM allscores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # -- edismax pf phrase boost (round 4; u8:solr/core/.../search/
    # ExtendedDismaxQParser.java addShingledPhraseQueries): the whole
    # query text as an implicit boosted phrase SHOULD clause — matching
    # requires the main OR alone; a phrase hit ("hash <stop gap> query",
    # StopFilter position increments preserved) adds boost*phrase-BM25.
    # Every phrase match implies both terms matched, so the oracle's
    # plain score union needs no extra filter.
    from sparklucene.search import edismax_query as _edx
    edx_pf_q = _edx("hash the query", {"content": 1.0},
                    pf={"content": 2.0})
    pfb_ctes, pfb_score = phrase_ctes_and_score([(0, "hash"), (2, "query")],
                                                boost=2.0)
    e["edismax_pf_phrase_boost"] = (_bm25(edx_pf_q, k=10),
                                    f"""WITH {corpus_ctes()},{pfb_ctes},
phrase_scores AS (
  SELECT pf.doc_id, {pfb_score} AS s
  FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('hash', 'query')),
allscores AS (
  SELECT * FROM term_scores UNION ALL SELECT * FROM phrase_scores)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM allscores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # -- edismax pf2 shingled bigram boost (round 4; the wordGrams=2
    # branch of addShingledPhraseQueries — every adjacent pair of
    # surviving query terms becomes its own boosted phrase SHOULD
    # clause; matching still requires the main query alone).
    edx_pf2_q = _edx("fast merge join", {"content": 1.0},
                     pf2={"content": 1.5})
    _b1_ctes, _b1_score = phrase_ctes_and_score(
        [(0, "fast"), (1, "merge")], boost=1.5, name="pfa")
    _b2_ctes, _b2_score = phrase_ctes_and_score(
        [(1, "merge"), (2, "join")], boost=1.5, name="pfb",
        with_tokp=False)
    e["edismax_pf2_bigram_boost"] = (_bm25(edx_pf2_q, k=10),
                                     f"""WITH {corpus_ctes()},{_b1_ctes},{_b2_ctes},
phrase_scores AS (
  SELECT pfa.doc_id, {_b1_score} AS s
  FROM pfa JOIN meta m ON pfa.doc_id = m.doc_id CROSS JOIN gstats g
  UNION ALL
  SELECT pfb.doc_id, {_b2_score} AS s
  FROM pfb JOIN meta m ON pfb.doc_id = m.doc_id CROSS JOIN gstats g),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('fast', 'join', 'merge')),
allscores AS (
  SELECT * FROM term_scores UNION ALL SELECT * FROM phrase_scores)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM allscores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # -- SynonymQuery (round 4; u8:lucene/core/.../search/
    # SynonymQuery.java): 'merge' and 'join' scored as ONE pseudo-term
    # (freq = tf sum, df = max member df — SynonymWeight's blended
    # TermStatistics), OR-ed with a normally-scored term.
    from sparklucene.query import Synonym, apply_synonyms
    syn_q = Or((Synonym(("join", "merge")), Term("scan")))
    syn_score = bm25.score_sql("s.ftf", "m.dlq", "x.df", "g.doc_count",
                               "g.sum_dl")
    tscore_syn = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                                "g.sum_dl")
    e["synonym_query_blended"] = (_bm25(syn_q, k=10), f"""WITH {corpus_ctes()},
syn AS (SELECT doc_id, sum(tf)::BIGINT AS ftf FROM tf
        WHERE term IN ('join', 'merge') GROUP BY doc_id),
sdf AS (SELECT max(df)::BIGINT AS df FROM tstats
        WHERE term IN ('join', 'merge')),
uni AS (
  SELECT s.doc_id, {syn_score} AS s
  FROM syn s JOIN meta m ON s.doc_id = m.doc_id
  CROSS JOIN sdf x CROSS JOIN gstats g
  UNION ALL
  SELECT tf.doc_id, {tscore_syn} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'scan')
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- query-time synonym-graph expansion (round 4; SynonymGraphFilter
    # via QueryBuilder.analyzeGraphBoolean): rule dup -> {vector,
    # "merge group"} turns Term('dup') into Or(Synonym(dup, vector),
    # Phrase(merge group)) — blended single-token node + exact-phrase
    # branch, each scoring normally.
    syn_rules = {"dup": ("vector", ("merge", "group"))}
    graph_q = apply_synonyms(parse("dup"), syn_rules)
    sg_ctes, sg_score = phrase_ctes_and_score([(0, "merge"), (1, "group")])
    e["synonym_graph_multiword"] = (_bm25(graph_q, k=10), f"""WITH {corpus_ctes()},{sg_ctes},
syn AS (SELECT doc_id, sum(tf)::BIGINT AS ftf FROM tf
        WHERE term IN ('dup', 'vector') GROUP BY doc_id),
sdf AS (SELECT max(df)::BIGINT AS df FROM tstats
        WHERE term IN ('dup', 'vector')),
uni AS (
  SELECT s.doc_id, {syn_score} AS s
  FROM syn s JOIN meta m ON s.doc_id = m.doc_id
  CROSS JOIN sdf x CROSS JOIN gstats g
  UNION ALL
  SELECT pf.doc_id, {sg_score} AS s
  FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # DisjunctionMaxQuery: max clause score + tiebreak * rest
    dismax_terms = ["spark", "merge", "join"]
    tscore2 = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count", "g.sum_dl")
    e["bm25_dismax"] = (
        _bm25(DisMax(tuple(Term(t) for t in dismax_terms), tiebreak=0.3), k=10),
        f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, CAST({tscore2} AS DOUBLE) AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN {_terms_in(dismax_terms)})
SELECT doc_id,
       CAST(CAST(max(s) + 0.3 * (sum(s) - max(s)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # BoostQuery: per-clause boost multiplies the weight (w = boost * idf)
    idf_e = "ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5))"
    avgdl_e = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom_e = f"(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl_e}))"
    boosted = (f"CAST(((CASE tf.term WHEN 'spark' THEN 2.5 ELSE 1.0 END "
               f"* {idf_e}) * tf.tf) / {denom_e} AS REAL)")
    e["bm25_boosted_or"] = (
        _bm25(Or((Term("spark", boost=2.5), Term("merge"))), k=10),
        f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {boosted} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # TotalHitCountCollector: exact hit count, no top-k shortcut
    def hits(spark, sf):
        return total_hits(index_for(spark, sf),
                          Or((Term("vector"), Term("window"))), mode="f64")
    e["search_total_hits"] = (hits, f"""WITH {corpus_ctes()}
SELECT count(DISTINCT doc_id)::BIGINT AS total_hits
FROM tf WHERE term IN ('vector', 'window')""")

    # ExportWriter: complete sorted result set of a conjunction
    def export(spark, sf):
        out = matches(index_for(spark, sf), And((Term("hash"), Term("vector"))),
                      mode="f64")
        return out.orderBy(F.desc("score"), F.asc("doc_id"))
    e["search_export_sorted"] = (export, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore2} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('hash', 'vector'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id HAVING count(*) = 2
ORDER BY score DESC, doc_id ASC""")

    # CursorMark deep paging: page 2 via keyset, checked against rank 11-20
    def page2(spark, sf):
        idx = index_for(spark, sf)
        q = Or((Term("query"), Term("scan")))
        p1 = search(idx, q, k=10, mode="f64").collect()
        last = p1[-1]
        return search_after(idx, q, k=10,
                            after=(last["score"], last["doc_id"]), mode="f64")
    e["search_cursor_page2"] = (page2, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore2} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('query', 'scan')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM doc_scores)
SELECT doc_id, score FROM ranked WHERE rn > 10 AND rn <= 20""")

    return e


def _index_stat_entries() -> dict[str, tuple[Callable, str | None]]:
    """Index-side artifacts (SURVEY.md §2.3): term dictionary stats, doc
    norms, global stats — read from the engine's built index tables and
    recomputed from scratch by the oracle."""
    e: dict[str, tuple[Callable, str | None]] = {}

    probe = ["spark", "merge", "join", "vector", "the", "data"]

    def term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        return (idx.termstats()
                .filter(F.col("term").isin(probe))
                .select("term", "df", "cf"))
    e["index_term_stats"] = (term_stats, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats WHERE term IN {_terms_in(probe)}""")

    def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        return (idx.termstats()
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(20)
                .select("term", "df"))
    e["index_top_terms_by_df"] = (top_terms, f"""WITH {corpus_ctes()}
SELECT term, df FROM tstats ORDER BY df DESC, term ASC LIMIT 20""")

    # -- Luke handler field summary (round 4; u8:solr/core/.../handler/
    # admin/LukeRequestHandler.java): per-field dictionary overview —
    # top terms by df annotated with the field's global dictionary
    # stats (distinct terms, total postings, collection frequency sum).
    # Everything reads the vocab-sized termstats table, never postings.
    def luke(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        ts = idx.termstats()
        tot = ts.agg(F.count("*").alias("n_terms"),
                     F.sum("df").alias("sum_df"),
                     F.sum("cf").alias("sum_cf"))
        return (ts.orderBy(F.desc("df"), F.asc("term")).limit(5)
                .select("term", "df", "cf")
                .crossJoin(F.broadcast(tot))
                .orderBy(F.desc("df"), F.asc("term")))
    e["luke_field_summary"] = (luke, f"""WITH {corpus_ctes()},
tot AS (SELECT count(*)::BIGINT AS n_terms, sum(df)::BIGINT AS sum_df,
               sum(cf)::BIGINT AS sum_cf FROM tstats),
top5 AS (SELECT term, df, cf FROM tstats
         ORDER BY df DESC, term ASC LIMIT 5)
SELECT t.term, t.df, t.cf, tot.n_terms, tot.sum_df, tot.sum_cf
FROM top5 t CROSS JOIN tot ORDER BY t.df DESC, t.term ASC""")

    # -- TermVectorComponent (round 3; u8:solr/core/.../handler/
    # component/TermVectorComponent.java: tv=true&tv.tf=true&tv.df=true)
    def tv_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import term_vectors
        return term_vectors(index_for(spark, sf_dir),
                            load_corpus(spark, sf_dir), (11, 42))
    e["term_vectors_for_docs"] = (tv_docs, f"""WITH {corpus_ctes()}
SELECT tf.doc_id, tf.term, tf.tf, ts.df, ts.cf
FROM tf JOIN tstats ts ON tf.term = ts.term
WHERE tf.doc_id IN (11, 42)
ORDER BY tf.doc_id, tf.term""")

    # -- PostingsEnum.POSITIONS round-trip (round 4;
    # u8:lucene/core/.../index/PostingsEnum.java): positions decoded
    # straight from the delta+VByte stream must equal the raw pre-stop
    # token positions — the codec check the forward-derived term vectors
    # cannot give.
    def tpos(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import term_positions
        idx = index_for(spark, sf_dir)
        return term_positions(idx, "merge", tuple(range(40)))
    e["postings_term_positions"] = (tpos, f"""
WITH tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents WHERE doc_id < 40) tl
)
SELECT doc_id, pos FROM tokp WHERE term = 'merge'
ORDER BY doc_id, pos""")

    # -- IndexSearcher.explain (round 4; u8:lucene/core/.../search/
    # IndexSearcher.java#explain + BM25Similarity.explain): per-(doc,
    # term) BM25 decomposition — tf, df, dl, quantized dl, idf, and the
    # score contribution, f32-rounded like the f64 scorer output.
    def explain(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import explain_terms
        idx = index_for(spark, sf_dir)
        corpus = load_corpus(spark, sf_dir)
        return explain_terms(idx, corpus, ("join", "merge"),
                             tuple(range(10)))

    _x_idf = "ln(1.0 + (g.doc_count - s.df + 0.5) / (s.df + 0.5))"
    _x_den = ("(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq "
              "/ (g.sum_dl / CAST(g.doc_count AS DOUBLE))))")
    e["explain_score_components"] = (explain, f"""WITH {corpus_ctes()}
SELECT tf.doc_id, tf.term, tf.tf, s.df, m.dl, m.dlq,
       CAST(CAST({_x_idf} AS REAL) AS DOUBLE) AS idf,
       CAST(CAST(({_x_idf} * tf.tf) / {_x_den} AS REAL) AS DOUBLE)
         AS contribution
FROM tf JOIN tstats s ON tf.term = s.term
JOIN meta m ON tf.doc_id = m.doc_id
CROSS JOIN gstats g
WHERE tf.term IN ('join', 'merge') AND tf.doc_id < 10
ORDER BY tf.doc_id, tf.term""")

    def doc_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        meta = idx.docmeta()
        # dlq from the stored norm byte via the SmallFloat decode table —
        # exercised through a join against a tiny broadcast decode table
        table = [(b, int(v)) for b, v in enumerate(LENGTH_TABLE)]
        decode = idx.spark.createDataFrame(table, "norm int, dlq long")
        return (meta.join(F.broadcast(decode), "norm")
                .select("doc_id", "dl", "dlq"))
    e["index_doc_norms"] = (doc_norms, f"""WITH {corpus_ctes()}
SELECT doc_id, dl, dlq FROM meta""")

    # -- RealTimeGet (round 3; Solr /get handler —
    # u8:solr/core/.../handler/component/RealTimeGetComponent.java):
    # fetch by unique key, stored fields + index-side doc metadata. This
    # engine's visibility contract is the committed index view (streaming
    # batches become visible at foreachBatch commit, streaming.py); the
    # id filter pushes into BOTH parquet scans and every join side after
    # the scan is <= |ids| rows.
    _rtg_ids = (5, 123, 321)

    def rtg(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        table = [(b, int(v)) for b, v in enumerate(LENGTH_TABLE)]
        decode = idx.spark.createDataFrame(table, "norm int, dlq long")
        meta = (idx.docmeta().filter(F.col("doc_id").isin(list(_rtg_ids)))
                .join(F.broadcast(decode), "norm"))
        langs = (_t(spark, sf_dir, "documents")
                 .filter(F.col("doc_id").isin(list(_rtg_ids)))
                 .select("doc_id", "lang", "source"))
        return (meta.join(F.broadcast(langs), "doc_id")
                .select("doc_id", "lang", "source", "dl", "dlq")
                .orderBy("doc_id"))
    e["realtime_get_by_ids"] = (rtg, f"""WITH {corpus_ctes()}
SELECT m.doc_id, d.lang, d.source, m.dl, m.dlq
FROM meta m JOIN documents d ON m.doc_id = d.doc_id
WHERE m.doc_id IN (5, 123, 321)
ORDER BY m.doc_id""")

    # -- TermsComponent (round 4; Solr /terms handler —
    # u8:solr/core/.../handler/component/TermsComponent.java): term
    # dictionary enumeration with prefix/regex/mincount/limit and both
    # sort orders; runs on the vocab-sized termstats only (no postings)
    def terms_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import terms_enum
        return terms_enum(index_for(spark, sf_dir), prefix="s",
                          sort="index", limit=15)
    e["terms_component_prefix_index"] = (terms_prefix, f"""WITH {corpus_ctes()}
SELECT term, df FROM tstats WHERE term LIKE 's%'
ORDER BY term ASC LIMIT 15""")

    def terms_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import terms_enum
        return terms_enum(index_for(spark, sf_dir), regex=".*a.*",
                          mincount=5, sort="count", limit=10, ttf=True)
    e["terms_component_regex_count"] = (terms_regex, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats
WHERE regexp_matches(term, '^(?:.*a.*)$') AND df >= 5
ORDER BY df DESC, term ASC LIMIT 10""")

    def index_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
        """FIXTURES.md §6.2: index-derived aggregates must equal the
        from-scratch recomputation (sum df == distinct (term,doc) pairs,
        sum cf == total token count, vocabulary size)."""
        idx = index_for(spark, sf_dir)
        return idx.termstats().agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("sum_df"),
            F.sum("cf").alias("sum_cf"))
    e["index_invariants"] = (index_invariants, f"""WITH {corpus_ctes()}
SELECT count(*)::BIGINT AS n_terms, sum(df)::BIGINT AS sum_df,
       sum(cf)::BIGINT AS sum_cf FROM tstats""")

    def sha_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
        """BASELINE.json input_hint per-row invariant: sha256(content)
        preserved through the corpus mapping."""
        corpus = load_corpus(spark, sf_dir)
        return corpus.select("doc_id", F.sha2(F.col("content"), 256).alias("sha"))
    e["corpus_sha256_invariant"] = (sha_invariant, """
SELECT doc_id, sha256(text) AS sha FROM documents""")

    def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        s = idx.stats
        return idx.spark.createDataFrame(
            [(int(s["n_docs"]), int(s["doc_count"]), int(s["sum_dl"]),
              float(s["sum_dl"] / float(s["doc_count"])))],
            "n_docs long, doc_count long, sum_dl long, avgdl double")
    e["index_global_stats"] = (global_stats, f"""WITH {corpus_ctes()}
SELECT n_docs, doc_count, sum_dl, sum_dl / CAST(doc_count AS DOUBLE) AS avgdl
FROM gstats""")

    # -- Index-time sort + early-terminating top-k (round 4;
    # u8:lucene/core/.../index/IndexWriterConfig.java setIndexSort,
    # u8:lucene/core/.../search/TopFieldCollector.java early exit):
    # a range-partitioned sorted parquet view with a per-file key
    # envelope manifest; top-k-by-field reads ONLY the leading file
    # prefix covering k (+ cutoff-tie files) — I/O ∝ k, not corpus.
    def sorted_topk25(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.sorted_index import build_sorted_view, sorted_topk
        docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
        key = os.path.realpath(sf_dir) + "#sorted-nchars"
        tag = hashlib.sha256(key.encode()).hexdigest()[:12]
        d = os.path.join("/tmp", "sparklucene-sorted",
                         f"{os.path.basename(os.path.realpath(sf_dir))}-{tag}")
        if not os.path.exists(os.path.join(d, "manifest.json")):
            build_sorted_view(docs, d, "n_chars", ascending=True,
                              n_partitions=8)
        return sorted_topk(spark, d, 25)
    e["index_sorted_topk"] = (sorted_topk25, """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars ASC, doc_id ASC LIMIT 25""")

    # early termination UNDER A FILTER: the sorted prefix grows
    # adaptively until it holds k predicate survivors (Lucene's
    # sort-matching collection in filter context).
    def sorted_topk_f(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.sorted_index import (build_sorted_view,
                                              sorted_topk_filtered)
        docs = _t(spark, sf_dir, "documents") \
            .select("doc_id", "n_chars", "lang")
        key = os.path.realpath(sf_dir) + "#sorted-nchars-lang"
        tag = hashlib.sha256(key.encode()).hexdigest()[:12]
        d = os.path.join("/tmp", "sparklucene-sorted",
                         f"{os.path.basename(os.path.realpath(sf_dir))}-{tag}")
        if not os.path.exists(os.path.join(d, "manifest.json")):
            build_sorted_view(docs, d, "n_chars", ascending=True,
                              n_partitions=8)
        return sorted_topk_filtered(spark, d, 20,
                                    F.col("lang") == "en")
    e["index_sorted_topk_filtered"] = (sorted_topk_f, """
SELECT doc_id, n_chars, lang FROM documents
WHERE lang = 'en'
ORDER BY n_chars ASC, doc_id ASC LIMIT 20""")

    return e


def _facet_entries() -> dict[str, tuple[Callable, str | None]]:
    """Facets / aggregations (SURVEY.md §2.7) over the documents table."""
    e: dict[str, tuple[Callable, str | None]] = {}

    def facet_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("lang").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("lang")))
    e["facet_field_lang"] = (facet_lang, """
SELECT lang, count(*)::BIGINT AS cnt FROM documents
GROUP BY lang ORDER BY cnt DESC, lang ASC""")

    def facet_source_top(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("source").agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= 2)
                .orderBy(F.desc("cnt"), F.asc("source")).limit(10))
    e["facet_field_source_topn"] = (facet_source_top, """
SELECT source, count(*)::BIGINT AS cnt FROM documents
GROUP BY source HAVING count(*) >= 2
ORDER BY cnt DESC, source ASC LIMIT 10""")

    def facet_range(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bucket = (F.floor(F.col("n_chars") / F.lit(500)) * 500).cast("long")
        return (docs.groupBy(bucket.alias("bucket_start"))
                .agg(F.count("*").alias("cnt"))
                .orderBy("bucket_start"))
    e["facet_range_nchars"] = (facet_range, """
SELECT (floor(n_chars / 500) * 500)::BIGINT AS bucket_start,
       count(*)::BIGINT AS cnt
FROM documents GROUP BY 1 ORDER BY bucket_start""")

    def facet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.agg(
            F.sum(F.when(F.col("n_chars") > 1000, 1).otherwise(0)).cast("long").alias("long_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("en_docs"),
            F.count("*").alias("all_docs"))
    e["facet_query_counts"] = (facet_query, """
SELECT sum(CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END)::BIGINT AS long_docs,
       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en_docs,
       count(*)::BIGINT AS all_docs
FROM documents""")

    # -- stats facet percentiles (round 4; Solr StatsComponent
    # percentiles — u8:solr/core/.../handler/component/StatsField.java).
    # Solr computes approximate t-digest percentiles; this engine pins
    # EXACT interpolated percentiles (Spark `percentile` == DuckDB
    # `quantile_cont`, verified bit-identical; float32-rounded output
    # for lerp-ulp robustness across inputs).
    def facet_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = _t(spark, sf_dir, "events")
        return (ev.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.percentile("value", 0.5).cast("float")
                     .cast("double").alias("p50"),
                     F.percentile("value", 0.95).cast("float")
                     .cast("double").alias("p95"))
                .orderBy("event_type"))
    e["facet_stats_percentiles"] = (facet_pct, """
SELECT event_type, count(*)::BIGINT AS n,
       CAST(CAST(quantile_cont(value, 0.5) AS REAL) AS DOUBLE) AS p50,
       CAST(CAST(quantile_cont(value, 0.95) AS REAL) AS DOUBLE) AS p95
FROM events GROUP BY event_type ORDER BY event_type""")

    # -- percentile SKETCH at scale (round 5; Solr PercentileAgg is a
    # mergeable t-digest — u8:solr/core/.../search/facet/PercentileAgg
    # .java). Sketch innards are engine-specific (like hll), so the
    # hash-checkable surface is the deterministic-sample variant:
    # exact interpolated percentile over an md5-prefix sample whose
    # membership is a pure per-row function of md5(salt || doc_id) —
    # DuckDB selects the SAME rows, so values match bit-for-bit while
    # the computation stays sublinear (fraction*n rows per group).
    # The production path (method="native" -> percentile_approx,
    # Spark's mergeable GK sketch) is exercised by tests/test_facets.py.
    def facet_pct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.facets import percentile_sketch
        return percentile_sketch(_t(spark, sf_dir, "documents"),
                                 "n_chars", by="lang", probs=(0.5, 0.9),
                                 method="sampled", fraction=0.25)
    e["percentile_sketch_sampled"] = (facet_pct_sketch, """
WITH s AS (
  SELECT lang, n_chars FROM documents
  WHERE substring(md5('pctl-v1' || doc_id::VARCHAR), 1, 8) < '40000000')
SELECT lang, quantile_cont(n_chars, 0.5) AS q50_est,
       quantile_cont(n_chars, 0.9) AS q90_est,
       count(*)::BIGINT AS sample_n
FROM s GROUP BY lang ORDER BY lang""")

    # -- multi-select faceting via tagged filter exclusion (round 4;
    # Solr {!tag=}/{!ex=} — u8:solr/core/.../request/SimpleFacets.java):
    # docs matching 'merge' with fq={!tag=L}lang IN (en,fr) and
    # fq={!tag=S}source='src0'; the lang facet excludes L (its own
    # filter lifted, source filter kept) and the source facet excludes S.
    def facet_multiselect(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.facets import multiselect_facets
        idx = index_for(spark, sf_dir)
        hits = matches(idx, Term("merge"), mode="f64").select("doc_id")
        docs = _t(spark, sf_dir, "documents")
        base = hits.join(docs, "doc_id")
        return multiselect_facets(
            base,
            filters={"L": F.col("lang").isin("en", "fr"),
                     "S": F.col("source") == "src0"},
            facets={"lang": {"L"}, "source": {"S"}})
    e["facet_multiselect_tagged"] = (facet_multiselect, f"""WITH {corpus_ctes()},
base AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')),
lang_f AS (
  SELECT 'lang' AS facet_field, lang AS value, count(*)::BIGINT AS cnt
  FROM base WHERE source = 'src0' GROUP BY lang),
source_f AS (
  SELECT 'source' AS facet_field, source AS value, count(*)::BIGINT AS cnt
  FROM base WHERE lang IN ('en', 'fr') GROUP BY source)
SELECT * FROM (SELECT * FROM lang_f UNION ALL SELECT * FROM source_f)
ORDER BY facet_field, cnt DESC, value ASC""")

    def facet_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= 3)
                .orderBy("lang", "source"))
    e["facet_pivot_lang_source"] = (facet_pivot, """
SELECT lang, source, count(*)::BIGINT AS cnt FROM documents
GROUP BY lang, source HAVING count(*) >= 3 ORDER BY lang, source""")

    # -- JSON Facet API nested subfacets (round 4; Solr JSON Facet —
    # u8:solr/solrj/.../json/TermsFacetMap.java + docs/json-facet-api):
    # top-3 lang buckets by count, each with an avg(n_chars) metric and a
    # nested top-2 source subfacet. One flat row per (lang, source)
    # bucket pair. Both rank passes are windowed topN — no collect, no
    # cross join; the lang bucket table (<= 3 rows) broadcasts into the
    # subfacet join.
    def json_facet_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        langs = (docs.groupBy("lang")
                 .agg(F.count("*").alias("lang_cnt"),
                      F.sum("n_chars").cast("long").alias("sum_chars"))
                 .withColumn("avg_chars",
                             F.col("sum_chars") / F.col("lang_cnt").cast("double"))
                 .withColumn("rk", F.row_number().over(
                     Window.orderBy(F.desc("lang_cnt"), F.asc("lang"))))
                 .filter(F.col("rk") <= 3).drop("rk", "sum_chars"))
        srcs = (docs.join(F.broadcast(langs.select("lang")), "lang")
                .groupBy("lang", "source")
                .agg(F.count("*").alias("src_cnt"))
                .withColumn("rk", F.row_number().over(
                    Window.partitionBy("lang")
                    .orderBy(F.desc("src_cnt"), F.asc("source"))))
                .filter(F.col("rk") <= 2).drop("rk"))
        return (srcs.join(F.broadcast(langs), "lang")
                .select("lang", "lang_cnt", "avg_chars", "source", "src_cnt")
                .orderBy(F.desc("lang_cnt"), F.asc("lang"),
                         F.desc("src_cnt"), F.asc("source")))
    e["json_facet_nested_terms"] = (json_facet_nested, """
WITH langs AS (
  SELECT lang, count(*)::BIGINT AS lang_cnt,
         sum(n_chars)::BIGINT / CAST(count(*) AS DOUBLE) AS avg_chars
  FROM documents GROUP BY lang
  ORDER BY lang_cnt DESC, lang ASC LIMIT 3),
srcs AS (
  SELECT d.lang, d.source, count(*)::BIGINT AS src_cnt
  FROM documents d JOIN langs USING (lang)
  GROUP BY d.lang, d.source
  QUALIFY row_number() OVER (PARTITION BY d.lang
                             ORDER BY count(*) DESC, d.source ASC) <= 2)
SELECT s.lang, l.lang_cnt, l.avg_chars, s.source, s.src_cnt
FROM srcs s JOIN langs l USING (lang)
ORDER BY l.lang_cnt DESC, s.lang ASC, s.src_cnt DESC, s.source ASC""")

    # facet.interval (arbitrary [lo,hi) intervals incl. the open tail) +
    # facet.prefix/offset bucket pagination + facet.missing, the
    # remaining Solr term/range facet options. Missing-bucket fixture: no
    # column in the synthetic table is nullable, so a pinned derived rule
    # (source of every n_chars % 7 == 0 doc treated as absent) creates
    # the missing bucket identically on both sides.
    def facet_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        iv = (F.when(F.col("n_chars") < 300, "[0,300)")
              .when(F.col("n_chars") < 1200, "[300,1200)")
              .otherwise("[1200,*)"))
        return (docs.groupBy(iv.alias("interval"))
                .agg(F.count("*").alias("cnt")).orderBy("interval"))
    e["facet_interval_nchars"] = (facet_interval, """
SELECT CASE WHEN n_chars < 300 THEN '[0,300)'
            WHEN n_chars < 1200 THEN '[300,1200)'
            ELSE '[1200,*)' END AS interval,
       count(*)::BIGINT AS cnt
FROM documents GROUP BY 1 ORDER BY interval""")

    # prefix 'src1' matches 11 fixture sources (src1, src10..src19) so
    # the offset window (rk 2..4) actually observes data — round 4's
    # 'w' prefix matched nothing and the driver compared 0 rows to
    # 0 rows (a vacuous pass; the round-4 verdict flagged it).
    def facet_prefix_page(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from pyspark.sql import Window
        return (docs.filter(F.col("source").startswith("src1"))
                .groupBy("source").agg(F.count("*").alias("cnt"))
                .withColumn("rk", F.row_number().over(
                    Window.orderBy(F.desc("cnt"), F.asc("source"))))
                .filter((F.col("rk") > 1) & (F.col("rk") <= 4))
                .drop("rk"))
    e["facet_prefix_offset_page"] = (facet_prefix_page, """
SELECT source, cnt FROM (
  SELECT source, count(*)::BIGINT AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, source ASC) AS rk
  FROM documents WHERE source LIKE 'src1%' GROUP BY source)
WHERE rk > 1 AND rk <= 4""")

    # -- JSON facet DOMAIN CHANGE: blockChildren (round 4; u8:solr/core/
    # .../search/facet/FacetRequest.java domain blockChildren +
    # BlockJoin domain docs): the query matches PARENTS (source blocks
    # whose any child matches), the facet domain switches to ALL their
    # children, then facets a child field — the nested-document facet
    # pattern. Domain switch = one equi-join on the block key; the
    # matching-parent side is distinct-block-sized.
    def facet_block_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        hits = matches(idx, Term("vector"), mode="f64").select("doc_id")
        parents = (hits.join(docs.select("doc_id", "source"), "doc_id")
                   .select("source").distinct())
        children = docs.join(F.broadcast(parents), "source")
        return (children.groupBy("lang").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("lang")))
    e["json_facet_block_domain"] = (facet_block_domain, f"""
WITH {corpus_ctes()},
parents AS (
  SELECT DISTINCT d.source FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'vector'))
SELECT c.lang, count(*)::BIGINT AS cnt
FROM documents c JOIN parents p ON c.source = p.source
GROUP BY c.lang ORDER BY cnt DESC, c.lang ASC""")

    # -- uniqueBlock aggregation (round 4; u8:solr/core/.../search/
    # facet/UniqueBlockAgg.java): inside a child-domain facet, count
    # PARENT BLOCKS once instead of child docs — "how many repos have a
    # child of this lang", the dedup companion of blockChildren.
    def facet_unique_block(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        hits = matches(idx, Term("vector"), mode="f64").select("doc_id")
        parents = (hits.join(docs.select("doc_id", "source"), "doc_id")
                   .select("source").distinct())
        children = docs.join(F.broadcast(parents), "source")
        return (children.groupBy("lang")
                .agg(F.countDistinct("source").cast("long")
                     .alias("unique_blocks"))
                .orderBy(F.desc("unique_blocks"), F.asc("lang")))
    e["json_facet_unique_block"] = (facet_unique_block, f"""
WITH {corpus_ctes()},
parents AS (
  SELECT DISTINCT d.source FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'vector'))
SELECT c.lang, count(DISTINCT c.source)::BIGINT AS unique_blocks
FROM documents c JOIN parents p ON c.source = p.source
GROUP BY c.lang ORDER BY unique_blocks DESC, c.lang ASC""")

    # -- facet.field over a MULTIVALUED field (round 4; SimpleFacets on
    # a multiValued="true" schema field: a document contributes one
    # count to EVERY value it holds). The corpus has no array column,
    # so both sides derive the same doc_id-keyed tags array.
    def facet_multivalued(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = F.col("doc_id")
        docs = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.array(F.concat(F.lit("t"), (d % 4).cast("string")),
                    F.concat(F.lit("t"), (d % 7).cast("string")),
                    F.lit("all")).alias("tags"))
        return (docs.select(F.explode("tags").alias("tag"))
                .groupBy("tag").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("tag")))
    e["facet_multivalued_field"] = (facet_multivalued, """
WITH tagged AS (
  SELECT doc_id, unnest(['t' || (doc_id % 4), 't' || (doc_id % 7),
                         'all']) AS tag
  FROM documents)
SELECT tag, count(*)::BIGINT AS cnt
FROM tagged GROUP BY tag ORDER BY cnt DESC, tag ASC""")

    # -- facet.contains (round 4; SimpleFacets facet.contains /
    # facet.contains.ignoreCase): bucket VALUES filtered by substring
    # before the topN cut — the type-ahead filter over facet values.
    def facet_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = _t(spark, sf_dir, "documents")
        return (docs.filter(F.col("source").contains("rc1"))
                .groupBy("source").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("source")).limit(5))
    e["facet_contains_filter"] = (facet_contains, """
SELECT source, count(*)::BIGINT AS cnt FROM documents
WHERE contains(source, 'rc1')
GROUP BY source ORDER BY cnt DESC, source ASC LIMIT 5""")

    def facet_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        src = F.when(F.col("n_chars") % 7 == 0, F.lit(None)).otherwise(
            F.col("source"))
        return (docs.select(src.alias("source"))
                .groupBy("source").agg(F.count("*").alias("cnt"))
                .orderBy(F.asc_nulls_last("source")))
    e["facet_missing_bucket"] = (facet_missing, """
SELECT CASE WHEN n_chars % 7 = 0 THEN NULL ELSE source END AS source,
       count(*)::BIGINT AS cnt
FROM documents GROUP BY 1 ORDER BY source ASC NULLS LAST""")

    def stats_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # stddev from exact integer power sums so both engines compute the
        # identical double expression (Solr StatsComponent fields)
        agg = docs.groupBy("lang").agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sumsq_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"))
        return (agg.withColumn(
            "mean_chars", F.col("sum_chars") / F.col("n").cast("double"))
            .withColumn("var_chars",
                        (F.col("sumsq_chars") - F.col("sum_chars") * F.col("sum_chars")
                         / F.col("n").cast("double")) / (F.col("n") - F.lit(1)).cast("double"))
            .orderBy("lang"))
    e["stats_component_numeric"] = (stats_numeric, """
WITH a AS (
  SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sum_chars,
         sum(n_chars * n_chars)::BIGINT AS sumsq_chars,
         min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars
  FROM documents GROUP BY lang)
SELECT lang, n, sum_chars, sumsq_chars, min_chars, max_chars,
       sum_chars / CAST(n AS DOUBLE) AS mean_chars,
       (sumsq_chars - sum_chars * sum_chars / CAST(n AS DOUBLE))
           / CAST(n - 1 AS DOUBLE) AS var_chars
FROM a ORDER BY lang""")

    def unique_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("lang")
                .agg(F.countDistinct("source").alias("uniq_sources"))
                .orderBy("lang"))
    e["unique_agg"] = (unique_agg, """
SELECT lang, count(DISTINCT source)::BIGINT AS uniq_sources
FROM documents GROUP BY lang ORDER BY lang""")

    def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # exact percentile with linear interpolation — identical to
        # DuckDB quantile_cont (t-digest approx is engine-specific, so
        # the exact variant is the oracle-checkable one)
        return docs.groupBy("lang").agg(
            F.expr("percentile(n_chars, 0.25)").alias("q25"),
            F.expr("percentile(n_chars, 0.5)").alias("q50"),
            F.expr("percentile(n_chars, 0.9)").alias("q90")).orderBy("lang")
    e["percentile_agg"] = (percentiles, """
SELECT lang, quantile_cont(n_chars, 0.25) AS q25,
       quantile_cont(n_chars, 0.5) AS q50,
       quantile_cont(n_chars, 0.9) AS q90
FROM documents GROUP BY lang ORDER BY lang""")

    def rollup_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.rollup("lang", "source")
                .agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= 5))
    e["facet_rollup_hierarchy"] = (rollup_facet, """
SELECT lang, source, count(*)::BIGINT AS cnt
FROM documents GROUP BY ROLLUP(lang, source) HAVING count(*) >= 5""")

    def hll(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Solr's hll facet agg -> Spark's HLL++ sketch. Approx sketches
        # are engine-specific by construction, so this is a rows-only
        # check; the exact twin is unique_agg above.
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("lang")
                .agg(F.approx_count_distinct("source").alias("approx_sources"))
                .orderBy("lang"))
    e["hll_approx_distinct"] = (hll, None)

    def events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                           "event_type")
                .agg(F.count("*").alias("n"),
                     _dec_sum("value").alias("sum_value"))
                .orderBy("hour", "event_type"))
    e["events_time_window_agg"] = (events_window, """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")

    # -- Multi-select faceting via tagged-filter exclusion (round 4;
    # u8:solr/core/.../search/facet/FacetRequest.java domain
    # excludeTags / u8:solr/core/.../request/SimpleFacets.java `{!ex=}`):
    # the lang facet is computed over the query domain with the TAGGED
    # lang filter excluded (every other filter still applies) — the UI
    # pattern where selecting a facet value must not collapse that
    # facet's own counts. Domain = docs matching Term('merge') AND
    # n_chars >= 300; the lang='en' selection is tagged and excluded.
    def facet_multiselect(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        base = matches(idx, Term("merge"), mode="f64").select("doc_id")
        fq_len = docs.filter(F.col("n_chars") >= 300).select("doc_id")
        # lang facet domain: q + untagged filters only (lang fq excluded)
        domain = base.join(fq_len, "doc_id", "left_semi")
        return (domain.join(docs.select("doc_id", "lang"), "doc_id")
                .groupBy("lang").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("lang")))
    e["facet_multiselect_exclude_tag"] = (facet_multiselect, f"""
WITH {corpus_ctes()}
SELECT d.lang, count(*)::BIGINT AS cnt
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
  AND d.n_chars >= 300
GROUP BY d.lang ORDER BY cnt DESC, d.lang ASC""")

    # -- facet.range over a DATE field with gap arithmetic, hardend and
    # other=all buckets (round 4; u8:solr/core/.../request/
    # SimpleFacets.java getFacetRangeCounts + RangeEndpointCalculator):
    # 6-day gaps from 2024-01-03 to 2024-01-24 — NOT a gap multiple, so
    # hardend=false keeps the 4th bucket a full gap wide and the range's
    # effective end is 2024-01-27; `before`/`between`/`after` count
    # against that boundary. Every bucket is emitted (mincount=0 spine).
    _DR_START, _DR_END, _DR_GAP = "2024-01-03 00:00:00", \
        "2024-01-24 00:00:00", 6

    def facet_range_date(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.facets import range_facet_date
        ev = _t(spark, sf_dir, "events")
        return range_facet_date(ev, "ts", _DR_START, _DR_END, _DR_GAP,
                                hardend=False)

    from sparklucene.facets import date_range_buckets
    _dr_spine, _dr_s, _dr_gap_s, _dr_ae = date_range_buckets(
        _DR_START, _DR_END, _DR_GAP, hardend=False)
    _dr_vals = ", ".join(f"({i}, '{lbl}')" for i, lbl in _dr_spine)
    e["facet_range_date_events"] = (facet_range_date, f"""
WITH ep AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
counts AS (
  SELECT CAST(floor((e - {_dr_s}) / {_dr_gap_s}) AS BIGINT) AS i,
         count(*)::BIGINT AS cnt
  FROM ep WHERE e >= {_dr_s} AND e < {_dr_ae} GROUP BY 1),
spine(i, bucket) AS (VALUES {_dr_vals}),
buckets AS (
  SELECT s.bucket, coalesce(c.cnt, 0)::BIGINT AS cnt
  FROM spine s LEFT JOIN counts c ON s.i = c.i),
o AS (
  SELECT sum(CASE WHEN e < {_dr_s} THEN 1 ELSE 0 END)::BIGINT AS c_before,
         sum(CASE WHEN e >= {_dr_s} AND e < {_dr_ae} THEN 1 ELSE 0 END)::BIGINT AS c_between,
         sum(CASE WHEN e >= {_dr_ae} THEN 1 ELSE 0 END)::BIGINT AS c_after
  FROM ep)
SELECT bucket, cnt FROM buckets
UNION ALL SELECT 'before', c_before FROM o
UNION ALL SELECT 'between', c_between FROM o
UNION ALL SELECT 'after', c_after FROM o
ORDER BY bucket""")

    # -- grouping: group.ngroups (round 4; u8:solr/core/.../search/
    # grouping/.../TermGroupFacetCollector.java + CommandHandler
    # totalGroupCount): the matching-doc count AND the number of
    # distinct groups among matches, one row. The distinct-group count
    # is a partial-aggregated two-level groupBy — no global sort.
    def grp_ngroups(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        hits = matches(idx, Or((Term("merge"), Term("join"))),
                       mode="f64").select("doc_id")
        return (hits.join(docs.select("doc_id", "source"), "doc_id")
                .agg(F.count("*").alias("matches"),
                     F.countDistinct("source").cast("long")
                     .alias("ngroups")))
    e["grouping_ngroups_matches"] = (grp_ngroups, f"""WITH {corpus_ctes()}
SELECT count(*)::BIGINT AS matches,
       count(DISTINCT d.source)::BIGINT AS ngroups
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf
                   WHERE term IN ('merge', 'join'))""")

    # -- group.facet=true (round 4; same TermGroupFacetCollector): facet
    # counts where each GROUP (source) counts once per facet value, not
    # each document — grouped-faceting for deduplicated UIs.
    def grp_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        hits = matches(idx, Or((Term("merge"), Term("join"))),
                       mode="f64").select("doc_id")
        return (hits.join(docs.select("doc_id", "lang", "source"),
                          "doc_id")
                .groupBy("lang")
                .agg(F.countDistinct("source").cast("long")
                     .alias("group_cnt"),
                     F.count("*").alias("doc_cnt"))
                .orderBy("lang"))
    e["grouping_group_facet_lang"] = (grp_facet, f"""WITH {corpus_ctes()}
SELECT d.lang, count(DISTINCT d.source)::BIGINT AS group_cnt,
       count(*)::BIGINT AS doc_cnt
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf
                   WHERE term IN ('merge', 'join'))
GROUP BY d.lang ORDER BY d.lang""")

    # -- JSON Facet API: buckets sorted by a SUB-STATISTIC rather than
    # count, plus numBuckets (round 4; u8:solr/core/.../search/facet/
    # FacetFieldProcessor.java sort:"avg_chars desc" + numBuckets:true).
    # Division pinned as sum::long / count::double (one IEEE f64 op) on
    # both sides; ties broken by bucket value.
    def json_facet_stat_sorted(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
        docs = _t(spark, sf_dir, "documents")
        b = (docs.groupBy("source")
             .agg(F.count("*").alias("cnt"),
                  F.sum("n_chars").cast("long").alias("sc")))
        nb = b.agg(F.count("*").cast("long").alias("num_buckets"))
        return (b.withColumn("avg_chars",
                             F.col("sc") / F.col("cnt").cast("double"))
                .orderBy(F.desc("avg_chars"), F.asc("source")).limit(5)
                .crossJoin(F.broadcast(nb))
                .select("source", "cnt", "avg_chars", "num_buckets")
                .orderBy(F.desc("avg_chars"), F.asc("source")))
    e["json_facet_stat_sorted"] = (json_facet_stat_sorted, """
WITH b AS (
  SELECT source, count(*)::BIGINT AS cnt,
         sum(n_chars)::BIGINT / CAST(count(*) AS DOUBLE) AS avg_chars
  FROM documents GROUP BY source),
nb AS (SELECT count(*)::BIGINT AS num_buckets FROM b)
SELECT source, cnt, avg_chars, num_buckets FROM b CROSS JOIN nb
ORDER BY avg_chars DESC, source ASC LIMIT 5""")

    return e


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col: str) -> F.Column:
    """Exact currency sum: DECIMAL(18,2) accumulate, DOUBLE result —
    identical on both engines regardless of summation order."""
    from pyspark.sql.functions import col as c
    return F.sum(c(col).cast("decimal(18,2)")).cast("double")


def _stream_entries() -> dict[str, tuple[Callable, str | None]]:
    """Solr streaming-expression algebra (SURVEY.md §2.9) via
    sparklucene.streams — select/top/unique/merge/joins/rollup/stats/fetch
    over the TPC-H-ish driver tables."""
    from sparklucene import streams as st
    e: dict[str, tuple[Callable, str | None]] = {}

    def sel(spark, sf):
        orders = _t(spark, sf, "orders")
        return st.select_stream(orders, {
            "okey": "o_orderkey",
            "discounted": F.col("o_totalprice") * F.lit(0.9).cast("double"),
            "pri": F.upper(F.col("o_orderpriority"))})
    e["stream_select_eval"] = (sel, """
SELECT o_orderkey AS okey,
       o_totalprice * CAST(0.9 AS DOUBLE) AS discounted,
       upper(o_orderpriority) AS pri
FROM orders""")

    def top(spark, sf):
        return st.rank_stream(_t(spark, sf, "orders"), 15,
                              F.desc("o_totalprice"), F.asc("o_orderkey")
                              ).select("o_orderkey", "o_totalprice")
    e["stream_top_k"] = (top, """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""")

    def uniq(spark, sf):
        return st.unique_stream(
            _t(spark, sf, "orders").select("o_custkey"), ["o_custkey"])
    e["stream_unique"] = (uniq, "SELECT DISTINCT o_custkey FROM orders")

    # having() — boolean evaluator over a rollup (round 4;
    # u8:solr/solrj/.../io/stream/HavingStream.java)
    def having(spark, sf):
        roll = st.rollup_stream(
            _t(spark, sf, "orders"), ["o_custkey"],
            [F.count("*").alias("n"), _dec_sum("o_totalprice").alias("tot")])
        return (st.having_stream(roll, (F.col("n") >= 3)
                                 & (F.col("tot") > 50000.0))
                .orderBy("o_custkey"))
    e["stream_having"] = (having, """
SELECT o_custkey, count(*)::BIGINT AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
FROM orders GROUP BY o_custkey
HAVING count(*) >= 3 AND CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE) > 50000.0
ORDER BY o_custkey""")

    # cartesianProduct() — multi-valued field fan-out (round 4;
    # u8:solr/solrj/.../io/stream/CartesianProductStream.java): one
    # tuple per element, other fields duplicated. The multi-valued
    # field is the analyzed token array of three fixed docs.
    def cartesian(spark, sf):
        from sparklucene.analysis import make_tokenize_udf
        tok = make_tokenize_udf()
        docs = (_t(spark, sf, "documents")
                .filter(F.col("doc_id") <= 2)
                .select("doc_id", tok(F.col("text")).alias("toks")))
        return (st.cartesian_product(docs, "toks", "token")
                .select("doc_id", "token")
                .orderBy("doc_id", "token"))
    e["stream_cartesian_product"] = (cartesian, f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS token
  FROM documents WHERE doc_id <= 2)
SELECT doc_id, token FROM tok WHERE token NOT IN {stoplist_sql()}
ORDER BY doc_id, token""")

    # {!graph} GraphQuery fixpoint traversal (round 4; u8:solr/core/...
    # /search/join/GraphQuery.java): descendants of event 1 in the
    # deterministic parent forest parent_id = event_id div 3, traversed
    # until NO new docs (maxDepth=-1). The oracle is a genuine recursive
    # CTE (DuckDB WITH RECURSIVE) rather than unrolled levels — the
    # fixpoint is data-derived on both sides.
    def graphq(spark, sf):
        ev = (_t(spark, sf, "events")
              .select("event_id",
                      F.expr("event_id div 3").alias("parent_id")))
        return st.graph_query(ev, F.col("event_id") == 1,
                              "event_id", "event_id", "parent_id",
                              max_depth=-1)
    e["graph_query_fixpoint"] = (graphq, """
WITH RECURSIVE doc AS (
  SELECT event_id, event_id // 3 AS parent_id FROM events),
g AS (
  SELECT event_id AS id, 0::BIGINT AS level FROM doc WHERE event_id = 1
  UNION
  SELECT d.event_id AS id, g.level + 1 AS level
  FROM doc d JOIN g ON d.parent_id = g.id)
SELECT id, min(level)::BIGINT AS level FROM g
GROUP BY id ORDER BY level, id""")

    # nodes()/GatherNodesStream (round 4; u8:solr/solrj/.../io/graph/
    # GatherNodesStream.java): 2-round BFS over the typed customer ->
    # order -> part edge graph from 4 root customers. The oracle unrolls
    # the same walk as fixed-depth anti-joined CTEs.
    def gather(spark, sf):
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = (orders.select(
                    F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
                    F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"))
                 .unionByName(li.select(
                    F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
                    F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"))))
        roots = (_t(spark, sf, "customer")
                 .filter(F.col("c_custkey") <= 4)
                 .select(F.concat(F.lit("c:"),
                                  F.col("c_custkey")).alias("node")))
        return st.gather_nodes(edges, roots, rounds=2)
    e["graph_gather_nodes_2hop"] = (gather, """
WITH edges AS (
  SELECT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst FROM orders
  UNION ALL
  SELECT 'o:' || l_orderkey, 'p:' || l_partkey FROM lineitem),
l0 AS (SELECT DISTINCT 'c:' || c_custkey AS node FROM customer
       WHERE c_custkey <= 4),
l1 AS (SELECT DISTINCT e.dst AS node FROM edges e
       JOIN l0 ON e.src = l0.node
       WHERE e.dst NOT IN (SELECT node FROM l0)),
l2 AS (SELECT DISTINCT e.dst AS node FROM edges e
       JOIN l1 ON e.src = l1.node
       WHERE e.dst NOT IN (SELECT node FROM l0)
         AND e.dst NOT IN (SELECT node FROM l1))
SELECT node, 0::BIGINT AS level FROM l0
UNION ALL SELECT node, 1::BIGINT FROM l1
UNION ALL SELECT node, 2::BIGINT FROM l2
ORDER BY level, node""")

    def merge_sorted(spark, sf):
        orders = _t(spark, sf, "orders")
        a = orders.filter(F.col("o_orderstatus") == "F")
        b = orders.filter(F.col("o_orderstatus") == "O")
        return st.merge_stream(a, b, F.asc("o_orderkey")) \
            .select("o_orderkey", "o_orderstatus")
    e["stream_merge_sorted"] = (merge_sorted, """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderstatus IN ('F', 'O') ORDER BY o_orderkey""")

    def hjoin(spark, sf):
        return st.hash_join(
            _t(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey"),
            _t(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment"),
            on=["c_custkey"]).select("o_orderkey", "c_custkey", "c_name",
                                     "c_mktsegment")
    e["stream_hash_join"] = (hjoin, """
SELECT o_orderkey, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey""")

    def outer_join(spark, sf):
        per_cust = (_t(spark, sf, "orders").groupBy("o_custkey")
                    .agg(F.count("*").alias("n_orders"))
                    .withColumnRenamed("o_custkey", "c_custkey"))
        cust = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
        out = st.hash_join(cust, per_cust, on=["c_custkey"], how="left")
        return out.select("c_custkey", "c_mktsegment",
                          F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    e["stream_outer_hash_join"] = (outer_join, """
SELECT c_custkey, c_mktsegment, coalesce(n.n_orders, 0)::BIGINT AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*)::BIGINT AS n_orders
           FROM orders GROUP BY o_custkey) n
  ON c_custkey = n.o_custkey""")

    def smjoin(spark, sf):
        li = _t(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        orders = _t(spark, sf, "orders")
        joined = st.inner_join(li, orders, on=["o_orderkey"])
        return st.rollup_stream(
            joined, ["o_orderstatus"],
            [F.count("*").alias("n_lines"), _dec_sum("l_quantity").alias("sum_qty")]
        ).orderBy("o_orderstatus")
    e["stream_sortmerge_join_rollup"] = (smjoin, """
SELECT o_orderstatus, count(*)::BIGINT AS n_lines,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus""")

    def isect(spark, sf):
        orders = _t(spark, sf, "orders")
        f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        return st.intersect_stream(f.distinct(), o, ["o_custkey"])
    e["stream_intersect"] = (isect, """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")

    # complement vs F-status orders only: every fixture customer has at
    # least one order, so the r1 "customers with no orders" slice
    # compared 0 rows to 0 rows (a vacuous pass, caught by
    # tests/test_oracle_nonvacuous.py); customers with no FULFILLED
    # order exist at every sf.
    def compl(spark, sf):
        cust = _t(spark, sf, "customer").select("c_custkey")
        orders = (_t(spark, sf, "orders")
                  .filter(F.col("o_orderstatus") == "F")
                  .select(F.col("o_custkey").alias("c_custkey")))
        return st.complement_stream(cust, orders, ["c_custkey"])
    e["stream_complement"] = (compl, """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'F')""")

    def rollup(spark, sf):
        li = _t(spark, sf, "lineitem")
        return st.rollup_stream(
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02")),
            ["l_returnflag", "l_linestatus"],
            [F.count("*").alias("count_order"),
             _dec_sum("l_quantity").alias("sum_qty"),
             _dec_sum("l_extendedprice").alias("sum_base_price"),
             F.min("l_quantity").alias("min_qty"),
             F.max("l_extendedprice").alias("max_price")],
        ).orderBy("l_returnflag", "l_linestatus")
    e["stream_rollup_metrics"] = (rollup, """
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS count_order,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       min(l_quantity) AS min_qty, max(l_extendedprice) AS max_price
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")

    def gstats(spark, sf):
        li = _t(spark, sf, "lineitem")
        return st.stats_stream(li, [
            F.count("*").alias("n"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            _dec_sum("l_extendedprice").alias("sum_price"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship")])
    e["stream_stats"] = (gstats, """
SELECT count(*)::BIGINT AS n, count(DISTINCT l_orderkey)::BIGINT AS n_orders,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
FROM lineitem""")

    def fetch(spark, sf):
        nation = _t(spark, sf, "nation")
        region = _t(spark, sf, "region").withColumnRenamed("r_regionkey",
                                                           "n_regionkey")
        return st.fetch_stream(nation, region, ["n_regionkey"], ["r_name"]) \
            .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
    e["stream_fetch_enrich"] = (fetch, """
SELECT n_nationkey, n_name, r_name
FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey""")

    def reduce_(spark, sf):
        import pandas as pd

        def per_type(pdf: pd.DataFrame) -> pd.DataFrame:
            # cents-integer accumulation == DECIMAL(18,2) sum (exact,
            # order-proof) — the oracle-parity rule for money sums
            cents = (pdf["value"] * 100).round().astype("int64").sum()
            return pd.DataFrame({
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "n_users": [pdf["user_id"].nunique()],
                "first_event": [pdf["event_id"].min()],
                "last_event": [pdf["event_id"].max()],
                "sum_value": [cents / 100.0]})
        return st.reduce_stream(
            _t(spark, sf, "events"), ["event_type"], per_type,
            "event_type string, n long, n_users long, first_event long, "
            "last_event long, sum_value double").orderBy("event_type")
    e["stream_reduce"] = (reduce_, """
SELECT event_type, count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users,
       min(event_id) AS first_event, max(event_id) AS last_event,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type""")

    # -- SignificantTermsStream (round 3; u8:solr/solrj/.../io/stream/
    # SignificantTermsStream.java): terms over-represented in the result
    # set of a query vs the corpus. The oracle re-derives foreground
    # doc-frequencies from raw tokens and applies the same single
    # integer-product relative-risk division.
    def sig_terms(spark, sf):
        from sparklucene.streams import significant_terms
        idx = index_for(spark, sf)
        return significant_terms(idx, load_corpus(spark, sf),
                                 Term("merge"), k=10, min_doc_freq=2)
    e["stream_significant_terms"] = (sig_terms, f"""WITH {corpus_ctes()},
fg AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge'),
fgn AS (SELECT count(*)::BIGINT AS fg_n FROM fg),
fgdf AS (
  SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
  FROM tf t JOIN fg USING (doc_id) GROUP BY t.term
  HAVING count(DISTINCT t.doc_id) >= 2)
SELECT f.term, f.fg_df, ts.df AS bg_df,
       CAST(f.fg_df * g.doc_count AS DOUBLE)
       / CAST(n.fg_n * ts.df AS DOUBLE) AS score
FROM fgdf f JOIN tstats ts ON f.term = ts.term
CROSS JOIN gstats g CROSS JOIN fgn n
ORDER BY score DESC, f.term ASC LIMIT 10""")

    # -- KnnStream (round 3): TF-IDF-cosine k-nearest to a seed doc ------
    def knn_stream(spark, sf):
        from sparklucene.mlt import knn_text
        idx = index_for(spark, sf)
        return knn_text(idx, load_corpus(spark, sf), doc_id=5, k=10)
    e["stream_knn_text"] = (knn_stream, f"""WITH {corpus_ctes()},
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE)
         * ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5)) AS w
  FROM tf JOIN tstats ts ON tf.term = ts.term CROSS JOIN gstats g),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
seedw AS (SELECT term, w AS qw FROM w WHERE doc_id = 5),
seedn AS (SELECT nrm AS qn FROM norms WHERE doc_id = 5),
dots AS (
  SELECT w.doc_id, sum(w.w * s.qw) AS dot
  FROM w JOIN seedw s USING (term) GROUP BY w.doc_id)
SELECT d.doc_id,
       CAST(CAST(d.dot / (n.nrm * sn.qn) AS REAL) AS DOUBLE) AS cosine
FROM dots d JOIN norms n USING (doc_id) CROSS JOIN seedn sn
WHERE d.doc_id != 5
ORDER BY cosine DESC, d.doc_id ASC LIMIT 10""")

    # -- shortestPath() / ShortestPathStream (round 4; u8:solr/solrj/...
    # /io/graph/ShortestPathStream.java): level-synchronous BFS from a
    # customer node to a part node over the directed c->o->p edge graph,
    # returning ALL tied shortest paths. The oracle unrolls the same BFS
    # as fixed-depth anti-joined CTEs and keeps only the minimum level
    # that reaches the target (at sf0.01 the pinned endpoints have three
    # tied 2-hop paths; at smaller SFs the target may be absent, in which
    # case both sides are empty).
    def spath(spark, sf):
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        edges = (orders.select(
                    F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
                    F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"))
                 .unionByName(li.select(
                    F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
                    F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"))))
        return st.shortest_path(edges, "c:102", "p:1784", max_depth=3)
    e["graph_shortest_path"] = (spath, """
WITH edges AS (
  SELECT DISTINCT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst
  FROM orders
  UNION
  SELECT DISTINCT 'o:' || l_orderkey, 'p:' || l_partkey FROM lineitem),
p0 AS (SELECT 'c:102' AS node, 'c:102' AS path),
v0 AS (SELECT node FROM p0),
p1 AS (SELECT e.dst AS node, p0.path || '->' || e.dst AS path
       FROM edges e JOIN p0 ON e.src = p0.node
       WHERE e.dst NOT IN (SELECT node FROM v0)),
v1 AS (SELECT node FROM v0 UNION SELECT node FROM p1),
p2 AS (SELECT e.dst AS node, p1.path || '->' || e.dst AS path
       FROM edges e JOIN p1 ON e.src = p1.node
       WHERE e.dst NOT IN (SELECT node FROM v1)),
v2 AS (SELECT node FROM v1 UNION SELECT node FROM p2),
p3 AS (SELECT e.dst AS node, p2.path || '->' || e.dst AS path
       FROM edges e JOIN p2 ON e.src = p2.node
       WHERE e.dst NOT IN (SELECT node FROM v2)),
hits AS (
  SELECT path, 1::BIGINT AS level FROM p1 WHERE node = 'p:1784'
  UNION ALL SELECT path, 2::BIGINT FROM p2 WHERE node = 'p:1784'
  UNION ALL SELECT path, 3::BIGINT FROM p3 WHERE node = 'p:1784')
SELECT path, level FROM hits
WHERE level = (SELECT min(level) FROM hits)
ORDER BY path""")

    # -- scoreNodes() / ScoreNodesStream (round 4; u8:solr/solrj/.../io/
    # graph/ScoreNodesStream.java): annotate a node-count stream with
    # nodeScore = count * ln(doc_count / df), df resolved from the term
    # dictionary (the reference batches TermsComponent lookups; here the
    # dictionary is a relation so the lookup is a broadcast join). The
    # node stream is the distinct-doc term counts of the docs matching
    # Term('merge') — a gather-style frequency aggregation.
    def snodes(spark, sf):
        idx = index_for(spark, sf)
        corpus = load_corpus(spark, sf)
        from sparklucene.analysis import make_tokenize_udf
        from sparklucene.search import matches
        tok = make_tokenize_udf()
        fg = matches(idx, Term("merge")).select("doc_id")
        nodes = (corpus.join(fg, "doc_id", "left_semi")
                 .select(F.explode(F.array_distinct(tok(F.col("content"))))
                         .alias("node"))
                 .groupBy("node").agg(F.count("*").alias("count")))
        return (st.score_nodes(nodes, idx.termstats(),
                               int(idx.stats["doc_count"]))
                .limit(12))
    e["graph_score_nodes"] = (snodes, f"""WITH {corpus_ctes()},
fg AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge'),
nodes AS (
  SELECT t.term AS node, count(DISTINCT t.doc_id)::BIGINT AS count
  FROM tf t JOIN fg USING (doc_id) GROUP BY t.term)
SELECT n.node, n.count,
       CAST(CAST(CAST(n.count AS DOUBLE)
                 * ln(CAST(g.doc_count AS DOUBLE) / CAST(ts.df AS DOUBLE))
                 AS REAL) AS DOUBLE) AS node_score
FROM nodes n JOIN tstats ts ON n.node = ts.term CROSS JOIN gstats g
ORDER BY node_score DESC, n.node ASC LIMIT 12""")

    # -- timeseries() / TimeSeriesStream (round 4; u8:solr/solrj/.../io/
    # stream/TimeSeriesStream.java): monthly buckets over 2001 (the data
    # ends 2001-08, so the trailing buckets are genuinely gap-filled).
    # The oracle builds the same calendar with generate_series and
    # left-joins the month aggregation.
    def tseries(spark, sf):
        orders = _t(spark, sf, "orders")
        return st.timeseries(
            orders, "o_orderdate", "2001-01-01", "2002-01-01", 1, "MONTH",
            {"n_orders": (F.count("*"), 0),
             "sum_price": (_dec_sum("o_totalprice"), 0.0)})
    e["stream_timeseries_gapfill"] = (tseries, """
WITH cal AS (
  SELECT unnest(generate_series(TIMESTAMP '2001-01-01',
                                TIMESTAMP '2001-12-01',
                                INTERVAL 1 MONTH)) AS bucket_start),
agg AS (
  SELECT date_trunc('month', o_orderdate) AS b, count(*)::BIGINT AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    AND o_orderdate < TIMESTAMP '2002-01-01'
  GROUP BY 1)
SELECT bucket_start, coalesce(a.n_orders, 0)::BIGINT AS n_orders,
       coalesce(a.sum_price, 0.0) AS sum_price
FROM cal LEFT JOIN agg a ON a.b = cal.bucket_start
ORDER BY bucket_start""")

    # -- features() / FeaturesSelectionStream (round 4; u8:solr/solrj/
    # .../io/stream/FeaturesSelectionStream.java + u8:solr/core/.../
    # search/IGainTermsQParserPlugin.java): top terms by information
    # gain for the binary class lang='en'. The oracle mirrors the exact
    # entropy expression tree (0·log2 0 guards, empty-complement guard,
    # float32 rounding for the transcendental result).
    def feats(spark, sf):
        docs = _t(spark, sf, "documents")
        return st.features_selection(docs, F.col("lang") == "en", k=15,
                                     min_df=5)

    def _h(x):
        x1 = f"(1.0 - {x})"
        return (f"-((CASE WHEN {x} <= 0.0 THEN 0.0 "
                f"ELSE {x} * log2({x}) END) + "
                f"(CASE WHEN {x1} <= 0.0 THEN 0.0 "
                f"ELSE {x1} * log2({x1}) END))")

    _n, _p = "CAST(t.n AS DOUBLE)", "CAST(t.p AS DOUBLE)"
    _df, _pdf = "CAST(c.df AS DOUBLE)", "CAST(c.pos_df AS DOUBLE)"
    _ig = (f"{_h(f'({_p} / {_n})')}"
           f" - ({_df} / {_n}) * {_h(f'({_pdf} / {_df})')}"
           f" - (CASE WHEN {_n} - {_df} <= 0.0 THEN 0.0 "
           f"ELSE (({_n} - {_df}) / {_n}) * "
           f"{_h(f'(({_p} - {_pdf}) / ({_n} - {_df}))')} END)")
    e["stream_features_igain"] = (feats, f"""WITH {corpus_ctes()},
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
tot AS (SELECT count(*)::BIGINT AS n, sum(pos)::BIGINT AS p FROM lab),
tcounts AS (
  SELECT tf.term, count(*)::BIGINT AS df, sum(l.pos)::BIGINT AS pos_df
  FROM tf JOIN lab l USING (doc_id)
  GROUP BY tf.term HAVING count(*) >= 5)
SELECT c.term, c.df, c.pos_df,
       CAST(CAST(({_ig}) AS REAL) AS DOUBLE) AS ig
FROM tcounts c CROSS JOIN tot t
ORDER BY ig DESC, c.term ASC LIMIT 15""")

    # -- train() / TextLogitStream (round 4; u8:solr/solrj/.../io/stream/
    # TextLogitStream.java + u8:solr/core/.../search/
    # TextLogisticRegressionQParserPlugin.java): batch logistic
    # regression over binary term features for the class lang='en'.
    # The oracle UNROLLS the three gradient iterations as CTE chains —
    # per-doc residual in f64, f32-rounded gradient addends (exact
    # order-proof sums), identical weight-update expression trees.
    _LT = ["dup", "merge", "scan", "vector"]

    def train(spark, sf):
        docs = _t(spark, sf, "documents")
        return st.train_logit(docs, F.col("lang") == "en", _LT,
                              iterations=3, lr=0.5)

    def _logit_sql(terms: list[str], iterations: int, lr: float) -> str:
        m = len(terms)
        bdefs = ",\n         ".join(
            f"coalesce(max(CASE WHEN f.term = '{t}' THEN 1.0 END), 0.0)"
            f" AS b{j + 1}" for j, t in enumerate(terms))
        parts = [f"""
feat AS (
  SELECT d.doc_id,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         {bdefs}
  FROM documents d LEFT JOIN tf f USING (doc_id)
  GROUP BY d.doc_id, d.lang),
nn AS (SELECT count(*)::DOUBLE AS n FROM feat),
w0 AS (SELECT {', '.join(f'0.0 AS w{j}' for j in range(m + 1))})"""]
        for i in range(1, iterations + 1):
            z = " + ".join([f"w.w0"] + [f"w.w{j + 1} * f.b{j + 1}"
                                        for j in range(m)])
            gsel = [("sum(CAST(CAST(resid AS REAL) AS DOUBLE)) AS g0")]
            gsel += [f"sum(CAST(CAST((resid * b{j + 1}) AS REAL) "
                     f"AS DOUBLE)) AS g{j + 1}" for j in range(m)]
            wsel = ", ".join(
                f"w.w{j} + (({lr} / nn.n) * g.g{j}) AS w{j}"
                for j in range(m + 1))
            parts.append(f"""
r{i} AS (
  SELECT f.*, (f.y - 1.0 / (1.0 + exp(-({z})))) AS resid
  FROM feat f CROSS JOIN w{i - 1} w),
g{i} AS (SELECT {', '.join(gsel)} FROM r{i}),
w{i} AS (SELECT {wsel} FROM w{i - 1} w CROSS JOIN g{i} g CROSS JOIN nn)""")
        names = ["__intercept__"] + terms
        sel = "\nUNION ALL\n".join(
            f"SELECT '{t}' AS feature, "
            f"CAST(CAST(w{iterations} AS REAL) AS DOUBLE) AS weight "
            f"FROM (SELECT w{j} AS w{iterations} FROM w{iterations})"
            for j, t in enumerate(names))
        return ",".join(parts) + "\n" + sel

    e["stream_train_logit"] = (train, f"""WITH {corpus_ctes()},{
        _logit_sql(_LT, 3, 0.5)}""")

    # -- sequence detection: "view then purchase within 24h" (round 4;
    # CEP-shape; streaming twin uses applyInPandasWithState, pinned
    # equal by the streaming==batch test) ------------------------------
    def followups(spark, sf):
        from sparklucene.streaming import detect_followups
        return detect_followups(_t(spark, sf, "events"))
    e["stream_detect_followups"] = (followups, """
WITH ev AS (SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'purchase')),
w AS (SELECT *, last_value(CASE WHEN event_type = 'view' THEN ts END
                           IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_type
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      FROM ev)
SELECT user_id, lv AS view_ts, ts AS purchase_ts
FROM w
WHERE event_type = 'purchase' AND lv IS NOT NULL
  AND lv >= ts - INTERVAL 24 HOUR""")

    # -- sessionize — gap-based session windows (round 4; Spark
    # session_window pattern; oracle = gaps-and-islands SQL with the
    # same inclusive prev+gap boundary) -------------------------------
    def sess(spark, sf):
        ev = _t(spark, sf, "events")
        return st.sessionize(ev, gap="25 minutes", by=("user_id",))
    e["stream_sessionize_users"] = (sess, """
WITH o AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events),
m AS (
  SELECT *, CASE WHEN pts IS NULL
                   OR ts > pts + INTERVAL 25 MINUTE THEN 1 ELSE 0 END AS brk
  FROM o),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 25 MINUTE AS session_end,
       count(*)::BIGINT AS n_events,
       CAST(CAST(sum(value) AS REAL) AS DOUBLE) AS sum_value
FROM g GROUP BY user_id, sid""")

    # -- random() — seeded deterministic sample (round 4;
    # u8:solr/solrj/.../io/stream/RandomStream.java) --------------------
    def rnd(spark, sf):
        docs = _t(spark, sf, "documents").select("doc_id", "lang")
        return st.random_stream(docs, "doc_id", 12, seed="r4")
    e["stream_random_seeded"] = (rnd, """
SELECT doc_id, lang FROM documents
ORDER BY sha256('r4:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
LIMIT 12""")

    # -- knnRegress — k-NN mean regression (round 4;
    # u8:solr/solrj/.../io/eval/KnnRegressionEvaluator.java) -------------
    def knnreg(spark, sf):
        pts = (_t(spark, sf, "embeddings")
               .select("vec_id",
                       F.col("embedding")[0].cast("double").alias("f0"),
                       F.col("embedding")[1].cast("double").alias("f1"),
                       F.col("embedding")[2].cast("double").alias("f2"),
                       F.col("label").cast("double").alias("y")))
        qs = spark.createDataFrame(
            [(0, 0.1, 0.2, 0.3), (1, -0.5, 0.0, 0.25)],
            "qid long, f0 double, f1 double, f2 double")
        return (st.knn_regress(pts, qs, ["f0", "f1", "f2"], "y", k=7,
                               id_col="vec_id")
                .orderBy("qid"))
    e["stream_knn_regress"] = (knnreg, """
WITH q(qid, q0, q1, q2) AS (
  SELECT * FROM (VALUES (0, 0.1, 0.2, 0.3), (1, -0.5, 0.0, 0.25))),
pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS f0,
         CAST(embedding[2] AS DOUBLE) AS f1,
         CAST(embedding[3] AS DOUBLE) AS f2,
         CAST(label AS DOUBLE) AS y
  FROM embeddings),
ranked AS (
  SELECT q.qid, p.vec_id, p.y,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY sqrt((p.f0 - q.q0) * (p.f0 - q.q0)
                         + (p.f1 - q.q1) * (p.f1 - q.q1)
                         + (p.f2 - q.q2) * (p.f2 - q.q2)) ASC,
                    p.vec_id ASC) AS rk
  FROM pts p CROSS JOIN q)
SELECT qid::BIGINT AS qid, avg(y) AS prediction,
       count(*)::BIGINT AS k_used
FROM ranked WHERE rk <= 7 GROUP BY qid ORDER BY qid""")

    return e


def _window_entries() -> dict[str, tuple[Callable, str | None]]:
    """Sort / paging / grouping / collapse (SURVEY.md §2.6)."""
    from pyspark.sql import Window
    e: dict[str, tuple[Callable, str | None]] = {}

    def multisort(spark, sf):
        docs = _t(spark, sf, "documents")
        return (docs.orderBy(F.asc("lang"), F.desc("n_chars"), F.asc("doc_id"))
                .limit(20).select("doc_id", "lang", "n_chars"))
    e["sort_multi_field"] = (multisort, """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 20""")

    # -- CursorMark over a FIELD sort (round 4; u8:solr/solrj/.../params/
    # CursorMarkParams.java — deep paging beyond search_after's
    # (score, doc_id) case): page 2 of the multi-field sort, cursor =
    # page 1's last (lang, n_chars, doc_id) tuple, fetched k-bounded
    # engine-side and re-derived as a scalar CTE oracle-side.
    def cursor_fields(spark, sf):
        from sparklucene.search import cursor_by_fields
        docs = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
        spec = (("lang", "asc"), ("n_chars", "desc"), ("doc_id", "asc"))
        p1 = cursor_by_fields(docs, spec, None, 20).collect()
        last = sorted(p1, key=lambda r: (r["lang"], -r["n_chars"],
                                         r["doc_id"]))[-1]
        return cursor_by_fields(
            docs, spec,
            (last["lang"], last["n_chars"], last["doc_id"]), 20)
    e["cursor_fieldsort_page2"] = (cursor_fields, """
WITH p1 AS (
  SELECT doc_id, lang, n_chars FROM documents
  ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 20),
last_key AS (
  SELECT lang, n_chars, doc_id FROM p1
  ORDER BY lang DESC, n_chars ASC, doc_id DESC LIMIT 1)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d CROSS JOIN last_key l
WHERE d.lang > l.lang
   OR (d.lang = l.lang AND d.n_chars < l.n_chars)
   OR (d.lang = l.lang AND d.n_chars = l.n_chars AND d.doc_id > l.doc_id)
ORDER BY d.lang ASC, d.n_chars DESC, d.doc_id ASC LIMIT 20""")

    # sortMissingLast / sortMissingFirst (round 4; Solr FieldType sort
    # missing-value policy — u8:solr/core/.../schema/FieldType.java):
    # docs without the sort field land AFTER every present value on asc
    # (missing-last) and BEFORE on the desc leg (missing-first). The
    # synthetic table is null-free, so a pinned derived rule (lang of
    # every n_chars % 7 == 0 doc treated as absent — the same fixture
    # rule facet.missing uses) creates the nulls identically on both
    # sides.
    def sort_missing(spark, sf):
        docs = _t(spark, sf, "documents")
        v = F.when(F.col("n_chars") % 7 == 0, None) \
             .otherwise(F.col("lang"))
        return (docs.select("doc_id", v.alias("lang_opt"), "n_chars")
                .orderBy(F.asc_nulls_last("lang_opt"),
                         F.desc_nulls_first("n_chars"), F.asc("doc_id"))
                .limit(25))
    e["sort_missing_last"] = (sort_missing, """
SELECT doc_id,
       CASE WHEN n_chars % 7 = 0 THEN NULL ELSE lang END AS lang_opt,
       n_chars
FROM documents
ORDER BY lang_opt ASC NULLS LAST, n_chars DESC NULLS FIRST, doc_id ASC
LIMIT 25""")

    def page2(spark, sf):
        docs = _t(spark, sf, "documents")
        w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        return (docs.withColumn("rn", F.row_number().over(w).cast("long"))
                .filter((F.col("rn") > 10) & (F.col("rn") <= 20))
                .select("doc_id", "n_chars", "rn"))
    e["paging_page2"] = (page2, """
SELECT doc_id, n_chars, rn FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) WHERE rn > 10 AND rn <= 20""")

    def top2_per_lang(spark, sf):
        docs = _t(spark, sf, "documents")
        w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        return (docs.withColumn("rn", F.row_number().over(w).cast("long"))
                .filter(F.col("rn") <= 2)
                .select("lang", "rn", "doc_id", "n_chars"))
    e["grouping_top2_per_group"] = (top2_per_lang, """
SELECT lang, rn, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) WHERE rn <= 2""")

    def collapse(spark, sf):
        docs = _t(spark, sf, "documents")
        w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        best = (docs.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn"))
        expand = docs.groupBy("source").agg(F.count("*").alias("group_size"))
        return (best.join(F.broadcast(expand), "source")
                .select("source", "doc_id", "n_chars", "group_size"))
    e["collapse_expand_by_source"] = (collapse, """
WITH best AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents),
sizes AS (SELECT source, count(*)::BIGINT AS group_size
          FROM documents GROUP BY source)
SELECT b.source, b.doc_id, b.n_chars, s.group_size
FROM best b JOIN sizes s ON b.source = s.source WHERE b.rn = 1""")

    return e


def _termdict_entries() -> dict[str, tuple[Callable, str | None]]:
    """Multi-term query rewrites (SURVEY.md §2.4): prefix / wildcard /
    regexp / fuzzy expand against the TERM DICTIONARY (termstats — never
    the ~n_ranges-times-larger postings table), rewrite to
    ConstantScore(Or(...)) and run through the ordinary search path
    (MultiTermQuery CONSTANT_SCORE_REWRITE)."""
    import numpy as np
    import pandas as pd

    from sparklucene.codec import decode_doc_ids, decode_tfs
    from sparklucene.query import Fuzzy, Prefix, Regexp, Wildcard
    e: dict[str, tuple[Callable, str | None]] = {}

    def _doc_set(idx: Index, q) -> DataFrame:
        return matches(idx, q).select("doc_id").orderBy("doc_id")

    def prefix(spark, sf):
        return _doc_set(index_for(spark, sf), Prefix("sc"))
    e["prefix_query"] = (prefix, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'sc%' ORDER BY doc_id""")

    def wildcard(spark, sf):
        return _doc_set(index_for(spark, sf), Wildcard("*ow"))
    e["wildcard_query"] = (wildcard, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf WHERE term LIKE '%ow' ORDER BY doc_id""")

    def regexp(spark, sf):
        return _doc_set(index_for(spark, sf), Regexp("f.*t"))
    e["regexp_query"] = (regexp, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf WHERE regexp_matches(term, '^f.*t$')
ORDER BY doc_id""")

    # FuzzyQuery with transpositions=True — Lucene's DEFAULT fuzzy mode
    # (round 4; u8:lucene/core/.../search/FuzzyQuery.java): an adjacent
    # swap counts as ONE edit, so 'sprak'~1 matches 'spark' (plain
    # levenshtein needs 2). Engine pins unrestricted Damerau-Levenshtein
    # (= DuckDB's damerau_levenshtein; identity fuzz-checked in tests).
    def fuzzy_transp(spark, sf):
        return _doc_set(index_for(spark, sf),
                        Fuzzy("sprak", max_edits=1, transpositions=True))
    e["fuzzy_query_transpositions"] = (fuzzy_transp, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf
WHERE damerau_levenshtein(term, 'sprak') <= 1
ORDER BY doc_id""")

    def fuzzy(spark, sf):
        return _doc_set(index_for(spark, sf), Fuzzy("mergee", max_edits=1))
    e["fuzzy_query"] = (fuzzy, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf WHERE levenshtein(term, 'mergee') <= 1
ORDER BY doc_id""")

    # FuzzyQuery prefixLength (round 4; u8:lucene/core/.../search/
    # FuzzyQuery.java prefixLength): the first N characters must match
    # EXACTLY and never count as edits — the distance automaton runs on
    # the suffixes only, and the dictionary scan becomes a prefix seek.
    # 'mirge'~1 with prefixLength=1: candidates must start with 'm'
    # and have lev(suffix, 'irge') <= 1 — a term like 'irged' with
    # lev('irged','mirge') = 2-via-prefix paths can never sneak in
    # through prefix edits, and the dictionary scan prefix-prunes.
    def fuzzy_pl(spark, sf):
        return search(index_for(spark, sf),
                      Fuzzy("mirge", max_edits=1, prefix_length=1),
                      k=None, mode="f64").select("doc_id").orderBy("doc_id")
    e["fuzzy_query_prefix_length"] = (fuzzy_pl, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id FROM tf
WHERE term LIKE 'm%'
  AND levenshtein(substr(term, 2), 'irge') <= 1
ORDER BY doc_id""")

    # TOP_TERMS scoring rewrite (round 4; u8:lucene/core/.../search/
    # MultiTermQuery.java TopTermsScoringBooleanQueryRewrite): instead of
    # constant-score, keep the best-n expansions with per-term boosts and
    # real BM25 ranking. Pinned selection spec on query.TopTerms; the
    # oracle re-derives candidates + boosts from the term dictionary and
    # scores (boost * idf * tf) / denom exactly like bm25.score_f64.
    _avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    _idf_e = "ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5))"
    _denom = f"(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {_avgdl}))"

    def fuzzy_scored(spark, sf):
        from sparklucene.query import TopTerms
        return search(index_for(spark, sf),
                      TopTerms(Fuzzy("mergee", max_edits=2), n=5),
                      k=10, mode="f64")
    e["fuzzy_query_scored"] = (fuzzy_scored, f"""WITH {corpus_ctes()},
cand AS (
  SELECT term, df,
         1.0 - levenshtein(term, 'mergee')
               / CAST(least(length('mergee'), length(term)) AS DOUBLE)
           AS boost
  FROM tstats WHERE levenshtein(term, 'mergee') <= 2),
kept AS (
  SELECT term, boost FROM cand
  ORDER BY boost DESC, df DESC, term ASC LIMIT 5),
term_scores AS (
  SELECT tf.doc_id,
         CAST(((k.boost * {_idf_e}) * tf.tf) / {_denom} AS REAL) AS s
  FROM tf JOIN kept k ON tf.term = k.term
  JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g)
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # TOP_TERMS_BLENDED_FREQ_SCORING (round 4; Lucene's DEFAULT fuzzy
    # rewrite — u8:lucene/core/.../search/BlendedTermQuery.java +
    # FuzzyQuery.defaultRewrite): same top-n candidates, but every kept
    # term scores with the BLENDED df (max over the kept set) and the
    # clauses combine via DisjunctionMax(tiebreak=0.01). The oracle
    # derives the blended df in SQL and mirrors the DisMax float path.
    def fuzzy_blended(spark, sf):
        from sparklucene.query import TopTerms
        return search(index_for(spark, sf),
                      TopTerms(Fuzzy("bath", max_edits=2), n=5,
                               blended=True),
                      k=10, mode="f64")
    _idf_b = "ln(1.0 + (g.doc_count - b.bdf + 0.5) / (b.bdf + 0.5))"
    e["fuzzy_query_blended"] = (fuzzy_blended, f"""WITH {corpus_ctes()},
cand AS (
  SELECT term, df,
         1.0 - levenshtein(term, 'bath')
               / CAST(least(length('bath'), length(term)) AS DOUBLE)
           AS boost
  FROM tstats WHERE levenshtein(term, 'bath') <= 2),
kept AS (
  SELECT term, boost FROM cand
  ORDER BY boost DESC, df DESC, term ASC LIMIT 5),
bdf AS (
  SELECT max(ts.df)::BIGINT AS bdf
  FROM kept k JOIN tstats ts ON k.term = ts.term),
term_scores AS (
  SELECT tf.doc_id,
         CAST(CAST(((k.boost * {_idf_b}) * tf.tf) / {_denom} AS REAL)
              AS DOUBLE) AS s
  FROM tf JOIN kept k ON tf.term = k.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g CROSS JOIN bdf b)
SELECT doc_id,
       CAST(CAST(max(s) + 0.01 * (sum(s) - max(s)) AS REAL) AS DOUBLE)
         AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def wildcard_scored(spark, sf):
        from sparklucene.query import TopTerms
        return search(index_for(spark, sf),
                      TopTerms(Wildcard("mer*"), n=5), k=10, mode="f64")
    # constant boosts -> selection degenerates to (df desc, term asc)
    e["wildcard_query_scored"] = (wildcard_scored, f"""WITH {corpus_ctes()},
kept AS (
  SELECT term FROM tstats WHERE term LIKE 'mer%'
  ORDER BY df DESC, term ASC LIMIT 5),
term_scores AS (
  SELECT tf.doc_id,
         CAST(((1.0 * {_idf_e}) * tf.tf) / {_denom} AS REAL) AS s
  FROM tf JOIN kept k ON tf.term = k.term
  JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g)
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def termfreq(spark, sf):
        """termfreq() relevance ValueSource: per-doc tf of one term."""
        idx = index_for(spark, sf)
        matched = idx.postings().filter(F.col("term") == "spark")

        def decode(batches):
            for pdf in batches:
                for db, tb in zip(pdf["doc_bytes"], pdf["tf_bytes"]):
                    yield pd.DataFrame({
                        "doc_id": decode_doc_ids(bytes(db)),
                        "tf": decode_tfs(bytes(tb)).astype(np.int64)})

        return (matched.select("doc_bytes", "tf_bytes")
                .mapInPandas(decode, "doc_id long, tf long")
                .orderBy("doc_id"))
    e["function_termfreq"] = (termfreq, f"""WITH {corpus_ctes()}
SELECT doc_id, tf FROM tf WHERE term = 'spark' ORDER BY doc_id""")

    def range_q(spark, sf):
        docs = _t(spark, sf, "documents")
        return (docs.filter(F.col("n_chars").between(500, 1500))
                .select("doc_id").orderBy("doc_id"))
    e["numeric_range_query"] = (range_q, """
SELECT doc_id FROM documents WHERE n_chars BETWEEN 500 AND 1500
ORDER BY doc_id""")

    def in_set(spark, sf):
        docs = _t(spark, sf, "documents")
        return (docs.filter(F.col("lang").isin("en", "de"))
                .select("doc_id", "lang").orderBy("doc_id"))
    e["term_in_set_query"] = (in_set, """
SELECT doc_id, lang FROM documents WHERE lang IN ('en', 'de')
ORDER BY doc_id""")

    return e


def _scalar_fn_entries() -> dict[str, tuple[Callable, str | None]]:
    """Scalar function library (SURVEY.md §2.11): math / date / string
    ValueSource equivalents, all Catalyst builtins."""
    e: dict[str, tuple[Callable, str | None]] = {}

    def math_fns(spark, sf):
        li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 400)
        return li.select(
            "l_orderkey", "l_linenumber",
            F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
            F.ceil("l_extendedprice").cast("long").alias("ceil_price"),
            F.floor("l_discount").cast("long").alias("floor_disc"),
            F.sqrt("l_extendedprice").alias("sqrt_price"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
            F.pmod(F.col("l_partkey"), F.lit(97)).alias("mod97"),
        ).orderBy("l_orderkey", "l_linenumber")
    e["function_math"] = (math_fns, """
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25.0) AS abs_dev,
       ceil(l_extendedprice)::BIGINT AS ceil_price,
       floor(l_discount)::BIGINT AS floor_disc,
       sqrt(l_extendedprice) AS sqrt_price,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate,
       l_partkey % 97 AS mod97
FROM lineitem WHERE l_orderkey <= 400
ORDER BY l_orderkey, l_linenumber""")

    def date_fns(spark, sf):
        orders = _t(spark, sf, "orders")
        return (orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"))
            .agg(F.count("*").alias("n"),
                 F.min("o_orderdate").alias("first_order"),
                 F.max("o_orderdate").alias("last_order"))
            .withColumn("month_num", F.month(F.col("month")).cast("long"))
            .withColumn("year_num", F.year(F.col("month")).cast("long"))
            .orderBy("month"))
    e["function_date_math"] = (date_fns, """
SELECT date_trunc('month', o_orderdate) AS month, count(*)::BIGINT AS n,
       min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
       month(date_trunc('month', o_orderdate))::BIGINT AS month_num,
       year(date_trunc('month', o_orderdate))::BIGINT AS year_num
FROM orders GROUP BY 1 ORDER BY month""")

    # -- Solr date MATH EXPRESSIONS (round 4; u8:solr/solrj/.../util/
    # DateMathParser.java): the `ts:[NOW/DAY-7DAYS TO NOW/DAY+1DAY]`
    # grammar — anchor, /UNIT round-down, +/-N UNIT calendar arithmetic.
    # Parsing is driver-side (operator constant); the bounds become
    # pushed-down scan predicates. The oracle re-derives the SAME bounds
    # independently with DuckDB interval arithmetic, never seeing the
    # parser.
    def solr_date_math(spark, sf):
        from sparklucene.datemath import parse_date_math
        lo = parse_date_math("2024-01-15T13:45:30Z/DAY-7DAYS")
        hi = parse_date_math("2024-01-15T13:45:30Z/DAY+1DAY")
        ts = F.col("ts").cast("timestamp")
        return (_t(spark, sf, "events")
                .filter((ts >= F.lit(lo.isoformat(sep=" ")).cast("timestamp"))
                        & (ts < F.lit(hi.isoformat(sep=" ")).cast("timestamp")))
                .groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     _dec_sum("value").alias("sum_value"))
                .orderBy("event_type"))
    e["function_solr_date_math"] = (solr_date_math, """
SELECT event_type, count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE ts >= date_trunc('day', TIMESTAMP '2024-01-15 13:45:30') - INTERVAL 7 DAY
  AND ts <  date_trunc('day', TIMESTAMP '2024-01-15 13:45:30') + INTERVAL 1 DAY
GROUP BY event_type ORDER BY event_type""")

    def string_fns(spark, sf):
        cust = _t(spark, sf, "customer").filter(F.col("c_custkey") <= 200)
        return cust.select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("c_name")).alias("tagged"),
            F.upper("c_name").alias("uname"),
            F.length("c_name").cast("long").alias("name_len"),
            F.substring("c_name", 1, 10).alias("name_prefix"),
            F.levenshtein(F.col("c_name"), F.lit("Customer#000000001"))
             .cast("long").alias("lev"),
        ).orderBy("c_custkey")
    e["function_string"] = (string_fns, """
SELECT c_custkey,
       concat(c_mktsegment, '/', c_name) AS tagged,
       upper(c_name) AS uname,
       length(c_name)::BIGINT AS name_len,
       substring(c_name, 1, 10) AS name_prefix,
       levenshtein(c_name, 'Customer#000000001')::BIGINT AS lev
FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""")

    # -- ord()/rord() ValueSources (round 3; u8:solr/core/.../search/
    # function/OrdFieldSource.java). Solr's ord(f) is the 1-based position
    # of a doc's value in the field's SORTED value dictionary; rord is the
    # reverse ordinal. Scale shape: the ordinal dictionary is built over
    # the DISTINCT values only (|dict| rows, not |docs|) — the global
    # window runs on that tiny set — then broadcast-joined back onto docs,
    # so no doc-proportional shuffle-by-one-partition ever happens.
    def ordinal_fns(spark, sf):
        from pyspark.sql import Window
        docs = _t(spark, sf, "documents")
        w_asc = Window.orderBy(F.col("lang").asc())
        w_desc = Window.orderBy(F.col("lang").desc())
        dict_df = (docs.select("lang").distinct()
                   .select("lang",
                           F.dense_rank().over(w_asc).cast("long").alias("ord"),
                           F.dense_rank().over(w_desc).cast("long").alias("rord")))
        return (docs.filter(F.col("doc_id") < 60)
                .join(F.broadcast(dict_df), "lang")
                .select("doc_id", "lang", "ord", "rord")
                .orderBy("doc_id"))
    # -- conditional ValueSources (round 4; Solr function queries
    # if()/exists()/def() — u8:solr/core/.../search/ValueSourceParser.java):
    # straight F.when/coalesce mappings over doc attributes.
    def conditional_fns(spark, sf):
        d = _t(spark, sf, "documents")
        opt = F.when(F.col("n_chars") % 7 == 0, None) \
               .otherwise(F.col("n_chars"))
        return d.select(
            "doc_id",
            F.when(F.col("n_chars") > 1000, F.lit("long"))
             .otherwise(F.lit("short")).alias("if_len"),
            opt.isNotNull().alias("exists_opt"),
            F.coalesce(opt, F.lit(-1)).cast("long").alias("def_opt"),
        ).orderBy("doc_id")
    e["function_conditional"] = (conditional_fns, """
SELECT doc_id,
       CASE WHEN n_chars > 1000 THEN 'long' ELSE 'short' END AS if_len,
       (CASE WHEN n_chars % 7 = 0 THEN NULL ELSE n_chars END IS NOT NULL)
         AS exists_opt,
       coalesce(CASE WHEN n_chars % 7 = 0 THEN NULL ELSE n_chars END,
                -1)::BIGINT AS def_opt
FROM documents ORDER BY doc_id""")

    e["function_ordinal"] = (ordinal_fns, """
WITH vals AS (SELECT DISTINCT lang FROM documents),
dict AS (
  SELECT lang,
         dense_rank() OVER (ORDER BY lang ASC)::BIGINT AS ord,
         dense_rank() OVER (ORDER BY lang DESC)::BIGINT AS rord
  FROM vals)
SELECT d.doc_id, d.lang, dict.ord, dict.rord
FROM documents d JOIN dict USING (lang)
WHERE d.doc_id < 60 ORDER BY d.doc_id""")

    # -- scale() / map() function queries (round 4; u8:solr/core/.../
    # search/function/ValueSourceParser.java ScaleFloatFunction,
    # RangeMapFloatFunction): scale(x, 0, 1) needs the GLOBAL min/max
    # (one tiny agg broadcast as a 1-row cross join — ScaleInfo's
    # createWeight pass); map(x, min, max, target) is a narrow CASE.
    # All-f64 expression trees, f32-rounded outputs.
    def scale_map(spark, sf):
        docs = _t(spark, sf, "documents")
        ext = docs.agg(F.min("n_chars").cast("double").alias("mn"),
                       F.max("n_chars").cast("double").alias("mx"))
        scaled = ((F.col("n_chars") - F.col("mn"))
                  / (F.col("mx") - F.col("mn")))
        mapped = (F.when((F.col("n_chars") >= 0)
                         & (F.col("n_chars") <= 500), F.lit(0.0))
                  .otherwise(F.col("n_chars").cast("double")))
        return (docs.crossJoin(F.broadcast(ext))
                .filter(F.col("doc_id") < 80)
                .select("doc_id",
                        scaled.cast("float").cast("double").alias("scaled"),
                        mapped.alias("mapped"))
                .orderBy("doc_id"))
    e["function_scale_map"] = (scale_map, """
WITH ext AS (SELECT CAST(min(n_chars) AS DOUBLE) AS mn,
                    CAST(max(n_chars) AS DOUBLE) AS mx FROM documents)
SELECT doc_id,
       CAST(CAST((n_chars - mn) / (mx - mn) AS REAL) AS DOUBLE) AS scaled,
       CASE WHEN n_chars >= 0 AND n_chars <= 500 THEN 0.0
            ELSE CAST(n_chars AS DOUBLE) END AS mapped
FROM documents CROSS JOIN ext
WHERE doc_id < 80 ORDER BY doc_id""")

    return e


TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9_]+')"
H60 = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


def _shingles_sql(n: int) -> str:
    """DuckDB list expression: distinct token n-gram shingles of ``toks``."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (f"list_distinct(list_transform("
            f"range(1, greatest(len(toks) - {n - 1}, 0) + 1), i -> {parts}))")


def _textops_entries() -> dict[str, tuple[Callable, str | None]]:
    """Text-analysis pipeline ops (token stats, quality, language ID,
    fingerprint) — sparklucene.textops, all JVM-codegen expressions."""
    from sparklucene import textops
    e: dict[str, tuple[Callable, str | None]] = {}

    e["text_token_stats"] = (
        lambda spark, sf: textops.token_stats(_t(spark, sf, "documents")),
        f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_ws_tokens,
       len({TOKS_SQL})::BIGINT AS n_tokens,
       len(list_distinct({TOKS_SQL}))::BIGINT AS n_terms,
       coalesce(list_sum(list_transform({TOKS_SQL},
                t -> ceil(length(t) / 4)::BIGINT)), 0)::BIGINT AS n_subwords
FROM documents""")

    # -- PII detection + redaction (round 4; the scrubbing pass every
    # LLM training pipeline runs before tokenization). The synthetic
    # corpus contains no PII, so both sides derive identical PII spans
    # from doc_id (docs where doc_id % 3 = 0 get an email + IPv4 +
    # phone appended) — the detector/redactor then runs on equal
    # inputs. Patterns are alternation-free so Java regex and RE2
    # agree on every span; DuckDB needs the 'g' flag to match Spark's
    # replace-all.
    def pii(spark, sf):
        d = F.col("doc_id")
        aug = F.when(d % 3 == 0, F.concat(
            F.col("text"), F.lit(" contact user"), d.cast("string"),
            F.lit("@example.com at 10.0."),
            (d % 256).cast("string"), F.lit("."),
            ((d * 7) % 256).cast("string"), F.lit(" call +1 555 0"),
            (d % 90 + 10).cast("string"))).otherwise(F.col("text"))
        docs = (_t(spark, sf, "documents")
                .select("doc_id", aug.alias("text")))
        return textops.pii_scan(docs).orderBy("doc_id")
    from sparklucene.textops import (PII_EMAIL_RE, PII_IPV4_RE,
                                     PII_PHONE_RE)
    e["text_pii_scan"] = (pii, f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact user' || doc_id || '@example.com at 10.0.'
                || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                || ' call +1 555 0' || (doc_id % 90 + 10)
         ELSE text END AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(
           regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_IPV4_RE}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(
           regexp_replace(regexp_replace(
               t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_IPV4_RE}', '<IP>', 'g'),
           '{PII_PHONE_RE}'))::BIGINT AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(
           t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_IPV4_RE}', '<IP>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug ORDER BY doc_id""")

    # -- line-level boilerplate removal (round 4; the CCNet/RefinedWeb
    # web-pipeline pass: a line occurring in >= min_docs distinct docs
    # of the same source/domain is navigation-footer boilerplate and is
    # dropped everywhere). The synthetic corpus has single-line text, so
    # both sides derive the SAME multi-line column: three fixed 40-char
    # segments joined by newlines, plus a shared footer line injected
    # into docs where doc_id % 3 = 0 — the operator then detects and
    # strips exactly that footer (and any organically-repeated segment).
    _BOILER = "subscribe to our newsletter - site footer"

    def boiler(spark, sf):
        d, t = F.col("doc_id"), F.col("text")
        segs = [F.substring(t, 1, 40), F.substring(t, 41, 40),
                F.substring(t, 81, 40)]
        aug = F.when(d % 3 == 0, F.concat_ws(
            "\n", segs[0], F.lit(_BOILER), segs[1], segs[2])
        ).otherwise(F.concat_ws("\n", *segs))
        docs = (_t(spark, sf, "documents")
                .select("doc_id", aug.alias("text"), "source"))
        return (textops.remove_boilerplate_lines(docs, min_docs=3)
                .orderBy("doc_id"))
    e["pipeline_boilerplate_lines"] = (boiler, f"""
WITH aug AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 0 THEN concat_ws(chr(10),
                substring(text, 1, 40), '{_BOILER}',
                substring(text, 41, 40), substring(text, 81, 40))
         ELSE concat_ws(chr(10), substring(text, 1, 40),
                substring(text, 41, 40), substring(text, 81, 40))
         END AS t
  FROM documents),
lines AS (
  SELECT doc_id, source,
         unnest(string_split(t, chr(10))) AS line,
         unnest(range(1, len(string_split(t, chr(10))) + 1)) AS pos
  FROM aug),
freq AS (
  SELECT source, trim(line) AS nl
  FROM lines WHERE trim(line) <> ''
  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 3),
kept AS (
  SELECT l.doc_id, l.line, l.pos FROM lines l
  LEFT JOIN freq f ON l.source = f.source AND trim(l.line) = f.nl
  WHERE f.nl IS NULL),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY 1),
reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS clean_text
        FROM kept GROUP BY 1)
SELECT t.doc_id, t.n_lines,
       (t.n_lines - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
       coalesce(r.clean_text, '') AS clean_text
FROM tot t LEFT JOIN reb r USING (doc_id)
ORDER BY doc_id""")

    # -- deterministic hash sampling (round 3): reproducible holdout
    # split + per-language stratified rebalance; membership is a pure
    # function of md5(salt || doc_id), so DuckDB selects the SAME rows
    def det_sample(spark, sf):
        s = textops.deterministic_sample(_t(spark, sf, "documents"), 0.25)
        return (s.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
                .orderBy("lang"))
    e["sample_deterministic_frac"] = (det_sample, """
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE substring(md5('holdout-v1' || doc_id::VARCHAR), 1, 8) < '40000000'
GROUP BY lang ORDER BY lang""")

    _strata = {"en": 0.1, "de": 0.5, "es": 0.9, "fr": 1.0, "zh": 0.0}
    from sparklucene.textops import _frac_thr
    _thr_vals = ", ".join(f"('{k}', '{_frac_thr(v)}')"
                          for k, v in sorted(_strata.items()))

    def strat_sample(spark, sf):
        s = textops.stratified_sample(_t(spark, sf, "documents"), _strata)
        return (s.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
                .orderBy("lang"))
    e["sample_stratified_by_lang"] = (strat_sample, f"""
WITH thr(lang, t) AS (VALUES {_thr_vals})
SELECT d.lang, count(*)::BIGINT AS n
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE substring(md5('holdout-v1' || d.doc_id::VARCHAR), 1, 8) < thr.t
GROUP BY d.lang ORDER BY d.lang""")

    # -- token-budget data mixing (round 4): integer mixture weights +
    # a global token budget -> per-language integer token targets ->
    # min(1, target/avail) md5-prefix keep thresholds. At the driver's
    # sf0.01 tier this caps de at keep-all (target > avail) while en is
    # cut to ~15% and es is allowlist-dropped — every branch bites.
    _MIXW = {"en": 1, "de": 3, "fr": 2, "zh": 1}
    _MIXB, _MIXSW = 12000, sum(_MIXW.values())
    _mixw_vals = ", ".join(f"('{k}', {v})"
                           for k, v in sorted(_MIXW.items()))

    def mix_sample(spark, sf):
        s = textops.mixture_sample(_t(spark, sf, "documents"), _MIXW,
                                   token_budget=_MIXB)
        return (s.groupBy("lang")
                .agg(F.count("*").cast("long").alias("n_docs"),
                     F.sum("dl").alias("sampled_tokens"),
                     F.min("target_tokens").alias("target_tokens"),
                     F.min("avail_tokens").alias("avail_tokens"))
                .orderBy("lang"))
    e["pipeline_mixture_sample"] = (mix_sample, f"""
WITH d AS (SELECT doc_id, lang, len({TOKS_SQL})::BIGINT AS dl
           FROM documents),
w(lang, wt) AS (VALUES {_mixw_vals}),
a AS (SELECT d.lang, w.wt, sum(dl)::BIGINT AS avail_tokens
      FROM d JOIN w USING (lang) GROUP BY 1, 2),
p AS (SELECT lang, avail_tokens,
             (wt * {_MIXB} // {_MIXSW})::BIGINT AS target_tokens,
             least(CAST(floor(
                 ((wt * {_MIXB} // {_MIXSW})::DOUBLE
                  / avail_tokens::DOUBLE) * 4294967296.0) AS BIGINT),
                 4294967296) AS thr
      FROM a)
SELECT d.lang, count(*)::BIGINT AS n_docs, sum(d.dl)::BIGINT AS sampled_tokens,
       min(p.target_tokens) AS target_tokens,
       min(p.avail_tokens) AS avail_tokens
FROM d JOIN p USING (lang)
WHERE ('0x' || substring(md5('mix-v1' || d.doc_id::VARCHAR), 1, 8))::BIGINT
      < p.thr
GROUP BY d.lang ORDER BY d.lang""")

    stop_list = "[" + ", ".join(
        f"'{w}'" for w in sorted(textops.ENGLISH_STOP_WORDS)) + "]"
    e["text_quality_score"] = (
        lambda spark, sf: textops.quality_score(_t(spark, sf, "documents")),
        f"""
WITH base AS (
  SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_filter(toks, t -> list_contains({stop_list}, t)))::BIGINT
           AS n_stop_tokens,
       coalesce(list_sum(list_transform(toks, t -> length(t)::BIGINT)), 0)::BIGINT
           AS n_token_chars,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha_chars,
       length(text)::BIGINT AS n_chars_text,
       len(list_filter(toks, t -> list_contains({stop_list}, t)))
           / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       coalesce(list_sum(list_transform(toks, t -> length(t)::BIGINT)), 0)
           / CAST(len(toks) AS DOUBLE) AS mean_token_len,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           / CAST(length(text) AS DOUBLE) AS alpha_ratio
FROM base""")

    marker_cols = ",\n       ".join(
        "len(list_intersect(list_distinct(toks), ["
        + ", ".join(f"'{w}'" for w in ws) + f"]))::BIGINT AS score_{lg}"
        for lg, ws in sorted(textops.LANG_MARKERS.items()))
    langs = sorted(textops.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = (f"CASE WHEN {best} = 0 THEN CAST(NULL AS VARCHAR) "
            + " ".join(f"WHEN score_{lg} = {best} THEN '{lg}'"
                       for lg in langs) + " END")
    e["text_language_id"] = (
        lambda spark, sf: textops.language_id(_t(spark, sf, "documents")),
        f"""
WITH base AS (
  SELECT doc_id, lang AS labeled_lang, {TOKS_SQL} AS toks FROM documents),
scored AS (
  SELECT doc_id, labeled_lang,
       {marker_cols}
  FROM base)
SELECT doc_id, labeled_lang, {', '.join('score_' + lg for lg in langs)},
       {case} AS pred_lang
FROM scored""")

    e["text_fingerprint"] = (
        lambda spark, sf: textops.fingerprint(_t(spark, sf, "documents")),
        f"""
WITH base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, {_shingles_sql(4)} AS shingles FROM base)
SELECT doc_id, len(shingles)::BIGINT AS n_shingles,
       (coalesce(list_sum(list_transform(shingles,
           s -> {H60.format(x='s')} % 2305843009213693951)), 0)
        % 2305843009213693951)::BIGINT AS fingerprint
FROM sh""")

    # -- round 3: repetition, decontamination, sequence packing ----------
    grams3 = " || ' ' || ".join(f"toks[i+{j}]" for j in range(3))
    e["text_dup_ngram_fraction"] = (
        lambda spark, sf: textops.duplicate_ngram_fraction(
            _t(spark, sf, "documents"), n=3),
        f"""
WITH base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, list_transform(
        range(1, greatest(len(toks) - 2, 0) + 1), i -> {grams3}) AS grams
      FROM base)
SELECT doc_id, len(grams)::BIGINT AS n_ngrams,
       len(list_distinct(grams))::BIGINT AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN (len(grams) - len(list_distinct(grams)))
                 / CAST(len(grams) AS DOUBLE)
            ELSE 0.0 END AS dup_ngram_frac
FROM g""")

    # -- round 4: end-to-end quality filter (dedup keeper + length +
    # perplexity band + stopword floor — the CCNet/Gopher composition) --
    _qf_stop = "[" + ", ".join(
        f"'{w}'" for w in sorted(textops.ENGLISH_STOP_WORDS)) + "]"
    e["pipeline_quality_filter"] = (
        lambda spark, sf: textops.quality_filter(
            _t(spark, sf, "documents")),
        f"""
WITH tokall AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tfa AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM tokall GROUP BY doc_id, term),
cfa AS (SELECT term, sum(tf)::BIGINT AS cf FROM tfa GROUP BY term),
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS total FROM cfa),
dla AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tfa GROUP BY doc_id),
h AS (
  SELECT tfa.doc_id,
         sum(CAST(tfa.tf AS DOUBLE)
             * -ln(CAST(cfa.cf AS DOUBLE) / tot.total)) AS hsum
  FROM tfa JOIN cfa USING (term) CROSS JOIN tot
  GROUP BY tfa.doc_id),
lp AS (
  SELECT h.doc_id, dla.dl,
         CAST(CAST(h.hsum / CAST(dla.dl AS DOUBLE) AS REAL) AS DOUBLE)
           AS logppl
  FROM h JOIN dla USING (doc_id)),
sr AS (
  SELECT doc_id,
         len(list_filter(toks, t -> list_contains({_qf_stop}, t)))
           / CAST(len(toks) AS DOUBLE) AS stop_ratio
  FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)),
canon AS (
  SELECT d.doc_id
  FROM (SELECT doc_id, sha256(text) AS sha FROM documents) d
  JOIN (SELECT sha256(text) AS sha, min(doc_id) AS keeper
        FROM documents GROUP BY 1) k USING (sha)
  WHERE d.doc_id = k.keeper)
SELECT lp.doc_id, lp.dl, lp.logppl, sr.stop_ratio
FROM lp JOIN sr USING (doc_id) JOIN canon USING (doc_id)
WHERE lp.dl >= 20 AND lp.logppl >= 3.39 AND lp.logppl <= 3.41
  AND sr.stop_ratio >= 0.01
ORDER BY lp.doc_id""")

    # -- round 4: unigram LM cross-entropy (CCNet-style quality proxy) --
    e["text_unigram_logppl"] = (
        lambda spark, sf: textops.unigram_logppl(
            _t(spark, sf, "documents")),
        f"""
WITH tokall AS (
  SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tfa AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM tokall GROUP BY doc_id, term),
cfa AS (SELECT term, sum(tf)::BIGINT AS cf FROM tfa GROUP BY term),
tot AS (SELECT CAST(sum(cf) AS DOUBLE) AS total FROM cfa),
dla AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tfa GROUP BY doc_id),
h AS (
  SELECT tfa.doc_id,
         sum(CAST(tfa.tf AS DOUBLE)
             * -ln(CAST(cfa.cf AS DOUBLE) / tot.total)) AS hsum
  FROM tfa JOIN cfa USING (term) CROSS JOIN tot
  GROUP BY tfa.doc_id)
SELECT h.doc_id, dla.dl,
       CAST(CAST(h.hsum / CAST(dla.dl AS DOUBLE) AS REAL) AS DOUBLE)
         AS logppl
FROM h JOIN dla USING (doc_id)""")

    # -- round 4: sliding-window chunking (RAG / long-context prep) -----
    e["pipeline_chunk_overlap"] = (
        lambda spark, sf: textops.chunk_overlap(
            _t(spark, sf, "documents"), size=64, stride=48),
        f"""
WITH b AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM b WHERE len(toks) > 0),
st AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(CAST(ceil((n - 64) / 48.0) AS INT), 0)
                         * 48 + 1, 48)) AS start_token
  FROM nz)
SELECT doc_id, (start_token / 48)::BIGINT AS chunk_id,
       start_token::BIGINT AS start_token,
       len(list_slice(toks, start_token + 1, start_token + 64))::BIGINT
         AS n_tokens,
       array_to_string(list_slice(toks, start_token + 1, start_token + 64),
                       ' ') AS chunk_text
FROM st ORDER BY doc_id, chunk_id""")

    # -- round 4: cross-document duplicated-span removal (the span-level
    # ExactSubstr dedup of Lee et al. 2022 at 4-gram granularity): a
    # 4-gram in >= 2 distinct docs marks its 4 token positions for
    # removal in EVERY doc; the remainder is reassembled in order. At
    # sf0.01 this organically bites 368/500 docs while keeping text.
    e["pipeline_dup_span_removal"] = (
        lambda spark, sf: textops.remove_duplicate_spans(
            _t(spark, sf, "documents"), n=4, min_docs=2),
        f"""
WITH b AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
occ AS (
  SELECT doc_id, i AS s,
         {H60.format(x="array_to_string(toks[i:i+3], ' ')")} AS h
  FROM b, unnest(range(1, greatest(len(toks) - 2, 1))) AS u(i)
  WHERE len(toks) >= 4),
dup AS (SELECT h FROM occ GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT occ.doc_id, s + d AS pos
        FROM occ JOIN dup USING (h), unnest(range(0, 4)) AS r(d)),
tok AS (SELECT doc_id, unnest(toks) AS tok,
               unnest(range(1, len(toks) + 1)) AS pos FROM b),
kept AS (SELECT t.doc_id, t.tok, t.pos FROM tok t
         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
         WHERE c.pos IS NULL),
tot AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM b),
reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(tok, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY 1)
SELECT t.doc_id, t.n_tokens,
       (t.n_tokens - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
       coalesce(r.clean_text, '') AS clean_text
FROM tot t LEFT JOIN reb r USING (doc_id)
ORDER BY doc_id""")

    def contam(spark, sf):
        docs = _t(spark, sf, "documents")
        bench = docs.filter(F.col("doc_id") % 23 == 0)
        return textops.contamination_scores(docs, bench, n=8)
    e["pipeline_decontamination"] = (contam, f"""
WITH base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_shingles_sql(8)}) AS gram FROM base),
h AS (SELECT doc_id, {H60.format(x='gram')} AS h FROM g),
bh AS (SELECT DISTINCT h FROM h WHERE doc_id % 23 = 0),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM h GROUP BY doc_id),
hit AS (SELECT doc_id, count(*)::BIGINT AS n_hits FROM h
        WHERE h IN (SELECT h FROM bh) GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
       coalesce(hit.n_hits, 0)::BIGINT AS n_hits,
       coalesce(hit.n_hits, 0) / CAST(t.n_grams AS DOUBLE) AS contamination
FROM tot t LEFT JOIN hit ON t.doc_id = hit.doc_id""")

    e["pipeline_pack_sequences"] = (
        lambda spark, sf: textops.pack_sequences(
            _t(spark, sf, "documents"), budget=128, sep=1),
        f"""
WITH base AS (SELECT doc_id, len({TOKS_SQL}) + 1 AS cost FROM documents),
o AS (SELECT doc_id, cost,
             coalesce(sum(cost) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS "offset"
      FROM base)
SELECT doc_id, "offset", cost::BIGINT AS n_tokens_sep,
       ("offset" // 128)::BIGINT AS first_seq,
       (("offset" + cost - 1) // 128)::BIGINT AS last_seq
FROM o""")

    # -- URL/domain blocklist filtering (round 4; the UT1-style pass of
    # web pretraining pipelines — CCNet/RefinedWeb/Dolma). The synthetic
    # corpus has no URL column, so both sides derive the SAME url from
    # doc_id/source (docs where doc_id % 3 = 0 get a 'www.' subdomain —
    # exercising the suffix-match rule). One narrow expression: no join,
    # no UDF; the predicate sits inside the scan at any scale.
    _BLOCKED = ("src32.example.com", "src115.example.com", "nosuch.org")

    def urlblock(spark, sf):
        d = F.col("doc_id")
        url = F.concat(
            F.lit("https://"),
            F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"), (d % 7).cast("string"),
            F.lit(".example.com/p/"), d.cast("string"))
        docs = (_t(spark, sf, "documents")
                .select("doc_id", "source", url.alias("url")))
        out = textops.url_blocklist_filter(docs, _BLOCKED)
        return (out.groupBy("domain", "blocked")
                .agg(F.count("*").alias("cnt"))
                .orderBy("domain", "blocked"))
    e["pipeline_url_blocklist"] = (urlblock, """
WITH u AS (
  SELECT doc_id,
         'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || source || (doc_id % 7) || '.example.com/p/' || doc_id AS url
  FROM documents),
dom AS (
  SELECT doc_id,
         lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS domain
  FROM u),
v AS (
  SELECT domain,
         (domain = 'nosuch.org' OR ends_with(domain, '.nosuch.org')
          OR domain = 'src115.example.com'
          OR ends_with(domain, '.src115.example.com')
          OR domain = 'src32.example.com'
          OR ends_with(domain, '.src32.example.com')) AS blocked
  FROM dom)
SELECT domain, blocked, count(*)::BIGINT AS cnt
FROM v GROUP BY domain, blocked ORDER BY domain, blocked""")

    # -- per-domain quota sampling (round 4; the anti-domination cap of
    # web corpus builds: no single domain may contribute more than N
    # docs). Deterministic md5 rank within each source group — the kept
    # set is partitioning/engine/scale-invariant, same contract as
    # deterministic_sample.
    def domcap(spark, sf):
        out = textops.domain_cap_sample(
            _t(spark, sf, "documents").select("doc_id", "source"), cap=5)
        return out.select("doc_id", "source", "rk").orderBy("source", "rk")
    e["pipeline_domain_cap"] = (domcap, """
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('domain-cap-v1:' || CAST(doc_id AS VARCHAR)),
                    doc_id)::BIGINT AS rk
  FROM documents)
WHERE rk <= 5 ORDER BY source, rk""")

    return e


def _dedup_entries() -> dict[str, tuple[Callable, str | None]]:
    """Dedup stack (sparklucene.dedup): exact sha groups, MinHash
    signatures, banded-LSH candidates, SimHash + Hamming pairs, blocked
    n-gram Jaccard."""
    from sparklucene import dedup
    e: dict[str, tuple[Callable, str | None]] = {}

    # the fixture corpus has no exact-duplicate texts, so the plain
    # entry returned 0 rows at the driver's sf (a vacuous r2 pass; the
    # round-4 verdict flagged it). Both sides apply the same pinned
    # deterministic augmentation — every doc_id % 13 == 3 doc gains an
    # exact copy at doc_id + 10_000_000 — so every group has exactly
    # 2 copies and the keeper is always the original (min doc_id).
    def exact_groups(spark, sf):
        docs = _t(spark, sf, "documents")
        aug = (docs.filter(F.col("doc_id") % 13 == 3)
               .withColumn("doc_id", F.col("doc_id") + 10_000_000))
        return dedup.exact_dup_groups(docs.unionByName(aug))
    e["dedup_exact_groups"] = (exact_groups, """
WITH aug AS (
  SELECT * FROM documents
  UNION ALL
  SELECT * REPLACE (doc_id + 10000000 AS doc_id) FROM documents
  WHERE doc_id % 13 = 3)
SELECT sha256(text) AS content_sha, count(*)::BIGINT AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM aug GROUP BY 1 HAVING count(*) > 1""")

    sig_cols = ",\n       ".join(
        f"min(({a} * h30 + {b}) % {dedup.LSH_PRIME})::BIGINT AS sig{i}"
        for i, (a, b) in enumerate(dedup.MINHASH_COEFFS))
    minhash_ctes = f"""
base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_shingles_sql(3)}) AS s FROM base),
hh AS (SELECT doc_id, {H60.format(x='s')} % {dedup.HASH30_MOD} AS h30 FROM sh),
sigs AS (
  SELECT doc_id,
       {sig_cols}
  FROM hh GROUP BY doc_id)"""
    e["dedup_minhash_signatures"] = (
        lambda spark, sf: dedup.minhash_signatures(_t(spark, sf, "documents")),
        f"WITH {minhash_ctes}\nSELECT * FROM sigs")

    n_bands = len(dedup.MINHASH_COEFFS) // 2
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat_ws('_', sig{2 * b}, sig{2 * b + 1}) AS band_key FROM sigs"
        for b in range(n_bands))
    e["dedup_lsh_candidates"] = (
        lambda spark, sf: dedup.lsh_candidate_pairs(_t(spark, sf, "documents")),
        f"""WITH {minhash_ctes},
bands AS ({band_selects})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id""")

    # -- Incremental LSH dedup (round 4): the per-crawl-snapshot shape —
    # a deterministic "new batch" (doc_id % 10 == 3) band-joined against
    # the remaining corpus only. MinHash is per-doc, so the oracle
    # computes one signature table and splits it; the engine computes the
    # two sides from their own texts (the persisted-signature-table
    # production pattern).
    def lsh_incr(spark, sf):
        docs = _t(spark, sf, "documents")
        return dedup.lsh_candidates_incremental(
            docs.filter(F.col("doc_id") % 10 == 3),
            docs.filter(F.col("doc_id") % 10 != 3))
    e["dedup_lsh_incremental"] = (lsh_incr, f"""WITH {minhash_ctes},
bands AS ({band_selects})
SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc
FROM bands n JOIN bands c
  ON n.band_id = c.band_id AND n.band_key = c.band_key
WHERE n.doc_id % 10 = 3 AND c.doc_id % 10 != 3""")

    simhash_ctes = f"""
base AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM base GROUP BY 1, 2),
hh AS (SELECT doc_id, tf, {H60.format(x='term')} AS h FROM tf),
bitsum AS (
  SELECT doc_id, b, sum(tf * (((h >> b) & 1) * 2 - 1))::BIGINT AS s
  FROM hh, range(0, 32) r(b) GROUP BY doc_id, b),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
  FROM bitsum GROUP BY doc_id)"""
    e["dedup_simhash"] = (
        lambda spark, sf: dedup.simhash(_t(spark, sf, "documents")),
        f"WITH {simhash_ctes}\nSELECT * FROM sim")

    e["dedup_simhash_pairs"] = (
        lambda spark, sf: dedup.simhash_pairs(_t(spark, sf, "documents")),
        f"""WITH {simhash_ctes},
chunks AS (
  SELECT doc_id, simhash, c AS chunk_id,
         (simhash >> (c * 8)) & 255 AS chunk_val
  FROM sim, range(0, 4) r(c)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b
    ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""")

    # -- duplicate clusters (round 4): connected components over the
    # simhash near-dup pairs — min-id label propagation on the engine
    # side, a genuine WITH RECURSIVE reachability closure on the oracle
    # side (transitive clusters, not just pairs: keeper = comp == node).
    def dup_cc(spark, sf):
        pairs = dedup.simhash_pairs(_t(spark, sf, "documents"))
        return (dedup.dup_clusters(pairs)
                .select(F.col("node").alias("doc_id"), "comp",
                        (F.col("node") == F.col("comp")).alias("keeper")))
    e["dedup_duplicate_clusters"] = (dup_cc, f"""WITH RECURSIVE {simhash_ctes},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM (SELECT doc_id, simhash, c AS chunk_id,
               (simhash >> (c * 8)) & 255 AS chunk_val
        FROM sim, range(0, 4) r(c)) a
  JOIN (SELECT doc_id, simhash, c AS chunk_id,
               (simhash >> (c * 8)) & 255 AS chunk_val
        FROM sim, range(0, 4) r(c)) b
    ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(sh_a, sh_b)) <= 3),
edges AS (
  SELECT doc_a AS x, doc_b AS y FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
walk(node, r) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT e.x, w.r FROM edges e JOIN walk w ON e.y = w.node)
SELECT node AS doc_id, min(r)::BIGINT AS comp,
       node = min(r) AS keeper
FROM walk GROUP BY node ORDER BY doc_id""")

    e["dedup_ngram_jaccard"] = (
        lambda spark, sf: dedup.ngram_jaccard_pairs(_t(spark, sf, "documents")),
        f"""
WITH base AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
sh AS (SELECT doc_id, source, unnest({_shingles_sql(3)}) AS s FROM base),
hh AS (SELECT doc_id, source, {H60.format(x='s')} AS h FROM sh),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM hh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM hh a JOIN hh b
    ON a.source = b.source AND a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter,
       (sa.n_sh + sb.n_sh - n_inter)::BIGINT AS n_union,
       n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b""")

    return e


def _similarity_entries() -> dict[str, tuple[Callable, str | None]]:
    """Embedding similarity search (sparklucene.similarity): exact
    brute-force cosine top-k + hyperplane-LSH bucketed ANN, both on the
    1/4096 integer grid for bit-exact cross-engine parity."""
    from sparklucene import similarity as sim
    e: dict[str, tuple[Callable, str | None]] = {}

    QIDS = [0, 1, 2]
    qids_sql = ", ".join(str(q) for q in QIDS)
    quant_ctes = """
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 4096 + 0.5)::BIGINT) AS q
  FROM embeddings),
nv AS (
  SELECT vec_id, q,
         list_sum(list_transform(q, x -> x * x))::BIGINT AS norm2
  FROM qv)"""

    e["ann_cosine_topk_exact"] = (
        lambda spark, sf: sim.cosine_topk(_t(spark, sf, "embeddings"), QIDS, k=5),
        f"""WITH {quant_ctes},
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM nv a JOIN nv b ON b.vec_id != a.vec_id
  WHERE a.vec_id IN ({qids_sql})),
scored AS (
  SELECT qid, vec_id,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS cosine
  FROM pairs),
ranked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
SELECT qid, rank, vec_id, cosine FROM ranked WHERE rank <= 5""")

    # -- PRE-filtered exact ANN (round 4; Lucene KnnFloatVectorQuery
    # acceptDocs / Solr {!knn}+fq semantics): candidates restricted to
    # lang='en' docs BEFORE scoring — each query's top-5 comes from the
    # filtered pool (post-filtering could return < 5).
    def ann_filtered(spark, sf):
        return sim.cosine_topk_filtered(
            _t(spark, sf, "embeddings"), _t(spark, sf, "documents"),
            F.col("lang") == "en", QIDS, k=5)
    e["ann_filtered_topk"] = (ann_filtered, f"""WITH {quant_ctes},
fpairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM nv a JOIN nv b ON b.vec_id != a.vec_id
  JOIN documents d ON b.vec_id = d.doc_id
  WHERE a.vec_id IN ({qids_sql}) AND d.lang = 'en'),
fscored AS (
  SELECT qid, vec_id,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS cosine
  FROM fpairs),
franked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM fscored)
SELECT qid, rank, vec_id, cosine FROM franked WHERE rank <= 5""")

    # -- MMR result diversification (round 4; Carbonell & Goldstein,
    # SIGIR 1998): greedy unrolled to k=3 in the oracle; (1-lam) is
    # written (1.0 - 0.7) so both sides use the identical f64 constant.
    def mmr(spark, sf):
        idx = index_for(spark, sf)
        emb = _t(spark, sf, "embeddings")
        return sim.mmr_rerank(idx, Or((Term("join"), Term("merge"))), emb,
                              k=3, window=12, lam=0.7, mode="f64")

    _m_score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count",
                              "g.sum_dl")

    def _ms(step_refs: str) -> str:
        return (f"0.7 * w.score - (1.0 - 0.7) * {step_refs}")

    _c1 = ("coalesce((SELECT c FROM cs WHERE va = w.doc_id AND "
           "vb = (SELECT doc_id FROM s1)), 0.0)")
    _c2 = ("coalesce((SELECT c FROM cs WHERE va = w.doc_id AND "
           "vb = (SELECT doc_id FROM s2)), 0.0)")
    e["search_mmr_diversified"] = (mmr, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {_m_score} AS s
  FROM tf JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE)
    AS score
  FROM term_scores GROUP BY doc_id),
w AS (SELECT doc_id, score FROM doc_scores
      ORDER BY score DESC, doc_id ASC LIMIT 12),
qv AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * 4096 + 0.5)::BIGINT) AS q
  FROM embeddings WHERE vec_id IN (SELECT doc_id FROM w)),
nv AS (SELECT vec_id, q,
              list_sum(list_transform(q, x -> x * x))::BIGINT AS norm2
       FROM qv),
cs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CASE WHEN a.norm2 = 0 OR b.norm2 = 0 THEN 0.0
              ELSE list_sum(list_transform(list_zip(a.q, b.q),
                                           z -> z[1] * z[2]))
                   / (sqrt(CAST(a.norm2 AS DOUBLE))
                      * sqrt(CAST(b.norm2 AS DOUBLE))) END AS c
  FROM nv a JOIN nv b ON a.vec_id != b.vec_id),
s1 AS (SELECT w.doc_id, {_ms("0.0")} AS mmr FROM w
       ORDER BY mmr DESC, doc_id ASC LIMIT 1),
s2 AS (SELECT w.doc_id, {_ms(_c1)} AS mmr FROM w
       WHERE w.doc_id != (SELECT doc_id FROM s1)
       ORDER BY mmr DESC, doc_id ASC LIMIT 1),
s3 AS (SELECT w.doc_id, {_ms(f"greatest({_c1}, {_c2})")} AS mmr FROM w
       WHERE w.doc_id NOT IN (SELECT doc_id FROM s1
                              UNION ALL SELECT doc_id FROM s2)
       ORDER BY mmr DESC, doc_id ASC LIMIT 1)
SELECT 1::BIGINT AS rank, doc_id,
       CAST(CAST(mmr AS REAL) AS DOUBLE) AS mmr FROM s1
UNION ALL
SELECT 2::BIGINT, doc_id, CAST(CAST(mmr AS REAL) AS DOUBLE) FROM s2
UNION ALL
SELECT 3::BIGINT, doc_id, CAST(CAST(mmr AS REAL) AS DOUBLE) FROM s3""")

    # -- int8 scalar quantization + compressed brute-force ANN (round 4;
    # standard absmax scheme; per-vector scales cancel in the cosine) --
    # -- 1-bit binary quantization + Hamming search (round 4; sign-
    # random-projection binary hashing, the 32x-compressed coarse mode
    # of modern vector stores): bit i of word j set iff x[32j+i] > 0
    # (32 dims/word keeps every word positive in both engines); query
    # words are plan literals, distance = summed popcount(xor).
    def binary_hamming(spark, sf):
        return sim.hamming_topk(_t(spark, sf, "embeddings"),
                                query_vec_id=0, dim=64, k=10)
    e["ann_binary_hamming_topk"] = (binary_hamming, """
WITH words AS (
  SELECT vec_id,
    CAST(coalesce(list_sum(list_transform(range(1, 33),
      i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 1))
           ELSE 0 END)), 0) AS BIGINT) AS w0,
    CAST(coalesce(list_sum(list_transform(range(33, 65),
      i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 33))
           ELSE 0 END)), 0) AS BIGINT) AS w1
  FROM embeddings),
qw AS (SELECT w0 AS q0, w1 AS q1 FROM words WHERE vec_id = 0)
SELECT w.vec_id,
       (bit_count(xor(w.w0, q.q0)) + bit_count(xor(w.w1, q.q1)))::BIGINT
         AS hamming
FROM words w CROSS JOIN qw q
WHERE w.vec_id != 0
ORDER BY hamming ASC, w.vec_id ASC LIMIT 10""")

    e["ann_int8_quantized_topk"] = (
        lambda spark, sf: sim.cosine_topk_int8(
            _t(spark, sf, "embeddings"), QIDS, k=5),
        f"""WITH
q8v AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
           AS scale,
         list_transform(embedding, x ->
           CASE WHEN list_max(list_transform(embedding,
                                             y -> abs(y::DOUBLE))) = 0.0
                THEN 0
                ELSE CAST(greatest(least(floor(x::DOUBLE /
                       (list_max(list_transform(embedding,
                                                y -> abs(y::DOUBLE)))
                        / 127.0) + 0.5), 127.0), -127.0) AS INT)
           END) AS q8
  FROM embeddings),
n8 AS (
  SELECT vec_id, q8,
         list_sum(list_transform(q8, v -> v::BIGINT * v::BIGINT))::BIGINT
           AS norm2_8
  FROM q8v),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         list_sum(list_transform(list_zip(a.q8, b.q8),
                                 z -> z[1]::BIGINT * z[2]::BIGINT))::BIGINT
           AS dot,
         a.norm2_8 AS qn, b.norm2_8 AS bn
  FROM n8 a JOIN n8 b ON b.vec_id != a.vec_id
  WHERE a.vec_id IN ({qids_sql})),
scored AS (
  SELECT qid, vec_id,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE)))
           AS cosine8
  FROM pairs),
ranked AS (
  SELECT qid, vec_id, cosine8,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine8 DESC, vec_id ASC)::BIGINT
           AS rank
  FROM scored)
SELECT qid, rank, vec_id, cosine8 FROM ranked WHERE rank <= 5""")

    # deterministic hyperplanes, mirrored literally in SQL
    planes = [[sim._plane_coeff(i, j) for j in range(64)] for i in range(8)]
    proj_terms = []
    for i, coeffs in enumerate(planes):
        arr = "[" + ", ".join(str(c) for c in coeffs) + "]"
        proj_terms.append(
            f"CASE WHEN list_sum(list_transform(list_zip({arr}, q), "
            f"z -> z[1] * z[2])) > 0 THEN {1 << i} ELSE 0 END")
    bucket_sql = "(" + " + ".join(proj_terms) + ")::BIGINT"

    e["ann_lsh_bucketed_topk"] = (
        lambda spark, sf: sim.lsh_cosine_topk(_t(spark, sf, "embeddings"), QIDS, k=5),
        f"""WITH {quant_ctes},
bk AS (SELECT vec_id, q, norm2, {bucket_sql} AS bucket FROM nv),
cand AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id, b.bucket AS bucket,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND b.vec_id != a.vec_id
  WHERE a.vec_id IN ({qids_sql})),
scored AS (
  SELECT qid, vec_id, bucket,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS cosine
  FROM cand),
ranked AS (
  SELECT qid, vec_id, bucket, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
SELECT qid, rank, vec_id, bucket, cosine FROM ranked WHERE rank <= 5""")

    e["ann_lsh_multiprobe_topk"] = (
        lambda spark, sf: sim.lsh_cosine_topk(_t(spark, sf, "embeddings"),
                                              QIDS, k=5, probes=1),
        f"""WITH {quant_ctes},
bk AS (SELECT vec_id, q, norm2, {bucket_sql} AS bucket FROM nv),
cand AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id, b.bucket AS bucket,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM bk a JOIN bk b
    ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND b.vec_id != a.vec_id
  WHERE a.vec_id IN ({qids_sql})),
scored AS (
  SELECT qid, vec_id, bucket,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS cosine
  FROM cand),
ranked AS (
  SELECT qid, vec_id, bucket, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
SELECT qid, rank, vec_id, bucket, cosine FROM ranked WHERE rank <= 5""")

    # embedding-cosine near-dup: LSH-bucket candidates + exact verify
    # (threshold 0.3 chosen so the driver fixture yields a non-trivial
    # pair set; production semantic dedup runs 0.9+)
    e["dedup_embedding_neardup"] = (
        lambda spark, sf: __import__("sparklucene.dedup", fromlist=["d"])
        .embedding_neardup_pairs(_t(spark, sf, "embeddings"),
                                 min_cosine=0.3),
        f"""WITH {quant_ctes},
bk AS (SELECT vec_id, q, norm2, {bucket_sql} AS bucket FROM nv),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS na, b.norm2 AS nb
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b,
       dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
FROM pairs
WHERE dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= 0.3""")

    # IVF coarse-quantizer ANN: the k-means is deterministic integer
    # arithmetic on the 1/4096 grid (md5-hash seed init, integer-sum
    # centroids, fixed 2 Lloyd iterations), so the WHOLE pipeline —
    # seeds, both update steps, final assignment, probe, cosine top-k —
    # unrolls into SQL and the driver gets a full hash check (plus the
    # independent numpy mirror in tests/test_pipeline_ops.py).
    def _ivf_assign(name: str, cents: str) -> str:
        """One Lloyd assignment pass as a CTE: argmax_j dot(q, S_j) /
        sqrt(snorm2_j), ties to the smallest centroid id — the exact
        float expression of similarity._centroid_scores."""
        return f"""{name} AS (
  SELECT vec_id, cid AS centroid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(list_zip(v.q, c.s), z -> z[1] * z[2]))::BIGINT
               / sqrt(CAST(c.snorm2 AS DOUBLE)) DESC, c.cid ASC) AS rn
    FROM nv v CROSS JOIN {cents} c)
  WHERE rn = 1)"""

    def _ivf_update(i: int) -> str:
        """Centroid rebuild as per-dimension integer sums; an emptied or
        cancelled-to-zero cluster keeps its previous state."""
        return f"""u{i} AS (
  SELECT a.centroid AS cid, qd.dim, sum(qd.val)::BIGINT AS s
  FROM a{i} a JOIN qd ON a.vec_id = qd.vec_id
  GROUP BY a.centroid, qd.dim),
u{i}l AS (SELECT cid, list(s ORDER BY dim) AS snew FROM u{i} GROUP BY cid),
c{i} AS (
  SELECT p.cid,
         CASE WHEN u.snew IS NOT NULL
                   AND list_sum(list_transform(u.snew, x -> x * x)) > 0
              THEN u.snew ELSE p.s END AS s
  FROM c{i - 1}n p LEFT JOIN u{i}l u ON p.cid = u.cid),
c{i}n AS (
  SELECT cid, s, list_sum(list_transform(s, x -> x * x))::BIGINT AS snorm2
  FROM c{i})"""

    ivf_sql = f"""WITH {quant_ctes},
qd AS (
  SELECT vec_id, unnest(q) AS val, unnest(range(len(q))) AS dim FROM nv),
seeds AS (
  SELECT vec_id, q, norm2 FROM (
    SELECT vec_id, q, norm2,
           ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM nv WHERE norm2 > 0
    ORDER BY h, vec_id LIMIT 4)),
c0n AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS s,
         norm2::BIGINT AS snorm2
  FROM seeds),
{_ivf_assign("a1", "c0n")},
{_ivf_update(1)},
{_ivf_assign("a2", "c1n")},
{_ivf_update(2)},
{_ivf_assign("a3", "c2n")},
probe AS (
  SELECT vec_id AS qid, centroid AS pc FROM a3 WHERE vec_id IN ({qids_sql})),
cand AS (
  SELECT p.qid, v.vec_id, v.centroid,
         list_sum(list_transform(list_zip(qq.q, vv.q), z -> z[1] * z[2]))::BIGINT AS dot,
         qq.norm2 AS qn, vv.norm2 AS bn
  FROM a3 v
  JOIN probe p ON v.centroid = p.pc AND v.vec_id != p.qid
  JOIN nv vv ON vv.vec_id = v.vec_id
  JOIN nv qq ON qq.vec_id = p.qid),
scored AS (
  SELECT qid, vec_id, centroid,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS cosine
  FROM cand),
ranked AS (
  SELECT qid, vec_id, centroid, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM scored)
SELECT qid, rank, vec_id, centroid, cosine FROM ranked WHERE rank <= 5"""

    e["ann_ivf_topk"] = (
        lambda spark, sf: sim.ivf_cosine_topk(_t(spark, sf, "embeddings"),
                                              QIDS, k=5, n_centroids=4,
                                              iters=2, nprobe=1),
        ivf_sql)

    # -- SemDeDup (round 4; Abbas et al. 2023): cluster embeddings with
    # the SAME pinned k-means as ann_ivf_topk, then drop any doc with a
    # smaller-id same-cluster neighbor at cosine >= 0.9 (the id-ordered
    # deterministic variant of the paper's random-order greedy). The
    # oracle reuses the seeds/a1..a3/u1..u2 CTE chain verbatim (over a
    # redefined nv), then forms within-cluster pairs only. The synthetic
    # embeddings are near-orthogonal (max pairwise cosine ~0.51), so the
    # pinned fixture rule both sides apply — every vec_id % 17 == 5 row
    # gains an exact copy at id+10_000_000 — makes the rule bite:
    # each copy lands in its original's cluster and is dropped by it.
    def semdedup(spark, sf):
        from sparklucene import dedup as _dd
        emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        aug = (emb.filter(F.col("vec_id") % 17 == 5)
               .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                       "embedding"))
        return _dd.semantic_dedup(emb.unionByName(aug),
                                  n_clusters=4, iters=2, min_cosine=0.9)
    semdedup_sql = f"""WITH sd_base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id, embedding FROM embeddings
  WHERE vec_id % 17 = 5),
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 4096 + 0.5)::BIGINT) AS q
  FROM sd_base),
nv AS (
  SELECT vec_id, q,
         list_sum(list_transform(q, x -> x * x))::BIGINT AS norm2
  FROM qv),
qd AS (
  SELECT vec_id, unnest(q) AS val, unnest(range(len(q))) AS dim FROM nv),
seeds AS (
  SELECT vec_id, q, norm2 FROM (
    SELECT vec_id, q, norm2,
           ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM nv WHERE norm2 > 0
    ORDER BY h, vec_id LIMIT 4)),
c0n AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS s,
         norm2::BIGINT AS snorm2
  FROM seeds),
{_ivf_assign("a1", "c0n")},
{_ivf_update(1)},
{_ivf_assign("a2", "c1n")},
{_ivf_update(2)},
{_ivf_assign("a3", "c2n")},
sd_pairs AS (
  SELECT b.vec_id AS vec_id, b.centroid AS centroid,
         a.vec_id AS dropped_by,
         list_sum(list_transform(list_zip(x.q, y.q), z -> z[1] * z[2]))::BIGINT
           / (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE)))
           AS cosine
  FROM a3 a JOIN a3 b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
  JOIN nv x ON x.vec_id = a.vec_id
  JOIN nv y ON y.vec_id = b.vec_id
  WHERE x.norm2 > 0 AND y.norm2 > 0),
sd_hit AS (
  SELECT vec_id, centroid, dropped_by, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dropped_by ASC) AS rn
  FROM sd_pairs WHERE cosine >= 0.9)
SELECT vec_id, centroid, dropped_by, cosine FROM sd_hit WHERE rn = 1"""
    e["dedup_semantic_semdedup"] = (semdedup, semdedup_sql)

    # -- Product quantization ADC (round 4; Jégou et al., TPAMI 2011):
    # m=4 subspace codebooks learned by the SAME pinned integer k-means
    # as ann_ivf_topk, one per subspace; candidates scored from their
    # codes alone (ADC lookup tables). The whole pipeline — per-subspace
    # seeds, 2 Lloyd iterations, final codes, LUT scoring — unrolls into
    # SQL, so the driver gets a full hash check.
    PQ_M, PQ_KSUB, PQ_DIM = 4, 4, 64
    PQ_D = PQ_DIM // PQ_M

    def _pq_sub_ctes(j: int) -> str:
        a, b = j * PQ_D + 1, (j + 1) * PQ_D
        return f"""svn{j} AS (
  SELECT vec_id, q[{a}:{b}] AS sq,
         list_sum(list_transform(q[{a}:{b}], x -> x * x))::BIGINT AS sn2
  FROM nv),
svd{j} AS (
  SELECT vec_id, unnest(sq) AS val, unnest(range(len(sq))) AS dim FROM svn{j}),
pqseeds{j} AS (
  SELECT vec_id, sq FROM (
    SELECT vec_id, sq,
           ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM svn{j} WHERE sn2 > 0
    ORDER BY h, vec_id LIMIT {PQ_KSUB})),
pc{j}_0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, sq AS s,
         1::BIGINT AS n,
         list_sum(list_transform(sq, x -> x * x))::BIGINT AS snorm2
  FROM pqseeds{j})"""

    def _pq_assign(j: int, i: int) -> str:
        return f"""pa{j}_{i} AS (
  SELECT vec_id, cid AS code FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             list_sum(list_transform(list_zip(v.sq, c.s), z -> z[1] * z[2]))::BIGINT
               / sqrt(CAST(c.snorm2 AS DOUBLE)) DESC, c.cid ASC) AS rn
    FROM svn{j} v CROSS JOIN pc{j}_{i - 1} c)
  WHERE rn = 1)"""

    def _pq_update(j: int, i: int) -> str:
        return f"""pu{j}_{i} AS (
  SELECT a.code AS cid, d.dim, sum(d.val)::BIGINT AS s,
         count(*)::BIGINT AS cnt
  FROM pa{j}_{i} a JOIN svd{j} d ON a.vec_id = d.vec_id
  GROUP BY a.code, d.dim),
pul{j}_{i} AS (
  SELECT cid, list(s ORDER BY dim) AS snew, max(cnt) AS n
  FROM pu{j}_{i} GROUP BY cid),
pcp{j}_{i} AS (
  SELECT p.cid,
         CASE WHEN u.snew IS NOT NULL
                   AND list_sum(list_transform(u.snew, x -> x * x)) > 0
              THEN u.snew ELSE p.s END AS s,
         CASE WHEN u.snew IS NOT NULL
                   AND list_sum(list_transform(u.snew, x -> x * x)) > 0
              THEN u.n ELSE p.n END AS n
  FROM pc{j}_{i - 1} p LEFT JOIN pul{j}_{i} u ON p.cid = u.cid),
pc{j}_{i} AS (
  SELECT cid, s, n, list_sum(list_transform(s, x -> x * x))::BIGINT AS snorm2
  FROM pcp{j}_{i})"""

    def _pq_contrib(j: int) -> str:
        a, b = j * PQ_D + 1, (j + 1) * PQ_D
        return f"""pct{j} AS (
  SELECT q.qid, v.vec_id,
         CAST(list_sum(list_transform(list_zip(q.qq[{a}:{b}], c.s),
                                      z -> z[1] * z[2]))::BIGINT AS DOUBLE)
           / c.n AS dj,
         CAST(c.snorm2 AS DOUBLE) / (c.n * c.n) AS rj
  FROM pa{j}_3 v JOIN pc{j}_2 c ON v.code = c.cid
  CROSS JOIN pq_q q
  WHERE v.vec_id != q.qid)"""

    _pq_kmeans = ",\n".join(
        _pq_sub_ctes(j) + ",\n" + _pq_assign(j, 1) + ",\n"
        + _pq_update(j, 1) + ",\n" + _pq_assign(j, 2) + ",\n"
        + _pq_update(j, 2) + ",\n" + _pq_assign(j, 3)
        for j in range(PQ_M))
    _pq_contribs = ",\n".join(_pq_contrib(j) for j in range(PQ_M))
    pq_sql = f"""WITH {quant_ctes},
{_pq_kmeans},
pq_q AS (
  SELECT vec_id AS qid, q AS qq, norm2 AS qnorm2
  FROM nv WHERE vec_id IN ({qids_sql})),
{_pq_contribs},
pq_tot AS (
  SELECT t0.qid, t0.vec_id,
         (t0.dj + t1.dj + t2.dj + t3.dj)
           / (sqrt(CAST(q.qnorm2 AS DOUBLE))
              * sqrt((t0.rj + t1.rj + t2.rj + t3.rj))) AS adc_cosine
  FROM pct0 t0
  JOIN pct1 t1 ON t0.qid = t1.qid AND t0.vec_id = t1.vec_id
  JOIN pct2 t2 ON t0.qid = t2.qid AND t0.vec_id = t2.vec_id
  JOIN pct3 t3 ON t0.qid = t3.qid AND t0.vec_id = t3.vec_id
  JOIN pq_q q ON t0.qid = q.qid),
pq_ranked AS (
  SELECT qid, vec_id, adc_cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_cosine DESC, vec_id ASC)::BIGINT AS rank
  FROM pq_tot)
SELECT qid, rank, vec_id, adc_cosine FROM pq_ranked WHERE rank <= 5"""

    e["ann_pq_adc_topk"] = (
        lambda spark, sf: sim.pq_adc_topk(_t(spark, sf, "embeddings"),
                                          QIDS, k=5, m=4, ksub=4, iters=2),
        pq_sql)

    # -- Hybrid BM25 + vector retrieval fused by Reciprocal Rank Fusion
    # (round 4; Cormack, Clarke & Buettcher, SIGIR 2009 — the standard
    # calibration-free hybrid-search combiner): lexical top-20 for
    # 'merge OR spark' fused with exact-cosine top-20 neighbors of
    # embedding vec_id=0. The oracle recomputes BOTH lists from raw
    # parquet (full BM25 CTE chain + integer-grid cosine), then applies
    # 1/(60+rank) with the same lexical-first addition order.
    def hybrid(spark, sf):
        idx = index_for(spark, sf)
        return sim.hybrid_rrf_topk(
            idx, Or((Term("merge"), Term("spark"))),
            _t(spark, sf, "embeddings"), query_vec_id=0,
            k=10, k_lex=20, k_vec=20, rrf_k=60, mode="f64")

    _hy_score = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                               "g.sum_dl")
    # shared list-building CTEs for both fusion oracles (RRF + linear)
    _hy_prefix = f"""{corpus_ctes()},
{quant_ctes},
hy_ts AS (
  SELECT tf.doc_id, {_hy_score} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
hy_lex AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM hy_ts GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 20),
hy_pairs AS (
  SELECT b.vec_id,
         list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]))::BIGINT AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM nv a JOIN nv b ON b.vec_id != a.vec_id
  WHERE a.vec_id = 0)"""
    hybrid_sql = f"""WITH {_hy_prefix},
hy_lexr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS lex_rank
  FROM hy_lex),
hy_vecr AS (
  SELECT vec_id AS doc_id, vrank AS vec_rank FROM (
    SELECT vec_id,
           row_number() OVER (
             ORDER BY dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) DESC,
                      vec_id ASC)::BIGINT AS vrank
    FROM hy_pairs)
  WHERE vrank <= 20),
hy_fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + l.lex_rank AS DOUBLE),
                  CAST(0.0 AS DOUBLE))
       + coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + v.vec_rank AS DOUBLE),
                  CAST(0.0 AS DOUBLE)) AS rrf_score
  FROM hy_lexr l FULL OUTER JOIN hy_vecr v ON l.doc_id = v.doc_id),
hy_ranked AS (
  SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)::BIGINT AS rank,
         doc_id, rrf_score, lex_rank, vec_rank
  FROM hy_fused)
SELECT rank, doc_id, rrf_score, lex_rank, vec_rank
FROM hy_ranked WHERE rank <= 10"""

    e["hybrid_rrf_search"] = (hybrid, hybrid_sql)

    # -- Hybrid fusion, min-max-normalized weighted sum (round 4; the
    # other standard metasearch combiner — Montague & Aslam, CIKM 2001):
    # same two lists; each normalized over its own retrieved set,
    # fused = 0.5*lex_norm + 0.5*vec_norm, missing list contributes 0.
    def hybrid_lin(spark, sf):
        idx = index_for(spark, sf)
        return sim.hybrid_linear_topk(
            idx, Or((Term("merge"), Term("spark"))),
            _t(spark, sf, "embeddings"), query_vec_id=0,
            k=10, k_lex=20, k_vec=20, w_lex=0.5, w_vec=0.5, mode="f64")

    hybrid_lin_sql = f"""WITH {_hy_prefix},
hyl_mm AS (SELECT min(score) AS mn, max(score) AS mx FROM hy_lex),
hyl_n AS (
  SELECT l.doc_id,
         CASE WHEN m.mx = m.mn THEN CAST(1.0 AS DOUBLE)
              ELSE (l.score - m.mn) / (m.mx - m.mn) END AS lex_norm
  FROM hy_lex l CROSS JOIN hyl_mm m),
hyv AS (
  SELECT vec_id AS doc_id,
         dot / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(bn AS DOUBLE))) AS c
  FROM hy_pairs),
hyv_top AS (
  SELECT doc_id, c FROM (
    SELECT doc_id, c,
           row_number() OVER (ORDER BY c DESC, doc_id ASC) AS rn FROM hyv)
  WHERE rn <= 20),
hyv_mm AS (SELECT min(c) AS mn, max(c) AS mx FROM hyv_top),
hyv_n AS (
  SELECT v.doc_id,
         CASE WHEN m.mx = m.mn THEN CAST(1.0 AS DOUBLE)
              ELSE (v.c - m.mn) / (m.mx - m.mn) END AS vec_norm
  FROM hyv_top v CROSS JOIN hyv_mm m),
hy_fused2 AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_norm, v.vec_norm,
         coalesce(CAST(0.5 AS DOUBLE) * l.lex_norm, CAST(0.0 AS DOUBLE))
       + coalesce(CAST(0.5 AS DOUBLE) * v.vec_norm, CAST(0.0 AS DOUBLE))
           AS fused
  FROM hyl_n l FULL OUTER JOIN hyv_n v ON l.doc_id = v.doc_id),
hy_ranked2 AS (
  SELECT row_number() OVER (ORDER BY fused DESC, doc_id ASC)::BIGINT AS rank,
         doc_id, fused, lex_norm, vec_norm
  FROM hy_fused2)
SELECT rank, doc_id, fused, lex_norm, vec_norm
FROM hy_ranked2 WHERE rank <= 10"""

    e["hybrid_linear_search"] = (hybrid_lin, hybrid_lin_sql)

    # -- ClusteringComponent (round 3; u8:solr/contrib/clustering/...
    # /CarrotClusteringEngine.java user surface): top-30 hits of a BM25
    # query k-means-clustered on their embeddings. The oracle restricts
    # nv/qd to the winner set, then reuses the SAME unrolled-k-means CTEs
    # as ann_ivf_topk (seeds, a1..a3, u1..u2) verbatim.
    _cl_score = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                               "g.sum_dl")

    def clustered(spark, sf):
        idx = index_for(spark, sf)
        return sim.cluster_results(idx, Or((Term("merge"), Term("spark"))),
                                   _t(spark, sf, "embeddings"), k_docs=30,
                                   n_clusters=4, iters=2, mode="f64")
    e["cluster_search_results"] = (clustered, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {_cl_score} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
top AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 30),
qv AS (
  SELECT e.vec_id,
         list_transform(e.embedding, x -> floor(x::DOUBLE * 4096 + 0.5)::BIGINT) AS q
  FROM embeddings e JOIN top t ON e.vec_id = t.doc_id),
nv AS (
  SELECT vec_id, q,
         list_sum(list_transform(q, x -> x * x))::BIGINT AS norm2
  FROM qv),
qd AS (
  SELECT vec_id, unnest(q) AS val, unnest(range(len(q))) AS dim FROM nv),
seeds AS (
  SELECT vec_id, q, norm2 FROM (
    SELECT vec_id, q, norm2,
           ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM nv WHERE norm2 > 0
    ORDER BY h, vec_id LIMIT 4)),
c0n AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS s,
         norm2::BIGINT AS snorm2
  FROM seeds),
{_ivf_assign("a1", "c0n")},
{_ivf_update(1)},
{_ivf_assign("a2", "c1n")},
{_ivf_update(2)},
{_ivf_assign("a3", "c2n")}
SELECT t.doc_id, t.score, a3.centroid AS cluster
FROM top t JOIN a3 ON t.doc_id = a3.vec_id
ORDER BY cluster ASC, score DESC, doc_id ASC""")

    return e


def _routed_entries() -> dict[str, tuple[Callable, str | None]]:
    """Document routing / sharded collections (Solr implicit/compositeId
    routing, u8:solr/solrj/.../ImplicitDocRouter.java). Per-route
    sub-indexes are built through index_for (locked, disk-cached); a
    routes.json manifest with absolute dirs makes them a routed
    collection for sparklucene.routing.routed_search. Scoring is
    PER-SHARD statistics — Solr's default distributed IDF behavior
    (u8:solr/core/.../search/stats/LocalStatsCache.java) — which the
    oracles reproduce by computing every BM25 statistic within the
    route's sub-corpus only."""
    import json as _json

    e: dict[str, tuple[Callable, str | None]] = {}
    q_ms = Or((Term("merge"), Term("spark")))
    tsc = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                         "g.sum_dl")
    stop = stoplist_sql()

    def _routed_base(spark: SparkSession, sf_dir: str) -> str:
        langs = sorted(
            r[0] for r in _t(spark, sf_dir, "documents")
            .select("lang").distinct().collect())
        manifest = {}
        for lg in langs:
            idx = index_for(
                spark, sf_dir, variant=f"rt-{lg}",
                transform=lambda c, lg=lg: c.filter(F.col("lang") == lg))
            manifest[lg] = {"dir": idx.paths.root,
                            "n_docs": idx.stats["n_docs"]}
        base = os.path.join("/tmp", "sparklucene-idx",
                            os.path.basename(os.path.realpath(sf_dir))
                            + "-routed")
        os.makedirs(base, exist_ok=True)
        tmp = os.path.join(base, "routes.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump({"route_col": "lang", "routes": manifest}, fh,
                       sort_keys=True)
        os.replace(tmp, os.path.join(base, "routes.json"))
        return base

    def single_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_search
        base = _routed_base(spark, sf_dir)
        return routed_search(spark, base, q_ms, route="en", k=10,
                             mode="f64")
    # per-shard stats: every CTE runs inside the lang='en' sub-corpus
    e["routed_search_single_shard"] = (single_shard, f"""WITH docs_r AS (
  SELECT * FROM documents WHERE lang = 'en'),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM docs_r),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop} GROUP BY doc_id, term),
doclen AS (
  SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM docs_r d
  LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS dl FROM tok
             WHERE term NOT IN {stop} GROUP BY doc_id) t USING (doc_id)),
meta AS (
  SELECT doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq FROM doclen),
gstats AS (
  SELECT count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl FROM meta),
tstats AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY term),
term_scores AS (
  SELECT tf.doc_id, {tsc} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
       'en' AS route
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_search
        base = _routed_base(spark, sf_dir)
        return routed_search(spark, base, q_ms, route=None, k=10,
                             mode="f64")
    # fan-out merge: per-LANG statistics throughout, global (score, doc)
    # top-k — the union of per-shard top-10s contains the global top-10
    e["routed_search_fanout"] = (fanout, f"""WITH tok AS (
  SELECT d.lang, d.doc_id,
         unnest(regexp_extract_all(lower(d.text), '{TOKEN_RE_SQL}')) AS term
  FROM documents d),
tf AS (
  SELECT lang, doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop} GROUP BY lang, doc_id, term),
doclen AS (
  SELECT d.lang, d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS dl FROM tok
             WHERE term NOT IN {stop} GROUP BY doc_id) t USING (doc_id)),
meta AS (
  SELECT lang, doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq
  FROM doclen),
gstats AS (
  SELECT lang, count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl FROM meta GROUP BY lang),
tstats AS (
  SELECT lang, term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY lang, term),
term_scores AS (
  SELECT tf.lang, tf.doc_id, {tsc} AS s
  FROM tf
  JOIN tstats ts ON tf.lang = ts.lang AND tf.term = ts.term
  JOIN meta m ON tf.lang = m.lang AND tf.doc_id = m.doc_id
  JOIN gstats g ON tf.lang = g.lang
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
       lang AS route
FROM term_scores GROUP BY lang, doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # ---- ExactStatsCache fan-out (round 4; u8:solr/core/.../search/
    # stats/ExactStatsCache.java): merged global df/doc_count before
    # scoring — distributed ranking equals one unrouted index, so the
    # oracle computes WHOLE-CORPUS statistics and tags each hit with its
    # shard (the doc's lang)
    def fanout_global(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_search
        base = _routed_base(spark, sf_dir)
        return routed_search(spark, base, q_ms, route=None, k=10,
                             mode="f64", stats="global")
    e["routed_search_global_stats"] = (fanout_global, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tsc} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark'))
SELECT s.doc_id AS doc_id,
       CAST(CAST(sum(CAST(s.s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
       any_value(d.lang) AS route
FROM term_scores s JOIN documents d ON s.doc_id = d.doc_id
GROUP BY s.doc_id
ORDER BY score DESC, s.doc_id ASC LIMIT 10""")

    # ---- distributed faceting with refinement (round 4;
    # u8:solr/core/.../handler/component/FacetComponent.java
    # DistribFieldFacet): phase 1 ships each shard's top
    # (limit + overrequest) buckets; phase 2 asks shards for exact
    # counts of candidates they did not report. With refinement the
    # top-`limit` equals the UNSHARDED facet — which is exactly what
    # the oracle computes (matching docs -> source counts, top 5).
    def routed_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_facet_field
        base = _routed_base(spark, sf_dir)
        return routed_facet_field(
            spark, base, Term("merge"), _t(spark, sf_dir, "documents"),
            "source", limit=5)
    e["routed_facet_refined"] = (routed_facet, f"""WITH {corpus_ctes()}
SELECT source AS value, count(*)::BIGINT AS cnt
FROM documents
WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
GROUP BY source ORDER BY cnt DESC, value ASC LIMIT 5""")

    # ---- two-phase distributed grouping (round 4;
    # u8:solr/core/.../search/grouping/distributed/command/
    # {SearchGroupsFieldCommand,TopGroupsFieldCommand}.java): phase 1
    # merges per-shard top-3 groups by group head; phase 2 merges each
    # shard's within-group top-2. For max-score heads the two-phase
    # merge is provably exact (see routed_grouped_topk's docstring), so
    # the oracle's replay of the pipeline equals the unsharded grouped
    # top-k; shard column = lang.
    # stats="global" (ExactStatsCache) makes doc scores the unrouted
    # engine's, which is what the oracle's global BM25 CTE computes.
    def routed_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_grouped_topk
        base = _routed_base(spark, sf_dir)
        return routed_grouped_topk(
            spark, base, q_ms, _t(spark, sf_dir, "documents"), "source",
            n_groups=3, group_limit=2, stats="global")
    e["routed_grouping_topk"] = (routed_grouping, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tsc} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id),
s1 AS (
  SELECT d.lang AS shard, d.source AS grp, ds.doc_id, ds.score
  FROM doc_scores ds JOIN documents d USING (doc_id)),
sheads AS (
  SELECT shard, grp, max(score) AS shead FROM s1 GROUP BY shard, grp),
p1 AS (
  SELECT shard, grp FROM (
    SELECT shard, grp, row_number() OVER (
      PARTITION BY shard ORDER BY shead DESC, grp ASC) AS r
    FROM sheads) WHERE r <= 3),
cand AS (SELECT DISTINCT grp FROM p1),
p2 AS (
  SELECT s1.shard, s1.grp, s1.doc_id, s1.score,
         row_number() OVER (PARTITION BY s1.shard, s1.grp
                            ORDER BY score DESC, doc_id ASC) AS sr
  FROM s1 WHERE s1.grp IN (SELECT grp FROM cand)),
merged AS (
  SELECT grp, doc_id, score,
         row_number() OVER (PARTITION BY grp
                            ORDER BY score DESC, doc_id ASC)::BIGINT AS rk
  FROM p2 WHERE sr <= 2),
mtop AS (SELECT * FROM merged WHERE rk <= 2),
ghead AS (
  SELECT grp, max(score) AS head FROM mtop GROUP BY grp
  ORDER BY head DESC, grp ASC LIMIT 3)
SELECT m.grp, g.head, m.rk, m.doc_id, m.score
FROM mtop m JOIN ghead g USING (grp)
ORDER BY g.head DESC, m.grp ASC, m.rk ASC""")

    # ---- distributed suggester merge (round 4; u8:solr/core/.../
    # handler/component/SpellCheckComponent.java finishStage): shards
    # ship their full prefix dictionary slice (vocab-scale, prefix
    # pushdown), the coordinator sums df/cf — shards partition docs, so
    # the sums ARE the global stats and the merge equals the unsharded
    # suggester exactly.
    def routed_sugg(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import routed_suggest
        base = _routed_base(spark, sf_dir)
        return routed_suggest(spark, base, "s", k=8)
    e["routed_suggest_merged"] = (routed_sugg, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats
WHERE term LIKE 's%' ORDER BY cf DESC, term ASC LIMIT 8""")

    # ---- CompositeId hash-range router (round 4;
    # u8:solr/solrj/.../common/cloud/CompositeIdRouter.java): ring hash
    # (hash16(lang) << 16) | hash16(doc_id), 4 contiguous shard ranges,
    # `_route_=en!` pruning to the 2^16-wide prefix window. The oracle
    # recomputes the sha256-based ring position per doc in SQL, keeps
    # only the shard(s) covering en's window, and scores each shard with
    # its LOCAL statistics (Solr default)."""
    def _hashed_base(spark: SparkSession, sf_dir: str) -> str:
        from sparklucene.routing import RING, _hash32_col
        n_shards = 4
        hcol = _hash32_col("doc_id", "lang")
        manifest = {}
        # one tiny count-agg finds populated ring ranges (an empty shard
        # is dir=None in the manifest — build_hashed_index's convention;
        # build_index itself refuses an empty corpus)
        shard_expr = F.shiftright(_hash32_col("doc_id", "lang")
                                  * F.lit(n_shards), 32)
        counts = {int(r[0]): int(r[1])
                  for r in _t(spark, sf_dir, "documents")
                  .groupBy(shard_expr.alias("s")).count().collect()}
        for s in range(n_shards):
            n_docs = counts.get(s, 0)
            entry = {"dir": None, "n_docs": n_docs,
                     "range": [-(-RING * s // n_shards) if s else 0,
                               -(-RING * (s + 1) // n_shards)]}
            if n_docs:
                idx = index_for(
                    spark, sf_dir, variant=f"hs4-{s}",
                    transform=lambda c, s=s: c.filter(
                        F.shiftright(_hash32_col("doc_id", "lang")
                                     * F.lit(n_shards), 32) == s))
                entry["dir"] = idx.paths.root
            manifest[f"s{s}"] = entry
        base = os.path.join("/tmp", "sparklucene-idx",
                            os.path.basename(os.path.realpath(sf_dir))
                            + "-hashed4")
        os.makedirs(base, exist_ok=True)
        tmp = os.path.join(base, "routes.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump({"router": "compositeId", "n_shards": n_shards,
                        "id_col": "doc_id", "shard_key_col": "lang",
                        "routes": manifest}, fh, sort_keys=True)
        os.replace(tmp, os.path.join(base, "routes.json"))
        return base

    def hashed_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.routing import hashed_search
        base = _hashed_base(spark, sf_dir)
        return hashed_search(spark, base, q_ms, route_key="en", k=10,
                             mode="f64")
    _h16 = "(('0x' || substr(sha256({x}), 1, 4))::UBIGINT)"
    _hdoc = (f"(({_h16.format(x='lang')}::BIGINT << 16) | "
             f"{_h16.format(x='CAST(doc_id AS VARCHAR)')}::BIGINT)")
    _enlo = f"({_h16.format(x=chr(39) + 'en' + chr(39))}::BIGINT << 16)"
    e["hashed_search_route_key"] = (hashed_by_key, f"""WITH sharded AS (
  SELECT d.*, ({_hdoc} * 4) >> 32 AS shard FROM documents d),
covered AS (
  SELECT DISTINCT s FROM (VALUES (({_enlo} * 4) >> 32),
                                 ((({_enlo} | 65535) * 4) >> 32)) v(s)),
docs_r AS (SELECT * FROM sharded WHERE shard IN (SELECT s FROM covered)),
tok AS (
  SELECT shard, doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM docs_r),
tf AS (
  SELECT shard, doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop} GROUP BY shard, doc_id, term),
doclen AS (
  SELECT d.shard, d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM docs_r d
  LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS dl FROM tok
             WHERE term NOT IN {stop} GROUP BY doc_id) t USING (doc_id)),
meta AS (
  SELECT shard, doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq
  FROM doclen),
gstats AS (
  SELECT shard, count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl FROM meta GROUP BY shard),
tstats AS (
  SELECT shard, term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY shard, term),
term_scores AS (
  SELECT tf.shard, tf.doc_id, {tsc} AS s
  FROM tf
  JOIN tstats ts ON tf.shard = ts.shard AND tf.term = ts.term
  JOIN meta m ON tf.shard = m.shard AND tf.doc_id = m.doc_id
  JOIN gstats g ON tf.shard = g.shard
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
       's' || CAST(shard AS VARCHAR) AS route
FROM term_scores GROUP BY shard, doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # ---- time-routed alias (round 4; u8:solr/core/.../cloud/api/
    # collections/TimeRoutedAlias.java): month buckets over the pinned
    # derived timestamp 2025-01-01 + (doc_id % 90) days (the fixture
    # convention — documents carry no timestamp column); a Feb 1 –
    # Mar 31 window opens only the 2025-02/2025-03 buckets, scored with
    # per-bucket LOCAL stats
    _TS = ("timestampadd(DAY, CAST(doc_id % 90 AS INT), "
           "timestamp'2025-01-01 00:00:00')")

    def _tra_base(spark: SparkSession, sf_dir: str) -> str:
        buckets = ("2025-01", "2025-02", "2025-03")
        manifest = {}
        for b in buckets:
            idx = index_for(
                spark, sf_dir, variant=f"tra-{b}",
                transform=lambda c, b=b: c.filter(
                    F.date_format(F.expr(_TS), "yyyy-MM") == b))
            manifest[b] = {"dir": idx.paths.root,
                           "n_docs": idx.stats["n_docs"]}
        base = os.path.join("/tmp", "sparklucene-idx",
                            os.path.basename(os.path.realpath(sf_dir))
                            + "-tra")
        os.makedirs(base, exist_ok=True)
        tmp = os.path.join(base, "routes.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump({"router": "time", "ts_col": "ts",
                        "interval": "month", "routes": manifest}, fh,
                       sort_keys=True)
        os.replace(tmp, os.path.join(base, "routes.json"))
        return base

    def tra_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        from datetime import date as _date

        from sparklucene.routing import time_routed_search
        base = _tra_base(spark, sf_dir)
        return time_routed_search(spark, base, q_ms, _date(2025, 2, 1),
                                  _date(2025, 3, 31), k=10, mode="f64")
    e["time_routed_search_window"] = (tra_window, f"""WITH bucketed AS (
  SELECT d.*, strftime(DATE '2025-01-01'
         + ((doc_id % 90)::INT * INTERVAL 1 DAY), '%Y-%m') AS b
  FROM documents d),
docs_r AS (SELECT * FROM bucketed WHERE b IN ('2025-02', '2025-03')),
tok AS (
  SELECT b, doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM docs_r),
tf AS (
  SELECT b, doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop} GROUP BY b, doc_id, term),
doclen AS (
  SELECT d.b, d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM docs_r d
  LEFT JOIN (SELECT doc_id, count(*)::BIGINT AS dl FROM tok
             WHERE term NOT IN {stop} GROUP BY doc_id) t USING (doc_id)),
meta AS (
  SELECT b, doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq
  FROM doclen),
gstats AS (
  SELECT b, count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl FROM meta GROUP BY b),
tstats AS (
  SELECT b, term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY b, term),
term_scores AS (
  SELECT tf.b, tf.doc_id, {tsc} AS s
  FROM tf
  JOIN tstats ts ON tf.b = ts.b AND tf.term = ts.term
  JOIN meta m ON tf.b = m.b AND tf.doc_id = m.doc_id
  JOIN gstats g ON tf.b = g.b
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id,
       CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
       b AS route
FROM term_scores GROUP BY b, doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    return e


def _intervals_entries() -> dict[str, tuple[Callable, str | None]]:
    """Minimal intervals slice (u8:lucene/queries/.../intervals/ —
    Intervals.maxwidth over ordered/unordered): proximity co-occurrence
    queries through the full engine path (query.Within), scored with the
    summed-idf phrase weight; oracles re-derive anchors/chases from raw
    token positions in SQL (same position CTEs as the sloppy phrase)."""
    e: dict[str, tuple[Callable, str | None]] = {}
    e["intervals_ordered_within"] = (
        _bm25(Within(("fast", "key", "scan"), window=8, ordered=True), k=10),
        within_topk_sql(("fast", "key", "scan"), 8, True, k=10))
    e["intervals_unordered_within"] = (
        _bm25(Within(("merge", "join"), window=6, ordered=False), k=10),
        within_topk_sql(("merge", "join"), 6, False, k=10))

    # nested span algebra (round 4; u8:lucene/core/.../search/spans/
    # {SpanNearQuery,SpanOrQuery,SpanNotQuery}.java): composable trees —
    # SpanNear over SpanOr, SpanNot exclusion — through the full engine
    # path (query.Span / spans.eval_spans); the SQL oracle re-derives the
    # span sets from raw token positions with the same pinned spec
    # (span_topk_sql emits one CTE per tree node)
    from sparklucene.query import Span
    from sparklucene.spans import (SpanNearNode as _SN, SpanNotNode as _SX,
                                   SpanOrNode as _SO, SpanTerm as _ST)
    _nested_ord = _SN((_SO((_ST("merge"), _ST("hash"))), _ST("join")),
                      slop=3, in_order=True)
    e["span_near_ordered_nested"] = (
        _bm25(Span(_nested_ord), k=10), span_topk_sql(_nested_ord, k=10))
    _nested_unord = _SN((_ST("fast"), _SO((_ST("scan"), _ST("key")))),
                        slop=6, in_order=False)
    e["span_near_unordered_or"] = (
        _bm25(Span(_nested_unord), k=10), span_topk_sql(_nested_unord, k=10))
    _not_tree = _SX(_SN((_ST("merge"), _ST("join")), slop=8, in_order=True),
                    _ST("hash"))
    e["span_not_exclusion"] = (
        _bm25(Span(_not_tree), k=10), span_topk_sql(_not_tree, k=10))

    # SpanNot pre/post exclusion distances (round 4; u8:lucene/core/
    # .../search/spans/SpanNotQuery.java 4-arg form): the include
    # window also dies when 'hash' occurs up to 2 tokens BEFORE or 3
    # tokens AFTER it — proximity-guarded exclusion, stricter than the
    # plain overlap test above.
    _not_dist_tree = _SX(_SN((_ST("merge"), _ST("join")), slop=8,
                             in_order=True),
                         _ST("hash"), pre=2, post=3)
    e["span_not_dist_exclusion"] = (
        _bm25(Span(_not_dist_tree), k=10),
        span_topk_sql(_not_dist_tree, k=10))

    # surround query language (round 4; u8:lucene/queryparser/.../
    # surround/parser/QueryParser.jj): nW/nN/OR/NOT syntax parsed into
    # the same span trees — '2W(fast, OR(join, merge))' = ordered near,
    # distance 2 (slop 1), over an OR alternative.
    from sparklucene.spans import parse_surround
    _sur_tree = parse_surround("2W(fast, OR(join, merge))")
    e["surround_query_topk"] = (
        _bm25(Span(_sur_tree), k=10), span_topk_sql(_sur_tree, k=10))

    # SpanMultiTermQueryWrapper (round 5; u8:lucene/core/.../search/
    # spans/SpanMultiTermQueryWrapper.java): a wildcard inside a span
    # tree — 'merge' followed (slop 4) by any dictionary term matching
    # s*a* (scan/small/spark/stream at fixture scale). The engine
    # expands against the term dictionary at query-build time
    # (search.span_multi_term -> SpanOr of SpanTerms); the oracle
    # re-derives BOTH the expansion (LIKE over the re-derived
    # dictionary) and the ordered-chase span sets from raw positions,
    # with the span weight summing idf over every pattern match — the
    # pinned include-side leaf rule applied to the rewritten OR.
    def span_wc_near(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.query import Wildcard
        from sparklucene.search import span_multi_term
        idx = index_for(spark, sf_dir)
        # explicit cap far above any fixture tier's dictionary: the
        # DuckDB oracle's LIKE expansion is uncapped, so the engine
        # side must never hit its maxClauseCount analog here
        wc = span_multi_term(idx, Wildcard("s*a*"), max_expansions=65536)
        q = Span(_SN((_ST("merge"), wc), slop=4, in_order=True))
        return search(idx, q, k=10, mode="f64", prune=True)
    e["span_wildcard_near"] = (span_wc_near, f"""WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
spL AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM tokp
        WHERE term = 'merge'),
spR AS (SELECT doc_id, pos AS s, pos + 1 AS e FROM tokp
        WHERE term LIKE 's%a%'
          AND term IN (SELECT term FROM tstats)),
n0 AS (SELECT doc_id, s AS s0, e AS pe, 0 AS gap FROM spL),
n1 AS (
  SELECT a.doc_id, a.s0, c.e AS pe, a.gap + (c.s - a.pe) AS gap
  FROM n0 a JOIN spR c ON c.doc_id = a.doc_id AND c.s >= a.pe
  QUALIFY row_number() OVER (PARTITION BY a.doc_id, a.s0, a.pe, a.gap
                             ORDER BY c.s, c.e) = 1),
sp AS (SELECT DISTINCT doc_id, s0 AS s, pe AS e FROM n1 WHERE gap <= 4),
pf AS (SELECT doc_id, count(*)::BIGINT AS tfp FROM sp GROUP BY doc_id),
widf AS (
  SELECT (SELECT ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5))
            FROM tstats ts WHERE ts.term = 'merge')
       + (SELECT sum(ln(1.0 + (g.doc_count - df + 0.5) / (df + 0.5)))
            FROM tstats
            WHERE term LIKE 's%a%' AND term <> 'merge') AS w
  FROM gstats g)
SELECT pf.doc_id AS doc_id,
       CAST(CAST((widf.w * pf.tfp)
            / (pf.tfp + 1.2 * (1.0 - 0.75
                               + 0.75 * m.dlq
                                 / (g.sum_dl / CAST(g.doc_count AS DOUBLE))))
            AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id
CROSS JOIN gstats g CROSS JOIN widf
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # SpanContaining / SpanWithin (round 4; u8:lucene/core/.../search/
    # spans/{SpanContainingQuery,SpanWithinQuery}.java): enclosure tests
    # between two span trees. Containing keeps the windows ('merge ..
    # join' within slop 6) that enclose a 'hash' occurrence; Within keeps
    # the 'scan' occurrences enclosed by a wide 'fast .. key' window.
    from sparklucene.spans import (SpanContainingNode as _SC,
                                   SpanWithinNode as _SW)
    _cont_tree = _SC(_SN((_ST("merge"), _ST("join")), slop=6, in_order=True),
                     _ST("hash"))
    e["span_containing_topk"] = (
        _bm25(Span(_cont_tree), k=10), span_topk_sql(_cont_tree, k=10))
    _within_tree = _SW(_ST("scan"),
                       _SN((_ST("fast"), _ST("key")), slop=8, in_order=True))
    e["span_within_topk"] = (
        _bm25(Span(_within_tree), k=10), span_topk_sql(_within_tree, k=10))

    # SpanFirstQuery slice (u8:lucene/core/.../spans/SpanFirstQuery.java):
    # 'merge' within the first 5 pre-stop token positions; freq =
    # qualifying positions, single-term summed-idf phrase weight
    _sft, _sfe = "merge", 5
    _sf_idf = (f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE "
               f"term = '{_sft}') + 0.5) / ((SELECT df FROM tstats WHERE "
               f"term = '{_sft}') + 0.5))")
    _sf_avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    e["span_first_topk"] = (
        _bm25(SpanFirst(_sft, _sfe), k=10), f"""WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS tfp FROM tokp
  WHERE term = '{_sft}' AND pos < {_sfe} GROUP BY doc_id
)
SELECT pf.doc_id AS doc_id,
       CAST(CAST(({_sf_idf} * pf.tfp)
            / (pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {_sf_avgdl}))
            AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # SpanPositionRangeQuery (round 4; u8:lucene/core/.../search/spans/
    # SpanPositionRangeQuery.java — SpanFirst's parent): spans fully
    # inside [start, end) in the pre-stop position stream; freq = number
    # of qualifying spans, single-term phrase weight.
    def span_pos_range(spark, sf):
        from sparklucene.query import Span
        from sparklucene.spans import SpanPositionRangeNode, SpanTerm
        q = Span(SpanPositionRangeNode(SpanTerm(_sft), start=3, end=40))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["span_position_range_topk"] = (span_pos_range, f"""
WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
pf AS (
  SELECT doc_id, count(*)::BIGINT AS tfp FROM tokp
  WHERE term = '{_sft}' AND pos >= 3 AND pos + 1 <= 40 GROUP BY doc_id
)
SELECT pf.doc_id AS doc_id,
       CAST(CAST(({_sf_idf} * pf.tfp)
            / (pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {_sf_avgdl}))
            AS REAL) AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # highlighting round (Solr HighlightComponent user surface,
    # u8:solr/core/.../handler/component/HighlightComponent.java):
    # matched-term positions decoded for the <= k winners only; snippet =
    # 7-token window starting 2 tokens before the first match
    def hl_run(spark, sf):
        idx = index_for(spark, sf)
        corpus = load_corpus(spark, sf)
        out = search(idx, Or((Term("merge"), Term("vector"))), k=10,
                     mode="f64", hydrate=corpus, highlight=True)
        first = F.array_min(F.flatten(F.transform(
            "highlights", lambda h: h["positions"]))).cast("long")
        return out.select("doc_id", "score", first.alias("first_pos"),
                          "snippet")

    hscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")
    e["search_highlighted"] = (hl_run, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {hscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'vector')),
topk AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 10),
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl),
firstp AS (
  SELECT doc_id, min(pos)::BIGINT AS first_pos
  FROM tokp WHERE term IN ('merge', 'vector') GROUP BY doc_id),
snip AS (
  SELECT d.doc_id, f.first_pos,
         array_to_string(list_slice(
           regexp_extract_all(lower(d.text), '{TOKEN_RE_SQL}'),
           greatest(f.first_pos - 2, 0) + 1,
           greatest(f.first_pos - 2, 0) + 7), ' ') AS snippet
  FROM documents d JOIN firstp f USING (doc_id))
SELECT t.doc_id, t.score, s.first_pos, s.snippet
FROM topk t JOIN snip s USING (doc_id)""")

    # -- multi-passage ranked highlighting (round 4; UnifiedHighlighter
    # hl.snippets>1 — u8:lucene/highlighter/.../uhighlight/
    # UnifiedHighlighter.java + PassageScorer.java): fixed 16-token
    # passage tiling (no sentence breaks in this corpus), passage score
    # = sum of matched-occurrence idfs, f32-rounded BEFORE ranking, top
    # 2 passages per winner doc. Positions are pre-stop stream indexes
    # (gaps preserved), same as the index stores.
    def hl_passages(spark, sf):
        from sparklucene.search import highlight_passages
        idx = index_for(spark, sf)
        return highlight_passages(idx, Or((Term("merge"), Term("join"))),
                                  k=5, window=16, n_passages=2)
    e["highlight_passages_topk"] = (hl_passages, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {hscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')),
topk AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 5),
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents WHERE doc_id IN (SELECT doc_id FROM topk)) tl),
idfs AS (
  SELECT ts.term, ln(1 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5)) AS w
  FROM tstats ts CROSS JOIN gstats g
  WHERE ts.term IN ('join', 'merge')),
pas AS (
  SELECT doc_id, ((pos // 16) * 16)::BIGINT AS window_start,
         count(*)::BIGINT AS n_matches,
         CAST(CAST(sum(i.w) AS REAL) AS DOUBLE) AS passage_score
  FROM tokp JOIN idfs i USING (term)
  GROUP BY doc_id, (pos // 16) * 16),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY passage_score DESC, window_start ASC) AS r
  FROM pas)
SELECT doc_id, window_start, n_matches, passage_score
FROM ranked WHERE r <= 2
ORDER BY doc_id, passage_score DESC, window_start""")
    return e


def _payload_entries() -> dict[str, tuple[Callable, str | None]]:
    """PayloadScoreQuery (round 4; u8:lucene/queries/.../payloads/
    PayloadScoreQuery.java + PayloadFunction): one payload byte per
    stored occurrence (build_index(payloads="position_mix") — the pinned
    assigner 1 + ((pos*31 + len(term)) % 8), recomputable in SQL), per-doc
    factor = fn over the term's payload bytes, score = factor * BM25 or
    the raw factor. The oracle re-derives payloads from raw token
    positions on the pre-stop stream."""
    from sparklucene.query import PayloadScore
    e: dict[str, tuple[Callable, str | None]] = {}

    _tokp = f"""
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
)"""

    def _pay_run(term: str, fn: str, include: bool):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            idx = index_for(spark, sf_dir, variant="pay",
                            payloads="position_mix")
            return search(idx, PayloadScore(term, fn=fn,
                                            include_span_score=include),
                          k=10, mode="f64")
        return run

    # PostingsEnum.PAYLOADS round-trip: payload bytes decoded from the
    # index must equal the pinned assigner recomputed from raw positions.
    def pay_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.search import term_payloads
        idx = index_for(spark, sf_dir, variant="pay",
                        payloads="position_mix")
        return term_payloads(idx, "merge", tuple(range(60)))
    e["postings_term_payloads"] = (pay_stream, f"""WITH {_tokp}
SELECT doc_id, pos,
       (1 + ((pos * 31 + length('merge')) % 8))::BIGINT AS payload
FROM tokp WHERE term = 'merge' AND doc_id < 60
ORDER BY doc_id, pos""")

    # avg payload factor x BM25 (Lucene's default includeSpanScore mode);
    # payload ints sum exactly in f64, so the avg is order-independent
    _t = "merge"
    _idf = (f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = "
            f"'{_t}') + 0.5) / ((SELECT df FROM tstats WHERE term = '{_t}')"
            " + 0.5))")
    _avgdl = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    _denom = f"(a.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {_avgdl}))"
    e["payload_score_avg_topk"] = (
        _pay_run(_t, "avg", True), f"""WITH {corpus_ctes()},{_tokp},
occ AS (
  SELECT doc_id, CAST(1 + ((pos * 31 + {len(_t)}) % 8) AS DOUBLE) AS pay
  FROM tokp WHERE term = '{_t}'
),
a AS (
  SELECT doc_id, count(*)::BIGINT AS tf,
         sum(pay) / CAST(count(*) AS DOUBLE) AS factor
  FROM occ GROUP BY doc_id
)
SELECT a.doc_id AS doc_id,
       CAST(CAST(a.factor * (({_idf} * a.tf) / {_denom}) AS REAL)
            AS DOUBLE) AS score
FROM a JOIN meta m ON a.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # raw summed-payload ranking (includeSpanScore=false)
    e["payload_score_sum_raw_topk"] = (
        _pay_run(_t, "sum", False), f"""WITH {corpus_ctes()},{_tokp},
occ AS (
  SELECT doc_id, CAST(1 + ((pos * 31 + {len(_t)}) % 8) AS DOUBLE) AS pay
  FROM tokp WHERE term = '{_t}'
)
SELECT doc_id, CAST(CAST(sum(pay) AS REAL) AS DOUBLE) AS score
FROM occ GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""")

    # -- SpanPayloadCheckQuery (round 4; u8:lucene/queries/.../payloads/
    # SpanPayloadCheckQuery.java): an occurrence matches only when its
    # payload byte equals the required value — freq = matching count,
    # phrase-weighted with the term's full-df idf (the wrapped span's
    # scoring).
    def pay_check(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.query import PayloadCheck
        idx = index_for(spark, sf_dir, variant="pay",
                        payloads="position_mix")
        return search(idx, PayloadCheck(_t, payload=3), k=10, mode="f64")
    e["payload_check_topk"] = (pay_check, f"""WITH {corpus_ctes()},{_tokp},
occ AS (
  SELECT doc_id FROM tokp
  WHERE term = '{_t}' AND 1 + ((pos * 31 + {len(_t)}) % 8) = 3
),
a AS (SELECT doc_id, count(*)::BIGINT AS tf FROM occ GROUP BY doc_id)
SELECT a.doc_id AS doc_id,
       CAST(CAST(({_idf} * a.tf) / {_denom} AS REAL) AS DOUBLE) AS score
FROM a JOIN meta m ON a.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC
LIMIT 10""")
    return e


def _result_composition_entries() -> dict[str, tuple[Callable, str | None]]:
    """Search-result post-processing (SURVEY.md §2.5-2.7): grouping,
    function scoring, constant score, facet-on-results — the Solr
    components that consume the matching doc set."""
    from pyspark.sql import Window
    e: dict[str, tuple[Callable, str | None]] = {}

    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count", "g.sum_dl")
    _doc_scores = f"""
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id)"""
    q_ms = Or((Term("merge"), Term("spark")))

    # -- ReRank (round 3; Solr ReRankQParserPlugin:
    # u8:solr/core/.../search/ReRankQParserPlugin.java) ------------------
    def reranked(spark, sf):
        from sparklucene.search import rerank
        idx = index_for(spark, sf)
        return rerank(idx, Or((Term("spark"), Term("merge"), Term("join"))),
                      Term("vector"), k=10, rerank_docs=30, weight=2.0,
                      mode="f64")
    e["search_reranked"] = (reranked, f"""WITH {corpus_ctes()},
main_ts AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge', 'spark')),
main_top AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS base
  FROM main_ts GROUP BY doc_id
  ORDER BY base DESC, doc_id ASC LIMIT 30),
rr AS (
  SELECT tf.doc_id,
         CAST(CAST(sum(CAST({tscore} AS DOUBLE)) AS REAL) AS DOUBLE) AS rs
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector' GROUP BY tf.doc_id)
SELECT mt.doc_id, mt.base + 2.0 * coalesce(rr.rs, 0.0) AS score
FROM main_top mt LEFT JOIN rr ON mt.doc_id = rr.doc_id
ORDER BY score DESC, mt.doc_id ASC LIMIT 10""")

    # -- QueryElevation (round 3; Solr QueryElevationComponent:
    # u8:solr/core/.../handler/component/QueryElevationComponent.java —
    # elevateIds/excludeIds with forceElevation) ------------------------
    def elevated_q(spark, sf):
        from sparklucene.search import elevate
        idx = index_for(spark, sf)
        return elevate(idx, q_ms, elevated=(451, 17), excluded=(3,),
                       k=10, mode="f64")
    e["query_elevation_topk"] = (elevated_q, f"""WITH {corpus_ctes()},{_doc_scores},
elev(doc_id, ord) AS (VALUES (451, 0), (17, 1)),
epart AS (
  SELECT e.doc_id, coalesce(o.score, 0.0) AS score, 1 AS elevated, e.ord
  FROM elev e LEFT JOIN doc_scores o ON e.doc_id = o.doc_id),
opart AS (
  SELECT doc_id, score, 0 AS elevated, NULL::INT AS ord
  FROM doc_scores
  WHERE doc_id NOT IN (451, 17, 3)
  ORDER BY score DESC, doc_id ASC LIMIT 8),
united AS (SELECT * FROM epart UNION ALL SELECT * FROM opart)
SELECT doc_id, score, elevated,
       (row_number() OVER (ORDER BY elevated DESC, ord ASC NULLS LAST,
                           score DESC, doc_id ASC) - 1)::INT AS rank
FROM united ORDER BY rank LIMIT 10""")

    # -- Expressions module (round 4; u8:lucene/expressions/.../js/
    # JavascriptCompiler.java): user expression string compiled to a
    # validated Catalyst expression over (_score, doc attributes) and
    # used as the sort. The oracle evaluates the identical float
    # expression tree (f64 + / * over the f32-rounded BM25 score);
    # parenthesization is pinned by the compiler's canonical emission.
    def expr_sort(spark, sf):
        from sparklucene.expressions import expression_sort
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        return expression_sort(
            idx, Or((Term("merge"), Term("scan"))), attrs,
            "_score + ln(1.0 + n_chars) * 0.25", k=10, mode="f64")
    e["expression_sort_topk"] = (expr_sort, f"""WITH {corpus_ctes()},
ts2 AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'scan')),
hits AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS sc
  FROM ts2 GROUP BY doc_id),
vals AS (
  SELECT h.doc_id,
         (h.sc + (ln((1.0 + d.n_chars)) * 0.25)) AS v
  FROM hits h JOIN documents d USING (doc_id))
SELECT doc_id, CAST(CAST(v AS REAL) AS DOUBLE) AS sort_value
FROM vals ORDER BY sort_value DESC, doc_id ASC LIMIT 10""")

    def grouped(spark, sf):
        idx = index_for(spark, sf)
        docs = _t(spark, sf, "documents").select("doc_id", "lang")
        res = matches(idx, q_ms, mode="f64").join(docs, "doc_id")
        w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
        return (res.withColumn("rn", F.row_number().over(w).cast("long"))
                .filter(F.col("rn") <= 2)
                .select("lang", "rn", "doc_id", "score"))
    e["search_grouped_top2_per_lang"] = (grouped, f"""WITH {corpus_ctes()},{_doc_scores}
SELECT lang, rn, doc_id, score FROM (
  SELECT d.lang, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM doc_scores s JOIN documents d ON s.doc_id = d.doc_id)
WHERE rn <= 2""")

    def func_score(spark, sf):
        idx = index_for(spark, sf)
        docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        res = matches(idx, q_ms, mode="f64").join(docs, "doc_id")
        # sqrt is IEEE-correctly-rounded (identical across engines); the
        # JVM's ln differs from libm by 1 ulp on some inputs
        boosted = res.withColumn(
            "boosted", F.col("score") * F.sqrt(F.col("n_chars").cast("double")))
        return (boosted.select("doc_id", "score", "boosted")
                .orderBy(F.desc("boosted"), F.asc("doc_id")).limit(10))
    e["function_score_query"] = (func_score, f"""WITH {corpus_ctes()},{_doc_scores}
SELECT s.doc_id, s.score, s.score * sqrt(CAST(d.n_chars AS DOUBLE)) AS boosted
FROM doc_scores s JOIN documents d ON s.doc_id = d.doc_id
ORDER BY boosted DESC, s.doc_id ASC LIMIT 10""")

    def const_score(spark, sf):
        idx = index_for(spark, sf)
        res = matches(idx, And((Term("dup"), Term("vector"))), mode="f64")
        return (res.select("doc_id", F.lit(1.5).alias("score"))
                .orderBy("doc_id"))
    e["constant_score_query"] = (const_score, f"""WITH {corpus_ctes()}
SELECT doc_id, 1.5 AS score FROM tf WHERE term IN ('dup', 'vector')
GROUP BY doc_id HAVING count(*) = 2 ORDER BY doc_id""")

    def facet_results(spark, sf):
        idx = index_for(spark, sf)
        docs = _t(spark, sf, "documents").select("doc_id", "lang")
        res = matches(idx, q_ms, mode="f64").join(docs, "doc_id")
        return (res.groupBy("lang").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("lang")))
    e["facet_on_search_results"] = (facet_results, f"""WITH {corpus_ctes()},{_doc_scores}
SELECT d.lang, count(*)::BIGINT AS cnt
FROM doc_scores s JOIN documents d ON s.doc_id = d.doc_id
GROUP BY d.lang ORDER BY cnt DESC, lang ASC""")

    return e


def _sql_surface_entries() -> dict[str, tuple[Callable, str | None]]:
    """Parallel-SQL surface (SURVEY.md §2.10): the full BM25 pipeline as
    one plain spark.sql statement (Catalyst/whole-stage-codegen only — no
    engine code), checked against the DuckDB twin of the same SQL."""
    from sparklucene.sqlsurface import bm25_topk_sparksql, register_corpus_view
    e: dict[str, tuple[Callable, str | None]] = {}

    terms = ["table", "hash", "batch"]

    def sql_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_corpus_view(spark, sf_dir)
        return spark.sql(bm25_topk_sparksql(terms, k=12))
    e["sql_surface_bm25"] = (sql_bm25, bm25_topk_sql(terms, k=12))

    def sql_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_corpus_view(spark, sf_dir)
        return spark.sql("""
            SELECT lang, cast(count(*) as bigint) AS cnt,
                   cast(sum(n_chars) as bigint) AS sum_chars
            FROM documents GROUP BY lang ORDER BY lang""")
    e["sql_surface_facet"] = (sql_facet, """
SELECT lang, count(*)::BIGINT AS cnt, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang ORDER BY lang""")

    return e


def _streaming_entries() -> dict[str, tuple[Callable, str | None]]:
    """NRT incremental indexing (sparklucene.streaming): a two-wave
    Structured Streaming build must yield exactly the term dictionary the
    oracle computes from the whole corpus — streaming==batch semantics."""
    import shutil

    e: dict[str, tuple[Callable, str | None]] = {}

    def nrt_termstats(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.streaming import index_stream_once
        key = os.path.realpath(sf_dir)
        tag = hashlib.sha256(key.encode()).hexdigest()[:12]
        root = os.path.join("/tmp", "sparklucene-nrt", tag)
        idx_dir = os.path.join(root, "idx")
        fresh = (os.path.exists(os.path.join(idx_dir, "stats.json"))
                 and load_stats(idx_dir).get("format") == FORMAT_VERSION)
        if not fresh:
            shutil.rmtree(root, ignore_errors=True)
            src = os.path.join(root, "incoming")
            corpus = load_corpus(spark, sf_dir)
            half = corpus.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
            (corpus.filter(F.col("doc_id") <= half)
             .write.parquet(os.path.join(src, "wave=0")))
            (corpus.filter(F.col("doc_id") > half)
             .write.parquet(os.path.join(src, "wave=1")))
            schema = ("repo string, path string, commit string, lang string, "
                      "content string, doc_id long")
            index_stream_once(spark, src + "/*", schema, idx_dir,
                              drange_size=256,
                              checkpoint_dir=os.path.join(root, "ckpt"))
        idx = Index(spark, idx_dir)
        return (idx.termstats()
                .filter(F.col("term").isin(["spark", "merge", "join", "the"]))
                .select("term", "df", "cf"))
    e["streaming_nrt_build_termstats"] = (nrt_termstats, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats
WHERE term IN ('join', 'merge', 'spark', 'the')""")

    return e


def _multimodal_entries() -> dict[str, tuple[Callable, str | None]]:
    """Multimodal binary-payload plumbing (sparklucene.multimodal):
    Arrow-batched mapInPandas feature extraction over opaque bytes."""
    from sparklucene import multimodal as mm
    e: dict[str, tuple[Callable, str | None]] = {}

    def features(spark, sf):
        return mm.extract_features(mm.attach_payload(_t(spark, sf, "documents")))
    e["multimodal_payload_features"] = (features, """
SELECT doc_id, 'text' AS modality,
       octet_length(encode(text))::BIGINT AS byte_len,
       sha256(text) AS payload_sha,
       substring(text, 1, 8) AS head
FROM documents""")

    return e


#: the driver corpus' fixed generator vocabulary (TESTDATA.md — identical
#: at every scale factor; verified sf0.001/0.01/0.1). Lets vocab-dependent
#: oracles (e.g. the Porter stem map) be static SQL.
VOCAB31 = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
           "fast", "filter", "group", "hash", "join", "key", "line",
           "merge", "order", "part", "query", "row", "scan", "slow",
           "small", "sort", "spark", "stream", "table", "the", "value",
           "vector", "window"]


def _analyzer_entries() -> dict[str, tuple[Callable, str | None]]:
    """Round-2 analysis-chain operators (SURVEY.md §2.2): Porter stemmer,
    ShingleFilter, EdgeNGramFilter — each through a full alternate-analyzer
    index build, checked against DuckDB recomputing the same chain."""
    from sparklucene.analysis import ENGLISH_STOP_WORDS, AnalyzerConfig
    from sparklucene.stem import porter_stem

    e: dict[str, tuple[Callable, str | None]] = {}
    stop = stoplist_sql()
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")

    # -- Field-analysis handler as a table (round 4;
    # u8:solr/core/.../handler/FieldAnalysisRequestHandler.java): the
    # post-filter token stream with pre-stop positions, distributed.
    def token_stream(spark, sf):
        from sparklucene.analysis import token_stream_df
        docs = _t(spark, sf, "documents") \
            .filter(F.col("doc_id") < 3).select("doc_id", "text")
        return (token_stream_df(docs, "text")
                .orderBy("doc_id", "pos", "term"))
    e["analysis_field_token_stream"] = (token_stream, f"""
WITH tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents WHERE doc_id < 3) tl
)
SELECT doc_id, pos, term FROM tokp WHERE term NOT IN {stop}
ORDER BY doc_id, pos, term""")

    # -- Porter-stemmed BM25 search --------------------------------------
    stem_vals = ", ".join(f"('{w}', '{porter_stem(w)}')" for w in VOCAB31
                          if w not in ENGLISH_STOP_WORDS)
    stems = sorted({porter_stem(w) for w in ("merge", "table", "value")})

    def stemmed(spark, sf):
        idx = index_for(spark, sf, variant="porter",
                        analyzer=AnalyzerConfig(stem="porter"))
        return search(idx, Or(tuple(Term(s) for s in stems)), k=10,
                      mode="f64")
    e["bm25_stemmed"] = (stemmed, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
sm(term, sterm) AS (VALUES {stem_vals}),
tf AS (
  SELECT doc_id, coalesce(sm.sterm, tok.term) AS term, count(*)::BIGINT AS tf
  FROM tok LEFT JOIN sm ON tok.term = sm.term
  WHERE tok.term NOT IN {stop}
  GROUP BY doc_id, coalesce(sm.sterm, tok.term)
),
doclen AS (
  SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) t
  USING (doc_id)
),
meta AS (
  SELECT doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq FROM doclen
),
gstats AS (
  SELECT count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl
  FROM meta
),
tstats AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY term
),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ({', '.join(repr(s) for s in stems)}))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- ShingleFilter: 2-word shingle term dictionary -------------------
    def shingle_tstats(spark, sf):
        idx = index_for(spark, sf, variant="sh2",
                        analyzer=AnalyzerConfig(shingle=(2, 2)))
        return (idx.termstats().filter(F.col("term").like("% %"))
                .orderBy(F.desc("df"), F.asc("term")).limit(10)
                .select("term", "df", "cf"))
    e["analyzer_shingle_termstats"] = (shingle_tstats, f"""WITH tl AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
                     t -> t NOT IN {stop}) AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                               i -> toks[i] || ' ' || toks[i+1])) AS term
  FROM tl
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM sh GROUP BY term
)
SELECT term, df, cf FROM ts ORDER BY df DESC, term ASC LIMIT 10""")

    # -- EdgeNGramFilter: 2..3-char prefixes as the term dictionary ------
    def edge_tstats(spark, sf):
        idx = index_for(spark, sf, variant="edge23",
                        analyzer=AnalyzerConfig(edge_ngram=(2, 3)))
        return (idx.termstats()
                .orderBy(F.desc("df"), F.asc("term")).limit(15)
                .select("term", "df", "cf"))
    e["analyzer_edge_ngram_termstats"] = (edge_tstats, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(2, least(3, len(term)) + 1),
                               n -> substring(term, 1, n::INT))) AS term
  FROM tok WHERE term NOT IN {stop}
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM g GROUP BY term
)
SELECT term, df, cf FROM ts ORDER BY df DESC, term ASC LIMIT 15""")

    # -- French minimal stemmer (Savoy SAC'06; round 3) ------------------
    # same VALUES-map oracle pattern as Porter: the pinned 31-word corpus
    # vocabulary makes the word->stem map static SQL
    from sparklucene.stem import french_minimal_stem
    fr_vals = ", ".join(
        f"('{w}', '{french_minimal_stem(w)}')" for w in VOCAB31
        if w not in ENGLISH_STOP_WORDS and french_minimal_stem(w) != w)
    fr_probe = sorted({french_minimal_stem(w)
                       for w in ("customer", "filter", "vector", "merge")})

    def fr_min_tstats(spark, sf):
        idx = index_for(spark, sf, variant="frmin",
                        analyzer=AnalyzerConfig(stem="french_minimal"))
        return (idx.termstats()
                .filter(F.col("term").isin(fr_probe))
                .select("term", "df", "cf"))
    e["analyzer_french_minimal_termstats"] = (fr_min_tstats, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
sm(term, sterm) AS (VALUES {fr_vals}),
st AS (
  SELECT doc_id, coalesce(sm.sterm, tok.term) AS term
  FROM tok LEFT JOIN sm ON tok.term = sm.term
  WHERE tok.term NOT IN {stop}
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM st GROUP BY term
)
SELECT term, df, cf FROM ts WHERE term IN {_terms_in(fr_probe)}""")

    # -- HTMLStripCharFilter (round 3; u8:lucene/analysis/common/...
    # /charfilter/HTMLStripCharFilter.java). The corpus has no markup, so
    # the entry derives an HTML-wrapped corpus (deterministic literal
    # wrapping — comments, a script element, named + numeric entities),
    # indexes it with html_strip=True, and probes the term dictionary for
    # terms that only exist if stripping behaved: entity-decoded tokens
    # present, tag names / script bodies / comment text absent.
    _HTML_PRE = '<div class="doc"><b>'
    _HTML_POST = ('</b><script type="text/javascript">var stripped_flag = 1;'
                  '</script><!-- hidden webmarkup --> Done &amp; d&#111;ne '
                  '&lt;webtag&gt;')
    _html_probe = ("done", "webtag", "stripped_flag", "webmarkup",
                   "script", "javascript", "div", "amp", "lt")

    def _html_wrap(c):
        return c.withColumn(
            "content", F.concat(F.lit(_HTML_PRE), F.col("content"),
                                F.lit(_HTML_POST)))

    def html_tstats(spark, sf):
        idx = index_for(spark, sf, variant="html",
                        analyzer=AnalyzerConfig(html_strip=True),
                        transform=_html_wrap)
        return (idx.termstats().filter(F.col("term").isin(list(_html_probe)))
                .orderBy("term").select("term", "df", "cf"))
    e["analyzer_html_strip_termstats"] = (html_tstats, f"""WITH raw AS (
  SELECT doc_id, '{_HTML_PRE.replace("'", "''")}' || text ||
         '{_HTML_POST.replace("'", "''")}' AS html
  FROM documents),
stripped AS (
  SELECT doc_id,
    replace(replace(replace(replace(replace(replace(replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        html, '<!--.*?-->', ' ', 'gs'),
        '<script\\b[^>]*>.*?</script\\s*>', ' ', 'gis'),
        '<style\\b[^>]*>.*?</style\\s*>', ' ', 'gis'),
        '<[^>]*>', ' ', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      '&nbsp;', ' '), '&amp;', '&'), '&#111;', 'o') AS text
  FROM raw),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM stripped),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM tok WHERE term NOT IN {stop} GROUP BY term)
SELECT term, df, cf FROM ts WHERE term IN {_terms_in(_html_probe)}
ORDER BY term ASC""")

    # -- PhoneticFilter / Soundex (round 3) ------------------------------
    # u8:lucene/analysis/phonetic/.../PhoneticFilter.java (encoder =
    # commons-codec American Soundex). inject=True is the Solr default:
    # each token emits itself AND its code at the same position. The
    # pinned corpus vocabulary makes the word->code map static SQL; codes
    # contain digits, so they can never collide with the alphabetic
    # source vocabulary.
    from sparklucene.stem import soundex
    px_vals = ", ".join(
        f"('{w}', '{soundex(w)}')" for w in VOCAB31
        if w not in ENGLISH_STOP_WORDS)
    px_probe = sorted({soundex(w)
                       for w in ("customer", "merge", "vector", "window")})

    def phonetic_tstats(spark, sf):
        idx = index_for(spark, sf, variant="sndx",
                        analyzer=AnalyzerConfig(phonetic="soundex"))
        return (idx.termstats().filter(F.col("term").isin(px_probe))
                .orderBy("term").select("term", "df", "cf"))
    e["analyzer_phonetic_termstats"] = (phonetic_tstats, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
base AS (SELECT doc_id, term FROM tok WHERE term NOT IN {stop}),
px(term, code) AS (VALUES {px_vals}),
injected AS (
  SELECT doc_id, term FROM base
  UNION ALL
  SELECT b.doc_id, px.code AS term FROM base b
  JOIN px ON b.term = px.term AND px.code <> px.term
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM injected GROUP BY term
)
SELECT term, df, cf FROM ts WHERE term IN {_terms_in(px_probe)}
ORDER BY term ASC""")

    # -- KeywordRepeat + Porter + RemoveDuplicates (round 3) -------------
    # u8:lucene/analysis/common/.../miscellaneous/{KeywordRepeatFilter,
    # RemoveDuplicatesTokenFilter}.java: surface form AND stem indexed at
    # the same position; unchanged stems emit once. Same static VALUES
    # pattern as the phonetic oracle (inject only where stem <> term).
    kr_vals = ", ".join(
        f"('{w}', '{porter_stem(w)}')" for w in VOCAB31
        if w not in ENGLISH_STOP_WORDS)
    kr_probe = sorted({w for w in ("merge", "table", "value", "join")}
                      | {porter_stem(w)
                         for w in ("merge", "table", "value", "join")})

    def kwrepeat_tstats(spark, sf):
        idx = index_for(spark, sf, variant="kwrep",
                        analyzer=AnalyzerConfig(stem="porter",
                                                stem_inject=True))
        return (idx.termstats().filter(F.col("term").isin(kr_probe))
                .orderBy("term").select("term", "df", "cf"))
    e["analyzer_keyword_repeat_termstats"] = (kwrepeat_tstats, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
base AS (SELECT doc_id, term FROM tok WHERE term NOT IN {stop}),
sm(term, sterm) AS (VALUES {kr_vals}),
injected AS (
  SELECT doc_id, term FROM base
  UNION ALL
  SELECT b.doc_id, sm.sterm AS term FROM base b
  JOIN sm ON b.term = sm.term AND sm.sterm <> sm.term
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM injected GROUP BY term
)
SELECT term, df, cf FROM ts WHERE term IN {_terms_in(kr_probe)}
ORDER BY term ASC""")

    # -- CommonGramsFilter (round 3; u8:lucene/analysis/common/...
    # /commongrams/CommonGramsFilter.java): adjacent pairs touching a
    # stopword ALSO emit "a_b" at the first member's position, pre-stop —
    # classic phrase-speed indexing. Probe: top bigram terms by df.
    def cgrams_tstats(spark, sf):
        idx = index_for(spark, sf, variant="cgrams",
                        analyzer=AnalyzerConfig(
                            common_grams=ENGLISH_STOP_WORDS))
        return (idx.termstats().filter(F.col("term").contains("_"))
                .orderBy(F.desc("df"), F.asc("term")).limit(12)
                .select("term", "df", "cf"))
    e["analyzer_common_grams_termstats"] = (cgrams_tstats, f"""WITH tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
bi AS (
  SELECT a.doc_id, a.term || '_' || b.term AS term
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN {stop} OR b.term IN {stop}
),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM bi GROUP BY term
)
SELECT term, df, cf FROM ts ORDER BY df DESC, term ASC LIMIT 12""")

    # -- PatternReplaceCharFilter (round 4; u8:lucene/analysis/common/
    # .../pattern/PatternReplaceCharFilter.java): raw character-stream
    # regex rewrite BEFORE tokenization/lowercasing — 'fast' -> 'quick'
    # merges the two spellings' statistics; 'fast' vanishes from the
    # dictionary. Probe: termstats of (fast, merge, quick).
    def pat_replace_tstats(spark, sf):
        idx = index_for(spark, sf, variant="patrep",
                        analyzer=AnalyzerConfig(
                            char_pattern_replace=(("fast", "quick"),)))
        return (idx.termstats()
                .filter(F.col("term").isin(["fast", "merge", "quick"]))
                .select("term", "df", "cf").orderBy("term"))
    e["analyzer_pattern_replace_termstats"] = (pat_replace_tstats, f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(
           lower(regexp_replace(text, 'fast', 'quick', 'g')),
           '{TOKEN_RE_SQL}')) AS term
  FROM documents),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS cf
  FROM tok WHERE term NOT IN {stop} GROUP BY term)
SELECT term, df, cf FROM ts WHERE term IN ('fast', 'merge', 'quick')
ORDER BY term""")

    # -- PathHierarchyTokenizer (round 4; u8:lucene/analysis/common/
    # .../path/PathHierarchyTokenizer.java): the corpus `path` column
    # ('doc/<id>.txt') indexed as every ancestor prefix — directory
    # drill-down / prefix faceting as single term lookups. Probe: top
    # dictionary entries by df ('doc' covers the corpus; full paths tie
    # at df=1, term-ordered).
    def path_hier_tstats(spark, sf):
        from sparklucene.build import Field
        fld = Field("path_h", "path",
                    AnalyzerConfig(tokenizer="path_hierarchy",
                                   stopwords=frozenset()))
        idx = index_for(spark, sf, variant="pathh", extra_fields=(fld,))
        fk = "path_h\x1f"
        t = idx.termstats().filter(F.col("term").startswith(fk))
        body = F.col("term").substr(F.lit(len(fk) + 1),
                                    F.length(F.col("term")))
        return (t.select(body.alias("term"), "df", "cf")
                .orderBy(F.desc("df"), F.asc("term")).limit(10))
    e["analyzer_path_hierarchy_termstats"] = (path_hier_tstats, """
WITH pref AS (
  SELECT doc_id, unnest(list_transform(range(1, 3),
    i -> array_to_string(list_slice(
           str_split('doc/' || doc_id || '.txt', '/'), 1, i), '/')))
    AS term
  FROM documents),
ts AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS cf
  FROM pref GROUP BY term)
SELECT term, df, cf FROM ts ORDER BY df DESC, term ASC LIMIT 10""")

    return e


def _multifield_entries() -> dict[str, tuple[Callable, str | None]]:
    """Multi-field indexing + edismax-style per-field search (SURVEY
    §3.2 stage 2, ExtendedDismaxQParser semantics): content plus keyword
    ``lang``/``repo`` fields, each with its own norms and global stats."""
    from sparklucene.analysis import AnalyzerConfig
    from sparklucene.build import Field
    from sparklucene.query import DisMax

    stop = stoplist_sql()
    e: dict[str, tuple[Callable, str | None]] = {}
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")
    kw = AnalyzerConfig(tokenizer="keyword", stopwords=frozenset())
    mf_fields = (Field("lang", "lang", kw), Field("repo", "repo", kw))

    def _mf_index(spark, sf):
        return index_for(spark, sf, variant="mf", extra_fields=mf_fields)

    # keyword-field BM25 score: tf = 1, dlq = 1, avgdl = 1 — same f64
    # expression tree as the engine's per-field scorer
    lang_score = bm25.score_sql("1", "1", "s.df", "g.doc_count", "g.sum_dl")

    def mf_dismax(spark, sf):
        q = DisMax((Term("spark"), Term("en", field="lang")), tiebreak=0.1)
        return search(_mf_index(spark, sf), q, k=10, mode="f64")
    e["bm25_multifield_dismax"] = (mf_dismax, f"""WITH {corpus_ctes()},
lang_tf AS (SELECT doc_id FROM documents WHERE lang = 'en'),
lang_s AS (SELECT count(*)::BIGINT AS df FROM lang_tf),
lang_g AS (SELECT count(*)::BIGINT AS doc_count, count(*)::BIGINT AS sum_dl
           FROM documents),
ls AS (
  SELECT lt.doc_id, {bm25.score_sql('1', '1', 's.df', 'g.doc_count', 'g.sum_dl')} AS s
  FROM lang_tf lt CROSS JOIN lang_s s CROSS JOIN lang_g g),
cs AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'spark'),
bothsides AS (
  SELECT coalesce(c.doc_id, l.doc_id) AS doc_id, c.s AS c_s, l.s AS l_s
  FROM cs c FULL JOIN ls l ON c.doc_id = l.doc_id)
SELECT doc_id, CAST(CAST(
  CASE WHEN c_s IS NULL THEN l_s WHEN l_s IS NULL THEN c_s
       WHEN c_s >= l_s THEN c_s ELSE l_s END
  + 0.1 * ((coalesce(CAST(c_s AS DOUBLE), 0) + coalesce(CAST(l_s AS DOUBLE), 0))
           - CASE WHEN c_s IS NULL THEN l_s WHEN l_s IS NULL THEN c_s
                  WHEN c_s >= l_s THEN c_s ELSE l_s END)
  AS REAL) AS DOUBLE) AS score
FROM bothsides
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def mf_boost(spark, sf):
        q = Or((Term("vector"), Term("src3", field="repo", boost=2.0)))
        return search(_mf_index(spark, sf), q, k=10, mode="f64")
    repo_idf = ("ln(1.0 + (g.doc_count - s.df + 0.5) / (s.df + 0.5))")
    e["bm25_field_boost"] = (mf_boost, f"""WITH {corpus_ctes()},
repo_tf AS (SELECT doc_id FROM documents WHERE source = 'src3'),
repo_s AS (SELECT count(*)::BIGINT AS df FROM repo_tf),
repo_g AS (SELECT count(*)::BIGINT AS doc_count, count(*)::BIGINT AS sum_dl
           FROM documents),
uni AS (
  SELECT rt.doc_id,
         cast(((2.0 * {repo_idf}) * 1)
              / (1 + 1.2 * (1.0 - 0.75 + 0.75 * 1
                 / (g.sum_dl / cast(g.doc_count as double)))) as real) AS s
  FROM repo_tf rt CROSS JOIN repo_s s CROSS JOIN repo_g g
  UNION ALL
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector')
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def mf_termstats(spark, sf):
        idx = _mf_index(spark, sf)
        keys = ["lang\x1fen", "lang\x1fde", "repo\x1fsrc1"]
        return (idx.termstats().filter(F.col("term").isin(keys))
                .select("term", "df", "cf").orderBy("term"))
    e["multifield_termstats"] = (mf_termstats, """WITH kv AS (
  SELECT 'lang' || chr(31) || lang AS term,
         count(*)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM documents GROUP BY lang
  UNION ALL
  SELECT 'repo' || chr(31) || source,
         count(*)::BIGINT, count(*)::BIGINT
  FROM documents GROUP BY source)
SELECT term, df, cf FROM kv
WHERE term IN ('lang' || chr(31) || 'en', 'lang' || chr(31) || 'de',
               'repo' || chr(31) || 'src1')
ORDER BY term""")

    # -- copyField catch-all (round 4; Solr schema <copyField source=...
    # dest=...> — u8:solr/core/.../schema/IndexSchema.java copyFields,
    # u8:solr/core/.../update/DocumentBuilder.java): multiple source
    # fields concatenate into one analyzed destination field with its
    # OWN length norms and stats — the classic `df` catch-all. Here
    # content + lang + repo copy into `catchall` (standard chain), so a
    # term that never appears in the text body (the lang value 'de')
    # still matches through the catch-all, and scores use catchall's
    # per-field dl/avgdl (body length + 2 copied tokens).
    def copyfield(spark, sf):
        def add_catchall(c):
            return c.withColumn(
                "catchall", F.concat_ws(" ", "content", "lang", "repo"))
        idx = index_for(spark, sf, variant="copyfield",
                        transform=add_catchall,
                        extra_fields=(Field("catchall", "catchall"),))
        q = Or((Term("de", field="catchall"),
                Term("merge", field="catchall")))
        return search(idx, q, k=10, mode="f64")
    ca_score = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                              "g.sum_dl")
    e["copyfield_catchall_search"] = (copyfield, f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(
           lower(text || ' ' || lang || ' ' || source),
           '{TOKEN_RE_SQL}')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term NOT IN {stop}
  GROUP BY doc_id, term
),
doclen AS (
  SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) t
  USING (doc_id)
),
meta AS (
  SELECT doc_id, dl, {quantize_length_sql('dl')}::BIGINT AS dlq FROM doclen
),
gstats AS (
  SELECT count(*) FILTER (WHERE dl >= 1)::BIGINT AS doc_count,
         sum(dl)::BIGINT AS sum_dl
  FROM meta
),
tstats AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
term_scores AS (
  SELECT tf.doc_id, {ca_score} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('de', 'merge'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    return e


def _join_entries() -> dict[str, tuple[Callable, str | None]]:
    """Join operators (SURVEY §2.4 join rows): ToParentBlockJoinQuery
    (child hits rolled up to a parent key, ScoreMode.Max) and
    JoinUtil / Solr ``{!join from= to=}`` (query-time cross-collection
    semi-join) — both as Catalyst joins over engine match sets."""
    e: dict[str, tuple[Callable, str | None]] = {}
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")

    def block_join(spark, sf):
        idx = index_for(spark, sf)
        hits = matches(idx, Or((Term("spark"), Term("merge"))), mode="f64")
        parents = load_corpus(spark, sf).select("doc_id", "repo")
        return (hits.join(parents, "doc_id")
                .groupBy("repo")
                .agg(F.max("score").alias("score"),
                     F.count("*").alias("n_children"))
                .orderBy(F.desc("score"), F.asc("repo")).limit(10))
    e["block_join_parent_rollup"] = (block_join, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id)
SELECT d.source AS repo, max(ds.score) AS score,
       count(*)::BIGINT AS n_children
FROM doc_scores ds JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY score DESC, repo ASC LIMIT 10""")

    # -- ToChildBlockJoinQuery (round 4; u8:lucene/join/.../
    # ToChildBlockJoinQuery.java): the inverse direction — parents
    # matching a query hand their score DOWN to every child doc. Parent
    # = source group; parent score = max child hit (the ScoreMode.Max
    # parent query above); every child of a matching parent returns
    # with that parent's score.
    def block_join_children(spark, sf):
        idx = index_for(spark, sf)
        hits = matches(idx, Term("dup"), mode="f64")
        docs = load_corpus(spark, sf).select("doc_id", "repo")
        pscore = (hits.join(docs, "doc_id")
                  .groupBy("repo").agg(F.max("score").alias("score")))
        return (docs.join(F.broadcast(pscore), "repo")
                .select("doc_id", F.col("repo").alias("parent"), "score")
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(20))
    e["block_join_children_of_parents"] = (block_join_children, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'dup'),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id),
pscore AS (
  SELECT d.source AS parent, max(ds.score) AS score
  FROM doc_scores ds JOIN documents d USING (doc_id)
  GROUP BY d.source)
SELECT d.doc_id, p.parent, p.score
FROM documents d JOIN pscore p ON d.source = p.parent
ORDER BY p.score DESC, d.doc_id ASC LIMIT 20""")

    # -- [child] doc transformer (round 4; u8:solr/core/.../response/
    # transform/ChildDocTransformerFactory.java): the top-k parents of a
    # block-join query return WITH their nested children attached,
    # bounded by childLimit — flattened here as (parent, parent_score,
    # child_doc_id, child_rank) rows. Children rank by doc_id asc (the
    # reference returns children in index order within the block).
    def child_transform(spark, sf):
        from pyspark.sql import Window
        idx = index_for(spark, sf)
        hits = matches(idx, Or((Term("spark"), Term("merge"))), mode="f64")
        docs = load_corpus(spark, sf).select("doc_id", "repo")
        pscore = (hits.join(docs, "doc_id")
                  .groupBy("repo")
                  .agg(F.max("score").alias("parent_score"))
                  .orderBy(F.desc("parent_score"), F.asc("repo")).limit(3))
        w = Window.partitionBy("repo").orderBy(F.asc("doc_id"))
        return (docs.join(F.broadcast(pscore), "repo")
                .withColumn("child_rank", F.row_number().over(w)
                            .cast("long"))
                .filter(F.col("child_rank") <= 5)
                .select(F.col("repo").alias("parent"), "parent_score",
                        F.col("doc_id").alias("child_doc_id"),
                        "child_rank"))
    e["block_join_child_transformer"] = (child_transform, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id),
p AS (SELECT d.source AS parent, max(ds.score) AS parent_score
      FROM doc_scores ds JOIN documents d USING (doc_id)
      GROUP BY 1 ORDER BY parent_score DESC, parent ASC LIMIT 3),
k AS (SELECT p.parent, p.parent_score, d.doc_id AS child_doc_id,
             row_number() OVER (PARTITION BY p.parent
                                ORDER BY d.doc_id)::BIGINT AS child_rank
      FROM p JOIN documents d ON d.source = p.parent)
SELECT parent, parent_score, child_doc_id, child_rank
FROM k WHERE child_rank <= 5""")

    def join_util(spark, sf):
        idx = index_for(spark, sf)
        inner = matches(idx, Term("dup"), mode="f64").select("doc_id")
        corpus = load_corpus(spark, sf)
        langs = (inner.join(corpus.select("doc_id", "lang"), "doc_id")
                 .select("lang").distinct())
        outer = corpus.join(F.broadcast(langs), "lang", "left_semi")
        return outer.agg(F.count("*").alias("n_docs"),
                         F.countDistinct("lang").alias("n_langs"))
    e["join_cross_collection"] = (join_util, f"""WITH {corpus_ctes()}
SELECT count(*)::BIGINT AS n_docs, count(DISTINCT lang)::BIGINT AS n_langs
FROM documents
WHERE lang IN (SELECT DISTINCT d2.lang
               FROM tf JOIN documents d2 USING (doc_id)
               WHERE tf.term = 'dup')""")

    # -- JoinUtil ScoreMode.Total / Avg (round 4; u8:lucene/join/.../
    # JoinUtil.java ScoreMode): parent key scored by the SUM and AVG of
    # its joined child hits' BM25 scores (ScoreMode.Max is
    # block_join_parent_rollup above). The f64 sum over per-doc f32
    # scores is exact (24-bit mantissas, tiny exponent spread, few
    # thousand addends), so it is summation-order-independent and the
    # oracle reproduces it bit-for-bit.
    def join_score_modes(spark, sf):
        idx = index_for(spark, sf)
        hits = matches(idx, Or((Term("join"), Term("merge"))), mode="f64")
        parents = load_corpus(spark, sf).select("doc_id", "repo")
        return (hits.join(parents, "doc_id")
                .groupBy("repo")
                .agg(F.sum("score").alias("score_total"),
                     (F.sum("score") / F.count("*")).alias("score_avg"),
                     F.count("*").alias("n_children"))
                .orderBy(F.desc("score_total"), F.asc("repo")).limit(8))
    e["join_score_mode_total_avg"] = (join_score_modes, f"""
WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
  FROM term_scores GROUP BY doc_id)
SELECT d.source AS repo, sum(ds.score) AS score_total,
       sum(ds.score) / count(*) AS score_avg,
       count(*)::BIGINT AS n_children
FROM doc_scores ds JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY score_total DESC, repo ASC LIMIT 8""")

    return e


def _example_similarity(tf, dl, df, cf, doc_count, sum_dl):
    """Pluggable-Similarity example (SURVEY.md §2.13): tf-saturation
    ``tf / (tf + dl/avgdl)`` — log-free so every float op is IEEE
    correctly-rounded and the DuckDB oracle reproduces it bit-for-bit
    (``dl`` is the SmallFloat-quantized length the index stores)."""
    avgdl = sum_dl / doc_count
    return tf / (tf + dl / avgdl)


def _omit_norms_similarity(tf, dl, df, cf, doc_count, sum_dl):
    """omitNorms=true scoring (public knowledge: Lucene FieldType's
    omitNorms option + BM25Similarity's norms-absent branch — with no
    norm to read, length normalization drops and the tf saturation
    becomes ``tf / (tf + k1)``). Same Lucene 8.x idf; np.log is glibc
    ln, reproduced by DuckDB ln under the f32 rounding every similarity
    slot applies."""
    import numpy as np
    idf = np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + 1.2)


def _lm_dirichlet_similarity(tf, dl, df, cf, doc_count, sum_dl):
    """LM with Dirichlet smoothing (Zhai & Lafferty, SIGIR 2001 — the
    model behind Lucene's LMDirichletSimilarity). Pinned engine spec:

        score = max(0, ln(1 + tf / (mu * cf / T)) + ln(mu / (dl + mu)))

    with mu = 2000, T = sum_dl (total tokens in the field), dl the
    SmallFloat-quantized length. np.log is glibc ln == DuckDB ln, so the
    oracle mirrors the expression tree exactly."""
    import numpy as np

    mu = 2000.0
    score = (np.log(1.0 + tf / (mu * (cf / sum_dl)))
             + np.log(mu / (dl + mu)))
    return np.maximum(score, 0.0)


def _lm_jelinek_mercer_similarity(tf, dl, df, cf, doc_count, sum_dl):
    """LM with Jelinek-Mercer smoothing (Zhai & Lafferty, SIGIR 2001 —
    the model behind Lucene's LMJelinekMercerSimilarity). Pinned engine
    spec (lambda = 0.1, Lucene's default for short queries):

        score = ln(1 + ((1 - lam) * tf / dl) / (lam * (cf / T)))

    with T = sum_dl and dl the SmallFloat-quantized length. Every
    operation maps 1:1 to the DuckDB oracle's expression tree."""
    import numpy as np

    lam = 0.1
    return np.log(1.0 + ((1.0 - lam) * tf / dl)
                  / (lam * (cf / sum_dl)))


def _dfr_inl2_similarity(tf, dl, df, cf, doc_count, sum_dl):
    """DFR I(n)L2 (Amati & van Rijsbergen, TOIS 2002 — Lucene's
    DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2), c = 1).
    Pinned engine spec:

        tfn   = tf * log2(1 + avgdl / dl)          (H2, c = 1)
        score = (1 / (tfn + 1)) * tfn * log2((N + 1) / (df + 0.5))

    with avgdl = T / N on quantized lengths; log2 x = ln x / ln 2 on
    both sides so the float expression trees match bit-for-bit."""
    import numpy as np

    ln2 = np.log(2.0)
    avgdl = sum_dl / doc_count
    tfn = tf * (np.log(1.0 + avgdl / dl) / ln2)
    return ((1.0 / (tfn + 1.0)) * tfn
            * (np.log((doc_count + 1.0) / (df + 0.5)) / ln2))


def _query_algebra_entries() -> dict[str, tuple[Callable, str | None]]:
    """Round-2 query-algebra completeness (SURVEY.md §2.4-2.5):
    MatchAllDocs, FILTER occur, constant-score multi-term rewrites
    composable inside scored booleans, MultiPhrase, BooleanSimilarity,
    user-supplied similarity."""
    from sparklucene.query import (Filtered, Fuzzy, MatchAllDocs,
                                   MultiPhrase, Prefix, Wildcard)
    from sparklucene.search import total_hits as _total_hits

    e: dict[str, tuple[Callable, str | None]] = {}
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")

    # -- MatchAllDocsQuery ------------------------------------------------
    def match_all(spark, sf):
        return _total_hits(index_for(spark, sf), MatchAllDocs(), mode="f64")
    e["match_all_count"] = (match_all, """
SELECT count(*)::BIGINT AS total_hits FROM documents""")

    # -- CommonTermsQuery (round 4; u8:lucene/queries/.../
    # CommonTermsQuery.java): terms whose df exceeds max_doc_freq *
    # doc_count are demoted from required to optional-scoring. The split
    # is data-derived on BOTH sides: the oracle classifies each query
    # term against tstats with the same cutoff, requires all low-df
    # terms and sums BM25 over every matched term. At both test SFs
    # 'dup' (df ~5%) lands low while 'merge'/'scan' (~80%) land high.
    def common_terms(spark, sf):
        from sparklucene.search import common_terms_query
        idx = index_for(spark, sf)
        q = common_terms_query(idx, ["dup", "merge", "scan"],
                               max_doc_freq=0.5)
        return search(idx, q, k=10, mode="f64")
    e["common_terms_query"] = (common_terms, f"""WITH {corpus_ctes()},
qt AS (SELECT unnest(['dup', 'merge', 'scan']) AS term),
cls AS (
  SELECT q.term,
         CASE WHEN ts.df IS NULL OR ts.df < 0.5 * g.doc_count
              THEN 1 ELSE 0 END AS low
  FROM qt q LEFT JOIN tstats ts ON q.term = ts.term CROSS JOIN gstats g),
nlow AS (SELECT count(*)::BIGINT AS nl FROM cls WHERE low = 1),
matched AS (
  SELECT tf.doc_id, tf.term, c.low, {tscore} AS s
  FROM tf JOIN cls c ON tf.term = c.term
  JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g),
ok AS (
  SELECT doc_id FROM matched GROUP BY doc_id
  HAVING count(DISTINCT CASE WHEN low = 1 THEN term END)
         = (SELECT nl FROM nlow))
SELECT m.doc_id, CAST(CAST(sum(CAST(m.s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM matched m JOIN ok USING (doc_id)
GROUP BY m.doc_id ORDER BY score DESC, m.doc_id ASC LIMIT 10""")

    def match_all_except(spark, sf):
        q = Not(MatchAllDocs(), Or((Term("spark"), Term("merge"))))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["match_all_except_topk"] = (match_all_except, f"""WITH {corpus_ctes()}
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ('merge', 'spark'))
ORDER BY doc_id ASC LIMIT 10""")

    # -- FILTER occur (Solr fq=) -----------------------------------------
    def filtered(spark, sf):
        q = Filtered(Or((Term("spark"), Term("merge"))), Term("join"))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["bm25_filtered"] = (filtered, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')
    AND tf.doc_id IN (SELECT doc_id FROM tf WHERE term = 'join'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def fq_constant(spark, sf):
        # q=*:* fq=spark — rewrites to ConstantScore(Term) internally
        q = Filtered(MatchAllDocs(), Term("spark"))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["match_all_filtered_fq"] = (fq_constant, f"""WITH {corpus_ctes()}
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM tf WHERE term = 'spark'
ORDER BY doc_id ASC LIMIT 10""")

    # -- constant-score multi-term clauses inside scored booleans ---------
    def prefix_clause(spark, sf):
        q = And((Prefix("sc"), Term("merge")))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["bm25_with_prefix_clause"] = (prefix_clause, f"""WITH {corpus_ctes()},
cs AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'sc%'),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'merge' AND tf.doc_id IN (SELECT doc_id FROM cs))
SELECT doc_id,
       CAST(CAST(CAST(1.0 AS DOUBLE) + sum(CAST(s AS DOUBLE)) AS REAL)
            AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def wildcard_clause(spark, sf):
        q = Or((Wildcard("j*n"), Term("vector")))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["bm25_with_wildcard_clause"] = (wildcard_clause, f"""WITH {corpus_ctes()},
uni AS (
  SELECT DISTINCT doc_id, CAST(1.0 AS REAL) AS s
  FROM tf WHERE term LIKE 'j%n'
  UNION ALL
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector')
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def fuzzy_clause(spark, sf):
        q = Or((Fuzzy("merg", max_edits=1), Term("hash")))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["bm25_with_fuzzy_clause"] = (fuzzy_clause, f"""WITH {corpus_ctes()},
uni AS (
  SELECT DISTINCT doc_id, CAST(1.0 AS REAL) AS s
  FROM tf WHERE levenshtein(term, 'merg') <= 1
  UNION ALL
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'hash')
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- MultiPhraseQuery -------------------------------------------------
    def multiphrase(spark, sf):
        q = MultiPhrase(((0, ("fast", "slow")), (1, ("join", "merge"))))
        return search(index_for(spark, sf), q, k=10, mode="f64")
    # idf sums over EVERY alternative of every slot, in slot order with
    # alternatives sorted (engine pin, mirrored textually here)
    mp_idf = " + ".join(
        f"ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE term = '{t}')"
        f" + 0.5) / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5))"
        for t in ("fast", "slow", "join", "merge"))
    e["bm25_multiphrase"] = (multiphrase, f"""WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
pf AS (
  SELECT t0.doc_id, count(*)::BIGINT AS tfp
  FROM tokp t0
  JOIN tokp t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term IN ('fast', 'slow') AND t1.term IN ('join', 'merge')
  GROUP BY t0.doc_id
)
SELECT pf.doc_id AS doc_id,
       CAST(CAST((({mp_idf}) * pf.tfp)
            / (pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq
               / (g.sum_dl / CAST(g.doc_count AS DOUBLE)))) AS REAL)
            AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- ComplexPhrase: prefix inside a phrase (round 4;
    # u8:lucene/queryparser/.../complexPhrase/ComplexPhraseQueryParser.java)
    # "fast jo*" — the jo* slot expands against the dictionary into
    # MultiPhrase alternatives; idf sums 'fast' plus every expansion.
    def complexphrase(spark, sf):
        from sparklucene.search import complex_phrase
        idx = index_for(spark, sf)
        q = complex_phrase(idx, ("fast", Prefix("jo")),
                           max_expansions=1024)
        return search(idx, q, k=10, mode="f64")

    cp_idf = ("ln(1.0 + (g.doc_count - (SELECT df FROM tstats WHERE "
              "term = 'fast') + 0.5) / ((SELECT df FROM tstats WHERE "
              "term = 'fast') + 0.5)) + (SELECT sum(ln(1.0 + "
              "(g.doc_count - df + 0.5) / (df + 0.5))) FROM tstats "
              "WHERE term LIKE 'jo%')")
    e["complex_phrase_prefix"] = (complexphrase, f"""WITH {corpus_ctes()},
tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) tl
),
pf AS (
  SELECT t0.doc_id, count(*)::BIGINT AS tfp
  FROM tokp t0
  JOIN tokp t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = 'fast' AND t1.term LIKE 'jo%'
    AND t1.term IN (SELECT term FROM tstats)
  GROUP BY t0.doc_id
)
SELECT pf.doc_id AS doc_id,
       CAST(CAST((({cp_idf}) * pf.tfp)
            / (pf.tfp + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq
               / (g.sum_dl / CAST(g.doc_count AS DOUBLE)))) AS REAL)
            AS DOUBLE) AS score
FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- BooleanSimilarity ------------------------------------------------
    def boolean_sim(spark, sf):
        q = Or((Term("spark"), Term("merge")))
        return search(index_for(spark, sf), q, k=15, mode="boolean")
    e["boolean_similarity_or"] = (boolean_sim, f"""WITH {corpus_ctes()}
SELECT doc_id, CAST(count(*) AS DOUBLE) AS score
FROM tf WHERE term IN ('merge', 'spark')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 15""")

    # -- user-supplied similarity callable --------------------------------
    def custom_sim(spark, sf):
        q = Or((Term("spark"), Term("merge")))
        return search(index_for(spark, sf), q, k=10,
                      mode=_example_similarity)
    e["custom_similarity_or"] = (custom_sim, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id,
         CAST(CAST(1.0 AS DOUBLE)
              * (tf.tf / (tf.tf + m.dlq
                 / (g.sum_dl / CAST(g.doc_count AS DOUBLE)))) AS REAL) AS s
  FROM tf JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- omitNorms=true scoring (round 4) ---------------------------------
    def omit_norms(spark, sf):
        q = Or((Term("spark"), Term("merge")))
        return search(index_for(spark, sf), q, k=10,
                      mode=_omit_norms_similarity)
    e["bm25_omit_norms_or"] = (omit_norms, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id,
         CAST(ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5))
              * tf.tf / (tf.tf + 1.2) AS REAL) AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- batched query-set execution (one Spark job for N queries) -------
    def batch_queryset(spark, sf):
        from sparklucene.search import search_batch
        qs = {"bq_and": And((Term("hash"), Term("join"))),
              "bq_or": Or((Term("spark"), Term("merge"))),
              "bq_term": Term("vector")}
        return search_batch(index_for(spark, sf), qs, k=10, mode="f64")
    e["search_batch_queryset"] = (batch_queryset, f"""WITH {corpus_ctes()},
scored AS (
  SELECT 'bq_or' AS query, tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'spark')
  UNION ALL
  SELECT 'bq_and', tf.doc_id, {tscore}
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('hash', 'join')
  UNION ALL
  SELECT 'bq_term', tf.doc_id, {tscore}
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector'),
agg AS (
  SELECT query, doc_id,
         CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score,
         count(*) AS nt
  FROM scored GROUP BY query, doc_id),
filt AS (
  SELECT query, doc_id, score FROM agg
  WHERE query != 'bq_and' OR nt = 2),
ranked AS (
  SELECT query, doc_id, score,
         row_number() OVER (PARTITION BY query
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM filt)
SELECT query, doc_id, score FROM ranked WHERE rn <= 10""")

    # -- LM Dirichlet (Zhai-Lafferty) through the callable slot ----------
    def lm_dirichlet(spark, sf):
        q = Or((Term("vector"), Term("merge")))
        return search(index_for(spark, sf), q, k=10,
                      mode=_lm_dirichlet_similarity)
    e["lm_dirichlet_or"] = (lm_dirichlet, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id,
         CAST(CAST(1.0 AS DOUBLE) * greatest(
           ln(1.0 + tf.tf / (2000.0 * (ts.cf / CAST(g.sum_dl AS DOUBLE))))
           + ln(2000.0 / (m.dlq + 2000.0)), 0.0) AS REAL) AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'vector'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- LM Jelinek-Mercer through the callable slot (round 3) -----------
    def lm_jm(spark, sf):
        q = Or((Term("vector"), Term("merge")))
        return search(index_for(spark, sf), q, k=10,
                      mode=_lm_jelinek_mercer_similarity)
    e["lm_jelinek_mercer_or"] = (lm_jm, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id,
         CAST(ln(1.0 + ((1.0 - 0.1) * tf.tf / m.dlq)
                 / (0.1 * (ts.cf / CAST(g.sum_dl AS DOUBLE)))) AS REAL) AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'vector'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- DFR I(n)L2 through the callable slot (round 3) ------------------
    def dfr_inl2(spark, sf):
        q = Or((Term("vector"), Term("merge")))
        return search(index_for(spark, sf), q, k=10,
                      mode=_dfr_inl2_similarity)
    _tfn = ("(tf.tf * (ln(1.0 + (CAST(g.sum_dl AS DOUBLE) / g.doc_count)"
            " / m.dlq) / ln(2.0)))")
    e["dfr_inl2_or"] = (dfr_inl2, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id,
         CAST((1.0 / ({_tfn} + 1.0)) * {_tfn}
              * (ln((g.doc_count + 1.0) / (ts.df + 0.5)) / ln(2.0))
              AS REAL) AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term IN ('merge', 'vector'))
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    return e


# ---------------------------------------------------------------------------
# public registry assembly
# ---------------------------------------------------------------------------

#: entries the driver's round-1 CORRECTNESS window already verified
#: (CORRECTNESS_r01.json). The driver checks a bounded prefix of the
#: registry each round, so entries WITHOUT a driver-green row yet are
#: ordered first — across rounds every entry gets driver coverage.
_R01_COVERED = frozenset({
    "bm25_term", "bm25_or_flagship", "bm25_or_wide", "bm25_and",
    "bm25_not", "bm25_msm2", "bm25_and_missing_term", "bm25_with_deletes",
    "classic_similarity_or", "more_like_this", "bm25_phrase",
    "bm25_phrase_stopword_gap", "bm25_phrase_sloppy", "bm25_phrase_or_term",
    "bm25_dismax", "bm25_boosted_or", "search_total_hits",
    "search_export_sorted", "search_cursor_page2", "index_term_stats",
    "index_top_terms_by_df", "index_doc_norms", "index_invariants",
    "corpus_sha256_invariant", "index_global_stats", "facet_field_lang",
    "facet_field_source_topn", "facet_range_nchars", "facet_query_counts",
    "facet_pivot_lang_source", "stats_component_numeric", "unique_agg",
    "percentile_agg", "facet_rollup_hierarchy", "hll_approx_distinct",
    "events_time_window_agg", "stream_select_eval", "stream_top_k",
    "stream_unique", "stream_merge_sorted", "stream_hash_join",
    "stream_outer_hash_join", "stream_sortmerge_join_rollup",
    # stream_complement's r1 row was VACUOUS (0 rows == 0 rows: every
    # fixture customer has at least one order) — deliberately NOT
    # listed here so the F-status variant re-enters the round-5 window
    # as a no-driver-row entry.
    "stream_intersect", "stream_rollup_metrics",
    "stream_stats", "stream_fetch_enrich", "sort_multi_field",
    "paging_page2",
})


#: entries the driver's round-2 CORRECTNESS window verified
#: (CORRECTNESS_r02.json — 49 hash-green + ann_ivf_topk rows-only, which
#: is deliberately EXCLUDED here: round 3 gave it a full SQL oracle and
#: it needs a hash-green row)
_R02_COVERED = frozenset({
    "match_all_count", "match_all_except_topk", "bm25_filtered",
    "match_all_filtered_fq", "bm25_with_prefix_clause",
    "bm25_with_wildcard_clause", "bm25_with_fuzzy_clause",
    "bm25_multiphrase", "boolean_similarity_or", "custom_similarity_or",
    "search_batch_queryset", "lm_dirichlet_or", "bm25_multifield_dismax",
    "bm25_field_boost", "multifield_termstats", "bm25_stemmed",
    "analyzer_shingle_termstats", "analyzer_edge_ngram_termstats",
    "block_join_parent_rollup", "join_cross_collection", "stream_reduce",
    "grouping_top2_per_group", "collapse_expand_by_source",
    "function_termfreq", "numeric_range_query", "term_in_set_query",
    "text_token_stats", "text_quality_score", "text_language_id",
    # dedup_exact_groups' r2 row was VACUOUS (0 rows == 0 rows: the
    # fixture corpus has no exact duplicates) — deliberately NOT listed
    # here so the augmented, non-vacuous version re-enters the round-5
    # window as a no-driver-row entry.
    "text_fingerprint", "dedup_minhash_signatures",
    "dedup_lsh_candidates", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "ann_cosine_topk_exact",
    "ann_lsh_bucketed_topk", "ann_lsh_multiprobe_topk",
    "dedup_embedding_neardup", "multimodal_payload_features",
    "search_grouped_top2_per_lang", "function_score_query",
    "constant_score_query", "facet_on_search_results", "sql_surface_bm25",
    "sql_surface_facet", "streaming_nrt_build_termstats", "prefix_query",
})

_DRIVER_COVERED = _R01_COVERED | _R02_COVERED

#: entries the driver's round-3 CORRECTNESS window verified
#: (CORRECTNESS_r03.json — 50 entries, all hash-green; includes 12
#: re-checks of r1 entries, so those 12 are FRESH, not stale)
_R03_COVERED = frozenset({
    "wildcard_query", "regexp_query", "fuzzy_query", "function_math",
    "function_date_math", "function_string", "ann_ivf_topk",
    "lm_jelinek_mercer_or", "dfr_inl2_or",
    "analyzer_french_minimal_termstats", "analyzer_html_strip_termstats",
    "analyzer_phonetic_termstats", "analyzer_keyword_repeat_termstats",
    "analyzer_common_grams_termstats", "term_vectors_for_docs",
    "realtime_get_by_ids", "stream_significant_terms", "stream_knn_text",
    "suggest_prefix_topk", "spellcheck_topk", "sample_deterministic_frac",
    "sample_stratified_by_lang", "text_dup_ngram_fraction",
    "pipeline_decontamination", "pipeline_pack_sequences",
    "cluster_search_results", "routed_search_single_shard",
    "routed_search_fanout", "intervals_ordered_within",
    "intervals_unordered_within", "span_first_topk", "search_highlighted",
    "search_reranked", "query_elevation_topk", "function_ordinal",
    "spatial_geodist_topk", "spatial_bbox_filter", "spatial_heatmap_facet",
    "bm25_term", "bm25_or_flagship", "bm25_or_wide", "bm25_and",
    "bm25_not", "bm25_msm2", "bm25_and_missing_term", "bm25_with_deletes",
    "classic_similarity_or", "more_like_this", "bm25_phrase",
    "bm25_phrase_stopword_gap",
})

#: entries the driver's round-4 CORRECTNESS window verified
#: (CORRECTNESS_r04.json — 50 entries, all hash-green, all brand-new
#: round-4 entries per the never-checked-first policy)
_R04_COVERED = frozenset({
    "bm25_msm_percent", "mlt_interesting_terms", "edismax_pf_phrase_boost",
    "edismax_pf2_bigram_boost", "synonym_query_blended",
    "synonym_graph_multiword", "common_terms_query",
    "complex_phrase_prefix", "bm25_omit_norms_or",
    "copyfield_catchall_search", "analysis_field_token_stream",
    "analyzer_pattern_replace_termstats",
    "analyzer_path_hierarchy_termstats", "block_join_children_of_parents",
    "block_join_child_transformer", "join_score_mode_total_avg",
    "luke_field_summary", "postings_term_positions",
    "explain_score_components", "terms_component_prefix_index",
    "terms_component_regex_count", "index_sorted_topk",
    "index_sorted_topk_filtered", "facet_stats_percentiles",
    "facet_multiselect_tagged", "json_facet_nested_terms",
    # facet_prefix_offset_page's r4 row was VACUOUS (0 rows == 0 rows:
    # the old 'w' prefix matched nothing) — deliberately NOT listed
    # here so the de-vacuated version re-enters the round-5 window as
    # a no-driver-row entry.
    "facet_interval_nchars",
    "json_facet_block_domain", "json_facet_unique_block",
    "facet_multivalued_field", "facet_contains_filter",
    "facet_missing_bucket", "facet_multiselect_exclude_tag",
    "facet_range_date_events", "grouping_ngroups_matches",
    "grouping_group_facet_lang", "json_facet_stat_sorted",
    "stream_having", "stream_cartesian_product", "graph_query_fixpoint",
    "graph_gather_nodes_2hop", "graph_shortest_path", "graph_score_nodes",
    "stream_timeseries_gapfill", "stream_features_igain",
    "stream_train_logit", "stream_detect_followups",
    "stream_sessionize_users", "stream_random_seeded",
})

#: every entry with at least one driver CORRECTNESS row (r1∪r2∪r3∪r4)
_ANY_DRIVER_ROW = _DRIVER_COVERED | _R03_COVERED | _R04_COVERED

#: round-5 driver-window ordering for the 73 entries that have NEVER
#: had a driver CORRECTNESS row (they are value-green in the local
#: full-registry DuckDB mirror, but mirror-only is weaker evidence).
#: Highest-complexity operators lead so they land inside the ~50-entry
#: round-5 window: nested spans, payloads, LTR, monitor, frange,
#: routed/hashed/time-routed/distributed serving, parsers, classifiers,
#: ANN quantization + hybrid fusion, then fuzzy/wildcard scoring
#: rewrites and the remaining pipeline/suggest/scalar entries (lowest
#: risk — simple plans with strong local mirror evidence).
_R05_PRIORITY = (
    # nested span algebra (8)
    "span_near_ordered_nested", "span_near_unordered_or",
    "span_not_exclusion", "span_not_dist_exclusion",
    "surround_query_topk", "span_containing_topk", "span_within_topk",
    "span_position_range_topk",
    # payloads (4)
    "postings_term_payloads", "payload_score_avg_topk",
    "payload_score_sum_raw_topk", "payload_check_topk",
    # LTR / monitor / frange (5)
    "ltr_linear_rerank", "ltr_trees_rerank", "monitor_match_docs",
    "frange_filtered_search", "frange_matchall_function",
    # routed / hashed / time-routed / distributed serving (6)
    "routed_search_global_stats", "routed_facet_refined",
    "routed_grouping_topk", "routed_suggest_merged",
    "hashed_search_route_key", "time_routed_search_window",
    # parsers (3) + classifiers (2)
    "parser_classic_mixed", "parser_range_boost", "simple_query_topk",
    "classify_naive_bayes", "classify_knn_vote",
    # ANN quantization + hybrid fusion + semantic dedup (10)
    "ann_pq_adc_topk", "ann_int8_quantized_topk",
    "ann_binary_hamming_topk", "ann_filtered_topk", "hybrid_rrf_search",
    "hybrid_linear_search", "dedup_semantic_semdedup",
    "dedup_lsh_incremental", "dedup_duplicate_clusters",
    "search_mmr_diversified",
    # fuzzy/wildcard scoring rewrites (6)
    "fuzzy_query_transpositions", "fuzzy_query_prefix_length",
    "fuzzy_query_scored", "fuzzy_query_blended", "wildcard_query_scored",
    "reversed_leading_wildcard",
    # function scoring / expressions / updates / highlight (6)
    "boost_by_external_field", "feature_field_saturation",
    "expression_sort_topk", "atomic_update_merge",
    "atomic_update_multivalued", "highlight_passages_topk",
    # ---- window boundary (~50) — entries below have the simplest
    # plans and strongest local evidence; they keep mirror coverage
    # if the round-5 window does not reach them ----
    "cursor_fieldsort_page2", "sort_missing_last", "stream_knn_regress",
    "spellcheck_more_popular", "suggest_infix_topk",
    "suggest_context_filtered", "suggest_free_text",
    "spellcheck_word_break", "spellcheck_word_combine",
    "spellcheck_collation", "spatial_geofilt_radius",
    "function_solr_date_math", "function_conditional",
    "function_scale_map", "text_pii_scan", "text_unigram_logppl",
    "pipeline_quality_filter", "pipeline_boilerplate_lines",
    "pipeline_dup_span_removal", "pipeline_mixture_sample",
    "pipeline_chunk_overlap", "pipeline_url_blocklist",
    "pipeline_domain_cap",
)

#: the 87 entries whose LATEST driver row dates from r1/r2, ordered
#: stalest-first (the 38 whose only row is r1, in r1 window order, then
#: the 49 whose latest row is r2, in r2 window order). Round 4's
#: 50-entry driver window re-verifies _STALE_FIRST[:50] on current
#: code; the rest land in round 5's window.
_STALE_FIRST = (
    "bm25_phrase_sloppy", "bm25_phrase_or_term", "bm25_dismax",
    "bm25_boosted_or", "search_total_hits", "search_export_sorted",
    "search_cursor_page2", "index_term_stats", "index_top_terms_by_df",
    "index_doc_norms", "index_invariants", "corpus_sha256_invariant",
    "index_global_stats", "facet_field_lang", "facet_field_source_topn",
    "facet_range_nchars", "facet_query_counts", "facet_pivot_lang_source",
    "stats_component_numeric", "unique_agg", "percentile_agg",
    "facet_rollup_hierarchy", "hll_approx_distinct",
    "events_time_window_agg", "stream_select_eval", "stream_top_k",
    "stream_unique", "stream_merge_sorted", "stream_hash_join",
    "stream_outer_hash_join", "stream_sortmerge_join_rollup",
    "stream_intersect", "stream_complement", "stream_rollup_metrics",
    "stream_stats", "stream_fetch_enrich", "sort_multi_field",
    "paging_page2", "match_all_count", "match_all_except_topk",
    "bm25_filtered", "match_all_filtered_fq", "bm25_with_prefix_clause",
    "bm25_with_wildcard_clause", "bm25_with_fuzzy_clause",
    "bm25_multiphrase", "boolean_similarity_or", "custom_similarity_or",
    "search_batch_queryset", "lm_dirichlet_or", "bm25_multifield_dismax",
    "bm25_field_boost", "multifield_termstats", "bm25_stemmed",
    "analyzer_shingle_termstats", "analyzer_edge_ngram_termstats",
    "block_join_parent_rollup", "join_cross_collection", "stream_reduce",
    "grouping_top2_per_group", "collapse_expand_by_source",
    "function_termfreq", "numeric_range_query", "term_in_set_query",
    "text_token_stats", "text_quality_score", "text_language_id",
    "text_fingerprint", "dedup_exact_groups", "dedup_minhash_signatures",
    "dedup_lsh_candidates", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "ann_cosine_topk_exact",
    "ann_lsh_bucketed_topk", "ann_lsh_multiprobe_topk",
    "dedup_embedding_neardup", "multimodal_payload_features",
    "search_grouped_top2_per_lang", "function_score_query",
    "constant_score_query", "facet_on_search_results", "sql_surface_bm25",
    "sql_surface_facet", "streaming_nrt_build_termstats", "prefix_query",
)


def _suggest_entries() -> dict[str, tuple[Callable, str | None]]:
    """Suggester + spell-check (round 3; Solr SuggestComponent /
    SpellCheckComponent, Lucene DirectSpellChecker —
    u8:solr/core/.../component/{SuggestComponent,SpellCheckComponent}.java,
    u8:lucene/suggest/.../spell/DirectSpellChecker.java). Both run against
    the term dictionary only; the oracle re-derives the dictionary from
    raw tokens and applies the same ranking in SQL."""
    from sparklucene.suggest import spellcheck, suggest_prefix

    e: dict[str, tuple[Callable, str | None]] = {}

    def sugg(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        return suggest_prefix(idx, "s", k=8)
    e["suggest_prefix_topk"] = (sugg, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats
WHERE term LIKE 's%' ORDER BY cf DESC, term ASC LIMIT 8""")

    def spell(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        return spellcheck(idx, "sprk", k=5, max_edits=2, min_prefix=1)
    e["spellcheck_topk"] = (spell, f"""WITH {corpus_ctes()}
SELECT term, levenshtein(term, 'sprk')::INT AS distance, df FROM tstats
WHERE levenshtein(term, 'sprk') <= 2 AND term <> 'sprk' AND term LIKE 's%'
ORDER BY distance ASC, df DESC, term ASC LIMIT 5""")

    # -- onlyMorePopular (round 4; Solr spellcheck.onlyMorePopular /
    # u8:lucene/suggest/.../spell/SpellChecker.java morePopular): the
    # input 'part' IS indexed, so only suggestions with df strictly
    # above part's own df survive — "did you mean the more common
    # spelling". min_prefix=0 because the fixture vocab (29 terms) has
    # no same-first-letter pairs within edit distance 2; with 'part'
    # the filter visibly BITES at sf0.01: 'sort' (higher df) survives
    # while 'fast' (lower df) and 'spark' (equal df — strict >) are
    # excluded. Round 4's input 'scan' had no edit-2 neighbor at all,
    # so the driver compared 0 rows to 0 rows (vacuous pass, caught by
    # tests/test_oracle_nonvacuous.py).
    def spell_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
        idx = index_for(spark, sf_dir)
        return spellcheck(idx, "part", k=5, max_edits=2, min_prefix=0,
                          only_more_popular=True)
    e["spellcheck_more_popular"] = (spell_pop, f"""WITH {corpus_ctes()},
wdf AS (SELECT coalesce(
          (SELECT df FROM tstats WHERE term = 'part'), 0) AS df)
SELECT t.term, levenshtein(t.term, 'part')::INT AS distance, t.df
FROM tstats t CROSS JOIN wdf w
WHERE levenshtein(t.term, 'part') <= 2 AND t.term <> 'part'
  AND t.df > w.df
ORDER BY distance ASC, t.df DESC, t.term ASC LIMIT 5""")

    # -- infix suggestions (round 4; u8:lucene/suggest/.../analyzing/
    # AnalyzingInfixSuggester.java): dictionary terms CONTAINING the
    # fragment, weight-ranked — the "search-anywhere-in-the-suggestion"
    # lookup the prefix suggester can't serve.
    def infix(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import suggest_infix
        idx = index_for(spark, sf_dir)
        return suggest_infix(idx, "ar", k=8)
    e["suggest_infix_topk"] = (infix, f"""WITH {corpus_ctes()}
SELECT term, df, cf FROM tstats
WHERE term LIKE '%ar%' ORDER BY cf DESC, term ASC LIMIT 8""")

    # -- context-filtered suggestions (round 4; Solr suggester
    # contextField / suggest.cfq — u8:solr/core/.../spelling/suggest/
    # SolrSuggester.java, u8:lucene/suggest/.../analyzing/
    # AnalyzingInfixSuggester.java contexts): the dictionary is built
    # from ONLY the matching context slice (lang='de'), so popularity
    # ranks differ from the corpus-wide prefix suggester.
    def ctx_sugg(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import context_suggest
        return context_suggest(_t(spark, sf_dir, "documents"), "me",
                               "lang", "de", k=10)
    e["suggest_context_filtered"] = (ctx_sugg, f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
  FROM documents WHERE lang = 'de'),
ts AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
              count(*)::BIGINT AS cf
       FROM tok WHERE term NOT IN {stoplist_sql()} GROUP BY term)
SELECT term, df, cf FROM ts WHERE term LIKE 'me%'
ORDER BY cf DESC, term ASC LIMIT 10""")

    # -- free-text next-token suggestion (round 4; u8:lucene/suggest/
    # .../analyzing/FreeTextSuggester.java): corpus bigram model with
    # stupid backoff to unigrams — 'merge' exercises the bigram branch,
    # the absent context exercises the backoff branch.
    def freetext(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import free_text_suggest
        return free_text_suggest(_t(spark, sf_dir, "documents"),
                                 ("merge", "zzzqx"), k=5)
    e["suggest_free_text"] = (freetext, f"""
WITH tokall AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents) t),
big AS (SELECT t0.term AS context, t1.term AS suggestion,
               count(*)::BIGINT AS cnt
        FROM tokall t0 JOIN tokall t1
          ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        WHERE t0.term IN ('merge', 'zzzqx')
        GROUP BY 1, 2),
bigk AS (SELECT context, suggestion, cnt, 2::BIGINT AS grams,
                row_number() OVER (PARTITION BY context
                                   ORDER BY cnt DESC, suggestion ASC) AS rn
         FROM big),
uni AS (SELECT term AS suggestion, count(*)::BIGINT AS cnt
        FROM tokall GROUP BY 1
        ORDER BY cnt DESC, suggestion ASC LIMIT 5),
miss(context) AS (SELECT c FROM (VALUES ('merge'), ('zzzqx')) v(c)
                  WHERE c NOT IN (SELECT DISTINCT context FROM big))
SELECT context, suggestion, cnt, grams FROM bigk WHERE rn <= 5
UNION ALL
SELECT m.context, u.suggestion, u.cnt, 1::BIGINT AS grams
FROM miss m CROSS JOIN uni u""")

    # -- WordBreakSpellChecker (round 4; u8:lucene/suggest/.../spell/
    # WordBreakSpellChecker.java): suggestWordBreaks splits a run-on
    # word where both halves are dictionary terms (freq = min of the
    # parts' df, the reference's combined-frequency rule);
    # suggestWordCombinations concatenates adjacent query words into a
    # dictionary term.
    _WB_WORD, _WB_MINLEN = "mergejoin", 2
    _wb_vals = ", ".join(
        f"('{_WB_WORD[:i]}', '{_WB_WORD[i:]}')"
        for i in range(_WB_MINLEN, len(_WB_WORD) - _WB_MINLEN + 1))

    def wbreak(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import word_break
        idx = index_for(spark, sf_dir)
        return word_break(idx, _WB_WORD, k=5, min_break_length=_WB_MINLEN)
    e["spellcheck_word_break"] = (wbreak, f"""WITH {corpus_ctes()},
splits(left_part, right_part) AS (VALUES {_wb_vals})
SELECT s.left_part, s.right_part, least(a.df, b.df)::BIGINT AS freq
FROM splits s JOIN tstats a ON a.term = s.left_part
              JOIN tstats b ON b.term = s.right_part
ORDER BY freq DESC, s.left_part ASC LIMIT 5""")

    def wcombine(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import word_combine
        idx = index_for(spark, sf_dir)
        return word_combine(idx, ("mer", "ge", "join"), k=5)
    e["spellcheck_word_combine"] = (wcombine, f"""WITH {corpus_ctes()},
pairs(left_word, right_word, cat) AS
  (VALUES ('mer', 'ge', 'merge'), ('ge', 'join', 'gejoin'))
SELECT p.left_word, p.right_word, t.term, t.df::BIGINT AS df
FROM pairs p JOIN tstats t ON t.term = p.cat
ORDER BY df DESC, t.term ASC LIMIT 5""")

    # -- spellcheck.collate — "did you mean" with hit verification
    # (round 4; u8:solr/core/.../spelling/SpellCheckCollator.java):
    # both words are misspelled; each takes its best correction and the
    # collation's AND hit count is re-queried.
    def collation(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sparklucene.suggest import collate
        idx = index_for(spark, sf_dir)
        return collate(idx, ("sprk", "mrge"), max_edits=2, min_prefix=1)
    e["spellcheck_collation"] = (collation, f"""WITH {corpus_ctes()},
s1 AS (SELECT term FROM tstats
       WHERE levenshtein(term, 'sprk') <= 2 AND term <> 'sprk'
         AND term LIKE 's%'
       ORDER BY levenshtein(term, 'sprk') ASC, df DESC, term ASC LIMIT 1),
s2 AS (SELECT term FROM tstats
       WHERE levenshtein(term, 'mrge') <= 2 AND term <> 'mrge'
         AND term LIKE 'm%'
       ORDER BY levenshtein(term, 'mrge') ASC, df DESC, term ASC LIMIT 1),
h AS (SELECT count(*)::BIGINT AS hits FROM (
        SELECT doc_id FROM tf WHERE term = (SELECT term FROM s1)
        INTERSECT
        SELECT doc_id FROM tf WHERE term = (SELECT term FROM s2)))
SELECT (SELECT term FROM s1) || ' ' || (SELECT term FROM s2) AS collation,
       (SELECT hits FROM h) AS hits""")

    return e


def _spatial_entries() -> dict[str, tuple[Callable, str | None]]:
    """Spatial surface (round 3; u8:solr geodist()/{!bbox}/
    SpatialHeatmapFacets — sparklucene.spatial). The fixture tables have
    no coordinates, so each entry derives them deterministically from
    doc_id with EXACT integer arithmetic (identical in Spark and DuckDB):
    lat = ((doc_id*7919) % 18000)/100 - 90, lon = ((doc_id*104729) %
    36000)/100 - 180. bbox/heatmap are IEEE-exact; geodist is rounded to
    3 decimals (module float-determinism contract)."""
    from sparklucene.spatial import geodist_km, geodist_sql, heatmap_facet

    e: dict[str, tuple[Callable, str | None]] = {}

    def _pts(spark, sf):
        return _t(spark, sf, "documents").select(
            "doc_id",
            (((F.col("doc_id") * 7919) % 18000) / F.lit(100.0)
             - F.lit(90.0)).alias("lat"),
            (((F.col("doc_id") * 104729) % 36000) / F.lit(100.0)
             - F.lit(180.0)).alias("lon"))

    _PTS_SQL = """pts AS (
  SELECT doc_id,
         ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM documents)"""

    def geo_topk(spark, sf):
        pts = _pts(spark, sf)
        return (pts.select(
            "doc_id", "lat", "lon",
            F.round(geodist_km(F.col("lat"), F.col("lon"), 10.5, 20.25), 3)
            .alias("dist_km"))
            .orderBy(F.asc("dist_km"), F.asc("doc_id")).limit(10))
    e["spatial_geodist_topk"] = (geo_topk, f"""WITH {_PTS_SQL}
SELECT doc_id, lat, lon,
       round({geodist_sql('lat', 'lon', '10.5', '20.25')}, 3) AS dist_km
FROM pts ORDER BY dist_km ASC, doc_id ASC LIMIT 10""")

    def bbox(spark, sf):
        from sparklucene.spatial import bbox_filter
        pts = _pts(spark, sf)
        return (bbox_filter(pts, "lat", "lon", -10.0, 30.0, 0.0, 90.0)
                .orderBy("doc_id").limit(20))
    e["spatial_bbox_filter"] = (bbox, f"""WITH {_PTS_SQL}
SELECT doc_id, lat, lon FROM pts
WHERE lat >= -10.0 AND lat <= 30.0 AND lon >= 0.0 AND lon <= 90.0
ORDER BY doc_id LIMIT 20""")

    def heatmap(spark, sf):
        pts = _pts(spark, sf)
        hm = heatmap_facet(pts, "lat", "lon", -90.0, 90.0, -180.0, 180.0,
                           rows=10, cols=10)
        return (hm.select(F.col("row").alias("cell_row"),
                          F.col("col").alias("cell_col"), "n")
                .orderBy("cell_row", "cell_col"))
    e["spatial_heatmap_facet"] = (heatmap, f"""WITH {_PTS_SQL}
SELECT CAST(least(floor((lat - -90.0) / 18.0), 9) AS BIGINT) AS cell_row,
       CAST(least(floor((lon - -180.0) / 36.0), 9) AS BIGINT) AS cell_col,
       count(*)::BIGINT AS n
FROM pts
WHERE lat >= -90.0 AND lat <= 90.0 AND lon >= -180.0 AND lon <= 180.0
GROUP BY 1, 2 ORDER BY cell_row, cell_col""")

    # -- {!geofilt pt= d=} (round 4; u8:solr/core/.../search/
    # SpatialFilterQParser.java): radius filter — keep docs within d km
    # of the point, nearest first. The distance is rounded to 3 decimals
    # on BOTH sides before the comparison (the module's float-
    # determinism contract), so the boundary is engine-independent.
    def geofilt(spark, sf):
        pts = _pts(spark, sf)
        d = F.round(geodist_km(F.col("lat"), F.col("lon"), 10.5, 20.25), 3)
        return (pts.select("doc_id", d.alias("dist_km"))
                .filter(F.col("dist_km") <= 3000.0)
                .orderBy(F.asc("dist_km"), F.asc("doc_id")))
    e["spatial_geofilt_radius"] = (geofilt, f"""WITH {_PTS_SQL}
SELECT doc_id,
       round({geodist_sql('lat', 'lon', '10.5', '20.25')}, 3) AS dist_km
FROM pts
WHERE round({geodist_sql('lat', 'lon', '10.5', '20.25')}, 3) <= 3000.0
ORDER BY dist_km ASC, doc_id ASC""")

    # -- geohash encode (round 5; u8:solr/core/.../schema/GeoHashField
    # .java / geohash() function via spatial4j GeohashUtils): bucket
    # counts over precision-2 geohash cells — the geohash-facet shape.
    # Integer bit arithmetic end-to-end (the only double steps are the
    # divide-first quantizations, IEEE-identical on both engines), so
    # cells match bit-for-bit.
    def geoh(spark, sf):
        from sparklucene.spatial import geohash_col
        pts = _pts(spark, sf)
        return (pts.groupBy(geohash_col("lat", "lon", precision=2)
                            .alias("cell"))
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), F.asc("cell")).limit(15))
    from sparklucene.spatial import geohash_sql, point_in_polygon_sql
    e["spatial_geohash_facet"] = (geoh, f"""WITH {_PTS_SQL}
SELECT {geohash_sql('lat', 'lon', 2)} AS cell, count(*)::BIGINT AS n
FROM pts GROUP BY 1 ORDER BY n DESC, cell ASC LIMIT 15""")

    # -- point-in-polygon (round 5; query-shape slice of
    # u8:lucene/spatial-extras RecursivePrefixTreeStrategy /
    # LatLonPoint.newPolygonQuery): docs inside a non-convex pentagon,
    # even-odd ray casting as one division-free literal predicate
    # (identical op tree on both engines — membership is bit-exact).
    _POLY = ((10.0, -30.0), (45.0, 10.0), (20.0, 60.0), (-15.0, 40.0),
             (5.0, 5.0))
    def pip(spark, sf):
        from sparklucene.spatial import point_in_polygon
        pts = _pts(spark, sf)
        return (point_in_polygon(pts, "lat", "lon", _POLY)
                .orderBy("doc_id").limit(25))
    e["spatial_point_in_polygon"] = (pip, f"""WITH {_PTS_SQL}
SELECT doc_id, lat, lon FROM pts
WHERE {point_in_polygon_sql('lat', 'lon', _POLY)}
ORDER BY doc_id LIMIT 25""")

    return e


def _monitor_entries() -> dict[str, tuple[Callable, str | None]]:
    """Reverse search — the lucene/monitor module (round 4;
    u8:lucene/monitor/.../Monitor.java, TermFilteredPresearcher.java):
    five registered standing queries (term, conjunction, boolean with
    exclusion, exact phrase, match-all) matched against every document.
    The engine runs presearch (anchor-term equi-join incl. the ANYTOKEN)
    + exact verify; the oracle evaluates each query brute-force as SQL
    predicates over raw tokens — phrase adjacency on PRE-stop positions,
    matching the engine's stop-gap phrase semantics."""
    from sparklucene.monitor import monitor_match
    e: dict[str, tuple[Callable, str | None]] = {}

    def mon(spark, sf):
        docs = _t(spark, sf, "documents")
        qs = {
            "q_term": Term("merge"),
            "q_and": And((Term("merge"), Term("join"))),
            "q_not": Not(Or((Term("hash"), Term("scan"))),
                         Term("parallel")),
            "q_phrase": Phrase(((0, "merge"), (1, "join"))),
            "q_all": MatchAllDocs(),
        }
        return monitor_match(docs, qs)

    stop = stoplist_sql()
    e["monitor_match_docs"] = (mon, f"""
WITH tokp AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
        FROM documents) t),
tfm AS (SELECT DISTINCT doc_id, term FROM tokp WHERE term NOT IN {stop})
SELECT doc_id, query_id FROM (
  SELECT doc_id, 'q_term' AS query_id FROM tfm WHERE term = 'merge'
  UNION ALL
  SELECT doc_id, 'q_and' FROM tfm WHERE term IN ('merge', 'join')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
  UNION ALL
  SELECT DISTINCT doc_id, 'q_not' FROM tfm
  WHERE term IN ('hash', 'scan')
    AND doc_id NOT IN (SELECT doc_id FROM tfm WHERE term = 'parallel')
  UNION ALL
  SELECT DISTINCT t0.doc_id, 'q_phrase'
  FROM tokp t0 JOIN tokp t1
    ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  WHERE t0.term = 'merge' AND t1.term = 'join'
  UNION ALL
  SELECT doc_id, 'q_all' FROM documents
) m ORDER BY doc_id, query_id""")
    return e


def _ltr_entries() -> dict[str, tuple[Callable, str | None]]:
    """Learning-to-rank rerank (round 4; u8:solr/contrib/ltr/...):
    first-pass BM25 top-50 for ``merge OR join``, three declared features
    (original score, min-max-normalized n_chars, a term-match flag), a
    linear model re-scoring the window, top-10 returned with the feature
    vector. The oracle recomputes the first pass brute-force (the same
    f64 BM25 parity contract as every search entry), extracts the same
    features in SQL, and applies the identical fixed-order float64
    expression tree."""
    from sparklucene.ltr import (FieldValue, LinearModel, OriginalScore,
                                 TermMatch, ltr_rerank)
    e: dict[str, tuple[Callable, str | None]] = {}

    def ltr(spark, sf):
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        feats = (OriginalScore("orig"),
                 FieldValue("len_norm", norm=(0.0, 5000.0), col="n_chars"),
                 TermMatch("has_fast", term="fast"))
        model = LinearModel((("orig", 1.0), ("len_norm", -2.0),
                             ("has_fast", 0.5)))
        return ltr_rerank(idx, Or((Term("join"), Term("merge"))), feats,
                          model, k=10, rerank_k=50, attrs=attrs)

    score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count",
                           "g.sum_dl")
    e["ltr_linear_rerank"] = (ltr, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')
),
first AS (
  SELECT doc_id,
         CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS orig_score
  FROM term_scores GROUP BY doc_id
  ORDER BY orig_score DESC, doc_id ASC LIMIT 50
),
feats AS (
  SELECT f.doc_id, f.orig_score, f.orig_score AS orig,
         (CAST(d.n_chars AS DOUBLE) - 0.0) / 5000.0 AS len_norm,
         CASE WHEN EXISTS (SELECT 1 FROM tf
                           WHERE tf.doc_id = f.doc_id AND tf.term = 'fast')
              THEN 1.0 ELSE 0.0 END AS has_fast
  FROM first f JOIN documents d USING (doc_id)
)
SELECT doc_id, orig_score, orig, len_norm, has_fast,
       0.0 + (1.0 * orig) + (-2.0 * len_norm) + (0.5 * has_fast)
       AS ltr_score
FROM feats ORDER BY ltr_score DESC, doc_id ASC LIMIT 10""")

    # -- MultipleAdditiveTreesModel (round 4; u8:solr/contrib/ltr/.../
    # model/MultipleAdditiveTreesModel.java): the same three features
    # routed down a 2-tree GBDT ensemble — each tree is ONE nested
    # Catalyst CASE (<= goes left, the reference's RegressionTreeNode
    # predicate), score = sum_t weight_t * leaf_t in declaration order.
    # The oracle re-derives the first pass + features as above and
    # evaluates the IDENTICAL nested CASE expressions.
    def ltr_trees(spark, sf):
        from sparklucene.ltr import AdditiveTreesModel, TreeNode
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        feats = (OriginalScore("orig"),
                 FieldValue("len_norm", norm=(0.0, 5000.0), col="n_chars"),
                 TermMatch("has_fast", term="fast"))
        t1 = TreeNode(feature="len_norm", threshold=0.07,
                      left=TreeNode(feature="has_fast", threshold=0.5,
                                    left=TreeNode(value=0.1),
                                    right=TreeNode(value=0.6)),
                      right=TreeNode(feature="orig", threshold=0.355,
                                     left=TreeNode(value=-0.2),
                                     right=TreeNode(value=0.3)))
        t2 = TreeNode(feature="orig", threshold=0.352,
                      left=TreeNode(value=0.0),
                      right=TreeNode(feature="len_norm", threshold=0.09,
                                     left=TreeNode(value=0.8),
                                     right=TreeNode(value=0.2)))
        model = AdditiveTreesModel(((1.0, t1), (0.5, t2)))
        return ltr_rerank(idx, Or((Term("join"), Term("merge"))), feats,
                          model, k=10, rerank_k=50, attrs=attrs)

    e["ltr_trees_rerank"] = (ltr_trees, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')
),
first AS (
  SELECT doc_id,
         CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS orig_score
  FROM term_scores GROUP BY doc_id
  ORDER BY orig_score DESC, doc_id ASC LIMIT 50
),
feats AS (
  SELECT f.doc_id, f.orig_score, f.orig_score AS orig,
         (CAST(d.n_chars AS DOUBLE) - 0.0) / 5000.0 AS len_norm,
         CASE WHEN EXISTS (SELECT 1 FROM tf
                           WHERE tf.doc_id = f.doc_id AND tf.term = 'fast')
              THEN 1.0 ELSE 0.0 END AS has_fast
  FROM first f JOIN documents d USING (doc_id)
)
SELECT doc_id, orig_score, orig, len_norm, has_fast,
       0.0
       + 1.0 * (CASE WHEN len_norm <= 0.07
                     THEN CASE WHEN has_fast <= 0.5 THEN 0.1 ELSE 0.6 END
                     ELSE CASE WHEN orig <= 0.355 THEN -0.2 ELSE 0.3 END END)
       + 0.5 * (CASE WHEN orig <= 0.352 THEN 0.0
                     ELSE CASE WHEN len_norm <= 0.09
                               THEN 0.8 ELSE 0.2 END END)
       AS ltr_score
FROM feats ORDER BY ltr_score DESC, doc_id ASC LIMIT 10""")
    return e


def _frange_entries() -> dict[str, tuple[Callable, str | None]]:
    """FunctionRangeQuery / ``{!frange}`` (round 4; u8:solr/core/.../
    search/function/FunctionRangeQuery.java): a non-scoring doc-set
    filter by a function over doc attributes, cogrouped into the range
    scorer (filter context — scores unchanged). Two entries: a scoring
    boolean under an attribute-range fq, and ``q=*:*`` under a computed-
    function fq (the classic frange shape)."""
    from sparklucene.search import frange_docs
    e: dict[str, tuple[Callable, str | None]] = {}

    def fr_scored(spark, sf):
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        flt = frange_docs(attrs, F.col("n_chars"), lower=500, upper=2500,
                          incl=True, incu=False)
        return search(idx, Or((Term("join"), Term("merge"))), k=10,
                      mode="f64", doc_filter=flt)

    score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count",
                           "g.sum_dl")
    e["frange_filtered_search"] = (fr_scored, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')
    AND tf.doc_id IN (SELECT doc_id FROM documents
                      WHERE n_chars >= 500 AND n_chars < 2500)
)
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def fr_matchall(spark, sf):
        from sparklucene.query import MatchAllDocs as MA
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        flt = frange_docs(attrs, F.col("n_chars") % 10, lower=0, upper=2)
        return search(idx, MA(), k=15, mode="f64", doc_filter=flt)

    e["frange_matchall_function"] = (fr_matchall, """
SELECT doc_id, 1.0 AS score FROM documents
WHERE (n_chars % 10) >= 0 AND (n_chars % 10) <= 2
ORDER BY score DESC, doc_id ASC LIMIT 15""")

    # -- {!boost b=} / FunctionScoreQuery / ExternalFileField (round 4):
    # final score = BM25 × (1 + (n_chars % 100)/100), the multiplicative
    # popularity-boost shape. Exhaustive scoring (an arbitrary multiplier
    # breaks impact monotonicity — the reference pays the same); the
    # f64 product is a single op, so the oracle matches bit-for-bit.
    def boosted(spark, sf):
        from sparklucene.search import boost_by
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        fac = (F.lit(1.0)
               + (F.col("n_chars") % 100).cast("double") / F.lit(100.0))
        return boost_by(idx, Or((Term("join"), Term("merge"))), attrs,
                        fac, k=10, mode="f64")

    score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count",
                           "g.sum_dl")
    e["boost_by_external_field"] = (boosted, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')
),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS bm25
  FROM term_scores GROUP BY doc_id)
SELECT ds.doc_id,
       ds.bm25 * (1.0 + CAST(d.n_chars % 100 AS DOUBLE) / 100.0) AS score
FROM doc_scores ds JOIN documents d USING (doc_id)
ORDER BY score DESC, ds.doc_id ASC LIMIT 10""")

    # -- FeatureField saturation query (round 4;
    # u8:lucene/core/.../document/FeatureField.java newSaturationQuery):
    # static-rank signal added as a SHOULD clause — final score =
    # BM25 + weight · f/(f+pivot). Exhaustive over the match set for the
    # same impact-monotonicity reason as {!boost}.
    def feat_sat(spark, sf):
        from sparklucene.search import feature_query
        idx = index_for(spark, sf)
        attrs = _t(spark, sf, "documents").select("doc_id", "n_chars")
        return feature_query(idx, Or((Term("join"), Term("merge"))),
                             attrs, F.col("n_chars"), kind="saturation",
                             weight=2.0, pivot=1000.0, k=10, mode="f64")

    e["feature_field_saturation"] = (feat_sat, f"""WITH {corpus_ctes()},
term_scores AS (
  SELECT tf.doc_id, {score} AS s
  FROM tf
  JOIN tstats s ON tf.term = s.term
  JOIN meta m ON tf.doc_id = m.doc_id
  CROSS JOIN gstats g
  WHERE tf.term IN ('join', 'merge')
),
doc_scores AS (
  SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS bm25
  FROM term_scores GROUP BY doc_id)
SELECT ds.doc_id,
       ds.bm25 + 2.0 * (greatest(CAST(d.n_chars AS DOUBLE), 0.0)
                        / (greatest(CAST(d.n_chars AS DOUBLE), 0.0) + 1000.0))
         AS score
FROM doc_scores ds JOIN documents d USING (doc_id)
ORDER BY score DESC, ds.doc_id ASC LIMIT 10""")
    return e


def _update_entries() -> dict[str, tuple[Callable, str | None]]:
    """Atomic updates (round 4; u8:solr/core/.../update/processor/
    AtomicUpdateDocumentMerger.java): the stored-doc merge half — set
    replaces a field, inc adds to a numeric one, NULL update cells leave
    the field untouched, docs outside the batch pass through. The
    reindex half (update_index) is covered by streaming==batch-style
    equality tests (filesystem mutation is not SQL-expressible)."""
    from sparklucene.updates import apply_atomic_updates
    e: dict[str, tuple[Callable, str | None]] = {}

    def atomic(spark, sf):
        docs = _t(spark, sf, "documents") \
            .select("doc_id", "lang", "source", "n_chars")
        updates = spark.createDataFrame(
            [(1, "xx", 100), (3, "xx", -50), (5, None, 100)],
            "doc_id long, lang string, n_chars long")
        return apply_atomic_updates(
            docs, updates, {"lang": "set", "n_chars": "inc"}) \
            .orderBy("doc_id")

    e["atomic_update_merge"] = (atomic, """
WITH up AS (SELECT * FROM (VALUES (1, 'xx', 100), (3, 'xx', -50),
                                  (5, NULL, 100))
            AS t(doc_id, lang_u, inc_u))
SELECT d.doc_id, coalesce(u.lang_u, d.lang) AS lang, d.source,
       (d.n_chars + coalesce(u.inc_u, 0))::BIGINT AS n_chars
FROM documents d LEFT JOIN up u USING (doc_id)
ORDER BY d.doc_id""")

    # -- multivalued atomic ops (round 4; AtomicUpdateDocumentMerger
    # doAdd/doAddDistinct/doRemove): both sides derive the same array
    # columns from doc_id (the corpus has none); docs with doc_id % 5
    # = 0 get 'extra' appended to tags (add-distinct — half already
    # contain it via % 6) and every 'x' removed from labels.
    def atomic_mv(spark, sf):
        from sparklucene.updates import apply_atomic_updates
        d = F.col("doc_id")
        base = _t(spark, sf, "documents").select(
            "doc_id",
            F.array(F.concat(F.lit("t"), (d % 3).cast("string")),
                    F.when(d % 6 == 0, F.lit("extra"))
                    .otherwise(F.lit("common"))).alias("tags"),
            F.array(F.concat(F.lit("l"), (d % 2).cast("string")),
                    F.lit("x")).alias("labels"))
        ups = (base.filter(d % 5 == 0)
               .select("doc_id",
                       F.array(F.lit("extra")).alias("tags"),
                       F.array(F.lit("x")).alias("labels")))
        out = apply_atomic_updates(base, ups,
                                   {"tags": "add-distinct",
                                    "labels": "remove"})
        return (out.select("doc_id",
                           F.array_join("tags", ",").alias("tags"),
                           F.array_join("labels", ",").alias("labels"))
                .orderBy("doc_id"))
    e["atomic_update_multivalued"] = (atomic_mv, """
WITH base AS (
  SELECT doc_id,
         ['t' || (doc_id % 3),
          CASE WHEN doc_id % 6 = 0 THEN 'extra' ELSE 'common' END] AS tags,
         ['l' || (doc_id % 2), 'x'] AS labels
  FROM documents),
upd AS (SELECT doc_id FROM base WHERE doc_id % 5 = 0)
SELECT b.doc_id,
       array_to_string(CASE WHEN u.doc_id IS NULL THEN b.tags
            WHEN list_contains(b.tags, 'extra') THEN b.tags
            ELSE list_concat(b.tags, ['extra']) END, ',') AS tags,
       array_to_string(CASE WHEN u.doc_id IS NULL THEN b.labels
            ELSE list_filter(b.labels, v -> v != 'x') END, ',') AS labels
FROM base b LEFT JOIN upd u USING (doc_id)
ORDER BY b.doc_id""")
    return e


def _parser_entries() -> dict[str, tuple[Callable, str | None]]:
    """Classic QueryParser surface end-to-end (round 4;
    u8:lucene/queryparser/.../classic/QueryParser.jj): query STRINGS with
    occurs + prefix wildcard + negation, and boosts + term ranges, parsed
    by ``query.parse`` and executed by the engine; oracles re-derive the
    dictionary expansions and the boosted/constant-score sums."""
    e: dict[str, tuple[Callable, str | None]] = {}
    tscore = bm25.score_sql("tf.tf", "m.dlq", "ts.df", "g.doc_count",
                            "g.sum_dl")

    # -- SimpleQueryParser (round 4; u8:lucene/queryparser/.../simple/
    # SimpleQueryParser.java — ES simple_query_string): the lenient
    # end-user grammar parsed into Not(And(merge, Or(join, "fast
    # merge")), slow) and executed; the oracle re-derives the nested
    # boolean: merge required, the or-branch required non-empty, slow
    # excluded, score = sum of matched positive leaf scores.
    def simple_q(spark, sf):
        from sparklucene.query import parse_simple
        q = parse_simple('merge +(join | "fast merge") -slow')
        return search(index_for(spark, sf), q, k=10, mode="f64")
    _sq_ctes, _sq_pscore = phrase_ctes_and_score([(0, "fast"),
                                                  (1, "merge")])
    e["simple_query_topk"] = (simple_q, f"""WITH {corpus_ctes()},{_sq_ctes},
s_m AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'merge'),
s_j AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'join'),
s_p AS (
  SELECT pf.doc_id, {_sq_pscore} AS s
  FROM pf JOIN meta m ON pf.doc_id = m.doc_id CROSS JOIN gstats g),
matched AS (
  -- nested-boolean rounding parity: the engine's Or SUBTREE returns an
  -- f32 (scorer._or_generic sums leaf f32s in f64, then rounds), and the
  -- outer And sums those f32 clause results in f64 — so the or-branch
  -- here must round to REAL before the final sum, or a doc whose total
  -- sits near an f32 midpoint hashes 1 ULP apart (bit at sf0.01 doc 88)
  SELECT sm.doc_id,
         CAST(sm.s AS DOUBLE)
           + CAST(CAST(coalesce(CAST(sj.s AS DOUBLE), 0)
                       + coalesce(CAST(sp.s AS DOUBLE), 0) AS REAL)
                  AS DOUBLE) AS tot
  FROM s_m sm
  LEFT JOIN s_j sj USING (doc_id)
  LEFT JOIN s_p sp USING (doc_id)
  WHERE (sj.doc_id IS NOT NULL OR sp.doc_id IS NOT NULL)
    AND sm.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'slow'))
SELECT doc_id, CAST(CAST(tot AS REAL) AS DOUBLE) AS score
FROM matched ORDER BY score DESC, doc_id ASC LIMIT 10""")

    def mixed(spark, sf):
        q = parse("+merge +jo* -parallel")
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["parser_classic_mixed"] = (mixed, f"""WITH {corpus_ctes()},
cs AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'jo%'),
term_scores AS (
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'merge'
    AND tf.doc_id IN (SELECT doc_id FROM cs)
    AND tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'parallel'))
SELECT doc_id,
       CAST(CAST(CAST(1.0 AS DOUBLE) + sum(CAST(s AS DOUBLE)) AS REAL)
            AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    idf_e = "ln(1.0 + (g.doc_count - ts.df + 0.5) / (ts.df + 0.5))"
    avgdl_e = "(g.sum_dl / CAST(g.doc_count AS DOUBLE))"
    denom_e = f"(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dlq / {avgdl_e}))"
    boosted2 = f"CAST(((2.0 * {idf_e}) * tf.tf) / {denom_e} AS REAL)"

    def range_boost(spark, sf):
        q = parse("+merge^2 +[scan TO spark]")
        return search(index_for(spark, sf), q, k=10, mode="f64")
    e["parser_range_boost"] = (range_boost, f"""WITH {corpus_ctes()},
rs AS (SELECT DISTINCT doc_id FROM tf
       WHERE term >= 'scan' AND term <= 'spark'),
term_scores AS (
  SELECT tf.doc_id, {boosted2} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'merge'
    AND tf.doc_id IN (SELECT doc_id FROM rs))
SELECT doc_id,
       CAST(CAST(CAST(1.0 AS DOUBLE) + sum(CAST(s AS DOUBLE)) AS REAL)
            AS DOUBLE) AS score
FROM term_scores GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")

    # -- ReversedWildcardFilter (round 4; u8:solr/core/.../analysis/
    # ReversedWildcardFilterFactory.java): '*ge' is a full-dictionary
    # scan on the forward vocabulary; reversed onto a reverse-token
    # field it becomes Prefix('eg') — a sorted-dictionary SEEK. The
    # oracle evaluates the equivalent forward LIKE '%ge' (same doc
    # set by construction), proving the rewrite is semantics-preserving.
    def rev_wild(spark, sf):
        from sparklucene.analysis import AnalyzerConfig
        from sparklucene.build import Field
        from sparklucene.query import reverse_wildcards
        idx = index_for(
            spark, sf, variant="rev",
            extra_fields=(Field("rev", "content",
                                AnalyzerConfig(reverse_tokens=True)),))
        q = reverse_wildcards(parse("*ge vector"), "rev")
        return search(idx, q, k=10, mode="f64")
    e["reversed_leading_wildcard"] = (rev_wild, f"""WITH {corpus_ctes()},
uni AS (
  SELECT DISTINCT doc_id, CAST(1.0 AS REAL) AS s
  FROM tf WHERE term LIKE '%ge'
  UNION ALL
  SELECT tf.doc_id, {tscore} AS s
  FROM tf JOIN tstats ts ON tf.term = ts.term
  JOIN meta m ON tf.doc_id = m.doc_id CROSS JOIN gstats g
  WHERE tf.term = 'vector')
SELECT doc_id, CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE) AS score
FROM uni GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10""")
    return e


def _classify_entries() -> dict[str, tuple[Callable, str | None]]:
    """Lucene classification module (u8:lucene/classification/.../
    SimpleNaiveBayesClassifier.java, KNearestNeighborClassifier.java):
    train on the labeled 80% split (doc_id % 5 != 0), classify the 20%
    holdout. Exact pinned specs in classify.py; the oracles re-derive
    every class statistic from raw tokens in SQL."""
    e: dict[str, tuple[Callable, str | None]] = {}

    splits = """
tr AS (SELECT doc_id, lang FROM documents WHERE doc_id % 5 != 0),
te AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
ttf AS (SELECT f.doc_id, f.term, CAST(f.tf AS DOUBLE) AS tf, tr.lang AS label
        FROM tf f JOIN tr USING (doc_id)),
qtf AS (SELECT f.doc_id, f.term, CAST(f.tf AS DOUBLE) AS tf
        FROM tf f JOIN te USING (doc_id))"""

    def nb(spark, sf):
        from sparklucene.classify import naive_bayes_classify
        docs = _t(spark, sf, "documents")
        train = docs.filter(F.col("doc_id") % 5 != 0)
        test = docs.filter(F.col("doc_id") % 5 == 0)
        return naive_bayes_classify(train, test)
    e["classify_naive_bayes"] = (nb, f"""WITH {corpus_ctes()},{splits},
cls_cf AS (SELECT label, term, sum(tf) AS cf FROM ttf GROUP BY label, term),
cls_tot AS (SELECT label, sum(cf) AS tokens_c FROM cls_cf GROUP BY label),
cls_docs AS (SELECT lang AS label, count(*)::DOUBLE AS n_c
             FROM tr GROUP BY lang),
gl AS (SELECT (SELECT count(*) FROM tr)::DOUBLE AS n_train,
              (SELECT count(DISTINCT term) FROM ttf)::DOUBLE AS vocab),
qlen AS (SELECT doc_id, sum(tf) AS dl FROM qtf GROUP BY doc_id),
matched AS (
  SELECT q.doc_id, c.label,
         sum(CAST(CAST(q.tf * ln(c.cf + 1.0) AS REAL) AS DOUBLE)) AS matched
  FROM qtf q JOIN cls_cf c USING (term) GROUP BY q.doc_id, c.label),
scores AS (
  SELECT ql.doc_id, cd.label,
         ln(cd.n_c / gl.n_train) + coalesce(m.matched, 0.0)
         - ql.dl * ln(ct.tokens_c + gl.vocab) AS score
  FROM qlen ql CROSS JOIN cls_docs cd
  JOIN cls_tot ct ON ct.label = cd.label CROSS JOIN gl
  LEFT JOIN matched m ON m.doc_id = ql.doc_id AND m.label = cd.label),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rn
  FROM scores)
SELECT doc_id, label, CAST(CAST(score AS REAL) AS DOUBLE) AS score
FROM ranked WHERE rn = 1 ORDER BY doc_id""")

    def knnc(spark, sf):
        from sparklucene.classify import knn_classify
        docs = _t(spark, sf, "documents")
        train = docs.filter(F.col("doc_id") % 5 != 0)
        test = docs.filter(F.col("doc_id") % 5 == 0)
        return knn_classify(train, test, k=5)
    e["classify_knn_vote"] = (knnc, f"""WITH {corpus_ctes()},{splits},
ntr AS (SELECT count(*)::DOUBLE AS n FROM tr),
tdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM ttf GROUP BY term),
tw AS (SELECT t.doc_id AS t_id, t.term,
              t.tf * ln(1.0 + (n.n - s.df + 0.5) / (s.df + 0.5)) AS w
       FROM ttf t JOIN tdf s USING (term) CROSS JOIN ntr n),
qw AS (SELECT q.doc_id AS q_id, q.term,
              q.tf * ln(1.0 + (n.n - s.df + 0.5) / (s.df + 0.5)) AS qw
       FROM qtf q JOIN tdf s USING (term) CROSS JOIN ntr n),
tn AS (SELECT t_id, sqrt(sum(w * w)) AS tn FROM tw GROUP BY t_id),
qn AS (SELECT q_id, sqrt(sum(qw * qw)) AS qn FROM qw GROUP BY q_id),
dots AS (SELECT q.q_id, t.t_id, sum(t.w * q.qw) AS dot
         FROM tw t JOIN qw q USING (term) GROUP BY q.q_id, t.t_id),
cosine AS (
  SELECT d.q_id, d.t_id,
         CAST(CAST(d.dot / (tn.tn * qn.qn) AS REAL) AS DOUBLE) AS cosine
  FROM dots d JOIN tn USING (t_id) JOIN qn USING (q_id)),
nbrs AS (
  SELECT q_id, t_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, t_id ASC) AS rn
  FROM cosine),
votes AS (
  SELECT n.q_id, tr.lang AS label, count(*)::BIGINT AS votes
  FROM nbrs n JOIN tr ON tr.doc_id = n.t_id
  WHERE n.rn <= 5 GROUP BY n.q_id, tr.lang),
winner AS (
  SELECT q_id, label, votes,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, label ASC) AS rn
  FROM votes)
SELECT q_id AS doc_id, label, votes
FROM winner WHERE rn = 1 ORDER BY doc_id""")
    return e


def registry() -> dict[str, tuple[Callable, str | None]]:
    e: dict[str, tuple[Callable, str | None]] = {}
    e.update(_search_entries())
    e.update(_query_algebra_entries())
    e.update(_multifield_entries())
    e.update(_analyzer_entries())
    e.update(_join_entries())
    e.update(_index_stat_entries())
    e.update(_facet_entries())
    e.update(_stream_entries())
    e.update(_window_entries())
    e.update(_termdict_entries())
    e.update(_suggest_entries())
    e.update(_textops_entries())
    e.update(_dedup_entries())
    e.update(_similarity_entries())
    e.update(_routed_entries())
    e.update(_intervals_entries())
    e.update(_payload_entries())
    e.update(_multimodal_entries())
    e.update(_result_composition_entries())
    e.update(_sql_surface_entries())
    e.update(_streaming_entries())
    e.update(_scalar_fn_entries())
    e.update(_spatial_entries())
    e.update(_monitor_entries())
    e.update(_ltr_entries())
    e.update(_frange_entries())
    e.update(_update_entries())
    e.update(_parser_entries())
    e.update(_classify_entries())
    # the driver checks a bounded PREFIX of the registry each round, so
    # ordering is evidence policy (never-driver-checked entries lead —
    # the round-2/round-4 verdicts' priority scale: zero-row is a
    # strictly worse evidence state than stale-but-green, because every
    # entry is re-verified against DuckDB on current code each session
    # by tests/test_driver_contract.py regardless). Round-5 ordering:
    #   1. brand-new round-5 entries (no driver row, not in the frozen
    #      _R05_PRIORITY list) — novel code, highest evidence value;
    #   2. the 73 entries never checked by any of r1–r4, in
    #      _R05_PRIORITY order (highest-complexity operators first so
    #      they land inside the ~50-entry round-5 window);
    #   3. the 87 entries whose latest row dates from r1/r2, stalest
    #      first (_STALE_FIRST — r4 re-checked none of these, its
    #      window was all brand-new r4 entries per CORRECTNESS_r04);
    #   4. r3/r4-checked entries (freshest evidence) close the
    #      registry. Every entry keeps a deterministic position.
    no_row = {k for k in e if k not in _ANY_DRIVER_ROW}
    brand_new = {k: e[k] for k in e
                 if k in no_row and k not in _R05_PRIORITY}
    never = {k: e[k] for k in _R05_PRIORITY if k in e}
    stale = {k: e[k] for k in _STALE_FIRST if k in e and k not in no_row}
    tail = {k: v for k, v in e.items()
            if k not in brand_new and k not in never and k not in stale}
    return {**brand_new, **never, **stale, **tail}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry(): hydrated two-phase flagship query (SURVEY.md §7.5)."""
    idx = index_for(spark, sf_dir)
    corpus = load_corpus(spark, sf_dir)
    q = Or((Term("spark"), Term("merge"), Term("join")))
    return search(idx, q, k=10, mode="f64", prune=True, hydrate=corpus)

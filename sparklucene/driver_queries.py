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
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparklucene import bm25
from sparklucene.analysis import TOKEN_RE_SQL, stoplist_sql
from sparklucene.build import FORMAT_VERSION, build_index, load_stats
from sparklucene.corpus import load_corpus
from sparklucene.norms import LENGTH_TABLE, quantize_length_sql
from sparklucene.query import And, Not, Or, Query, Term
from sparklucene.search import Index, search

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
                  msm: int = 1, neg_terms: list[str] | None = None) -> str:
    """Brute-force BM25 top-k in DuckDB, float-op-for-float-op identical to
    the engine's f64 scoring mode (bm25.score_f64 / score_sql)."""
    score = bm25.score_sql("tf.tf", "m.dlq", "s.df", "g.doc_count", "g.sum_dl")
    having = {"or": f"count(*) >= {msm}",
              "and": f"count(*) = {len(set(pos_terms))}"}[mode]
    neg = ""
    if neg_terms:
        neg = (f" AND tf.doc_id NOT IN (SELECT doc_id FROM tf "
               f"WHERE term IN {_terms_in(neg_terms)})")
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


# ---------------------------------------------------------------------------
# engine plumbing (Spark side)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, Index] = {}


def index_for(spark: SparkSession, sf_dir: str) -> Index:
    """Build-once-per-corpus index handle (disk-cached across processes)."""
    key = os.path.realpath(sf_dir)
    idx = _INDEX_CACHE.get(key)
    if idx is not None:
        return idx
    tag = hashlib.sha256(key.encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "sparklucene-idx", f"{os.path.basename(key)}-{tag}")
    fresh = False
    if os.path.exists(os.path.join(index_dir, "stats.json")):
        fresh = load_stats(index_dir).get("format") == FORMAT_VERSION
    if not fresh:
        import shutil
        shutil.rmtree(index_dir, ignore_errors=True)
        corpus = load_corpus(spark, sf_dir)
        build_index(spark, corpus, index_dir)
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

    e["bm25_and_missing_term"] = (
        # AND with an unindexed term -> empty (Lucene null-scorer semantics)
        _bm25(And((Term("spark"), Term("zzz_not_in_corpus"))), k=10),
        bm25_topk_sql(["spark", "zzz_not_in_corpus"], k=10, mode="and"))

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

    def facet_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return (docs.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= 3)
                .orderBy("lang", "source"))
    e["facet_pivot_lang_source"] = (facet_pivot, """
SELECT lang, source, count(*)::BIGINT AS cnt FROM documents
GROUP BY lang, source HAVING count(*) >= 3 ORDER BY lang, source""")

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

    return e


# ---------------------------------------------------------------------------
# public registry assembly
# ---------------------------------------------------------------------------

def registry() -> dict[str, tuple[Callable, str | None]]:
    e: dict[str, tuple[Callable, str | None]] = {}
    e.update(_search_entries())
    e.update(_index_stat_entries())
    e.update(_facet_entries())
    return e


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry(): hydrated two-phase flagship query (SURVEY.md §7.5)."""
    idx = index_for(spark, sf_dir)
    corpus = load_corpus(spark, sf_dir)
    q = Or((Term("spark"), Term("merge"), Term("join")))
    return search(idx, q, k=10, mode="f64", prune=True, hydrate=corpus)

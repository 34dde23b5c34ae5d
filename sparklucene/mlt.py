"""MoreLikeThis — similar-document retrieval from a seed doc.

Mirrors the capability of Lucene's MoreLikeThis (public knowledge:
lucene/queries/.../mlt/MoreLikeThis.java): take the seed document's
highest-weighted terms and run them as a disjunction, excluding the seed.

Term selection weight adapts the classic interestingness score to this
engine's pinned similarity: weight(t) = tf_seed(t) * idf_bm25(df_t, N)
with the Lucene 8.x idf (ln(1 + (N - df + 0.5)/(df + 0.5))); ties break
on term ascending so selection is deterministic and SQL-reproducible.
The seed's stats come from the term dictionary (one memoized lookup);
only the final disjunction touches the postings — identical cost profile
to any other OR query.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklucene import bm25
from sparklucene.analysis import tokenize_text
from sparklucene.query import MatchNoDocs, Or, Term
from sparklucene.search import Index, search


def more_like_this(index: Index, corpus: DataFrame, doc_id: int,
                   max_terms: int = 5, k: int = 10, mode: str = "lucene8",
                   min_df: int = 1) -> DataFrame:
    """Top-k docs most similar to ``doc_id`` (seed excluded)."""
    rows = (corpus.filter(F.col("doc_id") == int(doc_id))
            .select("content").collect())
    if not rows:
        return search(index, MatchNoDocs(), k=k, mode=mode)
    tf = Counter(tokenize_text(rows[0][0]))
    stats = index.term_stats_for(sorted(tf))
    n = int(index.stats["doc_count"])
    weighted = [(t, tf[t] * bm25.idf(s.df, n))
                for t, s in stats.items() if s.df >= min_df]
    top = sorted(weighted, key=lambda x: (-x[1], x[0]))[:max_terms]
    if not top:
        return search(index, MatchNoDocs(), k=k, mode=mode)
    q = Or(tuple(Term(t) for t, _ in top))
    return search(index, q, k=k, mode=mode, exclude_docs=[int(doc_id)])


def interesting_terms(index: Index, corpus: DataFrame, doc_id: int,
                      max_terms: int = 5, min_df: int = 1) -> DataFrame:
    """``mlt.interestingTerms=details`` (public knowledge:
    ``u8:solr/core/.../handler/MoreLikeThisHandler.java``): the terms MLT
    selected from the seed doc with their selection weights — the
    introspection half of :func:`more_like_this`, same tf·idf
    interestingness score and the same (weight desc, term asc) pin.
    Returns (term, tf, df, weight); weight is f32-rounded like every
    exposed score.

    Scale shape: identical to MLT's seed phase — one doc_id-pushdown
    read of the seed row, a max_terms-bounded dictionary lookup; nothing
    data-proportional.
    """
    rows = (corpus.filter(F.col("doc_id") == int(doc_id))
            .select("content").collect())
    spark = index.spark
    schema = "term string, tf long, df long, weight double"
    if not rows:
        return spark.createDataFrame([], schema)
    tf = Counter(tokenize_text(rows[0][0]))
    stats = index.term_stats_for(sorted(tf))
    n = int(index.stats["doc_count"])
    weighted = [(t, int(tf[t]), int(s.df), tf[t] * bm25.idf(s.df, n))
                for t, s in stats.items() if s.df >= min_df]
    top = sorted(weighted, key=lambda x: (-x[3], x[0]))[:max_terms]
    data = [(t, tfv, df, float(np.float32(w))) for t, tfv, df, w in top]
    return spark.createDataFrame(data, schema)


def knn_text(index: Index, corpus: DataFrame, doc_id: int, k: int = 10
             ) -> DataFrame:
    """KnnStream — k-nearest documents to a seed doc by TF-IDF cosine
    (u8:solr/solrj/.../io/stream/KnnStream.java, which is MoreLikeThis-
    based k-nearest by text; SURVEY.md §2.9, previously scoped out).

    Pinned engine spec: w(d,t) = tf(d,t) * idf(t) with the Lucene 8.x
    idf ln(1 + (N - df + 0.5)/(df + 0.5));
    cosine(q,d) = dot(q,d) / (||q|| * ||d||), reported as float32 (ties
    broken doc_id ASC, seed excluded).

    Scale shape: term weights are one scan + partial-agg groupBy; the
    seed's sparse vector and norm are broadcast; candidates are docs
    sharing >= 1 term with the seed (equi-join on term — docs sharing
    nothing have cosine 0 and are correctly absent). idf runs in an
    Arrow-batched pandas UDF so ln is glibc ln on both engine and
    oracle (np.log == DuckDB ln — same contract the LM similarities pin).
    """
    from sparklucene.analysis import make_tokenize_udf

    seed = int(doc_id)
    n = int(index.stats["doc_count"])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def idf_of(df_s: pd.Series) -> pd.Series:
        import numpy as np
        d = df_s.to_numpy(dtype=np.float64)
        return pd.Series(np.log(1.0 + (n - d + 0.5) / (d + 0.5)))

    tok = make_tokenize_udf()
    tf = (corpus.select("doc_id", F.explode(tok(F.col("content"))).alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("double").alias("tf")))
    ts = index.termstats().select("term", "df")
    w = (tf.join(ts, "term")
         .select("doc_id", "term",
                 (F.col("tf") * idf_of(F.col("df"))).alias("w")))
    norms = (w.groupBy("doc_id")
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    seed_w = (w.filter(F.col("doc_id") == seed)
              .select("term", F.col("w").alias("qw")))
    seed_n = (norms.filter(F.col("doc_id") == seed)
              .select(F.col("nrm").alias("qn")))
    dots = (w.join(F.broadcast(seed_w), "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("qw")).alias("dot")))
    return (dots.join(norms, "doc_id").crossJoin(F.broadcast(seed_n))
            .filter(F.col("doc_id") != seed)
            .select("doc_id",
                    (F.col("dot") / (F.col("nrm") * F.col("qn")))
                    .cast("float").cast("double").alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k))

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

"""Suggester + spell-check over the term dictionary.

Reference surface (public knowledge; u8: reconstruction anchors per
SURVEY.md §0 — no source exists on disk):
  u8:solr/core/src/java/org/apache/solr/handler/component/SuggestComponent.java
  u8:solr/core/src/java/org/apache/solr/handler/component/SpellCheckComponent.java
  u8:lucene/suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java

Spark-first design: both operators run against the cached, term-SORTED
termstats dictionary — never the postings table. Suggest is a
prefix-pushdown scan + ``TakeOrderedAndProject(k)``; spellcheck is a
Levenshtein filter with DirectSpellChecker's minPrefix guard narrowing
the scan to one prefix range first. At 100 TB the dictionary is
~n_ranges times smaller than the index and range-partitioned by term,
so both stay tiny metadata queries regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklucene.query import FIELD_SEP, field_key


def _dict_body(idx, field: str | None) -> DataFrame:
    """Dictionary rows of one field with the field qualifier stripped.

    The default field must not sweep up other fields' qualified keys
    (same guard as ``Index.expand_terms``)."""
    fk = field_key(field, "")
    t = idx.termstats()
    term = F.col("term")
    if fk:
        t = t.filter(term.startswith(fk))
        body = term.substr(F.lit(len(fk) + 1), F.length(term))
    else:
        t = t.filter(~term.contains(FIELD_SEP))
        body = term
    return t.select(body.alias("term"), "df", "cf")


def suggest_prefix(idx, prefix: str, k: int = 10,
                   field: str | None = None) -> DataFrame:
    """Search-as-you-type suggestions: dictionary terms starting with
    ``prefix`` ranked by collection frequency (popularity), then term —
    Solr SuggestComponent's lookup surface. Returns (term, df, cf).

    Plan: the startswith predicate pushes down to the term-sorted
    termstats parquet (FST-seek analog); ordering+limit compiles to
    ``TakeOrderedAndProject`` — no global sort, no postings touched.
    """
    d = _dict_body(idx, field)
    return (d.filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("cf"), F.asc("term"))
            .limit(k))


def spellcheck(idx, word: str, k: int = 5, max_edits: int = 2,
               min_prefix: int = 1, field: str | None = None) -> DataFrame:
    """Did-you-mean correction: dictionary terms within ``max_edits``
    Levenshtein distance of ``word`` that share its first ``min_prefix``
    characters (DirectSpellChecker's minPrefix, which also narrows the
    dictionary scan to one prefix range), ranked by edit distance, then
    document frequency (popularity), then term. The exact input word is
    excluded (it is not a correction). Returns (term, distance, df).
    """
    d = _dict_body(idx, field)
    term = F.col("term")
    dist = F.levenshtein(term, F.lit(word))
    pred = (dist <= max_edits) & (term != word)
    if min_prefix > 0 and word:
        pred = term.startswith(word[:min_prefix]) & pred
    return (d.filter(pred)
            .withColumn("distance", dist)
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .select("term", "distance", "df")
            .limit(k))


def collate(idx, words: "tuple[str, ...]", max_edits: int = 2,
            min_prefix: int = 1, field: str | None = None) -> DataFrame:
    """Spell-check COLLATION — Solr SpellCheckCollator's "did you mean"
    surface (public knowledge: ``u8:solr/core/.../spelling/
    SpellCheckCollator.java``, ``spellcheck.collate=true``): each query
    word either exists in the dictionary (kept as-is) or is replaced by
    its best correction (distance asc, df desc, term asc — the same pin
    as :func:`spellcheck`; left unchanged when nothing is within
    ``max_edits``); the collation is then VERIFIED by running the
    corrected conjunction and reporting its hit count, Solr's
    maxCollationTries re-query step. Returns one row
    (collation string, hits).

    Scale shape: per-word dictionary lookups are k-bounded metadata
    queries (words in a query ~ constant); the verification is one
    stock AND count.
    """
    from sparklucene.query import And, Term
    from sparklucene.search import total_hits

    corrected = []
    stats = idx.term_stats_for([field_key(field, w) if field else w
                                for w in words])
    for w in words:
        key = field_key(field, w) if field else w
        if stats.get(key) is not None:
            corrected.append(w)
            continue
        row = spellcheck(idx, w, k=1, max_edits=max_edits,
                         min_prefix=min_prefix, field=field).collect()
        corrected.append(row[0]["term"] if row else w)
    q = And(tuple(Term(t, field=field) for t in corrected))
    hits = int(total_hits(idx, q).collect()[0]["total_hits"])
    return idx.spark.createDataFrame(
        [(" ".join(corrected), hits)], "collation string, hits long")

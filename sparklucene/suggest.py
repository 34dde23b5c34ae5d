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


def suggest_infix(idx, fragment: str, k: int = 10,
                  field: str | None = None) -> DataFrame:
    """Infix suggestions — Lucene's AnalyzingInfixSuggester lookup shape
    (public knowledge: ``u8:lucene/suggest/.../analyzing/
    AnalyzingInfixSuggester.java``): dictionary terms CONTAINING
    ``fragment`` anywhere (not just as a prefix), ranked by weight —
    collection frequency here, the same popularity weight as
    :func:`suggest_prefix` — then term. Returns (term, df, cf).

    Plan: contains() cannot prefix-prune, so this scans the whole
    dictionary — which is the same trade the reference makes (its infix
    suggester searches a dedicated suggest index rather than seeking one
    FST path). The dictionary is vocab-sized metadata (~0.1% of the
    index, term-range partitioned), and ordering+limit compiles to
    ``TakeOrderedAndProject``."""
    d = _dict_body(idx, field)
    return (d.filter(F.col("term").contains(fragment))
            .orderBy(F.desc("cf"), F.asc("term"))
            .limit(k))


def free_text_suggest(docs: DataFrame, contexts: "tuple[str, ...]",
                      k: int = 5) -> DataFrame:
    """Next-token suggestion from a corpus n-gram model — Lucene's
    FreeTextSuggester shape (public knowledge: ``u8:lucene/suggest/.../
    analyzing/FreeTextSuggester.java``: an n-gram language model with
    stupid backoff, built from the corpus rather than the term
    dictionary). Pinned slice: for each context word, candidate next
    tokens ranked by corpus BIGRAM count (count desc, token asc); a
    context with NO observed bigram backs off to the corpus-wide top
    UNIGRAMS (``grams`` column reports which model answered, 2 or 1).
    Tokenization is the analyzer regex WITHOUT stopword removal — the
    reference builds its model on an un-stopped stream too. Returns
    (context, suggestion, cnt, grams).

    Scale shape: bigram pairs come from narrow per-row array zips (no
    positional self-join); one partial-aggregated groupBy reduces them;
    the context filter is a pushed-down literal IN; per-context top-k
    windows run over single-context slices (vocab-bounded); the backoff
    is the corpus top-k unigrams (TakeOrderedAndProject) cross-joined to
    the (operator-constant) missing contexts."""
    from pyspark.sql import Window

    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)")
    base = docs.select(toks.alias("toks")).filter(F.size("toks") > 0)
    pairs = base.select(F.explode(F.arrays_zip(
        F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("context"),
        F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("suggestion"),
    )).alias("p")).select("p.context", "p.suggestion")
    spark = docs.sparkSession
    ctx = spark.createDataFrame([(c,) for c in sorted(set(contexts))],
                                "context string")
    big = (pairs.filter(F.col("context").isin(list(contexts)))
           .groupBy("context", "suggestion")
           .agg(F.count("*").cast("long").alias("cnt")))
    w = Window.partitionBy("context").orderBy(F.desc("cnt"),
                                              F.asc("suggestion"))
    bigk = (big.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .withColumn("grams", F.lit(2).cast("long")))
    missing = ctx.join(big.select("context").distinct(), "context",
                       "left_anti")
    unik = (docs.select(F.explode(toks).alias("suggestion"))
            .groupBy("suggestion")
            .agg(F.count("*").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("suggestion")).limit(k)
            .crossJoin(F.broadcast(missing))
            .withColumn("grams", F.lit(1).cast("long")))
    return bigk.unionByName(unik.select("context", "suggestion", "cnt",
                                        "grams"))


def spellcheck(idx, word: str, k: int = 5, max_edits: int = 2,
               min_prefix: int = 1, field: str | None = None,
               only_more_popular: bool = False) -> DataFrame:
    """Did-you-mean correction: dictionary terms within ``max_edits``
    Levenshtein distance of ``word`` that share its first ``min_prefix``
    characters (DirectSpellChecker's minPrefix, which also narrows the
    dictionary scan to one prefix range), ranked by edit distance, then
    document frequency (popularity), then term. The exact input word is
    excluded (it is not a correction). Returns (term, distance, df).

    ``only_more_popular`` (Solr ``spellcheck.onlyMorePopular`` /
    Lucene SpellChecker ``morePopular``): keep only suggestions whose
    document frequency EXCEEDS the input word's own df — "did you mean
    the more common spelling"; an unindexed word has df 0, so every
    candidate qualifies. The word's df is one dictionary-point lookup.
    """
    d = _dict_body(idx, field)
    term = F.col("term")
    dist = F.levenshtein(term, F.lit(word))
    pred = (dist <= max_edits) & (term != word)
    if min_prefix > 0 and word:
        pred = term.startswith(word[:min_prefix]) & pred
    if only_more_popular:
        row = d.filter(term == word).select("df").collect()
        word_df = int(row[0]["df"]) if row else 0
        pred = pred & (F.col("df") > word_df)
    return (d.filter(pred)
            .withColumn("distance", dist)
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .select("term", "distance", "df")
            .limit(k))


def word_break(idx, word: str, k: int = 5, min_break_length: int = 2,
               field: str | None = None) -> DataFrame:
    """Word-break suggestions — Lucene WordBreakSpellChecker's
    ``suggestWordBreaks`` shape (public knowledge: ``u8:lucene/suggest/
    .../spell/WordBreakSpellChecker.java``), pinned to one split
    (maxChanges=1): every split point of ``word`` where BOTH halves are
    dictionary terms of length >= ``min_break_length`` is a suggestion,
    ranked by the reference's combined-frequency rule — the MINIMUM of
    the two parts' document frequencies — desc, then left part asc.
    Returns (left_part, right_part, freq).

    Scale shape: the split candidates are len(word)-1 literal pairs
    (operator constants); each side resolves via an IN-pushdown join
    against the vocab-sized dictionary. Nothing corpus-scale."""
    cands = [(word[:i], word[i:]) for i in
             range(min_break_length, len(word) - min_break_length + 1)]
    spark = idx.spark
    if not cands:
        return spark.createDataFrame(
            [], "left_part string, right_part string, freq long")
    cdf = spark.createDataFrame(cands, "left_part string, right_part string")
    d = _dict_body(idx, field).select("term", "df")
    # broadcast the constant candidate side INTO the dictionary scan both
    # times, so the vocab-sized dictionary is filtered, never shipped
    lhs = (d.join(F.broadcast(cdf), F.col("term") == F.col("left_part"))
           .select("left_part", "right_part", F.col("df").alias("_dfl")))
    return (d.join(F.broadcast(lhs), F.col("term") == F.col("right_part"))
            .select("left_part", "right_part",
                    F.least("_dfl", "df").cast("long").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("left_part"))
            .limit(k))


def word_combine(idx, words: "tuple[str, ...]", k: int = 5,
                 field: str | None = None) -> DataFrame:
    """Combine-words suggestions — WordBreakSpellChecker's
    ``suggestWordCombinations``: each ADJACENT pair of query words whose
    concatenation is a dictionary term suggests that term, ranked by its
    document frequency desc, then term asc. Returns
    (left_word, right_word, term, df)."""
    pairs = [(words[i], words[i + 1], words[i] + words[i + 1])
             for i in range(len(words) - 1)]
    spark = idx.spark
    if not pairs:
        return spark.createDataFrame(
            [], "left_word string, right_word string, term string, df long")
    pdf = spark.createDataFrame(
        pairs, "left_word string, right_word string, _cat string")
    d = _dict_body(idx, field).select("term", "df")
    return (d.join(F.broadcast(pdf), F.col("term") == F.col("_cat"))
            .select("left_word", "right_word", "term",
                    F.col("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
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


def context_suggest(docs: DataFrame, prefix: str, context_col: str,
                    context_value: str, k: int = 10,
                    text_col: str = "text") -> DataFrame:
    """Context-filtered suggestions — Solr's suggester ``contextField``
    / ``suggest.cfq`` (public knowledge: u8:solr/core/.../spelling/
    suggest/SolrSuggester.java context filtering,
    u8:lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java
    contexts): the dictionary is restricted to documents whose context
    field matches BEFORE ranking, so suggestions reflect only the
    selected slice (e.g. one language). Returns (term, df, cf) for
    dictionary terms starting with ``prefix``, ranked by collection
    frequency then term.

    Plan shape: the context filter pushes down to the corpus scan
    (partition/row-group pruning on a real layout), the token stream is
    one Arrow-batched narrow pass, and the (term) aggregation partial-
    aggregates before one vocab-sized shuffle; ordering+limit is
    ``TakeOrderedAndProject``.
    """
    from sparklucene.analysis import token_stream_df
    sl = docs.filter(F.col(context_col) == context_value) \
             .select("doc_id", text_col)
    toks = token_stream_df(sl, text_col)
    return (toks.groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"),
                 F.count("*").alias("cf"))
            .filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("cf"), F.asc("term"))
            .limit(k))

"""Corpus loading — the engine's document source (SURVEY.md §1.2).

Input shape pinned by BASELINE.json input_hint:
``corpus(repo string, path string, commit string, lang string, content string)``
plus a deterministic global ``doc_id bigint``.

Two loaders:
  - ``load_corpus``: maps the driver-provided ``documents.parquet``
    (doc_id, text, lang, source, n_chars) onto the corpus shape per
    FIXTURES.md §1 (content <- text, repo <- source, ...). The driver
    doc_id is already dense + deterministic, so it is kept.
  - ``assign_doc_ids``: for arbitrary corpora without ids — dense,
    deterministic ids from a distributed two-phase hash-bucketed rank
    over (repo, path, commit); stable across retries (never
    monotonically_increasing_id, SURVEY.md §1.2).

``expand_corpus`` deterministically replicates the corpus K-fold for
throughput/scaling benchmarks (seeded, derived purely from driver data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CORPUS_COLS = ["repo", "path", "commit", "lang", "content", "doc_id"]

#: bucket count for assign_doc_ids' two-phase rank — a pinned constant
#: (NOT cluster parallelism) so ids are identical on any cluster size.
#: 2^20 keeps per-bucket work ~10^6 rows even at the 10^12-file design
#: point; at small scale it costs nothing (the counts collect and the
#: offset broadcast carry only NON-EMPTY buckets, bounded by min(rows,
#: buckets)).
N_ID_BUCKETS = 1 << 20


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


def load_corpus_table(spark: SparkSession, table: str) -> DataFrame:
    """Load the corpus from a CATALOG TABLE (the Iceberg input shape).

    BASELINE.json's input_hint pins the production source as an Iceberg
    table ``(repo, path, commit, lang, content)``; with an Iceberg
    catalog configured on the session (``spark.sql.catalog.*`` — jars
    not present in this sandbox, so tests exercise the identical
    ``spark.read.table`` code path against the built-in catalog / temp
    views), this reads that table directly. Columns beyond the corpus
    shape are pruned (column pruning + partition pruning push into the
    Iceberg scan exactly as for parquet); a missing ``doc_id`` is
    assigned densely + deterministically via :func:`assign_doc_ids`.
    """
    df = spark.read.table(table)
    missing = [c for c in CORPUS_COLS if c != "doc_id"
               and c not in df.columns]
    if missing:
        raise ValueError(
            f"table {table!r} lacks corpus columns {missing}; expected "
            f"{CORPUS_COLS[:-1]} (+ optional doc_id)")
    if "doc_id" not in df.columns:
        df = assign_doc_ids(df.select(*[c for c in CORPUS_COLS
                                        if c != "doc_id"]))
    return df.select(
        *CORPUS_COLS[:-1], F.col("doc_id").cast("long").alias("doc_id"))


def assign_doc_ids(df: DataFrame) -> DataFrame:
    """Dense deterministic doc_id for a raw (repo,path,commit,...) corpus.

    Two-phase hash-bucketed rank, done exactly once per corpus build
    (SURVEY.md §7.4.2), fully distributed: bucket = murmur3(key) mod
    ``N_ID_BUCKETS`` (a PINNED constant — never cluster parallelism, so
    the same corpus yields the same ids on any cluster size), per-bucket
    row counts (one collect bounded by the NON-EMPTY bucket count, i.e.
    min(rows, N_ID_BUCKETS)), then per-bucket
    row_number + the bucket's cumulative offset. An unpartitioned
    ``Window.orderBy`` would coalesce the whole corpus into ONE task — a
    non-starter at 10^12 files — and a range-partitioned sort would make
    ids depend on sampled partition boundaries computed independently by
    the count and rank jobs; the hash bucket is a pure row function, so
    both phases agree by construction and ids are deterministic and
    stable across retries for unique keys. Ids are dense and key-sorted
    WITHIN each bucket (not globally key-ordered — the contract is
    density + determinism, not global order).

    Snapshot requirement (inherent to ANY multi-pass job over a mutable
    source, including the index build itself): the two passes must see
    the same rows. Read an immutable source — an Iceberg snapshot
    (time-travel/pinned snapshot-id) or a staged parquet dir; if the
    source offers no snapshot isolation, ``df.localCheckpoint()`` first.
    """
    keys = ["repo", "path", "commit"]
    bcol, ocol = "_sl_idbkt", "_sl_idoff"
    clash = [c for c in (bcol, ocol) if c in df.columns]
    if clash:
        raise ValueError(f"input columns {clash} collide with "
                         "assign_doc_ids' working columns")
    bucketed = df.withColumn(
        bcol, F.pmod(F.hash(*keys), F.lit(N_ID_BUCKETS)))
    counts = {r[bcol]: r["c"] for r in
              bucketed.groupBy(bcol).agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if not offsets:
        return df.withColumn("doc_id", F.lit(0).cast("long")).limit(0)
    # broadcast-join the B-row offset table (a literal map would bloat
    # the expression tree once B tracks cluster parallelism)
    spark = df.sparkSession
    offs = spark.createDataFrame(
        [(b, offsets[b]) for b in sorted(offsets)],
        f"{bcol} int, {ocol} long")
    w = Window.partitionBy(bcol).orderBy(*keys)
    return (bucketed
            .join(F.broadcast(offs), bcol)
            .withColumn("doc_id",
                        (F.row_number().over(w).cast("long") - 1
                         + F.col(ocol)))
            .drop(bcol, ocol))


def expand_corpus(df: DataFrame, factor: int, n_base: int) -> DataFrame:
    """Replicate the corpus ``factor``-fold with fresh dense doc_ids.

    doc_id' = replica * n_base + doc_id keeps ids dense and deterministic;
    term statistics scale uniformly so relevance behavior is preserved.
    """
    if factor <= 1:
        return df
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("replica")
    out = df.select("*", replicas)
    return (out
            .withColumn("doc_id",
                        F.col("replica").cast("long") * F.lit(int(n_base))
                        .cast("long") + F.col("doc_id").cast("long"))
            .withColumn("repo", F.concat_ws("-", "repo", "replica"))
            .drop("replica"))


def with_drange(df: DataFrame, drange_size: int) -> DataFrame:
    """Attach the doc-range shard key (SURVEY.md §1.2 segment analog)."""
    return df.withColumn("drange", (F.col("doc_id") / F.lit(drange_size)).cast("int"))

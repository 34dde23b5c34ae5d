"""Index-time sort + early-terminating top-k by a stored field.

Public knowledge this mirrors: Lucene's index sorting
(``u8:lucene/core/.../index/IndexWriterConfig.java`` ``setIndexSort``,
``u8:lucene/core/.../index/Sorter.java``) and the early-terminating
collection it enables (``u8:lucene/core/.../search/TopFieldCollector.java``
— when the index sort matches the query sort, each segment stops after k
competitive hits instead of visiting every live doc).

Spark-native re-expression (NOT a port): the "index sort" is a
range-partitioned, within-partition-sorted parquet view of the doc
attributes, written once at build time; the per-file min/max of the sort
key plus row counts land in a tiny ``manifest.json`` (the segment-level
"sort metadata"). A top-k query whose sort matches the view's sort reads
ONLY the leading files whose cumulative row count covers k (plus any
boundary files sharing the cutoff key value, so ties on the secondary
``doc_id`` order stay exact) — I/O proportional to k, not corpus size.
At 100 TB that turns a full-corpus sort into a couple of file reads; the
manifest is O(n_files), kept on the driver like Lucene keeps per-segment
sort metadata in segment info.

Nulls in the sort key are rejected at build time (Lucene index sorting
requires a missing-value policy; this engine pins "no nulls" rather than
silently choosing one).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


def build_sorted_view(df: DataFrame, out_dir: str, by: str,
                      ascending: bool = True, n_partitions: int = 8,
                      tiebreak: str = "doc_id") -> dict:
    """Write ``df`` as a range-partitioned parquet view sorted by
    (``by`` asc|desc, ``tiebreak`` asc) and record the per-file sort-key
    envelope. One global range shuffle — paid once at build, like
    Lucene's segment sort. Returns the manifest dict."""
    key = F.col(by).asc() if ascending else F.col(by).desc()
    if df.filter(F.col(by).isNull()).limit(1).count():
        raise ValueError(f"sort key {by!r} contains nulls — index sorting "
                         "requires a non-null key")
    (df.repartitionByRange(n_partitions, key)
       .sortWithinPartitions(key, F.col(tiebreak).asc())
       .write.mode("overwrite").parquet(out_dir))

    # exact per-file envelopes via ONE aggregation over the written view
    # (parquet footer min/max can be truncated for long binary keys, so
    # the manifest is computed from the data itself — n_files rows total)
    spark = df.sparkSession
    env = (spark.read.parquet(out_dir)
           .groupBy(F.input_file_name().alias("file"))
           .agg(F.min(by).alias("lo"), F.max(by).alias("hi"),
                F.count(F.lit(1)).alias("rows"))
           .collect())
    files = [{"name": os.path.basename(r["file"]), "rows": r["rows"],
              "lo": r["lo"], "hi": r["hi"]} for r in env if r["rows"]]
    # leading-key order: ascending by lo, or descending by hi
    files.sort(key=(lambda f: f["lo"]) if ascending
               else (lambda f: f["hi"]), reverse=not ascending)
    manifest = {"by": by, "ascending": ascending, "tiebreak": tiebreak,
                "files": files, "total_rows": sum(f["rows"] for f in files)}
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def plan_files(view_dir: str, k: int) -> tuple[list[str], dict]:
    """The early-termination decision: the shortest leading file prefix
    whose row count covers k, extended across any boundary files that
    share the cutoff key value (exactness under ``tiebreak`` ties).
    Returns (file names to read, manifest)."""
    with open(os.path.join(view_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    asc = manifest["ascending"]
    chosen, covered = [], 0
    for i, f in enumerate(files):
        chosen.append(f["name"])
        covered += f["rows"]
        if covered >= k:
            cutoff = f["hi"] if asc else f["lo"]
            for g in files[i + 1:]:
                lead = g["lo"] if asc else g["hi"]
                if lead == cutoff:
                    chosen.append(g["name"])
                else:
                    break
            break
    return chosen, manifest


def sorted_topk_filtered(spark: SparkSession, view_dir: str, k: int,
                         predicate, columns: list[str] | None = None
                         ) -> DataFrame:
    """Early-terminating top-k WITH a filter — Lucene's sort-matching
    collector under a deleted-docs/filter context: the sorted file
    prefix is grown adaptively (doubling the covered row target) until
    it yields k predicate survivors or the view is exhausted. Each probe
    is one cheap count over the candidate prefix; the final answer reads
    only that prefix. Worst case (selectivity ~0) degrades to the full
    scan the filter would have cost anyway.
    """
    from pyspark.sql import functions as F

    with open(os.path.join(view_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    total = manifest["total_rows"]
    target = max(k, 1)
    while True:
        chosen, _ = plan_files(view_dir, target)
        paths = [os.path.join(view_dir, n) for n in chosen]
        df = spark.read.parquet(*paths).filter(predicate)
        if target >= total or df.limit(k).count() >= k:
            break
        target *= 2
    if columns:
        df = df.select(*columns)
    by, asc, tb = (manifest["by"], manifest["ascending"],
                   manifest["tiebreak"])
    key = F.col(by).asc() if asc else F.col(by).desc()
    return df.orderBy(key, F.col(tb).asc()).limit(k)


def sorted_topk(spark: SparkSession, view_dir: str, k: int,
                columns: list[str] | None = None) -> DataFrame:
    """Top-k by the view's index sort, reading only the manifest-chosen
    file prefix (early termination). The final order-within-k is a
    TakeOrderedAndProject over ~k rows, never a global sort."""
    chosen, manifest = plan_files(view_dir, k)
    by, asc = manifest["by"], manifest["ascending"]
    tb = manifest["tiebreak"]
    paths = [os.path.join(view_dir, n) for n in chosen]
    df = spark.read.parquet(*paths) if paths else (
        spark.read.parquet(view_dir).limit(0))
    if columns:
        df = df.select(*columns)
    key = F.col(by).asc() if asc else F.col(by).desc()
    return df.orderBy(key, F.col(tb).asc()).limit(k)

"""Multi-select faceting — Solr's tagged-filter exclusion model.

Public knowledge of Solr's faceting contract
(u8:solr/core/src/java/org/apache/solr/search/facet/FacetProcessor.java,
SolrReturnFields tag/ex handling in
u8:solr/core/.../request/SimpleFacets.java ~1,100 LoC): filters are
*tagged* (``fq={!tag=L}lang:en``) and each facet can *exclude* tags
(``facet.field={!ex=L}lang``), so a multi-select UI shows, per dimension,
the counts the user WOULD get if that dimension's own filter were lifted
while every other filter stays applied.

Spark mapping: the scored match set joins the attribute table once; each
facet dimension is one partial+final groupBy over the base filtered by
every non-excluded predicate. The number of dimensions is an operator
constant, so the plan is a small fixed union of aggregations over one
shared scan — Catalyst caches the join across branches under AQE, and
nothing is data-proportional on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multiselect_facets(base: DataFrame,
                       filters: dict[str, Column],
                       facets: dict[str, frozenset[str] | set[str]],
                       ) -> DataFrame:
    """Tagged-exclusion facet counts.

    ``base``    — the doc set to facet (already query-matched), carrying
                  the facet/filter attribute columns.
    ``filters`` — tag -> boolean Column (the tagged ``fq`` list).
    ``facets``  — facet field -> set of tags THAT FIELD excludes.

    Returns (facet_field, value, cnt): per facet field, the value counts
    over docs passing every filter whose tag is not excluded; values are
    stringified (Solr facet keys are strings), ordered cnt DESC then
    value ASC within each field, fields ASC.
    """
    outs = []
    for field in sorted(facets):
        excluded = facets[field]
        df = base
        for tag in sorted(filters):
            if tag not in excluded:
                df = df.filter(filters[tag])
        outs.append(df.groupBy(F.col(field).cast("string").alias("value"))
                    .agg(F.count("*").alias("cnt"))
                    .select(F.lit(field).alias("facet_field"),
                            "value", "cnt"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("facet_field", F.desc("cnt"), F.asc("value"))


def date_range_buckets(start: str, end: str, gap_days: int,
                       hardend: bool = False,
                       ) -> "tuple[list[tuple[int, str]], int, int, int]":
    """Operator-constant bucket plan for a Solr date range facet.

    Returns ``(spine, start_epoch, gap_secs, actual_end_epoch)`` where
    ``spine`` is ``[(bucket_index, 'YYYY-MM-DD HH:MM:SS'), ...]`` for
    every bucket from ``start`` (inclusive). Solr semantics
    (u8:solr/core/.../request/SimpleFacets.java getFacetRangeCounts +
    RangeEndpointCalculator): buckets are ``gap_days`` wide; when
    ``end - start`` is not a gap multiple, ``hardend=False`` keeps the
    last bucket a FULL gap wide (its end extends past ``end``) while
    ``hardend=True`` clips the range at ``end``. ``actual_end_epoch``
    is the boundary the ``other`` counts use: ``after`` counts
    ``ts >= actual_end``, ``before`` counts ``ts < start``, ``between``
    counts the rest (facet.other=all).
    """
    from datetime import datetime
    fmt = "%Y-%m-%d %H:%M:%S"
    s = datetime.strptime(start, fmt)
    e = datetime.strptime(end, fmt)
    if e <= s or gap_days <= 0:
        raise ValueError("end must follow start and gap must be positive")
    gap_secs = gap_days * 86400
    span = int((e - s).total_seconds())
    n_buckets = -(-span // gap_secs)          # ceil
    import calendar
    s_epoch = calendar.timegm(s.timetuple())
    actual_end = (s_epoch + n_buckets * gap_secs if not hardend
                  else s_epoch + span)
    spine = []
    for i in range(n_buckets):
        bs = datetime.utcfromtimestamp(s_epoch + i * gap_secs)
        spine.append((i, bs.strftime(fmt)))
    return spine, s_epoch, gap_secs, actual_end


def range_facet_date(df: DataFrame, field: str, start: str, end: str,
                     gap_days: int, hardend: bool = False) -> DataFrame:
    """Solr ``facet.range`` over a date field with ``facet.other=all``.

    Emits one row per bucket — EVERY bucket, mincount=0, via an
    operator-constant spine — labeled by its start timestamp string,
    plus the three ``other`` rows labeled ``before`` / ``between`` /
    ``after``. Columns ``(bucket, cnt)``, ordered by label.

    Scale shape: one narrow projection (epoch + integer floor-divide)
    feeding one partially-aggregated groupBy over an operator-constant
    key domain; the spine and the 3-row ``other`` frame are constant-
    size unions — nothing data-proportional leaves the executors.
    """
    spark = df.sparkSession
    spine, s_epoch, gap_secs, actual_end = date_range_buckets(
        start, end, gap_days, hardend)
    # timestamp -> whole epoch seconds (floor; all test data is > 1970).
    # TIMESTAMP_NTZ has no direct long cast; go through TIMESTAMP — the
    # session timezone is pinned UTC, so ntz values convert 1:1 and the
    # epoch matches DuckDB's naive-as-UTC epoch().
    e = F.col(field).cast("timestamp").cast("long")
    in_range = (e >= s_epoch) & (e < actual_end)
    idx = F.floor((e - F.lit(s_epoch)) / F.lit(gap_secs)).cast("long")
    counts = (df.filter(in_range)
              .groupBy(idx.alias("i")).agg(F.count("*").alias("cnt")))
    spine_df = spark.createDataFrame(spine, "i long, bucket string")
    buckets = (F.broadcast(spine_df).join(counts, "i", "left")
               .select("bucket",
                       F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")))
    other = df.agg(
        F.sum((e < s_epoch).cast("long")).alias("before"),
        F.sum(in_range.cast("long")).alias("between"),
        F.sum((e >= actual_end).cast("long")).alias("after"))
    other_rows = other.selectExpr(
        "stack(3, 'before', coalesce(before, 0), "
        "'between', coalesce(between, 0), "
        "'after', coalesce(after, 0)) AS (bucket, cnt)")
    return buckets.unionByName(other_rows).orderBy("bucket")


def percentile_sketch(df: DataFrame, field: str, by: str,
                      probs: "tuple[float, ...]" = (0.5, 0.9),
                      method: str = "sampled", fraction: float = 0.25,
                      salt: str = "pctl-v1", accuracy: int = 10000,
                      key_col: str = "doc_id") -> DataFrame:
    """Approximate percentiles at corpus scale — Solr's percentile stats
    agg is a mergeable t-digest sketch
    (u8:solr/core/.../handler/component/StatsField.java,
    u8:solr/core/.../search/facet/PercentileAgg.java); the exact twin is
    ``percentile_agg``/``facet_stats_percentiles``.

    Two scale paths, both one partial+final aggregation (no full sort):

    ``method="native"`` — Spark's built-in mergeable sketch
    (``percentile_approx``, Greenwald-Khanna): the production path for
    10^12 rows; sketch contents are engine-specific, so like ``hll``
    it has no cross-engine value oracle.

    ``method="sampled"`` — exact interpolated percentile over a
    DETERMINISTIC md5-prefix sample of the group (same primitive as
    ``textops.deterministic_sample``: membership is a pure per-row
    function of ``md5(salt || key)``, independent of partitioning,
    engine and scale tier). Error is the classic sample-quantile bound
    (O(1/sqrt(fraction·n)) per group), and the result is bit-for-bit
    reproducible in any engine with md5 — which is what makes this
    variant hash-checkable against DuckDB while remaining sublinear in
    memory: the exact percentile runs on fraction·n rows, and the scan
    itself is narrow (the filter pushes to the parquet scan).

    Returns (``by``, q<p> estimate columns, sample_n) ordered by group.
    """
    # q<p> labels: round, not int() — float truncation mislabels e.g.
    # 0.29 (0.29*100 == 28.999…) as q28; and sub-percent probs must not
    # silently collide into one duplicate column name.
    labels = [f"q{round(p * 100)}_est" for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"probs {probs!r} collide at whole-percent "
                         f"label resolution: {labels!r}")
    if method == "native":
        aggs = [F.percentile_approx(field, p, accuracy)
                .cast("double").alias(lab)
                for p, lab in zip(probs, labels)]
        return (df.groupBy(by)
                .agg(*aggs, F.count("*").cast("long").alias("sample_n"))
                .orderBy(by))
    if method != "sampled":
        raise ValueError(f"unknown percentile_sketch method {method!r}")
    from sparklucene.textops import sample_key, _frac_thr
    s = df.filter(sample_key(F.col(key_col), salt)
                  < F.lit(_frac_thr(fraction)))
    aggs = [F.expr(f"percentile({field}, {p!r})")
            .alias(lab) for p, lab in zip(probs, labels)]
    return (s.groupBy(by)
            .agg(*aggs, F.count("*").cast("long").alias("sample_n"))
            .orderBy(by))


def hll_sketch_partial(df: DataFrame, field: str, by: str | None = None,
                       lg_k: int = 12) -> DataFrame:
    """Per-shard mergeable HLL sketch — the shard half of Solr's
    distributed ``hll`` agg (public knowledge:
    u8:solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java —
    each shard serializes its HyperLogLog registers; the coordinator
    merges registers, never raw values).

    Spark mapping: ``hll_sketch_agg`` builds an Apache DataSketches HLL
    sketch per group — a BINARY column in the portable DataSketches
    wire format, readable by the Java/C++/Python DataSketches
    libraries, which is the cross-engine mergeable-sketch parity Solr's
    HLL (and t-digest percentile) surfaces provide and plain
    ``approx_count_distinct`` does not (HLL++'s internal buffer never
    leaves the plan).

    Returns (``by``?, sketch binary). One partial+final aggregation;
    the shipped state per group is the 2^lg_k register array
    (lg_k=12 -> ~2 KiB, relative standard error ~1.6 %), constant in
    the row count — the right 10^12-row shape.
    """
    keys = [by] if by else []
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(field).cast("string"), lg_k)
        .alias("sketch"))


def hll_sketch_merge(partials: DataFrame, by: str | None = None,
                     ) -> DataFrame:
    """Coordinator half of the distributed ``hll`` agg: union the
    per-shard register arrays (``hll_union_agg`` — register-wise max,
    associative and commutative, so shard order and shard count cannot
    change the result) and read the estimate off the merged sketch.

    ``partials`` — union of ``hll_sketch_partial`` outputs from any
    number of shards. Returns (``by``?, distinct_est long), ordered by
    group. Driver-side state: nothing; the merge is one aggregation
    whose state is a single register array per group.
    """
    keys = [by] if by else []
    out = (partials.groupBy(*keys)
           .agg(F.hll_sketch_estimate(
               F.hll_union_agg("sketch", True))
               .cast("long").alias("distinct_est")))
    return out.orderBy(by) if by else out


def hll_sketch_distinct(df: DataFrame, field: str, by: str | None = None,
                        lg_k: int = 12) -> DataFrame:
    """One-shot mergeable distinct count: partial + merge in a single
    plan (Catalyst's partial aggregation pushes the sketch build
    map-side; only register arrays cross the shuffle). Equals the
    shard-split pipeline ``hll_sketch_merge(union of per-shard
    hll_sketch_partial frames)`` register-for-register — the invariant
    the tests pin — because sketch union is exactly the merge the
    final aggregation step performs.
    """
    return hll_sketch_merge(hll_sketch_partial(df, field, by, lg_k), by)

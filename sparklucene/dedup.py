"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The standard near-dup stack for web/pretraining corpora (public knowledge:
Broder's shingling/MinHash resemblance estimation, Charikar's SimHash,
banded LSH), implemented Spark-first:

  * all hashing is md5-derived 60-bit integers computed by Catalyst
    builtins (md5/conv) — JVM codegen, reproducible in any engine;
  * MinHash signatures use S universal-hash permutations evaluated as S
    aggregate expressions over one shingle-hash column — no S-fold row
    explosion; candidate generation is banded LSH (equi-join on band
    keys), never an all-pairs product;
  * SimHash pairs are chunk-banded (Hamming<=k pairs must share one of
    k+1 signature chunks — pigeonhole), so the join is equi-key too;
  * per-doc work partial-aggregates before any shuffle; shuffle keys are
    (band_key) / (chunk value) — skew only from degenerate corpora, and
    AQE skew-join splits those.

Scale: at 10^12 docs the only wide ops are groupBy(doc) [dense, uniform]
and the band-key self-joins [bounded fan-out by construction].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklucene.textops import TOKEN_EXPR, _gram_idxs, _hash60

MERSENNE61 = 2305843009213693951
LSH_PRIME = 2147483647          # 2^31 - 1 universal-hash modulus
HASH30_MOD = 1073741824         # fold 60-bit hash into 30 bits pre-permutation

#: fixed (a, b) per MinHash permutation — small deterministic constants so
#: a*h30 + b stays well inside int64
MINHASH_COEFFS: list[tuple[int, int]] = [
    (387, 17), (1031, 901), (2053, 4099), (4099, 8209),
    (8209, 389), (16411, 1021), (32771, 2039), (65537, 4093),
]


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: sha256(text) groups with >1 member; keeper = min id."""
    return (docs
            .groupBy(F.sha2(F.col("text"), 256).alias("content_sha"))
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keeper_doc_id"))
            .filter(F.col("n_copies") > 1))


def _shingle_hashes(docs: DataFrame, shingle: int) -> DataFrame:
    """(doc_id, h) — 60-bit hash per *distinct* token shingle of each doc."""
    toks = F.expr(TOKEN_EXPR)
    # _gram_idxs guards the sub-shingle case: a doc with < shingle tokens
    # emits NO shingles (sequence(1, 0) is the DESCENDING [1, 0], whose
    # element_at(toks, 0) aborts the job under Spark 4 ANSI)
    idxs = _gram_idxs(toks, shingle)
    shingles = F.array_distinct(F.transform(
        idxs, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j)
                                           for j in range(shingle)])))
    return (docs.select("doc_id", F.explode(shingles).alias("s"))
            .select("doc_id", _hash60(F.col("s")).alias("h")))


def minhash_signatures(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """Per-doc MinHash signature columns sig0..sig{S-1}.

    sig_i = min over shingles of (a_i * (h mod 2^30) + b_i) mod (2^31-1);
    computed as S min-aggregates in ONE groupBy — partial aggregation
    makes this a map-side combine, shuffling S ints per doc.
    """
    sh = _shingle_hashes(docs, shingle)
    h30 = F.pmod(F.col("h"), F.lit(HASH30_MOD))
    aggs = [F.min(F.pmod(a * h30 + b, F.lit(LSH_PRIME))).alias(f"sig{i}")
            for i, (a, b) in enumerate(MINHASH_COEFFS)]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_rows(docs: DataFrame, shingle: int,
               rows_per_band: int) -> DataFrame:
    """(doc_id, band_id, band_key) rows: signatures split into bands of
    ``rows_per_band`` rows, keys concatenated for the LSH equi-join."""
    sigs = minhash_signatures(docs, shingle)
    n_sigs = len(MINHASH_COEFFS)
    if not 1 <= rows_per_band <= n_sigs or n_sigs % rows_per_band:
        # silent truncation would quietly lower recall below the
        # (bands, rows) S-curve the caller dialed in — and
        # rows_per_band > n_sigs would band NOTHING and report
        # "no near-duplicates" for a misconfiguration
        raise ValueError(
            f"rows_per_band={rows_per_band} must divide the signature "
            f"count ({n_sigs}) so every signature lands in a band")
    n_bands = n_sigs // rows_per_band
    bands = [
        F.struct(F.lit(b).alias("band_id"),
                 F.concat_ws("_", *[F.col(f"sig{b * rows_per_band + r}")
                                    for r in range(rows_per_band)]).alias("band_key"))
        for b in range(n_bands)
    ]
    return (sigs.select("doc_id", F.explode(F.array(*bands)).alias("b"))
            .select("doc_id", "b.band_id", "b.band_key"))


def lsh_candidate_pairs(docs: DataFrame, shingle: int = 3,
                        rows_per_band: int = 2) -> DataFrame:
    """Banded-LSH near-dup candidates: docs sharing >= 1 full band.

    Bands of ``rows_per_band`` signature rows; equi-join on (band_id,
    band_key) — the LSH trick that replaces the O(n^2) similarity scan.
    """
    exploded = _band_rows(docs, shingle, rows_per_band)
    a, b = exploded.alias("a"), exploded.alias("b")
    return (a.join(b, ["band_id", "band_key"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def lsh_candidates_incremental(new_docs: DataFrame, corpus_docs: DataFrame,
                               shingle: int = 3,
                               rows_per_band: int = 2) -> DataFrame:
    """Incremental near-dup screening — the production shape for a
    GROWING corpus (public practice: dedup pipelines, e.g. Lee et al.
    2022, run per crawl snapshot against the already-ingested corpus):
    band-join the NEW batch's MinHash signatures against the existing
    corpus's, returning (new_doc, corpus_doc) candidate pairs.

    Per-doc signatures depend only on the doc's own text, so the corpus
    side is exactly the signature/band table a production run would have
    PERSISTED at ingest — this job recomputes it from text for
    self-containment, but the join shape is the incremental one: cost
    scales with |new| × collision rate, never corpus × corpus, and never
    new × new (intra-batch dedup stays :func:`lsh_candidate_pairs`).
    """
    nb = _band_rows(new_docs, shingle, rows_per_band).alias("n")
    cb = _band_rows(corpus_docs, shingle, rows_per_band).alias("c")
    return (nb.join(cb, ["band_id", "band_key"])
            # a doc present in BOTH batches (replayed / overlapping
            # snapshot) must not pair with itself — downstream dedup
            # would read the self-pair as "near-duplicate, delete"
            .filter(F.col("n.doc_id") != F.col("c.doc_id"))
            .select(F.col("n.doc_id").alias("new_doc"),
                    F.col("c.doc_id").alias("corpus_doc"))
            .distinct())


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Charikar SimHash over analyzed term frequencies.

    For each bit b: sum tf * (+1 if bit b of hash(term) else -1) over the
    doc's terms; simhash bit b = 1 iff the sum > 0. One explode over
    (term, bit) then a partial-aggregating groupBy(doc).
    """
    toks = F.expr(TOKEN_EXPR)
    tf = (docs.select("doc_id", F.explode(toks).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
          .withColumn("h", _hash60(F.col("term"))))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    contrib = (tf.select("doc_id", "tf", "h", bit)
               .select("doc_id", "b",
                       F.expr("tf * ((shiftright(h, b) & 1) * 2 - 1)").alias("c")))
    bitsum = contrib.groupBy("doc_id", "b").agg(F.sum("c").alias("s"))
    return (bitsum.groupBy("doc_id")
            .agg(F.sum(F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
                "ELSE CAST(0 AS BIGINT) END")).alias("simhash")))


def simhash_pairs(docs: DataFrame, bits: int = 32, max_hamming: int = 3,
                  n_chunks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: with n_chunks > max_hamming, any qualifying pair
    agrees exactly on >= 1 chunk -> equi-join on (chunk_id, chunk value),
    then verify with bit_count(xor) on the candidates only.
    """
    assert n_chunks > max_hamming, "pigeonhole needs n_chunks > max_hamming"
    sh = simhash(docs, bits)
    width = bits // n_chunks
    chunks = [
        F.struct(F.lit(c).alias("chunk_id"),
                 F.shiftright(F.col("simhash"), c * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk_val"))
        for c in range(n_chunks)
    ]
    ex = (sh.select("doc_id", "simhash", F.explode(F.array(*chunks)).alias("c"))
          .select("doc_id", "simhash", "c.chunk_id", "c.chunk_val"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, ["chunk_id", "chunk_val"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def ngram_jaccard_pairs(docs: DataFrame, shingle: int = 3,
                        min_jaccard: float = 0.0,
                        max_block: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs within one ``source``
    (blocking key) — the verify step after LSH candidate generation, or a
    standalone blocked near-dup pass.

    ``max_block`` caps the candidate-generation fan-out of a DEGENERATE
    block (one giant source full of a hot shingle would otherwise
    re-create quadratic candidates): a (source, shingle-hash) group with
    more than ``max_block`` member docs is excluded from candidate
    generation — but NOT from scoring: surviving candidate pairs are
    verified with the exact intersection over ALL their shingles, so
    every reported (n_inter, n_union, jaccard) stays exact. Recall
    contract under the cap: a pair is reported iff it shares at least
    one shingle whose within-source doc frequency is <= max_block
    (ultra-common shingles are uninformative for near-dup detection —
    the standard stop-shingle rule of web-dedup pipelines).
    ``max_block=None`` (default) keeps complete recall.
    """
    sh = _shingle_hashes(docs.select("doc_id", "source", "text"), shingle) \
        .join(docs.select("doc_id", "source"), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_block is None:
        gen = sh
    else:
        freq = (sh.groupBy("source", "h")
                .agg(F.count("*").alias("_blk")))
        gen = (sh.join(freq, ["source", "h"])
               .filter(F.col("_blk") <= max_block)
               .drop("_blk"))
    a, b = gen.alias("a"), gen.alias("b")
    cand = (a.join(b, (F.col("a.source") == F.col("b.source"))
                   & (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b")))
    if max_block is None:
        # complete generation: the equi-join rows ARE the intersection
        inter = cand.groupBy("doc_a", "doc_b").agg(
            F.count("*").alias("n_inter"))
    else:
        # capped generation: re-derive the EXACT intersection (all
        # shingles, capped ones included) for the surviving pairs only
        pairs = cand.distinct()
        x, y = sh.alias("x"), sh.alias("y")
        inter = (pairs
                 .join(x, F.col("doc_a") == F.col("x.doc_id"))
                 .join(y, (F.col("doc_b") == F.col("y.doc_id"))
                       & (F.col("x.h") == F.col("y.h")))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count("*").alias("n_inter")))
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    out = (inter.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
           .withColumn("jaccard",
                       F.col("n_inter") / F.col("n_union").cast("double")))
    return out.filter(F.col("jaccard") >= min_jaccard) \
        .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")


def embedding_neardup_pairs(embeddings: DataFrame, min_cosine: float = 0.9,
                            n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic-dedup pass of
    a pretraining pipeline: candidate pairs come from a hyperplane-LSH
    bucket EQUI-join (never an all-pairs product; vectors whose cosine is
    high share sign buckets with high probability), then the exact
    integer-grid cosine verifies each candidate against ``min_cosine``.

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b. Recall dial =
    n_planes (fewer planes -> bigger buckets -> higher recall, more
    verify work); the verify step is exact, so precision is always 1.
    Scale: bucket join fan-out is bounded by bucket occupancy; at 10^12
    rows use more planes (+ multi-probe on the query side) to keep
    buckets O(corpus / 2^n_planes).
    """
    from sparklucene.similarity import hyperplane_buckets

    # zero-norm vectors have no direction: cosine is undefined (and the
    # norm product divides by zero under ANSI) — exclude them, same rule
    # as the exact/int8/LSH/IVF/PQ ANN paths and semantic_dedup
    bucketed = hyperplane_buckets(embeddings, n_planes) \
        .filter(F.col("norm2") > 0) \
        .select("vec_id", "q", "norm2", "bucket")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
    dot = F.aggregate(
        F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (dot / (F.sqrt(F.col("a.norm2").cast("double"))
                * F.sqrt(F.col("b.norm2").cast("double")))).alias("cosine"))
    return scored.filter(F.col("cosine") >= min_cosine)


def dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b", max_iters: int = 30) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs — connected components by
    min-id label propagation, the step every training-data dedup
    pipeline runs after pair generation (pairs alone over-delete: doc B
    dups A, C dups B => {A,B,C} is ONE cluster keeping ONE doc).

    Returns (node, comp): every doc appearing in a pair, labeled with
    the smallest doc_id reachable through the pair graph; the canonical
    keeper of a cluster is the doc with node == comp.

    Scale shape: edges are symmetrized once (localCheckpoint); each
    round is one neighbor-min equi-join + groupBy-min + a POINTER-JUMP
    join (comp := comp's comp, the union-find path-compression step),
    all keyed by doc id. The jump halves the remaining label depth each
    round, so convergence takes O(log diameter) rounds — ``max_iters=30``
    covers any component a real corpus can produce (diameter up to
    ~2^30), not just shallow near-dup clusters. The only per-round
    driver action is a convergence emptiness check; if the loop somehow
    exhausts ``max_iters`` unconverged it RAISES rather than silently
    returning partial clusters (which would under-merge and over-keep).
    """
    fwd = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    rev = pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)
    labels = (edges.select(F.col("x").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(int(max_iters)):
        nbr = (edges.join(labels.select(F.col("node").alias("y"),
                                        F.col("comp").alias("ncomp")), "y")
               .groupBy("x").agg(F.min("ncomp").alias("mn")))
        new = (labels.join(nbr.select(F.col("x").alias("node"), "mn"),
                           "node", "left")
               .select("node",
                       F.least(F.col("comp"),
                               F.coalesce(F.col("mn"), F.col("comp")))
                       .alias("comp")))
        # pointer jump: comp <- label(comp). Every comp value IS a node
        # id (labels start as node and only ever take other labels), so
        # the self-join is total; least() keeps monotone descent.
        new = (new.join(new.select(F.col("node").alias("comp"),
                                   F.col("comp").alias("_jump")),
                        "comp", "left")
               .select("node",
                       F.least(F.col("comp"),
                               F.coalesce(F.col("_jump"), F.col("comp")))
                       .alias("comp"))
               .localCheckpoint(eager=True))
        converged = (new.join(labels.select("node",
                                            F.col("comp").alias("old")),
                              "node")
                     .filter(F.col("comp") != F.col("old")).isEmpty())
        labels = new
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds — "
            "with pointer jumping this needs a component of diameter "
            f"> 2^{max_iters}; raise max_iters")
    return labels.orderBy("node")


def semdedup_cluster_count(n_vectors: int) -> int:
    """Default SemDeDup cluster count: ~10k vectors per cluster with a
    floor of 4. The n²/k within-cluster pair bound is only as good as
    k, so k MUST scale with corpus size — a fixed k at 100× the data
    means 100× the pairs per cluster. 10k/cluster keeps each cluster's
    pair block ~10^8 integer-dot comparisons (one executor-core-scale
    task) regardless of corpus size; the paper uses the same
    clusters-proportional-to-data regime."""
    return max(4, int(n_vectors) // 10_000)


def semantic_dedup(embeddings: DataFrame, n_clusters: int | None = None,
                   iters: int = 2, min_cosine: float = 0.9) -> DataFrame:
    """SemDeDup (public knowledge: Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", arXiv 2023): cluster the embedding space, then
    remove items that are near-duplicates of another item INSIDE their
    cluster — the method's point being that clustering bounds the
    quadratic comparison to within-cluster pairs.

    Clustering is the engine's pinned deterministic spherical k-means
    (:func:`sparklucene.similarity.ivf_index` — md5-seeded, integer-sum
    centroids, exact-int cosine assignment). Pinned removal rule (an
    id-ordered, layout-independent variant of the paper's random-order
    greedy): a doc is REMOVED when ANY smaller-id doc in its cluster has
    cosine >= ``min_cosine`` to it; the smallest such dropper and that
    pair's cosine are reported. Zero vectors never match (no direction).

    Returns the REMOVED rows: (vec_id, centroid, dropped_by, cosine).

    Scale shape — the paper's own argument: k clusters cut the pair work
    to ~n²/k, embarrassingly parallel by centroid (the self-join is
    equi-keyed on centroid); assignment reuses ivf_index's audited plan
    (centroids as plan literals, partial-agg updates). Pair cosines are
    exact integer dot/norms in one double expression — JVM codegen, no
    Python. ``n_clusters=None`` (the default) auto-sizes k to the
    corpus via :func:`semdedup_cluster_count` (~10k vectors/cluster,
    floor 4) — the n²/k bound is only as good as k, so k must grow
    with n; pass an explicit k only for pinned fixtures or when an
    external sizing rule applies.
    """
    from pyspark.sql import Window

    from sparklucene.similarity import ivf_index

    if n_clusters is None:
        n_clusters = semdedup_cluster_count(embeddings.count())
    assigned, _cents = ivf_index(embeddings, n_centroids=n_clusters,
                                 iters=iters)
    m = assigned.filter(F.col("norm2") > 0) \
        .select("vec_id", "centroid", "q", "norm2")
    a, b = m.alias("a"), m.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    cos = (dot / (F.sqrt(F.col("a.norm2").cast("double"))
                  * F.sqrt(F.col("b.norm2").cast("double"))))
    pairs = (a.join(b, (F.col("a.centroid") == F.col("b.centroid"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("b.vec_id").alias("vec_id"),
                     F.col("b.centroid").alias("centroid"),
                     F.col("a.vec_id").alias("dropped_by"),
                     cos.alias("cosine"))
             .filter(F.col("cosine") >= float(min_cosine)))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dropped_by"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "centroid", "dropped_by", "cosine"))

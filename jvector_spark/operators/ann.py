"""Similarity search over an embedding column (array<float>).

The one place our engine meets the reference on its own ground: JVector IS
an ANN engine (DiskANN/Vamana graph, README.md:13-14). We do not port the
graph — on Spark the idiomatic scale path is:

  * brute-force cosine top-k as the exact baseline (the analog of the
    reference's exact ground-truth computation, SiftSmall.testRecall's
    groundtruth ivecs) — a broadcast-join scan, embarrassingly parallel;
  * IVF (inverted-file) partitioning as the scale path: k-means centroids
    on a driver-side SAMPLE (the analog of PQ codebook training on <=128k
    sampled vectors, ProductQuantization.java:64,143-156), cluster
    assignment as a map-side vectorized expression, queries probe only
    `nprobe` nearest clusters. With nprobe = n_clusters results are exact
    (oracle-checkable); with nprobe < n_clusters it trades recall for scan
    fraction exactly like JVector's beam width trades recall for visited
    nodes.

Scale notes: scored candidates are pruned to a per-(query, partition) top-k
BEFORE the global shuffle (partial top-k, the TakeOrderedAndProject pattern
— same two-level merge as the reference's multi-index combine,
GraphSearcher.java:368-385), so the shuffle carries O(n_queries * k *
n_partitions) rows, never O(n_queries * N).

Tie-break contract everywhere: score desc, id asc (SearchResult.java:101-106).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a, b):
    """Cosine similarity between two array<float> columns, float64 math,
    left-to-right summation (matches the SQL oracle's per-index join-sum
    after round(6))."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def l2sq_expr(a, b):
    """Squared L2 distance between two array<float> columns (float64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


#: the reference's three similarity functions
#: (vector/VectorSimilarityFunction.java:34-69). Every mapping is
#: "higher = closer", so the (score desc, id asc) tie-break contract
#: applies uniformly. Our 'cosine' returns the RAW cosine rather than the
#: reference's (1+cos)/2 unit-interval compression — a strictly monotone
#: difference (rank-identical results; the reference compresses only so
#: its quantized score functions stay in [0,1]) kept for round-to-round
#: score compatibility of the gated driver queries.
SIMILARITY_METRICS = ("cosine", "euclidean", "dot_product")


def similarity_expr(metric: str, a, b):
    """Score two array<float> columns under one of the reference's
    similarity functions: euclidean = 1/(1+‖a−b‖²) (:40), dot_product =
    (1+a·b)/2 (:54), cosine = raw cos(a,b) (:67, see SIMILARITY_METRICS
    note). JVM-side expressions — no Python in the scan."""
    if metric == "cosine":
        return cosine_expr(a, b)
    if metric == "euclidean":
        return F.lit(1.0) / (F.lit(1.0) + l2sq_expr(a, b))
    if metric == "dot_product":
        return (F.lit(1.0) + _dot(a, b)) / F.lit(2.0)
    raise ValueError(f"unknown metric {metric!r}; one of {SIMILARITY_METRICS}")


def _score_expr(metric: str, a, b):
    """similarity_expr with the engine's score-precision contract applied:
    cosine rounds to 6 decimals (the oracle-comparison contract — lossless
    enough on [-1,1]), while euclidean/dot_product stay full double.
    Rounding those would collapse neighbors into ties for
    realistically-scaled unnormalized vectors (1/(1+L2²) at norms ~100
    lives below 1e-4, where the round-6 quantum reorders true neighbors
    by id) — the reference's EUCLIDEAN/DOT_PRODUCT do no rounding."""
    e = similarity_expr(metric, a, b)
    return F.round(e, 6) if metric == "cosine" else e


def _partial_global_topk(scored: DataFrame, k: int,
                         id_col: str) -> DataFrame:
    """ONE definition of the two-stage top-k epilogue every exact scan
    tier shares (brute force, IVF joined, IVF partition-pruned): partial
    top-k per (qid, input partition) bounds the shuffle, then the global
    window cuts to k with the (score desc, id asc) tie-break. Tiers must
    not re-implement this — a change to the cut or tie-break that missed
    one copy would silently fork the rank contract."""
    wp = Window.partitionBy("qid", F.spark_partition_id()).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    pruned = scored.withColumn("prn", F.row_number().over(wp)).where(
        F.col("prn") <= k
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), id_col,
                "score")
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    threshold: float | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k under `metric` (default cosine; 'euclidean' /
    'dot_product' score with the reference's unit-interval mappings, see
    similarity_expr): (qid, rank, vec_id, score).

    queries is broadcast (small); the corpus scan never shuffles — only the
    partial top-k rows do (partial top-k per (qid, input partition)
    bounds the shuffle). `threshold` adds the score floor BEFORE the
    partial cut, so at scale most rows die map-side.
    """
    scored = vectors.join(F.broadcast(queries)).select(
        F.col(qid_col).alias("qid"),
        F.col(id_col),
        _score_expr(metric, F.col(qvec_col), F.col(vec_col)).alias("score"),
    )
    if threshold is not None:
        scored = scored.where(F.col("score") >= F.lit(float(threshold)))
    return _partial_global_topk(scored, k, id_col)


def exact_rerank(
    cands: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    threshold: float | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Shared exact-cosine rerank epilogue of every two-phase ANN tier
    (graph float beam, NVQ-coded beam, BQ Hamming prefilter): broadcast
    the query vectors, score the candidate set with the SAME rounded
    cosine expression as brute_force_topk, optionally apply the exact
    score floor (GraphSearcher threshold semantics — the cut happens on
    exact rerank scores; approximate phases only bound exploration),
    then the bounded per-query window top-k under the (score desc, id
    asc) tie-break contract. `cands` carries (qid_col, id_col, vec_col);
    output is (qid_col, rank, id_col, score). One definition so the
    rerank contract (rounding, tie-break, threshold placement) cannot
    drift between tiers. `metric` widens the contract to the reference's
    euclidean/dot_product mappings (similarity_expr); tiers default to
    cosine."""
    scored = cands.join(
        F.broadcast(queries.select(qid_col, qvec_col)), qid_col).select(
        qid_col, F.col(id_col),
        _score_expr(metric, F.col(qvec_col), F.col(vec_col)).alias("score"))
    if threshold is not None:
        scored = scored.where(F.col("score") >= F.lit(float(threshold)))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(qid_col, (F.col("rn") - 1).cast("int").alias("rank"),
                id_col, "score")
    )


def brute_force_threshold(
    vectors: DataFrame,
    queries: DataFrame,
    threshold: float,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    metric: str = "cosine",
) -> DataFrame:
    """Exact threshold search: up to k results per query with
    similarity >= threshold, ranked (score desc, id asc) — the semantics
    of GraphSearcher's threshold overload (GraphSearcher.java:192-195:
    "results are returned... with a similarity >= threshold", bounded by
    topK; the reference expresses thresholds in the same [0,1]-mapped
    score space its similarity functions produce, so the floor composes
    with any `metric` here). Queries that clear the threshold fewer than
    k times return fewer rows; queries that never clear it return none.
    One plan with brute_force_topk — the floor applies before its
    partial cut."""
    return brute_force_topk(vectors, queries, k, id_col, vec_col,
                            qid_col, qvec_col, threshold=threshold,
                            metric=metric)


def train_centroids(
    vectors: DataFrame,
    n_clusters: int = 16,
    sample_cap: int = 16384,
    seed: int = 42,
    vec_col: str = "embedding",
    iters: int = 6,
) -> np.ndarray:
    """Deterministic k-means on a sampled subset (k-means++ init + Lloyd,
    fixed seed/iters — mirrors KMeansPlusPlusClusterer and
    K_MEANS_ITERATIONS=6 / the 128k training cap,
    ProductQuantization.java:63-64). Returns (n_clusters, dim) float64."""
    n = vectors.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = (
        vectors.sample(fraction=frac, seed=seed).select(vec_col).toPandas()[vec_col]
    )
    X = np.stack(sample.to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    from jvector_spark.operators.pq import kmeanspp_init

    cent = kmeanspp_init(X, min(n_clusters, len(X)), rng)
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(0)
    return cent


def assign_clusters(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """+ cluster:int — nearest centroid by L2, map-side expression over a
    literal centroid array (broadcast-sized; no UDF, no shuffle)."""
    cent_lit = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in centroids
    ])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec_col), lambda x, y: (x - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # materialize the O(n_clusters x dim) distance array ONCE behind a
    # projection boundary — inlining it into both array_position and
    # array_min doubles the per-row distance work on the full-corpus
    # assignment scan (the standing re-inlining rule)
    return (
        vectors.withColumn("_cdists", dists)
        .withColumn(
            "cluster",
            F.array_position(F.col("_cdists"), F.array_min("_cdists"))
            .cast("int") - 1,
        )
        .drop("_cdists")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF search: score only vectors whose cluster is among the query's
    `nprobe` nearest centroids. nprobe >= n_clusters → exact (= brute force).

    At scale the corpus would be WRITTEN partitioned by cluster
    (partitionBy("cluster") parquet), making the probe a partition-pruned
    scan; here the filter join expresses the same plan.
    """
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    qc = assign_probes(queries, centroids, nprobe, qvec_col)
    scored = assigned.join(
        F.broadcast(qc), F.array_contains(qc.probes, assigned.cluster)
    ).select(
        F.col(qid_col).alias("qid"),
        F.col(id_col),
        _score_expr("cosine", F.col(qvec_col), F.col(vec_col))
        .alias("score"),
    )
    return _partial_global_topk(scored, k, id_col)


def write_ivf_index(
    vectors: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus PARTITIONED BY CLUSTER (parquet
    partitionBy) — the IVF inverted-file layout on object storage. A
    probe of `nprobe` clusters then reads only those directories
    (partition pruning — the scan never opens unprobed clusters' files),
    which is the scale path the in-memory `ivf_topk` filter-join only
    simulates."""
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)


def ivf_topk_partitioned(
    spark,
    path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF search over a cluster-partitioned corpus: the scan filter
    `cluster IN (union of probed clusters)` prunes PARTITION DIRECTORIES
    (PartitionFilters in the plan — no IO for unprobed clusters), then
    the per-query probe join restricts each query to its own nprobe
    clusters. Results are identical to `ivf_topk` on the same centroids.
    """
    qc = assign_probes(queries, centroids, nprobe, qvec_col)
    probed = sorted({
        int(c) for row in qc.select("probes").collect() for c in row["probes"]
    })
    corpus = spark.read.parquet(path).where(F.col("cluster").isin(probed))
    scored = corpus.join(
        F.broadcast(qc), F.array_contains(qc.probes, corpus.cluster)
    ).select(
        F.col(qid_col).alias("qid"),
        F.col(id_col),
        _score_expr("cosine", F.col(qvec_col), F.col(vec_col))
        .alias("score"),
    )
    return _partial_global_topk(scored, k, id_col)


def assign_probes(
    queries: DataFrame, centroids: np.ndarray, nprobe: int, qvec_col: str = "qvec"
) -> DataFrame:
    """+ probes:array<int> — the nprobe nearest centroids per query."""
    cent_lit = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in centroids
    ])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(qvec_col), lambda x, y: (x - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    order = F.array_sort(
        F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
    )
    return queries.withColumn(
        "probes", F.slice(F.transform(order, lambda s: s["i"]), 1, nprobe)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, score) — embedding-cosine near-duplicate pairs.

    All-pairs form for bounded inputs / VERIFICATION ONLY (it is the recall
    oracle for `embedding_lsh_near_dup` in tests). The operator wired as
    the production path is `embedding_lsh_near_dup` — random-hyperplane
    LSH candidate generation, then exact cosine on candidates only.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


# --- random-hyperplane LSH near-dup (the bucketed scale path) -------------

N_PLANES = 16
LSH_BAND_BITS = 4


def random_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplane normals, rounded to 4 decimals so the SAME
    constants embed exactly in both the Spark plan and the SQL oracle
    (decimal literals parse to identical float64 in every engine)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((n_planes, dim)), 4)


def _plane_dots(vec_col: str, planes: np.ndarray) -> list:
    """One float64 dot-product expression per hyperplane, left-to-right
    summation (same associativity the cosine verifier uses)."""
    outs = []
    for p in planes:
        plane_lit = F.array(*[F.lit(float(v)) for v in p])
        outs.append(_dot(plane_lit, F.col(vec_col)))
    return outs


def embedding_lsh_near_dup(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_planes: int = N_PLANES,
    band_bits: int = LSH_BAND_BITS,
    seed: int = 7,
    max_bucket: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, score) — near-dup pairs via random-hyperplane LSH
    banding + exact cosine verification of the candidates only.

    SimHash-for-vectors (Charikar hyperplane LSH): bit_p = sign(v · h_p);
    the n_planes bits split into bands of `band_bits`; vectors agreeing on
    ANY full band become a candidate pair. Exact cosine then gates at
    `threshold`. The reference's recall/visited-nodes tradeoff
    (GraphSearcher beam width) maps to (n_planes, band_bits): more/narrower
    bands -> higher recall, more candidates.

    Scale shape (contrast with all-pairs `embedding_near_dup_pairs`):
      * signatures are map-side Catalyst expressions (no UDF, no shuffle);
      * the only shuffles are groupBy(bucket) and the candidate equi-joins —
        never a crossJoin/CartesianProduct (pytest-asserted);
      * adversarial mega-buckets capped at `max_bucket` like minhash LSH.

    Hyperplane constants come from `random_hyperplanes` and are mirrored
    verbatim in the SQL oracle, so candidate semantics (not just scores)
    are engine-identical — dot-product signs are exact at any margin
    >> float64 ulp (fixture min |dot| ~ 0.03).
    """
    if n_planes % band_bits:
        # trailing planes would be computed per row (full scan cost) but
        # never form a band — the caller's requested recall would
        # silently not materialize
        raise ValueError(
            f"n_planes={n_planes} must be a multiple of "
            f"band_bits={band_bits}: trailing planes never form a band")
    planes = random_hyperplanes(n_planes, _vec_dim(vectors, vec_col), seed)
    dots = _plane_dots(vec_col, planes)
    bits = F.array(*[
        F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")) for d in dots
    ])
    n_bands = n_planes // band_bits
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "", F.slice(bits, b * band_bits + 1, band_bits)
            ).alias("key"),
        )
        for b in range(n_bands)
    ])
    from jvector_spark.operators.dedup import md5_hash60

    sigs = vectors.select(
        F.col(id_col), F.explode(bands).alias("bk")
    ).select(
        id_col,
        md5_hash60(
            F.concat(F.col("bk.band").cast("string"), F.lit(":"), F.col("bk.key"))
        ).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    capped = sigs.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= max_bucket
    )
    a = capped.select(F.col(id_col).alias("id_a"), "bucket")
    b = capped.select(F.col(id_col).alias("id_b"), "bucket")
    cands = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def _vec_dim(vectors: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (schema carries no length).
    Same probe as bq._infer_dim (which imports from this module, so the
    shared form lives here)."""
    row = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("cannot infer dimension of an empty vector table")
    d = row[0]["d"]
    if d is None or int(d) <= 0:
        # a null first row would otherwise propagate as a garbage dim
        # (np.standard_normal((n, -1)), sequence(0, -2)) far from here
        raise ValueError(
            f"cannot infer dimension: first scanned row has a "
            f"null/empty {vec_col!r}")
    return int(d)

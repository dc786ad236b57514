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


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: (qid, rank, vec_id, score).

    queries is broadcast (small); the corpus scan never shuffles — only the
    partial top-k rows do.
    """
    scored = vectors.join(F.broadcast(queries)).select(
        F.col(qid_col).alias("qid"),
        F.col(id_col),
        F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6).alias("score"),
    )
    # partial top-k per (qid, input partition) bounds the shuffle
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
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), id_col, "score")
    )


def train_centroids(
    vectors: DataFrame,
    n_clusters: int = 16,
    sample_cap: int = 16384,
    seed: int = 42,
    vec_col: str = "embedding",
    iters: int = 6,
) -> np.ndarray:
    """Deterministic k-means on a sampled subset (Lloyd, fixed seed/iters —
    mirrors K_MEANS_ITERATIONS=6 and the 128k training cap,
    ProductQuantization.java:63-64). Returns (n_clusters, dim) float64."""
    n = vectors.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = (
        vectors.sample(fraction=frac, seed=seed).select(vec_col).toPandas()[vec_col]
    )
    X = np.stack(sample.to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
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
    return vectors.withColumn(
        "cluster", F.array_position(dists, F.array_min(dists)).cast("int") - 1
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
        F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6).alias("score"),
    )
    wp = Window.partitionBy("qid", F.spark_partition_id()).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    pruned = scored.withColumn("prn", F.row_number().over(wp)).where(F.col("prn") <= k)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), id_col, "score")
    )


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

    All-pairs form for bounded inputs / verification; at corpus scale,
    candidate-generate with `ivf_topk` (same-cluster pairs) or LSH first,
    then verify with this scorer.
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

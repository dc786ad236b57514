"""Product Quantization: the reference's compression core, on Spark.

Direct analog of `quantization/ProductQuantization.java` (SURVEY §2.8):
  * train      — per-subspace k-means (256 centroids, 6 Lloyd iterations,
                 trained on a bounded sample; mirrors K_MEANS_ITERATIONS=6
                 and MAX_PQ_TRAINING_SET_SIZE=128k,
                 ProductQuantization.java:63-64,114-141)
  * encode     — vector -> M uint8 codes (encodeTo:418-428), vectorized
                 numpy inside mapInPandas, codes stored as a BinaryType
                 column (the ByteSequence analog)
  * decode     — codes -> approximate vector (decode:433-450)
  * ADC search — per-query partial-sum lookup tables so each candidate
                 scores as gather+sum (precomputedScoreFunctionFor,
                 PQVectors.java:191-202), then exact rerank of the top
                 rerank_k survivors (the DiskANN two-phase pattern,
                 README.md:25-34)

Codebooks are small ((M, 256, dim/M) float64) and broadcast; encode is one
map-side pass; ADC scoring is numpy matrix work per partition with a
partial top-k before the shuffle. All deterministic (seeded init, fixed
iteration count) — but k-means is not ANSI-SQL-expressible, so driver
correctness for the approximate path is a rows-only check; pytest asserts
reconstruction-error monotonicity and recall against the exact oracle
(TestProductQuantization:85-92 / testAknnDiverse-style statistical
assertions).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_CLUSTERS = 256
KMEANS_ITERS = 6
TRAIN_CAP = 16384

# versioned codebook serialization (the ProductQuantization.write/load
# analog, ref quantization/ProductQuantization.java:550-589,639-683 —
# magic + version header, refuse-newer/accept-older): our own magic,
# little-endian header (magic, version, m, n_clusters, sub_dim) then the
# float64 codebook tensor
PQ_MAGIC = 0x4A565051  # "JVPQ"
PQ_FORMAT_VERSION = 1


def save_codebooks(path: str, codebooks: np.ndarray) -> None:
    """Atomically persist codebooks (m, n_clusters, sub_dim) float64."""
    m, k, sub = codebooks.shape
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<IIIII", PQ_MAGIC, PQ_FORMAT_VERSION, m, k, sub))
        f.write(np.ascontiguousarray(codebooks, dtype="<f8").tobytes())
    os.replace(tmp, path)


def load_codebooks(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic, ver, m, k, sub = struct.unpack("<IIIII", f.read(20))
        if magic != PQ_MAGIC:
            raise ValueError(f"not a codebook file (magic {magic:#x})")
        if ver > PQ_FORMAT_VERSION:
            raise ValueError(f"codebook version {ver} too new")
        data = np.frombuffer(f.read(), dtype="<f8")
    if data.size != m * k * sub:
        raise ValueError("codebook file truncated")
    return data.reshape(m, k, sub).copy()


def kmeanspp_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding (deterministic given rng) — the reference trains
    with KMeansPlusPlusClusterer (quantization/KMeansPlusPlusClusterer.java;
    ProductQuantization.createCodebooks): each next center is drawn with
    probability proportional to squared distance from the chosen set, so a
    bad uniform draw can't silently degrade codebook quality."""
    n = len(X)
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[int(rng.integers(n))]
    d2 = ((X - centers[0]) ** 2).sum(1)
    for i in range(1, k):
        tot = float(d2.sum())
        if tot <= 0.0:  # all remaining points coincide with a center
            centers[i:] = centers[0]
            break
        probs = d2 / tot
        idx = int(rng.choice(n, p=probs))
        centers[i] = X[idx]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(1))
    return centers


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = TRAIN_CAP,
    n_clusters: int = N_CLUSTERS,
    iters: int = KMEANS_ITERS,
) -> np.ndarray:
    """Codebooks (m, n_clusters, sub_dim) from a seeded sample
    (k-means++ init + fixed Lloyd iterations, mirroring
    K_MEANS_ITERATIONS=6 / MAX_PQ_TRAINING_SET_SIZE,
    ProductQuantization.java:63-64,114-141)."""
    n = vectors.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = vectors.sample(fraction=frac, seed=seed).select(vec_col).toPandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, n_clusters, sub))
    rng = np.random.default_rng(seed)
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        k = min(n_clusters, len(Xs))
        cent = kmeanspp_init(Xs, k, rng)
        for _ in range(iters):
            d = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = Xs[mask].mean(0)
        books[s, :k] = cent
        if k < n_clusters:  # degenerate tiny inputs: pad with first centroid
            books[s, k:] = cent[0]
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """+ codes:binary — M uint8 codes per vector, one vectorized map pass."""
    spark = vectors.sparkSession
    b_books = spark.sparkContext.broadcast(codebooks)
    m, _, sub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_books.value
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.uint8)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d = ((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d.argmin(1).astype(np.uint8)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                vec_col: pdf[vec_col],
                "codes": [c.tobytes() for c in codes],
            })

    schema = f"{id_col} long, {vec_col} array<float>, codes binary"
    return vectors.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_decode_codes(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 -> (n, dim) approximate vectors (numpy helper)."""
    m, _, sub = codebooks.shape
    out = np.empty((len(codes), m * sub))
    for s in range(m):
        out[:, s * sub : (s + 1) * sub] = codebooks[s][codes[:, s]]
    return out


def reconstruction_mse(vectors_pdf: pd.DataFrame, codebooks: np.ndarray,
                       vec_col: str = "embedding") -> float:
    """Mean squared reconstruction error (TestProductQuantization's
    iterative-improvement metric)."""
    X = np.stack(vectors_pdf[vec_col].to_numpy()).astype(np.float64)
    m, _, sub = codebooks.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        d = ((Xs[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = d.argmin(1).astype(np.uint8)
    return float(((X - pq_decode_codes(codes, codebooks)) ** 2).mean())


def pq_adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    rerank_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Two-phase search: ADC approximate scan over codes, exact cosine
    rerank of the rerank_k survivors (rerankK>=topK contract,
    GraphSearcher.search:209). Returns (qid, rank, vec_id, score) with
    score = exact cosine of the reranked survivors.

    Phase 1 is numpy per partition: per (query, subspace) a 256-entry
    dot-product table (query-normalized), candidate score = sum of M table
    lookups — the assembleAndSum gather (VectorUtilSupport.java:102-115).
    Partial top-rerank_k per partition bounds the shuffle.
    """
    if rerank_k is None:
        rerank_k = 4 * k
    spark = encoded.sparkSession
    qpdf = queries.toPandas()
    Q = np.stack(qpdf[qvec_col].to_numpy()).astype(np.float64)
    qids = qpdf[qid_col].to_numpy(np.int64)
    m, n_clusters, sub = codebooks.shape
    # per-query per-subspace lookup tables: dot(q_sub, centroid) / |q|
    qnorm = np.sqrt((Q * Q).sum(1))
    tables = np.empty((len(Q), m, n_clusters))
    for s in range(m):
        tables[:, s, :] = Q[:, s * sub : (s + 1) * sub] @ codebooks[s].T
    b = spark.sparkContext.broadcast((qids, tables, qnorm))

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, tables_, qnorm_ = b.value
        for pdf in batches:
            codes = np.frombuffer(
                b"".join(pdf["codes"].to_numpy()), dtype=np.uint8
            ).reshape(len(pdf), m)
            # approximate dot via gather+sum per subspace
            approx = np.zeros((len(qids_), len(pdf)))
            for s in range(m):
                approx += tables_[:, s, :][:, codes[:, s]]
            ids = pdf[id_col].to_numpy(np.int64)
            out = []
            top = min(len(pdf), rerank_k)
            for qi in range(len(qids_)):
                sel = np.argpartition(-approx[qi], top - 1)[:top]
                out.append(pd.DataFrame({
                    "qid": qids_[qi], id_col: ids[sel],
                    "approx": approx[qi][sel],
                }))
            yield pd.concat(out, ignore_index=True)

    partial = encoded.select(id_col, "codes").mapInPandas(
        adc, f"qid long, {id_col} long, approx double"
    )
    # global top-rerank_k survivors per query, then exact rerank
    w = Window.partitionBy("qid").orderBy(F.desc("approx"), F.asc(id_col))
    survivors = (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank_k)
        .drop("rn")
    )
    from jvector_spark.operators.ann import cosine_expr

    qdf = queries.select(
        F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qv")
    )
    exact = (
        survivors.join(encoded.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "qid")
        .select(
            "qid", id_col,
            F.round(cosine_expr(F.col("_qv"), F.col(vec_col)), 6).alias("score"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), id_col,
                "score")
    )

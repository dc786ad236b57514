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
  * anisotropic mode — ScaNN-style weighted training + coordinate-descent
                 encoding (encodeAnisotropic:248-285, KMeansPlusPlusClusterer
                 anisotropic phase; Guo et al. 2020), opt-in via
                 anisotropic_threshold on train_pq/pq_encode

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
# float64 codebook tensor. Version 2 appends the anisotropic threshold
# (float64; NaN = unweighted) after the header — mirroring the reference
# persisting anisotropicThreshold from PQ format version 3 on
# (ProductQuantization.write:558-567, TestProductQuantization's
# version round-trip tests). Version 3 appends the optional global
# centroid (uint32 length, 0 = none, then float64s — the reference
# writes globalCentroid the same way, write:556-557). Older versions
# still load (accept-older / refuse-newer).
PQ_MAGIC = 0x4A565051  # "JVPQ"
PQ_FORMAT_VERSION = 3


def save_codebooks(path: str, codebooks: np.ndarray,
                   anisotropic_threshold: float | None = None,
                   global_centroid: np.ndarray | None = None) -> None:
    """Atomically persist codebooks (m, n_clusters, sub_dim) float64."""
    m, k, sub = codebooks.shape
    t = float("nan") if anisotropic_threshold is None else float(
        anisotropic_threshold)
    # validate BEFORE opening the tmp file: a failed save must be
    # side-effect-free (no stale .tmp left beside the store)
    c = None
    if global_centroid is not None:
        c = np.ascontiguousarray(global_centroid, dtype="<f8").ravel()
        if c.size != m * sub:
            raise ValueError(
                f"centroid dim {c.size} != codebook dim {m * sub}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<IIIII", PQ_MAGIC, PQ_FORMAT_VERSION, m, k, sub))
        f.write(struct.pack("<d", t))
        if c is None:
            f.write(struct.pack("<I", 0))
        else:
            f.write(struct.pack("<I", c.size))
            f.write(c.tobytes())
        f.write(np.ascontiguousarray(codebooks, dtype="<f8").tobytes())
    os.replace(tmp, path)


def load_codebooks(path: str, return_threshold: bool = False,
                   return_centroid: bool = False):
    """Load codebooks; with the flags, also the persisted encode
    parameters. A file that CARRIES a threshold/centroid refuses the
    bare-books call for the corresponding field: those parameters change
    code semantics (pq_encode in the wrong frame / wrong objective
    silently mis-encodes), so a caller about to drop them must say so
    explicitly by passing the flag."""
    with open(path, "rb") as f:
        magic, ver, m, k, sub = struct.unpack("<IIIII", f.read(20))
        if magic != PQ_MAGIC:
            raise ValueError(f"not a codebook file (magic {magic:#x})")
        if ver > PQ_FORMAT_VERSION:
            raise ValueError(f"codebook version {ver} too new")
        thr = None
        if ver >= 2:
            (t,) = struct.unpack("<d", f.read(8))
            thr = None if np.isnan(t) else float(t)
        centroid = None
        if ver >= 3:
            (clen,) = struct.unpack("<I", f.read(4))
            if clen:
                if clen != m * sub:
                    # symmetric with the write-side check: a short
                    # centroid would numpy-broadcast in pq_encode and
                    # silently mis-center every vector
                    raise ValueError(
                        f"centroid dim {clen} != codebook dim {m * sub}")
                centroid = np.frombuffer(f.read(8 * clen), dtype="<f8").copy()
        data = np.frombuffer(f.read(), dtype="<f8")
    if data.size != m * k * sub:
        raise ValueError("codebook file truncated")
    if thr is not None and not return_threshold:
        raise ValueError(
            "codebook file carries anisotropic_threshold; load with "
            "return_threshold=True (it must be passed to pq_encode)")
    if centroid is not None and not return_centroid:
        raise ValueError(
            "codebook file carries global_centroid; load with "
            "return_centroid=True (it must be passed to pq_encode)")
    books = data.reshape(m, k, sub).copy()
    out = (books,)
    if return_threshold:
        out += (thr,)
    if return_centroid:
        out += (centroid,)
    return out if len(out) > 1 else books


def parallel_cost_multiplier(threshold: float, dim: int) -> float:
    """ScaNN's parallel-vs-orthogonal cost ratio from a dot-product
    relevance threshold T (KMeansPlusPlusClusterer.computeParallelCostMultiplier:116-124):
    parallel cost T², perpendicular cost (1-T²)/(d-1), clamped at 1
    (weighting below plain L2 never helps). Valid for unit-normalized
    training data; -1 < T < 1."""
    if not (-1.0 < threshold < 1.0):
        raise ValueError(f"anisotropic threshold must be in (-1, 1), got {threshold}")
    pc = threshold * threshold
    perp = (1.0 - pc) / max(dim - 1, 1)
    return max(1.0, pc / perp)


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


def _anisotropic_refine(Xs: np.ndarray, cent: np.ndarray, pcm: float,
                        iters: int) -> np.ndarray:
    """Anisotropic k-means refinement of one subspace's centroids
    (KMeansPlusPlusClusterer.cluster:131-146 second phase; ScaNN paper
    "Accelerating Large-Scale Inference with Anisotropic Vector
    Quantization", Guo et al. 2020, appendix 7.5).

    Assignment: weighted distance pcm·par + perp with
    par = ((c·x − x·x))², perp = ‖c−x‖² − par (weightedDistance:315-325).
    NOTE the deliberate asymmetry, faithful to the reference: the
    clusterer's assignment cost leaves `par` UNNORMALIZED (exactly as
    KMeansPlusPlusClusterer.weightedDistance does), while the encode path
    and anisotropic_loss normalize the parallel component by the vector
    norm (as ProductQuantization.computeResidual:393-398 does) — the
    reference itself trains and encodes under these two slightly
    different objectives, and matching its codebooks requires matching
    both as-is.
    Update: closed-form solve per cluster,
      c = (ocm·I + (1−ocm)/|L| · Σ xxᵀ/‖x‖²)⁻¹ · mean(L),  ocm = 1/pcm
    (updateCentroidsAnisotropic:378-431). Empty clusters keep their old
    centroid (the reference re-seeds to a random point; we stay
    deterministic — a centroid nothing chose is harmless padding).
    Stops early when <1% of points change cluster."""
    n, sub = Xs.shape
    k = len(cent)
    ocm = 1.0 / pcm
    xN = (Xs * Xs).sum(1)  # (n,)
    # per-point normalized outer-product weights, guarded for zero vectors
    safe = np.maximum(xN, 1e-30)
    assign = np.full(n, -1, dtype=np.intp)
    for _ in range(iters):
        cDotX = Xs @ cent.T                     # (n, k)
        cN = (cent * cent).sum(1)[None, :]      # (1, k)
        par = (cDotX - xN[:, None]) ** 2
        resid = cN - 2.0 * cDotX + xN[:, None]
        cost = pcm * par + (resid - par)
        new_assign = cost.argmin(1)
        changed = int((new_assign != assign).sum())
        assign = new_assign
        # closed-form weighted centroid per cluster
        for c in range(k):
            mask = assign == c
            cnt = int(mask.sum())
            if cnt == 0:
                continue
            L = Xs[mask]
            mean = L.mean(0)
            W = L / safe[mask, None]            # rows x/‖x‖²
            M = (L.T @ W) * ((1.0 - ocm) / cnt)
            M[np.diag_indices(sub)] += ocm
            cent[c] = np.linalg.solve(M, mean)
        if changed <= max(1, n // 100):
            break
    return cent


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = TRAIN_CAP,
    n_clusters: int = N_CLUSTERS,
    iters: int = KMEANS_ITERS,
    anisotropic_threshold: float | None = None,
    center: bool = False,
):
    """Codebooks (m, n_clusters, sub_dim) from a seeded sample
    (k-means++ init + fixed Lloyd iterations, mirroring
    K_MEANS_ITERATIONS=6 / MAX_PQ_TRAINING_SET_SIZE,
    ProductQuantization.java:63-64,114-141). With
    `anisotropic_threshold` set, each subspace's Lloyd pass is followed
    by the same number of anisotropic refinement iterations
    (createCodebooks:466-473: unweighted first — "significantly
    faster" — then weighted), using the subspace dimensionality for the
    cost multiplier as the reference's per-subspace clusterer does.

    With `center=True`, the global centroid of the training sample is
    subtracted before clustering and RETURNED alongside the codebooks —
    return value becomes (books, centroid) — the reference's
    globallyCenter option (compute:114-141; "not recommended when using
    the quantization for dot product", hence opt-in). Pass the centroid
    to pq_encode/pq_decode_codes; ADC top-k ordering is invariant to it
    (q·centroid is a per-query constant), so pq_adc_topk needs no change."""
    n = vectors.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = vectors.sample(fraction=frac, seed=seed).select(vec_col).toPandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    centroid = None
    if center:
        centroid = X.mean(0)
        X = X - centroid
    books = train_pq_np(X, m, n_clusters=n_clusters, iters=iters, seed=seed,
                        anisotropic_threshold=anisotropic_threshold)
    return (books, centroid) if center else books


def train_pq_np(X: np.ndarray, m: int, n_clusters: int = N_CLUSTERS,
                iters: int = KMEANS_ITERS, seed: int = 42,
                anisotropic_threshold: float | None = None) -> np.ndarray:
    """Numpy core of train_pq: (n, dim) sample -> (m, n_clusters, sub)
    codebooks. Shared by the Spark trainer above and the warm VectorPool
    (quantize='pq'), which trains on its load-time float matrix the way
    it already trains its IVF centroids."""
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
        if anisotropic_threshold is not None:
            pcm = parallel_cost_multiplier(anisotropic_threshold, sub)
            cent = _anisotropic_refine(Xs, cent, pcm, iters)
        books[s, :k] = cent
        if k < n_clusters:  # degenerate tiny inputs: pad with first centroid
            books[s, k:] = cent[0]
    return books


def _encode_unweighted(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8, nearest centroid per subspace
    (encodeUnweighted:401-405)."""
    m, _, sub = books.shape
    codes = np.empty((len(X), m), dtype=np.uint8)
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        d = ((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = d.argmin(1).astype(np.uint8)
    return codes


def _encode_anisotropic(X: np.ndarray, books: np.ndarray,
                        pcm: float, max_iters: int = 10) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 via coordinate descent on the anisotropic
    loss (encodeAnisotropic:248-285, optimizeSingleSubspace:287-330;
    MAX_ITERATIONS=10 "borrowed from SCANN code").

    The full-vector loss decomposes exactly over subspaces: with
    rᵢ = cᵢ − xᵢ and the signed parallel subtotal pᵢ = cᵢ·xᵢ − ‖xᵢ‖²,
    the residual's component parallel to x is S/‖x‖ where S = Σᵢ pᵢ, so

        loss = pcm·S²/‖x‖² + (‖r‖² − S²/‖x‖²)
             = Σᵢ ‖rᵢ‖²  +  (pcm−1)/‖x‖² · (Σᵢ pᵢ)²

    Coordinate descent holds all other subspaces fixed and picks
    argmin_j ‖rᵢ(j)‖² + λ·(S₋ᵢ + pᵢ(j))², which is the ScaNN paper's
    objective computed in closed form (the reference accumulates
    per-subspace squared components and re-squares their sum —
    encodeAnisotropic:256-260 — a formulation we deliberately do not
    reproduce; each of our sweeps provably never increases the loss,
    asserted by test_pq_aniso). Fully vectorized over the batch: the
    python loops are m subspaces × ≤10 sweeps, independent of n.

    Initialization = per-subspace min residual norm
    (initializeToMinResidualNorms:343-357), i.e. the unweighted code."""
    m, k, sub = books.shape
    n = len(X)
    if n == 0:
        return np.empty((0, m), dtype=np.uint8)
    xn_full = np.maximum((X * X).sum(1), 1e-30)        # ‖x‖² (n,)
    cN = (books * books).sum(2)                        # (m, k)
    # build rN/p per subspace so only these two (n,m,k) tensors are ever
    # resident (cDotX is p + xN — materializing it too would add 50% to
    # the peak, ~160 MB per 10k-row Arrow batch at m=8/k=256)
    rN = np.empty((n, m, k))                           # ‖rᵢ(j)‖²
    p = np.empty((n, m, k))                            # pᵢ(j), signed
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        cd = Xs @ books[s].T                           # (n, k) temp
        xn_s = (Xs * Xs).sum(1)[:, None]
        rN[:, s, :] = cN[s][None, :] - 2.0 * cd + xn_s
        p[:, s, :] = cd - xn_s
    codes = rN.argmin(2)                                # (n, m) intp
    lam = (pcm - 1.0) / xn_full                         # (n,)
    rows = np.arange(n)
    S = p[rows[:, None], np.arange(m)[None, :], codes].sum(1)  # (n,)
    for _ in range(max_iters):
        changed = False
        for i in range(m):
            p_i = p[:, i, :]                            # (n, k)
            S_other = S - p_i[rows, codes[:, i]]
            cost = rN[:, i, :] + lam[:, None] * (S_other[:, None] + p_i) ** 2
            new = cost.argmin(1)
            changed = changed or bool((new != codes[:, i]).any())
            codes[:, i] = new
            S = S_other + p_i[rows, new]
        if not changed:
            break
    return codes.astype(np.uint8)


def anisotropic_loss(X: np.ndarray, codes: np.ndarray,
                     books: np.ndarray, pcm: float) -> float:
    """Mean per-vector anisotropic loss pcm·‖r∥‖² + ‖r⊥‖² of an encoding
    (the quantity encodeAnisotropic minimizes) — test/metric helper."""
    recon = pq_decode_codes(codes, books)
    r = recon - X
    xn = np.maximum((X * X).sum(1), 1e-30)
    par = (r * X).sum(1) ** 2 / xn
    tot = (r * r).sum(1)
    return float((pcm * par + (tot - par)).mean())


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anisotropic_threshold: float | None = None,
    global_centroid: np.ndarray | None = None,
) -> DataFrame:
    """+ codes:binary — M uint8 codes per vector, one vectorized map pass.
    With `anisotropic_threshold`, codes are chosen by coordinate descent
    on the ScaNN anisotropic loss instead of nearest-centroid; the cost
    multiplier uses the ORIGINAL dimension, as the reference's encode
    does (optimizeSingleSubspace:289 with originalDimension). With
    `global_centroid` (from train_pq(center=True)), vectors are centered
    before code assignment (encodeTo:420-427 subtracting globalCentroid)."""
    spark = vectors.sparkSession
    b_books = spark.sparkContext.broadcast(
        (codebooks, None if global_centroid is None
         else np.asarray(global_centroid, dtype=np.float64).ravel()))
    m, _, sub = codebooks.shape
    pcm = (None if anisotropic_threshold is None
           else parallel_cost_multiplier(anisotropic_threshold, m * sub))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books, centroid = b_books.value
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if centroid is not None:
                X = X - centroid
            if pcm is None:
                codes = _encode_unweighted(X, books)
            else:
                codes = _encode_anisotropic(X, books, pcm)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                vec_col: pdf[vec_col],
                "codes": [c.tobytes() for c in codes],
            })

    schema = f"{id_col} long, {vec_col} array<float>, codes binary"
    return vectors.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_decode_codes(codes: np.ndarray, codebooks: np.ndarray,
                    global_centroid: np.ndarray | None = None) -> np.ndarray:
    """(n, m) uint8 -> (n, dim) approximate vectors (numpy helper).
    Adds the global centroid back when the codes were centered
    (decode:433-450 adding globalCentroid)."""
    m, _, sub = codebooks.shape
    out = np.empty((len(codes), m * sub))
    for s in range(m):
        out[:, s * sub : (s + 1) * sub] = codebooks[s][codes[:, s]]
    if global_centroid is not None:
        out += np.asarray(global_centroid, dtype=np.float64).ravel()
    return out


def reconstruction_mse(vectors_pdf: pd.DataFrame, codebooks: np.ndarray,
                       vec_col: str = "embedding",
                       global_centroid: np.ndarray | None = None) -> float:
    """Mean squared reconstruction error (TestProductQuantization's
    iterative-improvement metric)."""
    X = np.stack(vectors_pdf[vec_col].to_numpy()).astype(np.float64)
    Xc = X if global_centroid is None else X - np.asarray(
        global_centroid, dtype=np.float64).ravel()
    codes = _encode_unweighted(Xc, codebooks)
    rec = pq_decode_codes(codes, codebooks, global_centroid)
    return float(((X - rec) ** 2).mean())


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
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Two-phase search: ADC approximate scan over codes, exact cosine
    rerank of the rerank_k survivors (rerankK>=topK contract,
    GraphSearcher.search:209). Returns (qid, rank, vec_id, score) with
    score = exact cosine of the reranked survivors.

    Phase 1 is numpy per partition: per (query, subspace) a 256-entry
    dot-product table of dot(q_sub, centroid) — an UNNORMALIZED partial
    dot product (any per-query constant scales ranks identically);
    candidate score = sum of M table lookups — the assembleAndSum gather
    (VectorUtilSupport.java:102-115). Partial top-rerank_k per partition
    bounds the shuffle.

    `vectors` (optional): the full-precision source to fetch rerank rows
    from. Default None joins back to `encoded` — correct, but when
    `encoded` is an UNCACHED pq_encode plan, that join re-runs the whole
    Python encode pipeline (mapInPandas is opaque to column pruning)
    just to read the pass-through (id, embedding) columns; pass the
    original vectors DataFrame (or cache `encoded`) to avoid it.
    """
    if rerank_k is None:
        rerank_k = 4 * k
    spark = encoded.sparkSession
    qpdf = queries.toPandas()
    if not len(qpdf):  # empty query batch: empty result, same schema
        return spark.createDataFrame(
            [], f"qid long, rank int, {id_col} long, score double")
    Q = np.stack(qpdf[qvec_col].to_numpy()).astype(np.float64)
    qids = qpdf[qid_col].to_numpy(np.int64)
    m, n_clusters, sub = codebooks.shape
    tables = np.empty((len(Q), m, n_clusters))
    for s in range(m):
        tables[:, s, :] = Q[:, s * sub : (s + 1) * sub] @ codebooks[s].T
    b = spark.sparkContext.broadcast((qids, tables))

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, tables_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
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
    rerank_src = vectors if vectors is not None else encoded
    exact = (
        survivors.join(rerank_src.select(id_col, vec_col), id_col)
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

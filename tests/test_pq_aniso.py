"""Anisotropic PQ (ScaNN-style) — the reference's encodeAnisotropic /
anisotropic KMeansPlusPlusClusterer path (ProductQuantization.java:248-330,
KMeansPlusPlusClusterer.java:116-146,278-431), previously a cite-only
survey row. Mirrors TestProductQuantization's statistical assertions:
the weighted encoder must reduce the anisotropic loss it optimizes, and
MIPS/cosine recall at a fixed rerank budget must not degrade."""

import numpy as np
import pytest

from jvector_spark.operators.pq import (
    N_CLUSTERS,
    _encode_anisotropic,
    _encode_unweighted,
    anisotropic_loss,
    load_codebooks,
    parallel_cost_multiplier,
    pq_adc_topk,
    pq_decode_codes,
    pq_encode,
    save_codebooks,
    train_pq,
)


def _unit_rows(a: np.ndarray) -> np.ndarray:
    return a / np.linalg.norm(a, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def clustered_unit_vectors():
    """Seeded clustered unit vectors (dim 32) — the regime anisotropic
    quantization targets (unit-normalized, MIPS ≡ cosine)."""
    rng = np.random.default_rng(7)
    centers = _unit_rows(rng.normal(size=(40, 32)))
    labels = rng.integers(0, 40, 3000)
    X = _unit_rows(centers[labels] + 0.35 * rng.normal(size=(3000, 32)))
    return X.astype(np.float64)


def test_parallel_cost_multiplier_formula():
    # T=0 -> parallel cost 0 -> clamped to 1 (plain L2)
    assert parallel_cost_multiplier(0.0, 64) == 1.0
    # published formula: T²(d−1)/(1−T²), monotone in |T|
    t = 0.2
    expected = (t * t) * 63 / (1 - t * t)
    assert parallel_cost_multiplier(t, 64) == pytest.approx(max(1.0, expected))
    assert (parallel_cost_multiplier(0.5, 64)
            > parallel_cost_multiplier(0.2, 64) > 1.0)
    # reference guards -1 < T < 1 (KMeansPlusPlusClusterer.java:87-91)
    with pytest.raises(ValueError):
        parallel_cost_multiplier(1.0, 64)


def test_coordinate_descent_reduces_the_loss_it_optimizes(
        clustered_unit_vectors):
    X = clustered_unit_vectors
    books = train_pq_local(X, m=8, n_clusters=64)
    pcm = parallel_cost_multiplier(0.2, X.shape[1])
    plain = _encode_unweighted(X, books)
    aniso = _encode_anisotropic(X, books, pcm)
    l_plain = anisotropic_loss(X, plain, books, pcm)
    l_aniso = anisotropic_loss(X, aniso, books, pcm)
    # descent starts FROM the unweighted code and never increases
    assert l_aniso <= l_plain
    # and actually moves on clustered data (not a no-op)
    assert (aniso != plain).any()
    # parallel residual specifically shrinks (the whole point)
    def par(codes):
        r = pq_decode_codes(codes, books) - X
        return float(((r * X).sum(1) ** 2).mean())
    assert par(aniso) < par(plain)


def train_pq_local(X: np.ndarray, m: int, n_clusters: int,
                   threshold: float | None = None) -> np.ndarray:
    """Driver-side trainer twin over a numpy array (avoids a Spark
    session for pure-kernel tests)."""
    import pandas as pd
    from jvector_spark.operators import pq as pqmod
    sub = X.shape[1] // m
    books = np.empty((m, n_clusters, sub))
    rng = np.random.default_rng(42)
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        cent = pqmod.kmeanspp_init(Xs, n_clusters, rng)
        for _ in range(6):
            d = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(n_clusters):
                mask = assign == c
                if mask.any():
                    cent[c] = Xs[mask].mean(0)
        if threshold is not None:
            pcm = pqmod.parallel_cost_multiplier(threshold, sub)
            cent = pqmod._anisotropic_refine(Xs, cent, pcm, 6)
        books[s] = cent
    return books


def test_anisotropic_training_improves_mips_recall(clustered_unit_vectors):
    """End metric (TestProductQuantization's recall-style assertion):
    ADC ordering recall@10 vs exact dot product, fixed seed. The
    anisotropically trained+encoded codes must beat plain PQ on
    clustered unit vectors (ScaNN Fig. 4 regime)."""
    X = clustered_unit_vectors
    rng = np.random.default_rng(11)
    Q = _unit_rows(rng.normal(size=(40, 32)) + 0.0)
    exact = (Q @ X.T).argsort(1)[:, ::-1][:, :10]

    def recall(books, codes):
        # ADC: per-query table lookup sum (same math as pq_adc_topk phase 1)
        m, k, sub = books.shape
        tables = np.stack([Q[:, s * sub:(s + 1) * sub] @ books[s].T
                           for s in range(m)], axis=1)  # (q, m, k)
        approx = np.zeros((len(Q), len(X)))
        for s in range(m):
            approx += tables[:, s, :][:, codes[:, s]]
        got = approx.argsort(1)[:, ::-1][:, :10]
        return np.mean([len(set(a) & set(b)) / 10.0
                        for a, b in zip(got, exact)])

    books_u = train_pq_local(X, m=8, n_clusters=64)
    books_a = train_pq_local(X, m=8, n_clusters=64, threshold=0.2)
    pcm = parallel_cost_multiplier(0.2, X.shape[1])
    r_plain = recall(books_u, _encode_unweighted(X, books_u))
    r_aniso = recall(books_a, _encode_anisotropic(X, books_a, pcm))
    assert r_aniso > r_plain, (r_aniso, r_plain)


def test_encode_batch_split_invariance(clustered_unit_vectors):
    """Codes are a pure per-vector function — splitting the batch
    anywhere yields identical codes (Spark partitioning cannot change
    results)."""
    X = clustered_unit_vectors[:512]
    books = train_pq_local(X, m=4, n_clusters=32)
    pcm = parallel_cost_multiplier(0.25, X.shape[1])
    whole = _encode_anisotropic(X, books, pcm)
    parts = np.vstack([_encode_anisotropic(X[:100], books, pcm),
                       _encode_anisotropic(X[100:350], books, pcm),
                       _encode_anisotropic(X[350:], books, pcm)])
    assert (whole == parts).all()


def test_codebook_version2_roundtrip(tmp_path):
    books = np.arange(2 * 4 * 3, dtype=np.float64).reshape(2, 4, 3)
    p = str(tmp_path / "b.pq")
    save_codebooks(p, books, anisotropic_threshold=0.2)
    got, thr = load_codebooks(p, return_threshold=True)
    assert thr == pytest.approx(0.2)
    assert (got == books).all()
    # unweighted saves NaN sentinel -> loads as None
    save_codebooks(p, books)
    got, thr = load_codebooks(p, return_threshold=True)
    assert thr is None and (got == books).all()
    # version-1 files (no threshold field) still load: accept-older
    import struct
    legacy = str(tmp_path / "v1.pq")
    with open(legacy, "wb") as f:
        f.write(struct.pack("<IIIII", 0x4A565051, 1, 2, 4, 3))
        f.write(books.astype("<f8").tobytes())
    got, thr = load_codebooks(legacy, return_threshold=True)
    assert thr is None and (got == books).all()
    # refuse-newer
    newer = str(tmp_path / "v9.pq")
    with open(newer, "wb") as f:
        f.write(struct.pack("<IIIII", 0x4A565051, 9, 2, 4, 3))
    with pytest.raises(ValueError, match="too new"):
        load_codebooks(newer)


def test_spark_encode_and_two_phase_search(spark, clustered_unit_vectors):
    """pq_encode(anisotropic_threshold=...) through Spark: codes match
    the driver kernel bit-for-bit, and the two-phase ADC+exact-rerank
    search still satisfies the covering contract (top-k == brute force
    when rerank_k covers)."""
    import pandas as pd
    from pyspark.sql import functions as F

    X = clustered_unit_vectors[:800].astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X),
    })).repartition(4)
    books = train_pq(df, m=8, seed=42, n_clusters=64,
                     anisotropic_threshold=0.2)
    enc = pq_encode(df, books, anisotropic_threshold=0.2)
    pdf = enc.toPandas().sort_values("vec_id")
    got = np.frombuffer(b"".join(pdf["codes"]), np.uint8).reshape(-1, 8)
    pcm = parallel_cost_multiplier(0.2, X.shape[1])
    want = _encode_anisotropic(X.astype(np.float64), books, pcm)
    assert (got == want).all()

    rng = np.random.default_rng(3)
    Q = _unit_rows(rng.normal(size=(5, 32))).astype(np.float32)
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(5, dtype=np.int64), "qvec": list(Q),
    }))
    res = pq_adc_topk(enc, queries, books, k=5, rerank_k=len(X)).toPandas()
    # covering rerank => exact brute-force cosine top-k, rank-identical
    from jvector_spark.operators.ann import brute_force_topk
    exact = brute_force_topk(df, queries, k=5, qvec_col="qvec").toPandas()
    for q in range(5):
        got_ids = res[res.qid == q].sort_values("rank")["vec_id"].to_numpy()
        want_ids = (exact[exact.qid == q].sort_values("rank")["vec_id"]
                    .to_numpy())
        assert (got_ids == want_ids).all()

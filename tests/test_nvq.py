"""NVQ per-vector 8-bit quantization (NVQuantization.java:42-155 /
NVQScorer.java analogs): Catalyst/numpy encode parity, reconstruction
bounds, two-phase rerank exactness, and the quantized serving pool."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.nvq import (
    LEVELS,
    nvq_dequant_np,
    nvq_encode,
    nvq_encode_np,
    nvq_rerank_topk,
)


@pytest.fixture(scope="module")
def vectors_pdf():
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(12, 24)) * 3
    X = centers[rng.integers(0, 12, 500)] + rng.normal(size=(500, 24))
    return pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })


@pytest.fixture(scope="module")
def vectors_df(spark, vectors_pdf):
    return spark.createDataFrame(vectors_pdf).repartition(4)


def test_encode_parity_spark_vs_numpy(spark, vectors_df, vectors_pdf):
    """The Catalyst expression and the serving-side numpy encoder must
    produce IDENTICAL codes (half-up rounding on both sides) — a mismatch
    would make warm-pool scores drift from the batch tier's."""
    got = (nvq_encode(vectors_df).select("vec_id", "vmin", "delta", "codes")
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    X = np.stack(vectors_pdf["embedding"].to_numpy()).astype(np.float64)
    codes, vmin, delta = nvq_encode_np(X)
    assert np.array_equal(
        np.vstack(got["codes"].to_numpy()).astype(np.uint8), codes)
    assert np.allclose(got["vmin"], vmin, rtol=0, atol=1e-6)
    # serving side stores float32 params; compare at float32 resolution
    assert np.allclose(got["delta"], delta, rtol=1e-6, atol=0)
    assert codes.max() <= LEVELS and codes.min() >= 0


def test_encode_constant_and_extreme_vectors(spark):
    """Constant vectors (delta == 0) encode to all-zero codes and decode
    to vmin exactly; range endpoints map to codes 0 and 255."""
    pdf = pd.DataFrame({
        "vec_id": np.arange(2, dtype=np.int64),
        "embedding": [np.full(8, 2.5, np.float32),
                      np.array([-1, 0, 0, 0, 0, 0, 0, 3], np.float32)],
    })
    got = (nvq_encode(spark.createDataFrame(pdf))
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    assert list(got.loc[0, "codes"]) == [0] * 8
    assert got.loc[0, "delta"] == 0.0
    c1 = list(got.loc[1, "codes"])
    assert c1[0] == 0 and c1[-1] == LEVELS


def test_reconstruction_error_bounded(vectors_pdf):
    """Per-element |x - dequant(x)| <= delta/2 (affine 8-bit contract)."""
    X = np.stack(vectors_pdf["embedding"].to_numpy()).astype(np.float64)
    codes, vmin, delta = nvq_encode_np(X)
    dq = nvq_dequant_np(codes, vmin, delta)
    err = np.abs(X - dq)
    assert (err <= delta.astype(np.float64)[:, None] / 2 + 1e-9).all()


def test_rerank_topk_exact_with_coverage(spark, vectors_df, vectors_pdf):
    """Two-phase NVQ search == brute-force exact top-k when rerank_k
    covers the true result (the rerankK >= topK contract the PQ tier
    already pins) — scores exact, ranks identical."""
    from jvector_spark.operators.ann import brute_force_topk

    queries = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(5, dtype=np.int64),
        "qvec": list(vectors_pdf["embedding"].head(5)),
    }))
    enc = nvq_encode(vectors_df)
    got = (nvq_rerank_topk(enc, queries, k=10, rerank_k=100)
           .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    exp = (brute_force_topk(vectors_df, queries, k=10)
           .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_quantized_vector_pool_recall_and_memory(tmp_path, vectors_pdf):
    """The NVQ serving pool: ~8x smaller residency than the float64 pool,
    recall@10 >= 0.9 against the exact pool, and the IVF tier still
    composes with it."""
    from jvector_spark.serve import VectorPool

    p = str(tmp_path / "vecs.parquet")
    vectors_pdf.to_parquet(p, index=False)
    exact = VectorPool(p)
    nvq = VectorPool(p, quantize="nvq")
    X = np.stack(vectors_pdf["embedding"].head(8).to_numpy())
    a = exact.knn(X, k=10)
    b = nvq.knn(X, k=10)
    hits = 0
    for qid in range(8):
        ea = set(a[a["qid"] == qid]["vec_id"])
        eb = set(b[b["qid"] == qid]["vec_id"])
        hits += len(ea & eb)
    assert hits / 80 >= 0.9
    resident_exact = exact.mat.nbytes
    resident_nvq = (nvq._codes.nbytes + nvq._vmin.nbytes
                    + nvq._delta.nbytes)
    assert resident_nvq * 5 < resident_exact  # 8 bytes/dim -> ~1 byte/dim + params
    # IVF tier composes: full-probe == pool's own brute ranking
    nvq_ivf = VectorPool(p, quantize="nvq", n_clusters=8)
    c = nvq_ivf.knn(X, k=10, nprobe=8)
    pd.testing.assert_frame_equal(
        b.reset_index(drop=True), c.reset_index(drop=True))

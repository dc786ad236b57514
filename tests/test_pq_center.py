"""Global centering for PQ — the reference's globallyCenter option
(ProductQuantization.compute:114-141 subtracts the training centroid,
encodeTo:420-427 centers before assignment, decode:433-450 adds it back,
write:556-557 persists it). Off-center data is the regime it targets."""

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.pq import (
    load_codebooks,
    pq_adc_topk,
    pq_decode_codes,
    pq_encode,
    reconstruction_mse,
    save_codebooks,
    train_pq,
)


@pytest.fixture(scope="module")
def offcenter_df(spark):
    """Clustered data displaced far from the origin — uncentered PQ
    wastes codebook resolution representing the common offset."""
    rng = np.random.default_rng(13)
    centers = rng.normal(size=(12, 24))
    X = (centers[rng.integers(0, 12, 500)] + rng.normal(size=(500, 24))
         + 25.0)  # large common offset
    pdf = pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X],
    })
    return spark.createDataFrame(pdf).repartition(4), pdf


def test_centered_training_is_translation_equivariant(offcenter_df):
    """k-means (++ init included) is translation-equivariant, so with the
    same seed the centered pipeline reconstructs the SAME approximation —
    shifted codebooks, identical assignments. Centering's real benefit in
    the reference is numeric range (float32 codebooks/ADC hold residuals
    near zero instead of large absolute coordinates); in float64 the MSE
    must simply match. This pins the equivalence so a regression in the
    centering plumbing (double-shift, missed add-back) shows up as a
    large MSE delta."""
    df, pdf = offcenter_df
    books_u = train_pq(df, m=4, seed=9, n_clusters=64)
    books_c, centroid = train_pq(df, m=4, seed=9, n_clusters=64, center=True)
    assert centroid is not None and centroid.shape == (24,)
    # the mean offset actually moved into the centroid, out of the books
    assert abs(float(centroid.mean()) - 25.0) < 1.0
    assert abs(float(books_c.mean())) < 2.0 < float(books_u.mean())
    mse_u = reconstruction_mse(pdf, books_u)
    mse_c = reconstruction_mse(pdf, books_c, global_centroid=centroid)
    assert mse_c == pytest.approx(mse_u, rel=1e-6), (mse_c, mse_u)


def test_encode_decode_roundtrip_restores_offset(offcenter_df, spark):
    """Centered encode + decode reproduces the ORIGINAL (uncentered)
    vectors when clusters cover the points exactly."""
    rng = np.random.default_rng(2)
    X = (rng.normal(size=(30, 16)) + 50.0).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(30, dtype=np.int64), "embedding": list(X)}))
    books, centroid = train_pq(df, m=4, n_clusters=256, iters=8, seed=3,
                               center=True)
    enc = pq_encode(df, books, global_centroid=centroid).toPandas()
    enc = enc.sort_values("vec_id")
    codes = np.frombuffer(b"".join(enc["codes"]), np.uint8).reshape(30, 4)
    rec = pq_decode_codes(codes, books, global_centroid=centroid)
    assert np.allclose(rec, X.astype(np.float64), atol=1e-5)


def test_adc_ordering_invariant_to_centering_constant(offcenter_df, spark):
    """pq_adc_topk over centered codes still satisfies the covering
    contract (exact rerank = brute force): the per-query q·centroid
    constant cannot change phase-1 ordering."""
    df, pdf = offcenter_df
    books, centroid = train_pq(df, m=4, seed=9, n_clusters=64, center=True)
    enc = pq_encode(df, books, global_centroid=centroid)
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(4, dtype=np.int64),
        "qvec": pdf["embedding"].iloc[:4].tolist(),
    }))
    res = pq_adc_topk(enc, queries, books, k=5, rerank_k=500).toPandas()
    from jvector_spark.operators.ann import brute_force_topk
    exact = brute_force_topk(df, queries, k=5, qvec_col="qvec").toPandas()
    for q in range(4):
        a = res[res.qid == q].sort_values("rank")["vec_id"].to_numpy()
        b = exact[exact.qid == q].sort_values("rank")["vec_id"].to_numpy()
        assert (a == b).all()


def test_codebook_version3_roundtrip(tmp_path):
    import struct
    books = np.arange(2 * 4 * 3, dtype=np.float64).reshape(2, 4, 3)
    cent = np.arange(6, dtype=np.float64) * 1.5
    p = str(tmp_path / "c.pq")
    save_codebooks(p, books, anisotropic_threshold=0.3, global_centroid=cent)
    got, thr, c = load_codebooks(p, return_threshold=True,
                                 return_centroid=True)
    assert thr == pytest.approx(0.3)
    assert (got == books).all() and (c == cent).all()
    # no centroid -> None
    save_codebooks(p, books)
    got, c = load_codebooks(p, return_centroid=True)
    assert c is None and (got == books).all()
    # dim mismatch refused at write time
    with pytest.raises(ValueError, match="centroid dim"):
        save_codebooks(p, books, global_centroid=np.zeros(5))
    # v2 files (threshold, no centroid field) still load
    legacy = str(tmp_path / "v2.pq")
    with open(legacy, "wb") as f:
        f.write(struct.pack("<IIIII", 0x4A565051, 2, 2, 4, 3))
        f.write(struct.pack("<d", float("nan")))
        f.write(books.astype("<f8").tobytes())
    got, thr, c = load_codebooks(legacy, return_threshold=True,
                                 return_centroid=True)
    assert thr is None and c is None and (got == books).all()


def test_loader_refuses_to_drop_encode_parameters(tmp_path):
    """A file carrying a threshold/centroid refuses the bare-books load:
    silently discarding either would make pq_encode mis-encode (wrong
    frame / wrong objective) with no error."""
    import struct
    books = np.zeros((2, 4, 3))
    cent = np.ones(6)
    p = str(tmp_path / "g.pq")
    save_codebooks(p, books, global_centroid=cent)
    with pytest.raises(ValueError, match="carries global_centroid"):
        load_codebooks(p)
    with pytest.raises(ValueError, match="carries global_centroid"):
        load_codebooks(p, return_threshold=True)
    save_codebooks(p, books, anisotropic_threshold=0.2)
    with pytest.raises(ValueError, match="carries anisotropic_threshold"):
        load_codebooks(p, return_centroid=True)
    # plain files keep the ergonomic bare return
    save_codebooks(p, books)
    assert (load_codebooks(p) == books).all()
    # a corrupt/foreign short centroid is rejected instead of
    # numpy-broadcasting into silently wrong codes
    bad = str(tmp_path / "bad.pq")
    with open(bad, "wb") as f:
        f.write(struct.pack("<IIIII", 0x4A565051, 3, 2, 4, 3))
        f.write(struct.pack("<d", float("nan")))
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<d", 5.0))
        f.write(books.astype("<f8").tobytes())
    with pytest.raises(ValueError, match="centroid dim 1"):
        load_codebooks(bad, return_centroid=True)
    # failed save (bad centroid dim) leaves no stale .tmp behind
    target = str(tmp_path / "clean.pq")
    with pytest.raises(ValueError, match="centroid dim"):
        save_codebooks(target, books, global_centroid=np.zeros(5))
    import os
    assert not os.path.exists(target + ".tmp")

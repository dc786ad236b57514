"""Product-quantization tests mirroring TestProductQuantization +
recall-style assertions (TestProductQuantization.java:57-232,
SiftSmall.testRecall:353-379)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.functions import col as F_col

from jvector_spark.operators.ann import brute_force_topk
from jvector_spark.operators.pq import (
    pq_adc_topk,
    pq_decode_codes,
    pq_encode,
    reconstruction_mse,
    train_pq,
)


@pytest.fixture(scope="module")
def vectors_pdf():
    rng = np.random.default_rng(5)
    # clustered data so PQ has structure to exploit
    centers = rng.normal(size=(16, 32)) * 3
    X = centers[rng.integers(0, 16, 600)] + rng.normal(size=(600, 32))
    return pd.DataFrame({
        "vec_id": np.arange(600, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })


@pytest.fixture(scope="module")
def vectors_df(spark, vectors_pdf):
    return spark.createDataFrame(vectors_pdf).repartition(4)


def test_perfect_reconstruction_when_clusters_cover_points(spark):
    """clusters >= points -> exact reconstruction
    (TestProductQuantization.java:57)."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                        "embedding": list(X)})
    df = spark.createDataFrame(pdf)
    books = train_pq(df, m=4, n_clusters=256, iters=8, seed=3)
    enc = pq_encode(df, books).toPandas().sort_values("vec_id")
    codes = np.frombuffer(b"".join(enc["codes"]), np.uint8).reshape(40, 4)
    rec = pq_decode_codes(codes, books)
    assert np.allclose(rec, X.astype(np.float64), atol=1e-6)


def test_more_subspaces_reduce_error(vectors_df, vectors_pdf):
    """Finer quantization (more subspaces) must not increase MSE
    (iterative-improvement monotonicity analog)."""
    mse = [
        reconstruction_mse(vectors_pdf, train_pq(vectors_df, m=m, seed=7))
        for m in (2, 8, 32)
    ]
    assert mse[1] <= mse[0] * 1.05
    assert mse[2] <= mse[1] * 1.05


def test_adc_rerank_recall(spark, vectors_df, vectors_pdf):
    """Two-phase ADC + exact rerank: recall@10 >= 0.9 vs brute force, and
    every returned score is the exact cosine (rerank guarantees)."""
    books = train_pq(vectors_df, m=8, seed=7)
    enc = pq_encode(vectors_df, books)
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(8, dtype=np.int64),
        "qvec": vectors_pdf["embedding"].iloc[:8].tolist(),
    }))
    approx = pq_adc_topk(enc, queries, books, k=10, rerank_k=60).toPandas()
    exact = brute_force_topk(vectors_df, queries, k=10,
                             qvec_col="qvec").toPandas()
    recalls = []
    for qid in range(8):
        a = set(approx[approx["qid"] == qid]["vec_id"])
        e = set(exact[exact["qid"] == qid]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    # reranked scores are exact cosines: match brute-force scores for
    # overlapping ids
    m = approx.merge(exact, on=["qid", "vec_id"], suffixes=("_a", "_e"))
    assert np.allclose(m["score_a"], m["score_e"], atol=1e-9)


def test_codebook_serialize_roundtrip(spark, vectors_df, tmp_path):
    """Versioned codebook write/load (ProductQuantization.write:550-589 /
    load:639-683 analog): bit-exact round-trip, magic/version checks, and
    a search from RELOADED codebooks equals the in-memory one."""
    from jvector_spark.operators.pq import (
        PQ_FORMAT_VERSION, load_codebooks, save_codebooks)

    books = train_pq(vectors_df, m=8, seed=7)
    path = str(tmp_path / "books.bin")
    save_codebooks(path, books)
    reloaded = load_codebooks(path)
    assert np.array_equal(books, reloaded)

    # refuse alien/newer files
    with open(str(tmp_path / "junk.bin"), "wb") as f:
        f.write(b"\x00" * 40)
    with pytest.raises(ValueError):
        load_codebooks(str(tmp_path / "junk.bin"))
    import struct as _s
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    raw[4:8] = _s.pack("<I", PQ_FORMAT_VERSION + 1)
    newer = str(tmp_path / "newer.bin")
    with open(newer, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(ValueError):
        load_codebooks(newer)

    # end-to-end: encode+search from the reopened codebooks
    queries = vectors_df.limit(3).select(
        F_col("vec_id").alias("qid"), F_col("embedding").alias("qvec"))
    a = pq_adc_topk(pq_encode(vectors_df, books), queries, books,
                    k=5, rerank_k=40).toPandas().sort_values(["qid", "rank"])
    b = pq_adc_topk(pq_encode(vectors_df, reloaded), queries, reloaded,
                    k=5, rerank_k=40).toPandas().sort_values(["qid", "rank"])
    assert a[["qid", "rank", "vec_id"]].values.tolist() == \
        b[["qid", "rank", "vec_id"]].values.tolist()


def test_ivf_probe_recall(spark, vectors_df, vectors_pdf):
    """IVF with nprobe < n_clusters: bounded scan fraction, recall@10 >= 0.8
    on clustered data (the beam-width/recall trade the reference tests
    statistically, Test2DThreshold-style)."""
    from jvector_spark.operators.ann import (
        brute_force_topk, ivf_topk, train_centroids)

    queries = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(8, dtype=np.int64),
        "qvec": vectors_pdf["embedding"].iloc[100:108].tolist(),
    }))
    cents = train_centroids(vectors_df, n_clusters=8, seed=11)
    approx = ivf_topk(vectors_df, queries, cents, k=10, nprobe=3).toPandas()
    exact = brute_force_topk(vectors_df, queries, k=10).toPandas()
    recalls = []
    for qid in range(8):
        a = set(approx[approx["qid"] == qid]["vec_id"])
        e = set(exact[exact["qid"] == qid]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_partitioned_prunes_and_matches(spark, vectors_df, tmp_path_factory):
    """Cluster-partitioned IVF: PartitionFilters prune unprobed cluster
    directories (plan-asserted) and results equal the filter-join IVF on
    the same centroids; nprobe=all equals brute force exactly."""
    from jvector_spark.operators.ann import (
        brute_force_topk, ivf_topk, ivf_topk_partitioned, train_centroids,
        write_ivf_index)

    cents = train_centroids(vectors_df, n_clusters=8, seed=11)
    path = str(tmp_path_factory.mktemp("ivf_part"))
    write_ivf_index(vectors_df, path, cents)
    queries = vectors_df.limit(6).select(
        F_col("vec_id").alias("qid"), F_col("embedding").alias("qvec"))

    part = ivf_topk_partitioned(spark, path, queries, cents, k=10, nprobe=3)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    a = part.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    b = ivf_topk(vectors_df, queries, cents, k=10, nprobe=3).toPandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a[["qid", "vec_id"]].values.tolist() == \
        b[["qid", "vec_id"]].values.tolist()

    exact = ivf_topk_partitioned(spark, path, queries, cents, k=10,
                                 nprobe=8).toPandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    brute = brute_force_topk(vectors_df, queries, k=10).toPandas() \
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    assert exact[["qid", "vec_id"]].values.tolist() == \
        brute[["qid", "vec_id"]].values.tolist()


def test_pq_adc_topk_empty_queries(spark, vectors_df):
    """An empty query batch returns an empty, correctly-typed result
    (review finding: np.stack crashed on the driver)."""
    books = train_pq(vectors_df, m=8, seed=3)
    enc = pq_encode(vectors_df, books)
    empty_q = spark.createDataFrame([], "qid long, qvec array<float>")
    out = pq_adc_topk(enc, empty_q, books, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "qid", "rank", "vec_id", "score"]


def test_pq_adc_topk_rerank_from_vectors_source(spark, vectors_df):
    """vectors= fetches rerank rows from the original table instead of
    re-running the encode plan; results are identical."""
    books = train_pq(vectors_df, m=8, seed=3)
    enc = pq_encode(vectors_df, books)
    queries = vectors_df.limit(3).selectExpr(
        "vec_id as qid", "embedding as qvec")
    a = pq_adc_topk(enc, queries, books, k=5).toPandas()
    b = pq_adc_topk(enc, queries, books, k=5, vectors=vectors_df).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["qid", "rank"]).reset_index(drop=True),
        b.sort_values(["qid", "rank"]).reset_index(drop=True))

"""Binary Quantization tier (BinaryQuantization.java:88-110 /
BQVectors.java:117 analogs): Catalyst/numpy encode parity, Hamming
semantics, two-phase rerank exactness, and the entry-contract covering
budget at every fixture SF the driver touches."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jvector_spark.operators.bq import (
    bq_encode,
    bq_topk,
    encode_query_codes,
    hamming_expr,
)


@pytest.fixture(scope="module")
def vectors_pdf():
    rng = np.random.default_rng(17)
    X = rng.normal(size=(400, 48))
    return pd.DataFrame({
        "vec_id": np.arange(400, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })


@pytest.fixture(scope="module")
def vectors_df(spark, vectors_pdf):
    return spark.createDataFrame(vectors_pdf).repartition(4)


def test_encode_parity_spark_vs_numpy(spark, vectors_df, vectors_pdf):
    """The Catalyst HOF expression and the driver-side query encoder must
    pack bit-identically (same v>0 rule, same little-endian word layout
    as BinaryQuantization.encodeTo:97-110) — drift would corrupt every
    Hamming distance."""
    got = {r["vec_id"]: list(r["bq_code"])
           for r in bq_encode(vectors_df).select("vec_id", "bq_code").collect()}
    X = np.stack(vectors_pdf["embedding"].to_numpy()).astype(np.float64)
    want = encode_query_codes(X)
    assert all(got[i] == want[i] for i in range(len(want)))
    # 48 dims -> 1 word; high 16 bits must be zero (padding stays 0)
    assert all((np.uint64(got[i][0]) >> np.uint64(48)) == 0
               for i in range(len(want)))


def test_multiword_encode_and_hamming(spark):
    """Dims > 64 pack into MULTIPLE little-endian words (the fixture dims
    are single-word, so this is the only coverage of the word-boundary
    arithmetic): parity with the numpy encoder at d=100, and Hamming over
    the 2-word codes equals the bit-level truth."""
    rng = np.random.default_rng(23)
    X = rng.normal(size=(60, 100))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i].astype(np.float32)])
         for i in range(60)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["bq_code"])
           for r in bq_encode(df).collect()}
    want = encode_query_codes(X.astype(np.float32).astype(np.float64))
    assert all(len(got[i]) == 2 for i in range(60))
    assert all(got[i] == want[i] for i in range(60))
    enc = bq_encode(df)
    ref = got[0]
    h = {r["vec_id"]: r["h"] for r in enc.select(
        "vec_id",
        hamming_expr(F.col("bq_code"),
                     F.array(*[F.lit(int(w)) for w in ref])).alias("h")
    ).collect()}
    bits = X.astype(np.float32) > 0
    for i in range(60):
        assert h[i] == int((bits[i] ^ bits[0]).sum()), i


def test_hamming_expr_matches_numpy_popcount(spark, vectors_df, vectors_pdf):
    enc = bq_encode(vectors_df)
    a = enc.where(F.col("vec_id") == 0).select(
        F.col("bq_code").alias("ca")).first()["ca"]
    got = (enc.select("vec_id",
                      hamming_expr(F.col("bq_code"),
                                   F.array(*[F.lit(int(w)) for w in a])
                                   ).alias("h"))
           .toPandas().sort_values("vec_id"))
    X = np.stack(vectors_pdf["embedding"].to_numpy()).astype(np.float64)
    bits = X > 0
    want = (bits ^ bits[0]).sum(axis=1)
    assert np.array_equal(got["h"].to_numpy(), want)


def test_two_phase_exact_rank_parity(spark, vectors_df, vectors_pdf):
    """With a covering survivor budget, bq_topk is rank-identical to
    brute-force cosine (the rerankK >= topK contract,
    GraphSearcher.search:209) — same (score desc, id asc) tie-break and
    round-6 scores as the SQL oracle."""
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(4, 48))
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in Q[i]]) for i in range(4)],
        "qid long, qvec array<float>")
    n = len(vectors_pdf)
    res = bq_topk(bq_encode(vectors_df), qdf, k=10,
                  rerank_k=max(256, -(-n * 11 // 20))).toPandas()
    X = np.stack(vectors_pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = vectors_pdf["vec_id"].to_numpy()
    for qi in range(4):
        qn = Q[qi] / np.linalg.norm(Q[qi])
        scores = np.round(Xn @ qn, 6)
        truth = ids[np.lexsort((ids, -scores))[:10]].tolist()
        got = res[res.qid == qi].sort_values("rank")["vec_id"].tolist()
        assert got == truth, f"q{qi}: {got} != {truth}"


def test_phase1_scan_prunes_to_codes(spark, vectors_df, tmp_path_factory):
    """The 64x-narrower-scan claim, plan-asserted: with codes PERSISTED
    next to the floats, bq_topk's phase-1 scan must read ONLY
    (vec_id, bq_code) — the float embedding column appears in the rerank
    scan, never the Hamming scan."""
    path = str(tmp_path_factory.mktemp("bqidx")) + "/codes.parquet"
    bq_encode(vectors_df).write.parquet(path)
    enc = spark.read.parquet(path)
    rng = np.random.default_rng(2)
    q = rng.normal(size=48)
    qdf = spark.createDataFrame([(0, [float(x) for x in q])],
                                "qid long, qvec array<float>")
    plan = bq_topk(enc, qdf, k=5, rerank_k=50)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    scans = [s for s in plan.split("Scan parquet")[1:]]
    read_schemas = []
    for s in scans:
        seg = s.split("ReadSchema:")[1].split("\n")[0] if "ReadSchema:" in s \
            else ""
        read_schemas.append(seg)
    # at least one scan reads codes without the embedding (phase 1) and
    # one reads the embedding (rerank fetch)
    assert any("bq_code" in r and "embedding" not in r
               for r in read_schemas), read_schemas
    assert any("embedding" in r for r in read_schemas), read_schemas


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_entry_budget_covers_fixture(sf):
    """The entry contract's bq survivor budget (max(256, ceil(0.55n)))
    must cover the exact top-10 for the driver's query set (vec_id < 5)
    at every fixture SF — the pytest guarantee behind extending the
    brute-force oracle to the bq tier. Pure numpy twin of the scan
    (Hamming order with id-asc tie-break, identical to bq_topk's)."""
    path = f"/root/testdata/{sf}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture {sf} absent")
    import pyarrow.parquet as pq

    t = pq.read_table(path).to_pandas()
    V = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    V, ids = V[order], ids[order]
    n, d = V.shape
    budget = max(256, -(-n * 11 // 20))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    bits = V > 0
    for qpos in range(5):
        ham = (bits ^ bits[qpos]).sum(axis=1)
        hrank = np.lexsort((ids, ham))  # approx desc == hamming asc
        truth = set(ids[np.lexsort((ids, -np.round(Vn @ Vn[qpos], 6)))[:10]])
        survivors = set(ids[hrank[:budget]])
        assert truth <= survivors, (
            f"{sf} q{qpos}: covering budget {budget} missed "
            f"{truth - survivors}")

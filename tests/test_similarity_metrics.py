"""The reference's three VectorSimilarityFunctions
(vector/VectorSimilarityFunction.java:34-69) on the exact search
surface: euclidean 1/(1+L2²), dot_product (1+dp)/2, cosine (raw — a
strictly monotone, rank-identical variant of the reference's (1+cos)/2,
see ann.SIMILARITY_METRICS)."""

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.ann import (
    SIMILARITY_METRICS,
    brute_force_threshold,
    brute_force_topk,
    exact_rerank,
    similarity_expr,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(21)
    # deliberately NOT unit-normalized: dot_product, cosine, and
    # euclidean must disagree on ranking for the tests to mean anything
    X = (rng.normal(size=(300, 16)) * rng.uniform(0.2, 3.0, (300, 1)))
    Q = rng.normal(size=(5, 16))
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(300, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X],
    })).repartition(4)
    qdf = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(5, dtype=np.int64),
        "qvec": [r.astype(np.float32) for r in Q],
    }))
    return df, qdf, X.astype(np.float32).astype(np.float64), \
        Q.astype(np.float32).astype(np.float64)


def _numpy_scores(metric, Q, X):
    """Twin of ann._score_expr: cosine carries the round-6 oracle
    contract; euclidean/dot_product stay full double (rounding would
    collapse 1/(1+L2²) neighbors into id-ordered ties at realistic
    norms)."""
    if metric == "cosine":
        qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return np.round(qn @ xn.T, 6)
    if metric == "euclidean":
        d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        return 1.0 / (1.0 + d2)
    if metric == "dot_product":
        return (1.0 + Q @ X.T) / 2.0
    raise AssertionError(metric)


@pytest.mark.parametrize("metric", SIMILARITY_METRICS)
def test_brute_force_matches_numpy_oracle(data, metric):
    df, qdf, X, Q = data
    res = brute_force_topk(df, qdf, k=7, metric=metric).toPandas()
    sims = _numpy_scores(metric, Q, X)
    for q in range(5):
        order = np.lexsort((np.arange(len(X)), -sims[q]))[:7]
        got = res[res.qid == q].sort_values("rank")
        assert (got["vec_id"].to_numpy() == order).all(), metric
        assert got["score"].to_numpy() == pytest.approx(sims[q][order]), metric


def test_metrics_rank_differently_on_unnormalized_data(data):
    """Sanity: on non-unit vectors the three metrics pick different
    winners somewhere, i.e. the parameter is not cosmetic."""
    df, qdf, X, Q = data
    tops = {}
    for m in SIMILARITY_METRICS:
        r = brute_force_topk(df, qdf, k=3, metric=m).toPandas()
        tops[m] = tuple(r.sort_values(["qid", "rank"])["vec_id"])
    assert len(set(tops.values())) == 3, tops


def test_euclidean_not_rounded_to_id_order(spark):
    """Large-norm regression for the precision contract: at norms ~100,
    1/(1+L2²) scores differ below 1e-6 — a round-6 score would tie them
    and return id-ascending instead of true-nearest."""
    rng = np.random.default_rng(4)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    # distances ~140 from the query, DECREASING with id by 0.01 per step:
    # scores 1/(1+d²) ≈ 5.1e-5 with adjacent differences ~7e-12 — far
    # below a round-6 quantum, which would tie ALL of them and return
    # id-ASCENDING order; the true nearest order is id-descending. The
    # 0.01 step also dominates float32 coordinate noise (~0.045 in d²
    # vs 2.8 per step).
    X = np.stack([base * (140.0 - 0.01 * i) for i in range(50)])
    q = np.zeros(16, dtype=np.float32)
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X],
    }))
    qdf = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "qvec": [q]}))
    res = brute_force_topk(df, qdf, k=5, metric="euclidean").toPandas()
    got = res.sort_values("rank")["vec_id"].tolist()
    assert got == [49, 48, 47, 46, 45], got
    s = res.sort_values("rank")["score"].to_numpy()
    assert (np.diff(s) < 0).all(), s


def test_threshold_composes_with_metric(data):
    df, qdf, X, Q = data
    sims = _numpy_scores("euclidean", Q, X)
    floor = float(np.quantile(sims, 0.999))
    res = brute_force_threshold(df, qdf, threshold=floor, k=50,
                                metric="euclidean").toPandas()
    want = int((sims >= floor).sum())
    assert len(res) == want
    assert (res["score"] >= floor).all()


def test_exact_rerank_metric(data, spark):
    """exact_rerank under euclidean = brute force euclidean when the
    candidate set covers the corpus."""
    from pyspark.sql import functions as F
    df, qdf, X, Q = data
    cands = df.crossJoin(qdf.select("qid")).select(
        "qid", "vec_id", "embedding")
    got = exact_rerank(cands, qdf, k=5, metric="euclidean").toPandas()
    want = brute_force_topk(df, qdf, k=5, metric="euclidean").toPandas()
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    want = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert (got["vec_id"] == want["vec_id"]).all()
    assert got["score"].to_numpy() == pytest.approx(want["score"].to_numpy())


def test_unknown_metric_rejected():
    import pyspark.sql.functions as F
    with pytest.raises(ValueError, match="unknown metric"):
        similarity_expr("manhattan", F.col("a"), F.col("b"))

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
    if metric == "cosine":
        qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return qn @ xn.T
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
    sims = np.round(_numpy_scores(metric, Q, X), 6)
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


def test_threshold_composes_with_metric(data):
    df, qdf, X, Q = data
    sims = np.round(_numpy_scores("euclidean", Q, X), 6)
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

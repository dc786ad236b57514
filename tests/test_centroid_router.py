"""L1 hierarchy-descent routing (CentroidRouter): at real scale the
centroid set is itself a full scan (10^11 vectors / 2*10^5 per cell ~
5*10^5 centroids), so probe selection routes through a small Vamana graph
built over the centroids — the reference's upper-layer descent, with the
cluster cell as the routed unit."""

from __future__ import annotations

import numpy as np
import pytest

from jvector_spark.operators.graph import CentroidRouter, _normalize


@pytest.fixture(scope="module")
def big_centroids():
    rng = np.random.default_rng(13)
    # 20k centroids with structure (clustered centroids-of-centroids)
    meta = rng.normal(size=(64, 32)) * 3
    C = meta[rng.integers(0, 64, 20000)] + rng.normal(size=(20000, 32))
    return C


def test_route_recall_and_eval_cut(big_centroids):
    """Beam routing must find >=0.9 of the true top-nprobe cells while
    evaluating a small fraction of the centroid set — the whole point of
    the L1 layer."""
    router = CentroidRouter(big_centroids, R=8, n_seeds=512)
    Vc = _normalize(big_centroids)
    rng = np.random.default_rng(5)
    Q = _normalize(rng.normal(size=(30, 32)))
    hits = total_evals = 0
    nprobe = 8
    for q in Q:
        cells, evals = router.route(q, nprobe, ef=512)
        truth = np.argsort(-(Vc @ q), kind="stable")[:nprobe]
        hits += len(set(cells.tolist()) & set(truth.tolist()))
        total_evals += evals
    recall = hits / (nprobe * len(Q))
    frac = total_evals / (len(Q) * len(big_centroids))
    assert recall >= 0.95, recall
    assert frac <= 0.15, frac


def test_route_exact_at_covering_ef(big_centroids):
    """ef >= n_centroids degenerates to exact routing: the routed cells
    equal the brute top-nprobe (order included, id-asc ties)."""
    C = big_centroids[:500]
    router = CentroidRouter(C, R=8)
    Vc = _normalize(C)
    rng = np.random.default_rng(9)
    q = _normalize(rng.normal(size=(1, 32)))[0]
    cells, _ = router.route(q, 5, ef=500)
    ids = np.arange(500)
    s = Vc @ q
    truth = ids[np.lexsort((ids, -s))][:5]
    assert cells.tolist() == truth.tolist()


def test_graph_topk_with_router_matches_brute_routing(spark, tmp_path_factory):
    """End-to-end: graph_topk(router=...) with covering route_ef and
    covering ef is rank-identical to the brute-routed path."""
    from jvector_spark.operators.ann import train_centroids
    from jvector_spark.operators.graph import build_graph_index, graph_topk

    rng = np.random.default_rng(3)
    X = rng.normal(size=(600, 24))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i].astype(np.float32)])
         for i in range(600)],
        "vec_id long, embedding array<float>")
    cents = train_centroids(df, n_clusters=6, seed=42)
    path = str(tmp_path_factory.mktemp("rgraph")) + "/g"
    build_graph_index(df, path, cents, R=8)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=24)]) for i in range(3)],
        "qid long, qvec array<float>")
    router = CentroidRouter(cents, R=4)
    got = (graph_topk(spark, path, qdf, cents, k=10, nprobe=3, ef=600,
                      router=router, route_ef=len(cents))
           .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    want = (graph_topk(spark, path, qdf, cents, k=10, nprobe=3, ef=600)
            .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["score"], want["score"], atol=0)

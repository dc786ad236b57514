"""In-cell multi-layer hierarchy (the reference's addHierarchy mode).

Mirrors the reference's hierarchical-graph coverage: HNSW level sampling
(GraphIndexBuilder.getRandomGraphLevel:568-581), sparse upper layers
(OnHeapGraphIndex.java:60-95), beam-1 descent + candidate carry-down
(GraphSearcher.internalSearch:250-269,
setEntryPointsFromPreviousLayer:310-317), and the multilayer-graph
round-trip tests of the reference suite. The sidecar follows the NVQ
codes discipline: derived, mutation_gen-stamped, refused when stale."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.ann import brute_force_topk, train_centroids
from jvector_spark.operators.graph import (
    _build_cluster_graph,
    _descend_layers,
    _node_levels,
    _normalize,
    build_graph_index,
    build_hierarchy,
    graph_topk,
    graph_topk_nvq,
    insert_into_graph,
    quantize_graph_vectors,
)

DIM = 16


def test_level_sampling_deterministic_and_geometric():
    """P(level >= l) = R^-l (the HNSW invariant getRandomGraphLevel
    encodes), deterministic in the id, capped at ~log_R n."""
    ids = np.arange(20000, dtype=np.int64)
    R = 8
    lev = _node_levels(ids, R, len(ids))
    lev2 = _node_levels(ids, R, len(ids))
    assert (lev == lev2).all()  # pure function of the id
    n1 = int((lev >= 1).sum())
    n2 = int((lev >= 2).sum())
    # binomial(20000, 1/8): mean 2500, sd ~47 — generous 6-sigma bands
    assert 2200 <= n1 <= 2800, n1
    assert 200 <= n2 <= 420, n2  # mean 312.5
    cap = int(np.ceil(np.log(20000) / np.log(8))) + 1
    assert lev.max() <= cap
    # ids are hashed, not used raw: a contiguous prefix must not get
    # systematically different levels than a shifted range
    lev_off = _node_levels(ids + 10_000_000, R, len(ids))
    assert abs(int((lev_off >= 1).sum()) - n1) < 600


@pytest.fixture(scope="module")
def emb(spark):
    # multi-modal unit vectors in FEW cells so cells are big enough to
    # sample upper layers (P(level>=1) = 1/R)
    rng = np.random.default_rng(99)
    centers = rng.normal(size=(12, DIM))
    n = 3000
    X = (centers[rng.integers(0, 12, n)]
         + 0.35 * rng.normal(size=(n, DIM)))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def hindex(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hidx"))
    cents = train_centroids(emb, n_clusters=2, seed=7)
    build_graph_index(emb, path, cents, R=8, alpha=1.2)
    lp = build_hierarchy(spark, path)
    return path, cents, lp


def test_sidecar_shape_and_entries(spark, hindex):
    import json
    import os

    path, cents, lp = hindex
    rows = spark.read.parquet(lp).toPandas()
    assert set(rows.columns) >= {"vec_id", "layer", "lnbrs", "cluster"}
    assert (rows["layer"] >= 1).all()
    # a node present at layer l is present at every layer below it
    for vid, grp in rows.groupby("vec_id"):
        ls = sorted(grp["layer"].tolist())
        assert ls == list(range(1, len(ls) + 1)), (vid, ls)
    with open(os.path.join(lp, "_LAYERS_META.json")) as f:
        lm = json.load(f)
    assert lm["mutation_gen"] == 0
    for c, (eid, top) in lm["entries"].items():
        sub = rows[rows["cluster"] == int(c)]
        assert top == int(sub["layer"].max())
        at_top = sorted(sub[sub["layer"] == top]["vec_id"].tolist())
        assert eid == at_top[0]  # highest layer, lowest id on ties


def test_hierarchy_rank_identical_under_covering(spark, emb, hindex):
    """Covering contract survives the hierarchy: with full nprobe and
    generous ef, hierarchical search == brute force, exactly (the same
    oracle-applicability argument as the stride-seed path)."""
    path, cents, lp = hindex
    queries = emb.where("vec_id < 6").selectExpr(
        "vec_id as qid", "embedding as qvec")
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    got = graph_topk(spark, path, queries, cents, k=10, nprobe=2,
                     ef=4096, layers=lp).toPandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["qid", "rank"]).reset_index(drop=True),
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        check_dtype=False)


def test_descent_replaces_stride_seeds():
    """On a multi-modal cell, hierarchical descent must recover the
    recall that medoid-only entry loses (the navigability problem the
    upper layers exist to solve) at FEWER evaluations than the 64-seed
    stride sample it replaces."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(24, DIM))
    n = 3000
    V = _normalize(centers[rng.integers(0, 24, n)]
                   + 0.4 * rng.normal(size=(n, DIM)))
    ids = np.arange(n, dtype=np.int64)
    adj, medoid = _build_cluster_graph(V, R=8, alpha=1.2)
    nbrs = [np.asarray(a, dtype=np.int64) for a in adj]
    levels = _node_levels(ids, 8, n)
    amap: dict[int, dict[int, np.ndarray]] = {}
    for lvl in range(1, int(levels.max()) + 1):
        sub = np.flatnonzero(levels >= lvl)
        if len(sub) < 2:
            ladj = [[]] * len(sub)
        else:
            ladj, _ = _build_cluster_graph(V[sub], R=8, alpha=1.2)
        amap[lvl] = {int(sub[j]): sub[np.asarray(a, dtype=np.int64)]
                     for j, a in enumerate(ladj)}
    top = int(levels.max())
    entry = int(np.flatnonzero(levels == top)[0])

    from jvector_spark.operators.graph import beam_search_cluster

    def run(mode):
        hits = evals = 0
        rq = np.random.default_rng(5)
        for t in range(20):
            q = _normalize(centers[t % 24][None]
                           + 0.4 * rq.normal(size=(1, DIM)))[0]
            if mode == "hier":
                sp, d_ev = _descend_layers(amap, entry, top,
                                           lambda p: V[p] @ q)
            elif mode == "stride":
                sp, d_ev = np.arange(0, n, n // 64, dtype=np.int64)[:64], 0
            else:
                sp, d_ev = None, 0
            found, ne = beam_search_cluster(
                ids, V, nbrs, medoid, q, ef=32, seed_pos=sp)
            truth = set(np.argsort(-(V @ q))[:10].tolist())
            hits += len(truth & set(found[:32].tolist()))
            evals += ne + d_ev
        return hits / 200, evals

    rec_m, ev_m = run("medoid")
    rec_s, ev_s = run("stride")
    rec_h, ev_h = run("hier")
    assert rec_h >= rec_m + 0.2, (rec_m, rec_h)  # solves the routing gap
    assert rec_h >= 0.8, rec_h
    assert rec_h >= rec_s - 0.05, (rec_s, rec_h)  # matches stride seeds
    assert ev_h < ev_s, (ev_h, ev_s)  # at lower evaluation cost
    rec_h2, ev_h2 = run("hier")
    assert (rec_h2, ev_h2) == (rec_h, ev_h)  # deterministic


def test_nvq_tier_descends_through_codes(spark, emb, hindex):
    """graph_topk_nvq accepts the same sidecar; the descent scores
    through the quantized scorer and the exact rerank keeps the covering
    rank-identity."""
    path, cents, lp = hindex
    quantize_graph_vectors(spark, path)
    queries = emb.where("vec_id < 4").selectExpr(
        "vec_id as qid", "embedding as qvec")
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    got = graph_topk_nvq(spark, path, queries, cents, emb, k=10,
                         nprobe=2, ef=4096, layers=lp).toPandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["qid", "rank"]).reset_index(drop=True),
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        check_dtype=False)


def test_stale_sidecar_refused(spark, emb, tmp_path):
    """A mutation bumps mutation_gen; searching with yesterday's layers
    must fail loudly (same contract as the NVQ codes sidecar — a silent
    stale descent would seed from purged nodes or miss inserts)."""
    path = str(tmp_path / "g")
    cents = train_centroids(emb, n_clusters=2, seed=7)
    build_graph_index(emb.where("vec_id < 400"), path, cents, R=8,
                      alpha=1.2)
    lp = build_hierarchy(spark, path)
    insert_into_graph(
        spark, path,
        emb.where("vec_id >= 400 and vec_id < 410"), cents)
    queries = emb.where("vec_id < 2").selectExpr(
        "vec_id as qid", "embedding as qvec")
    with pytest.raises(ValueError, match="generation"):
        graph_topk(spark, path, queries, cents, k=5, nprobe=2,
                   ef=64, layers=lp).collect()
    # rebuilt sidecar serves again, and sees the inserted rows
    lp2 = build_hierarchy(spark, path)
    got = graph_topk(spark, path, queries, cents, k=5, nprobe=2,
                     ef=4096, layers=lp2).toPandas()
    assert len(got) == 10


def test_tiny_cells_fall_back_to_stride(spark, tmp_path):
    """Cells too small to sample any upper-layer node (or an empty
    sidecar altogether) keep the stride-seed path — layers= must not
    change results or error."""
    rng = np.random.default_rng(3)
    X = _normalize(rng.normal(size=(12, DIM))).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(12, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    spark_df = spark.createDataFrame(pdf)  # noqa: F841
    emb = spark.createDataFrame(pdf)
    path = str(tmp_path / "tiny")
    cents = train_centroids(emb, n_clusters=2, seed=1)
    build_graph_index(emb, path, cents, R=4, alpha=1.2)
    lp = build_hierarchy(spark, path)
    queries = emb.selectExpr("vec_id as qid", "embedding as qvec")
    exact = brute_force_topk(emb, queries, k=3).toPandas()
    got = graph_topk(spark, path, queries, cents, k=3, nprobe=2,
                     ef=64, layers=lp).toPandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["qid", "rank"]).reset_index(drop=True),
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        check_dtype=False)

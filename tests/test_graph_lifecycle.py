"""Graph-tier mutation lifecycle: incremental insert, 2-phase delete with
FreshDiskANN edge repair, and the rebuild-on-dirty merge policy.

Mirrors the reference's mutation tests (GraphIndexBuilder.addGraphNode:
594-665, removeDeletedNodes:695-805 — FreshDiskANN §4.2 — and
buildAndMergeNewNodes:992-1029; TestDeletions / randomized mutate-then-
search assertions): after every mutation, a covering-ef search must stay
RANK-IDENTICAL to brute force over the mutated membership, and structural
invariants (degree caps, connectivity from the medoid, tombstone-dir
hygiene) must hold."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.ann import brute_force_topk, train_centroids
from jvector_spark.operators.graph import (
    GRAPH_TOMBSTONES,
    build_graph_index,
    graph_topk,
    insert_into_graph,
    load_graph_meta,
    load_graph_tombstones,
    mark_deleted_graph,
    optimize_graph,
    purge_deleted_graph,
)

N, DIM, NC = 420, 16, 5


def _mk_emb(spark, n=N, seed=77):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(NC, DIM))
    X = centers[rng.integers(0, NC, n)] + 0.3 * rng.normal(size=(n, DIM))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def emb(spark):
    return _mk_emb(spark)


@pytest.fixture()
def mutable_index(spark, emb, tmp_path):
    """Graph built over the BASE subset (vec_id % 5 != 2); the %5==2 rows
    are the insert batch."""
    path = str(tmp_path / "gidx")
    cents = train_centroids(emb, n_clusters=NC, seed=42)
    base = emb.where("vec_id % 5 != 2")
    meta = build_graph_index(base, path, cents, R=8, alpha=1.2)
    return path, cents, meta


def _assert_rank_identical(spark, emb_live, path, cents, qids=8):
    queries = emb_live.where(f"vec_id < {qids}").selectExpr(
        "vec_id as qid", "embedding as qvec")
    exact = brute_force_topk(emb_live, queries, k=10).toPandas()
    got = graph_topk(spark, path, queries, cents, k=10,
                     nprobe=NC, ef=256).toPandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["qid", "rank"]).reset_index(drop=True),
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        check_dtype=False)


def _structural_invariants(spark, path, meta):
    pdf = spark.read.parquet(path).toPandas()
    R = meta["R"]
    by_cluster = dict(tuple(pdf.groupby("cluster")))
    for cluster, g in by_cluster.items():
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy(np.int64)
        idset = set(ids.tolist())
        pos = {int(v): i for i, v in enumerate(ids)}
        adj = [[pos[int(x)] for x in row] for row in g["neighbors"]]
        for i, (vid, row) in enumerate(zip(ids, g["neighbors"])):
            nbrs = [int(x) for x in row]
            assert vid not in nbrs, "self loop"
            assert len(set(nbrs)) == len(nbrs), "duplicate edge"
            assert set(nbrs) <= idset, "edge to purged/foreign node"
            # cap + a handful of connectivity bridges
            assert len(nbrs) <= 2 * R + 4
        # connectivity from the recorded medoid
        med = meta["medoids"][int(cluster)]
        reached = {pos[med]}
        stack = [pos[med]]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in reached:
                    reached.add(w)
                    stack.append(w)
        assert len(reached) == len(ids), f"cluster {cluster} fragmented"
    return pdf


def test_insert_rejects_duplicate_ids(spark, emb, mutable_index):
    """addGraphNode takes FRESH ordinals (GraphIndexBuilder.java:594-600):
    re-inserting an existing id (or a batch with internal duplicates)
    must raise, not silently produce two rows whose edges collide in the
    cell's id->position remap."""
    import pyspark.sql.functions as F

    path, cents, _ = mutable_index
    existing = emb.where("vec_id % 5 != 2").limit(1)
    with pytest.raises(ValueError, match="already exist"):
        insert_into_graph(spark, path, existing, cents)
    fresh = emb.where("vec_id % 5 = 2").limit(1)
    with pytest.raises(ValueError, match="duplicate ids within"):
        insert_into_graph(spark, path, fresh.unionAll(fresh), cents)
    # index untouched by the rejected inserts
    pdf = spark.read.parquet(path).select("vec_id").toPandas()
    assert pdf["vec_id"].is_unique
    assert len(pdf) == emb.where("vec_id % 5 != 2").count()


def test_insert_then_search_exact(spark, emb, mutable_index):
    path, cents, _ = mutable_index
    batch = emb.where("vec_id % 5 = 2")
    meta = insert_into_graph(spark, path, batch, cents)
    pdf = _structural_invariants(spark, path, meta)
    assert len(pdf) == N  # all rows present exactly once post-insert
    assert pdf["vec_id"].is_unique
    # inserted counts recorded for the optimize policy
    assert sum(meta["inserted"].values()) == batch.count()
    _assert_rank_identical(spark, emb, path, cents)


def test_mark_delete_masks_without_rewrite(spark, emb, mutable_index):
    path, cents, _ = mutable_index
    base = emb.where("vec_id % 5 != 2")
    doomed = base.where("vec_id % 7 = 3").select("vec_id")
    n_files_before = sum(len(fs) for _, _, fs in os.walk(path))
    mark_deleted_graph(spark, path, doomed)
    live = base.where("vec_id % 7 != 3")
    _assert_rank_identical(spark, live, path, cents)
    # mark phase touches only the tombstone dir — no graph file rewrites
    n_graph_files = sum(
        len(fs) for d, _, fs in os.walk(path) if GRAPH_TOMBSTONES not in d)
    assert n_graph_files == n_files_before
    # deleted ids never surface even as their own nearest neighbor
    q3 = base.where("vec_id = 3").selectExpr("vec_id as qid",
                                             "embedding as qvec")
    got = graph_topk(spark, path, q3, cents, k=10, nprobe=NC,
                     ef=256).toPandas()
    assert 3 not in set(got["vec_id"])


def test_purge_repairs_and_stays_exact(spark, emb, mutable_index):
    path, cents, _ = mutable_index
    base = emb.where("vec_id % 5 != 2")
    mark_deleted_graph(
        spark, path, [int(r[0]) for r in
                      base.where("vec_id % 7 = 3").select("vec_id").collect()])
    meta = purge_deleted_graph(spark, path)
    pdf = _structural_invariants(spark, path, meta)
    live = base.where("vec_id % 7 != 3")
    assert len(pdf) == live.count()  # rows physically gone
    assert not set(pdf["vec_id"]) & {
        int(r[0]) for r in base.where("vec_id % 7 = 3")
        .select("vec_id").collect()}
    # tombstone shards cleared; idempotent re-purge is a no-op
    assert load_graph_tombstones(spark, path, "vec_id") is None
    purge_deleted_graph(spark, path)
    _assert_rank_identical(spark, live, path, cents)


def test_delete_medoid_reseats_entry(spark, emb, mutable_index):
    path, cents, meta0 = mutable_index
    victim_cluster, victim = next(iter(meta0["medoids"].items()))
    mark_deleted_graph(spark, path, [victim])
    meta = purge_deleted_graph(spark, path)
    assert meta["medoids"][victim_cluster] != victim
    _structural_invariants(spark, path, meta)
    live = emb.where(f"vec_id % 5 != 2 and vec_id != {victim}")
    _assert_rank_identical(spark, live, path, cents)


def test_fully_deleted_cluster_partition_drops(spark, emb, mutable_index):
    path, cents, meta0 = mutable_index
    # doom an entire cluster's membership
    victim_cluster = min(meta0["medoids"])
    pdf = spark.read.parquet(path).toPandas()
    doomed = pdf[pdf["cluster"] == victim_cluster]["vec_id"].tolist()
    assert doomed
    mark_deleted_graph(spark, path, doomed)
    meta = purge_deleted_graph(spark, path)
    assert victim_cluster not in meta["medoids"]
    assert not os.path.isdir(os.path.join(path,
                                          f"cluster={victim_cluster}"))
    live = emb.where("vec_id % 5 != 2").where(
        ~emb.vec_id.isin([int(x) for x in doomed]))
    _assert_rank_identical(spark, live, path, cents)


def test_optimize_rebuilds_dirty_cells(spark, emb, mutable_index):
    path, cents, _ = mutable_index
    batch = emb.where("vec_id % 5 = 2")
    insert_into_graph(spark, path, batch, cents)
    meta = optimize_graph(spark, path, max_dirty=0.05)  # force rebuild
    assert meta["inserted"] == {}  # dirty counters consumed
    pdf = _structural_invariants(spark, path, meta)
    assert len(pdf) == N
    _assert_rank_identical(spark, emb, path, cents)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_driver_lifecycle_covering(spark, sf_dir):
    """The graph_lifecycle driver query's covering contract on the REAL
    fixtures: both phases must be rank-identical to brute-force cosine
    over the live membership (vec_id % 7 != 3) — the guarantee that makes
    the brute-force SQL oracle applicable."""
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("fixture missing")
    import __spark_entry__ as e

    got = e.q_graph_lifecycle(spark, sf_dir).toPandas()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    live = emb.where("vec_id % 7 != 3")
    queries = emb.where("vec_id < 5").selectExpr("vec_id as qid",
                                                 "embedding as qvec")
    exact = brute_force_topk(live, queries, k=10).toPandas()
    for phase in ("masked", "purged"):
        g = (got[got["phase"] == phase]
             .drop(columns="phase")
             .sort_values(["qid", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            g, exact.sort_values(["qid", "rank"]).reset_index(drop=True),
            check_dtype=False)


def test_insert_into_empty_cluster_seeds_medoid(spark, tmp_path):
    """A cluster receiving its FIRST members must gain a medoid and be
    searchable — the empty-cell edge Lloyd leaves behind."""
    rng = np.random.default_rng(3)
    X = _mk = (rng.normal(size=(60, DIM)))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    emb = spark.createDataFrame(pdf)
    # centroid 1 is far from every vector -> empty cell at build
    cents = np.stack([np.zeros(DIM), np.full(DIM, 100.0)])
    cents[0, 0] = 1.0
    path = str(tmp_path / "g2")
    build_graph_index(emb.where("vec_id >= 10"), path, cents, R=4)
    far = pd.DataFrame({
        "vec_id": np.arange(10, dtype=np.int64),
        "embedding": [(np.full(DIM, 100.0)
                       + rng.normal(size=DIM)).astype(np.float32)
                      .tolist() for _ in range(10)]})
    meta = insert_into_graph(spark, path, spark.createDataFrame(far), cents)
    assert 1 in meta["medoids"]
    queries = spark.createDataFrame(far.iloc[:2]).selectExpr(
        "vec_id as qid", "embedding as qvec")
    got = graph_topk(spark, path, queries, cents, k=3, nprobe=2,
                     ef=64).toPandas()
    assert set(got[got["qid"] == 0]["vec_id"]) <= set(range(10))
    assert (got[got["rank"] == 0]["vec_id"].to_numpy()
            == got[got["rank"] == 0]["qid"].to_numpy()).all()

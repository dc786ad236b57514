"""Crash containment for the graph-tier mutation lifecycle.

The reference's mutation path assumes a single durable process;
re-expressed over a partitioned parquet layout, every mutation is a
multi-step swap (staging write -> per-cluster dir swap -> meta save) and
each step boundary is a potential crash point. These tests pin the
containment contract:

- the mutation generation bumps durably BEFORE any membership change, so
  an NVQ codes sidecar can only ever be refused (loud), never silently
  joined against a newer graph (which would drop inserted nodes from the
  beam — the exact hole the staleness gate exists to close);
- searches tolerate meta that lags a crash (entry-point fallback to the
  on-disk is_medoid row), and the next purge re-syncs the meta itself;
- a failed swap rolls back BOTH replaced dirs and first-time cluster
  dirs, so a retry sees the pre-mutation index exactly;
- a hard crash mid-swap leaves only dot-prefixed aside dirs (invisible
  to partition discovery) that the next mutation's sweep restores or
  removes.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import jvector_spark.operators.graph as g
from jvector_spark.operators.ann import brute_force_topk, train_centroids

DIM = 16


def _mk(spark, tmp_path, n=150, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, DIM))
    X = centers[rng.integers(0, 3, n)] + 0.3 * rng.normal(size=(n, DIM))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    emb = spark.createDataFrame(pdf)
    cents = train_centroids(emb, n_clusters=3, seed=1)
    path = str(tmp_path / "gidx")
    base = emb.where("vec_id % 4 != 0")
    g.build_graph_index(base, path, cents, R=6, alpha=1.2)
    return emb, base, cents, path


def _crash_on_nth_meta_save(monkeypatch, n: int):
    calls = {"n": 0}
    orig = g._save_graph_meta

    def boom(path, meta):
        calls["n"] += 1
        if calls["n"] == n:
            raise RuntimeError("simulated crash before meta save")
        orig(path, meta)

    monkeypatch.setattr(g, "_save_graph_meta", boom)
    return calls


def _rank_identical(spark, live, path, cents, k=10):
    queries = live.where("vec_id < 6").selectExpr("vec_id as qid",
                                                  "embedding as qvec")
    exact = brute_force_topk(live, queries, k=k).toPandas()
    got = g.graph_topk(spark, path, queries, cents, k=k, nprobe=3,
                       ef=512).toPandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["qid", "rank"]).reset_index(drop=True),
        got.sort_values(["qid", "rank"]).reset_index(drop=True),
        check_dtype=False)


def test_insert_crash_after_rewrite_refuses_stale_sidecar(
        spark, tmp_path, monkeypatch):
    """Crash between the partition rewrite and the final (medoid) meta
    save: the generation was bumped BEFORE the rewrite, so the
    pre-insert NVQ sidecar must be refused — never silently joined, which
    would make the inserted vectors unreachable — while the float tier
    keeps serving the post-insert membership rank-identically."""
    emb, base, cents, path = _mk(spark, tmp_path)
    g.quantize_graph_vectors(spark, path)
    batch = emb.where("vec_id % 4 = 0")
    # save #1 = pre-rewrite gen bump, save #2 = post-rewrite medoid save
    _crash_on_nth_meta_save(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        g.insert_into_graph(spark, path, batch, cents)
    monkeypatch.undo()

    # the rewrite committed: all rows present exactly once
    pdf = spark.read.parquet(path).select("vec_id").toPandas()
    assert len(pdf) == emb.count() and pdf["vec_id"].is_unique
    # generation is AHEAD of the sidecar -> the quantized tier refuses
    with pytest.raises(ValueError, match="re-run quantize_graph_vectors"):
        g.graph_topk_nvq(spark, path, emb.limit(2).selectExpr(
            "vec_id as qid", "embedding as qvec"), cents, emb, k=5)
    # the float tier serves the full post-insert membership exactly
    _rank_identical(spark, emb, path, cents)
    # re-quantizing heals the quantized tier
    g.quantize_graph_vectors(spark, path)
    got = g.graph_topk_nvq(spark, path, emb.where("vec_id < 3").selectExpr(
        "vec_id as qid", "embedding as qvec"), cents, emb, k=5,
        nprobe=3, ef=512).toPandas()
    assert (got[got["rank"] == 0]["vec_id"].to_numpy()
            == got[got["rank"] == 0]["qid"].to_numpy()).all()


def test_insert_crash_leaves_fresh_cell_searchable(spark, tmp_path,
                                                   monkeypatch):
    """A cluster receiving its FIRST members in an insert whose final
    meta save crashed: meta has no medoid for the cell, but the on-disk
    is_medoid row exists — the in-task entry fallback must make the cell
    searchable rather than raising KeyError on every probe."""
    rng = np.random.default_rng(9)
    X = rng.normal(size=(40, DIM))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    emb = spark.createDataFrame(pdf)
    cents = np.stack([np.zeros(DIM), np.full(DIM, 100.0)])
    cents[0, 0] = 1.0
    path = str(tmp_path / "g2")
    g.build_graph_index(emb, path, cents, R=4)
    far = pd.DataFrame({
        "vec_id": np.arange(100, 110, dtype=np.int64),
        "embedding": [(np.full(DIM, 100.0)
                       + rng.normal(size=DIM)).astype(np.float32).tolist()
                      for _ in range(10)]})
    _crash_on_nth_meta_save(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        g.insert_into_graph(spark, path, spark.createDataFrame(far), cents)
    monkeypatch.undo()

    meta = g.load_graph_meta(path)
    assert 1 not in meta["medoids"]  # the lagging meta
    assert os.path.isdir(os.path.join(path, "cluster=1"))  # data landed
    queries = spark.createDataFrame(far.iloc[:2]).selectExpr(
        "vec_id as qid", "embedding as qvec")
    got = g.graph_topk(spark, path, queries, cents, k=3, nprobe=2,
                       ef=64).toPandas()
    assert (got[got["rank"] == 0]["vec_id"].to_numpy()
            == got[got["rank"] == 0]["qid"].to_numpy()).all()


def test_failed_swap_rolls_back_fresh_cluster_dir(spark, tmp_path,
                                                  monkeypatch):
    """shutil.move fails AFTER a first-time cluster dir was moved in:
    rollback must remove the fresh dir too (not only restore asides), so
    the retry passes the fresh-id probe and commits cleanly."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, DIM))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                        "embedding": [x.tolist() for x in X]})
    emb = spark.createDataFrame(pdf)
    # cents[0] far (empty at build), cents[1] near: the insert below
    # touches new cluster 0 FIRST, then fails on existing cluster 1
    cents = np.stack([np.full(DIM, 100.0), np.zeros(DIM)])
    cents[1, 0] = 1.0
    path = str(tmp_path / "g3")
    g.build_graph_index(emb, path, cents, R=4)
    before = spark.read.parquet(path).toPandas()
    batch = pd.DataFrame({
        "vec_id": np.arange(100, 106, dtype=np.int64),
        "embedding": [(np.full(DIM, 100.0)
                       + rng.normal(size=DIM)).astype(np.float32).tolist()
                      for _ in range(5)]
        + [(X[0] + 0.01).astype(np.float32).tolist()]})

    moves = {"n": 0}
    orig_move = shutil.move

    def failing_move(src, dst, *a, **kw):
        moves["n"] += 1
        if moves["n"] == 2:
            raise OSError("simulated move failure")
        return orig_move(src, dst, *a, **kw)

    monkeypatch.setattr(shutil, "move", failing_move)
    with pytest.raises(OSError, match="simulated move failure"):
        g.insert_into_graph(spark, path, spark.createDataFrame(batch),
                            cents)
    monkeypatch.undo()
    assert moves["n"] == 2  # the new cell moved in, then the swap died

    # fresh dir rolled back, existing partition restored byte-identical
    assert not os.path.isdir(os.path.join(path, "cluster=0"))
    after = spark.read.parquet(path).toPandas()
    pd.testing.assert_frame_equal(
        before.sort_values("vec_id").reset_index(drop=True),
        after.sort_values("vec_id").reset_index(drop=True))
    # no aside litter
    assert not [d for d in os.listdir(path) if d.startswith(".old-")]
    # the retry commits: fresh-id probe passes, both cells land
    meta = g.insert_into_graph(spark, path, spark.createDataFrame(batch),
                               cents)
    assert 0 in meta["medoids"]
    assert spark.read.parquet(path).count() == 46


def test_aside_dirs_invisible_and_swept(spark, tmp_path):
    """A hard crash mid-swap leaves `.old-<hex>-cluster=N` asides: they
    must be invisible to partition discovery (dot prefix), and the next
    mutation's sweep must restore the only-copy case and remove the
    superseded-copy case."""
    emb, base, cents, path = _mk(spark, tmp_path)
    n_base = base.count()
    live0 = os.path.join(path, "cluster=0")

    # superseded-copy case: aside alongside the live dir
    stale = os.path.join(path, ".old-deadbeef-cluster=0")
    shutil.copytree(live0, stale)
    assert spark.read.parquet(path).count() == n_base  # invisible
    pdf = spark.read.parquet(path).select("vec_id").toPandas()
    assert pdf["vec_id"].is_unique  # no double-counted rows

    # only-copy case: the live dir was renamed aside and the move-in died
    only = os.path.join(path, ".old-0badc0de-cluster=1")
    os.rename(os.path.join(path, "cluster=1"), only)
    assert spark.read.parquet(path).count() < n_base  # temporarily absent

    g._recover_asides(path)
    assert not os.path.isdir(stale)  # superseded copy removed
    assert not os.path.isdir(only)
    assert os.path.isdir(os.path.join(path, "cluster=1"))  # restored
    assert spark.read.parquet(path).count() == n_base
    # and the sweep runs from the public mutation path too
    shutil.copytree(live0, stale)
    g.mark_deleted_graph(spark, path, [int(base.first()["vec_id"])])
    g.purge_deleted_graph(spark, path)
    assert not os.path.isdir(stale)


def test_purge_crash_recovery_resyncs_medoid(spark, tmp_path, monkeypatch):
    """Purge crashes between its partition rewrite and its medoid save:
    the re-run purge (tombstones still present, ids already gone) must
    re-sync meta medoids from the on-disk is_medoid rows instead of
    clearing the marks around a permanently stale entry point."""
    emb, base, cents, path = _mk(spark, tmp_path)
    meta0 = g.load_graph_meta(path)
    victim_cluster, victim = next(iter(meta0["medoids"].items()))
    g.mark_deleted_graph(spark, path, [victim])
    # save #1 = pre-rewrite gen bump, save #2 = post-rewrite medoid save
    _crash_on_nth_meta_save(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        g.purge_deleted_graph(spark, path)
    monkeypatch.undo()

    # rewrite committed (victim gone), meta still names it as entry
    assert victim not in set(
        spark.read.parquet(path).select("vec_id").toPandas()["vec_id"])
    assert g.load_graph_meta(path)["medoids"][victim_cluster] == victim
    live = base.where(f"vec_id != {victim}")
    _rank_identical(spark, live, path, cents)  # fallback entry serves

    meta = g.purge_deleted_graph(spark, path)  # the recovery replay
    assert meta["medoids"][victim_cluster] != victim
    ondisk = {int(r["cluster"]): int(r["vec_id"]) for r in
              spark.read.parquet(path).where("is_medoid")
              .select("cluster", "vec_id").collect()}
    assert meta["medoids"] == ondisk
    assert g.load_graph_tombstones(spark, path, "vec_id") is None
    _rank_identical(spark, live, path, cents)

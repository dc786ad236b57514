"""Randomized mutation soak for the graph tier — the analog of the
reference's randomized mutate-then-search suites (TestDeletions /
TestConcurrentReadWriteDeletes: random interleavings of insert, delete,
and cleanup, each followed by exactness assertions against a model).

A seeded random walk drives insert_into_graph / mark_deleted_graph /
purge_deleted_graph / optimize_graph against a driver-side set model of
the live membership; after every step a covering-ef search must be
RANK-IDENTICAL to brute force over the model, and the structural
invariants (unique ids, edges into live members only, degree caps) must
hold. One seeded walk per run keeps this inside unit-test budget while
still exploring interleavings no hand-written scenario covers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import jvector_spark.operators.graph as g
from jvector_spark.operators.ann import brute_force_topk, train_centroids

DIM = 12
N_POOL = 260  # ids drawn from this universe, inserted in random slices
N_STEPS = 12


@pytest.mark.parametrize("seed", [101, 202])
def test_randomized_mutation_walk(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, DIM))
    X = centers[rng.integers(0, 3, N_POOL)] + 0.3 * rng.normal(
        size=(N_POOL, DIM))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)

    def df_of(ids):
        ids = sorted(int(i) for i in ids)
        return spark.createDataFrame(pd.DataFrame({
            "vec_id": np.asarray(ids, dtype=np.int64),
            "embedding": [X[i].tolist() for i in ids]}))

    # model state
    live: set[int] = set(range(80))
    never_inserted = list(range(80, N_POOL))
    marked: set[int] = set()

    emb_all = df_of(range(N_POOL))
    cents = train_centroids(emb_all, n_clusters=3, seed=7)
    path = str(tmp_path / "soak")
    g.build_graph_index(df_of(live), path, cents, R=6, alpha=1.2)

    def check():
        returnable = sorted(live - marked)
        corpus = df_of(returnable)
        queries = (corpus.orderBy("vec_id").limit(4)
                   .selectExpr("vec_id as qid", "embedding as qvec"))
        exact = brute_force_topk(corpus, queries, k=8).toPandas()
        got = g.graph_topk(spark, path, queries, cents, k=8, nprobe=3,
                           ef=N_POOL).toPandas()
        pd.testing.assert_frame_equal(
            exact.sort_values(["qid", "rank"]).reset_index(drop=True),
            got.sort_values(["qid", "rank"]).reset_index(drop=True),
            check_dtype=False)
        # structural: stored rows == live model; edges into live only
        pdf = spark.read.parquet(path).toPandas()
        assert sorted(pdf["vec_id"]) == sorted(live)
        idset = set(pdf["vec_id"].tolist())
        meta = g.load_graph_meta(path)
        for vid, row in zip(pdf["vec_id"], pdf["neighbors"]):
            nbrs = [int(x) for x in row]
            assert vid not in nbrs and len(set(nbrs)) == len(nbrs)
            assert set(nbrs) <= idset
            assert len(nbrs) <= 2 * meta["R"] + 4

    check()
    for step in range(N_STEPS):
        op = rng.choice(["insert", "mark", "purge", "optimize"])
        if op == "insert" and never_inserted:
            take = min(len(never_inserted),
                       int(rng.integers(1, 20)))
            batch = [never_inserted.pop() for _ in range(take)]
            g.insert_into_graph(spark, path, df_of(batch), cents)
            live.update(batch)
        elif op == "mark":
            pool = sorted(live - marked)
            if not pool:
                continue
            take = rng.choice(pool, size=min(len(pool) - 5,
                                             int(rng.integers(1, 12))),
                              replace=False) if len(pool) > 6 else []
            if not len(take):
                continue
            g.mark_deleted_graph(spark, path,
                                 [int(t) for t in take])
            marked.update(int(t) for t in take)
        elif op == "purge":
            g.purge_deleted_graph(spark, path)
            live -= marked
            marked.clear()
        else:
            g.optimize_graph(spark, path, max_dirty=0.2)
            live -= marked  # optimize purges pending marks first
            marked.clear()
        check()

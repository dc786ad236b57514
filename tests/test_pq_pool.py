"""PQ-code warm serving tier (quantize='pq') — the PQVectors serving
format plus the literal FusedADC/FusedADCPQDecoder analog.

Reference parity targets:
  * PQVectors.java:117 (codes-only residency),
    precomputedScoreFunctionFor:191-202 (per-query ADC lookup table)
  * graph/disk/feature/FusedADC.java:39-59 + FusedADCPQDecoder — the
    adjacency-fused code slabs scored via the SAME table, one contiguous
    gather per expansion
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def vectors_pdf():
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, 32)) * 3
    X = centers[rng.integers(0, 16, 600)] + rng.normal(size=(600, 32))
    return pd.DataFrame({
        "vec_id": np.arange(600, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })


def _write(pdf, tmp_path):
    p = str(tmp_path / "vecs.parquet")
    pdf.to_parquet(p, index=False)
    return p


def test_pq_pool_adc_scores_match_decoded_cosine(tmp_path, vectors_pdf):
    """The ADC table-gather score IS the cosine of the decoded vector:
    T[s, code_s] summed over subspaces = q . decode(codes), and the pool
    norms are the decoded norms (computed via the disjoint-subspace
    identity, never materializing the decoded matrix)."""
    from jvector_spark.operators.pq import pq_decode_codes
    from jvector_spark.serve import VectorPool

    pool = VectorPool(_write(vectors_pdf, tmp_path), quantize="pq")
    assert pool.mat is None  # codes-only residency
    dec = pq_decode_codes(pool._codes, pool._books)
    dec_norms = np.maximum(np.sqrt((dec * dec).sum(axis=1)), 1e-12)
    assert np.allclose(pool.norms, dec_norms, rtol=0, atol=1e-9)

    rng = np.random.default_rng(7)
    q = rng.normal(size=pool.dim)
    qn = float(np.linalg.norm(q))
    got = pool._score_positions(np.arange(pool.n), q, qn)
    want = (dec @ q) / (qn * dec_norms)
    assert np.allclose(got, want, rtol=0, atol=1e-9)


def test_pq_pool_recall_and_memory(tmp_path, vectors_pdf):
    """~4x+ smaller residency than the float64 pool (m bytes/vector +
    one codebook tensor vs 8 bytes/dim), recall@10 >= 0.8 against the
    exact pool, and the IVF tier composes (full probe == pool brute)."""
    from jvector_spark.serve import VectorPool

    p = _write(vectors_pdf, tmp_path)
    exact = VectorPool(p)
    pqp = VectorPool(p, quantize="pq")  # default m = dim/2
    X = np.stack(vectors_pdf["embedding"].head(8).to_numpy())
    a = exact.knn(X, k=10)
    b = pqp.knn(X, k=10)
    hits = 0
    for qid in range(8):
        hits += len(set(a[a["qid"] == qid]["vec_id"])
                    & set(b[b["qid"] == qid]["vec_id"]))
    assert hits / 80 >= 0.8, hits / 80
    # codes themselves are 16x smaller than the float matrix; the
    # codebook tensor is a constant that amortizes with pool size
    assert pqp._codes.nbytes * 10 < exact.mat.nbytes
    assert pqp._codes.nbytes + pqp._books.nbytes < exact.mat.nbytes
    # IVF tier composes: full-probe == pool's own brute ranking
    pq_ivf = VectorPool(p, quantize="pq", n_clusters=8)
    c = pq_ivf.knn(X, k=10, nprobe=8)
    pd.testing.assert_frame_equal(
        b.reset_index(drop=True), c.reset_index(drop=True))


def test_pq_pool_pq_m_override_and_validation(tmp_path, vectors_pdf):
    from jvector_spark.serve import VectorPool

    p = _write(vectors_pdf, tmp_path)
    pool = VectorPool(p, quantize="pq", pq_m=8)
    assert pool.pq_m == 8 and pool._codes.shape == (600, 8)
    with pytest.raises(ValueError, match="not divisible"):
        VectorPool(p, quantize="pq", pq_m=7)  # 32 % 7 != 0


def test_pq_pool_fused_graph_matches_gather(tmp_path_factory):
    """FusedADCPQDecoder shape: adjacency-fused PQ code slabs change
    NOTHING about results, order, or visited counts vs the gathered PQ
    graph path — only the memory layout the expansion reads — and the
    covering beam equals the pool's own brute ranking."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from jvector_spark.serve import VectorPool

    rng = np.random.RandomState(11)
    centers = rng.normal(size=(12, 16))
    n = 2400
    X = centers[rng.randint(0, 12, n)] + 0.3 * rng.normal(size=(n, 16))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("pqf")) + "/emb.parquet"
    pq_mod.write_table(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X)}), path)

    gpool = VectorPool(path, n_clusters=6, graph_R=8, quantize="pq")
    fpool = VectorPool(path, n_clusters=6, graph_R=8, quantize="pq",
                       graph_fused=True)
    q = X[rng.randint(0, n, 10)].astype(np.float64)

    gfast = gpool.knn(q, 10, nprobe=2, ef=48)
    ffast = fpool.knn(q, 10, nprobe=2, ef=48)
    assert ffast.equals(gfast)
    assert fpool.last_graph_evals == gpool.last_graph_evals
    # fused bulk-then-filter re-scores visited rows; gather never does
    assert fpool.last_graph_scored >= fpool.last_graph_evals
    assert gpool.last_graph_scored == gpool.last_graph_evals

    brute = gpool.knn(q, 10)
    gcov = gpool.knn(q, 10, ef=n)
    fcov = fpool.knn(q, 10, ef=n)
    assert gcov.equals(brute)
    assert fcov.equals(brute)

    # recall vs the EXACT float pool stays high through the quantized
    # beam (clustered data, half the bytes of NVQ at dim 16 -> m=8)
    exact = VectorPool(path).knn(q, 10)
    hits = sum(
        len(set(exact[exact["qid"] == i]["vec_id"])
            & set(ffast[ffast["qid"] == i]["vec_id"])) for i in range(10))
    assert hits / 100 >= 0.7, hits / 100


def test_pq_pool_hierarchy_composes(tmp_path_factory):
    """graph_hier descends through the pool's scoring kernel, so a PQ
    pool descends over ADC scores; covering beams stay rank-identical to
    the pool brute."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from jvector_spark.serve import VectorPool

    rng = np.random.RandomState(13)
    centers = rng.normal(size=(8, 16))
    n = 1600
    X = centers[rng.randint(0, 8, n)] + 0.3 * rng.normal(size=(n, 16))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("pqh")) + "/emb.parquet"
    pq_mod.write_table(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X)}), path)
    hpool = VectorPool(path, n_clusters=4, graph_R=8, quantize="pq",
                       graph_fused=True, graph_hier=True)
    brute = hpool.knn(X[:6].astype(np.float64), 10)
    cov = hpool.knn(X[:6].astype(np.float64), 10, ef=n)
    assert cov.equals(brute)


def test_fused_requires_compressed_codes(tmp_path_factory):
    """graph_fused refuses float pools; 'pq' satisfies the compressed
    requirement; unknown modes refuse."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from jvector_spark.serve import VectorPool

    rng = np.random.RandomState(5)
    X = rng.normal(size=(50, 8)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("gfp")) + "/emb.parquet"
    pq_mod.write_table(pa.table({
        "vec_id": np.arange(50, dtype=np.int64), "embedding": list(X)}),
        path)
    with pytest.raises(ValueError, match="graph_fused"):
        VectorPool(path, quantize="pq", graph_fused=True)  # no graph
    with pytest.raises(ValueError, match="unknown quantize"):
        VectorPool(path, quantize="int4")
    pool = VectorPool(path, quantize="pq", graph_R=4, graph_fused=True)
    assert pool._fused is not None


def test_quantized_pool_disk_rerank_exactness_and_recall(tmp_path_factory):
    """rerank_k: the reference's two-phase on-disk layout (compressed
    codes resident + full-precision InlineVectors on disk, approximate
    search then exactScoreFunction rerank). With covering candidates the
    result is EXACTLY the float pool's; at bounded budgets recall jumps
    far above codes-only scoring and returned scores are exact cosines."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from jvector_spark.serve import VectorPool

    rng = np.random.RandomState(29)
    centers = rng.normal(size=(12, 32))
    n = 3000
    X = centers[rng.randint(0, 12, n)] + 0.35 * rng.normal(size=(n, 32))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("rr")) + "/emb.parquet"
    pq_mod.write_table(pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X)}), path)
    q = X[rng.randint(0, n, 10)].astype(np.float64)
    exact = VectorPool(path).knn(q, 10)

    # covering contract: approx-brute candidates + full-width rerank
    # reproduce the float pool bit-for-bit (scores included)
    full = VectorPool(path, quantize="pq", pq_m=8, rerank_k=n)
    assert full.knn(q, 10).equals(exact)

    # bounded budget: codes-only pq8 is coarse; +rerank_k=50 recovers
    approx = VectorPool(path, quantize="pq", pq_m=8)
    rr = VectorPool(path, quantize="pq", pq_m=8, rerank_k=50)
    got_a = approx.knn(q, 10)
    got_r = rr.knn(q, 10)

    def recall(df):
        return sum(
            len(set(exact[exact["qid"] == i]["vec_id"])
                & set(df[df["qid"] == i]["vec_id"]))
            for i in range(10)) / 100

    assert recall(got_r) >= 0.9
    assert recall(got_r) >= recall(got_a)
    # reranked scores are the float pool's exact display scores
    merged = got_r.merge(exact, on=["qid", "vec_id"], how="inner",
                         suffixes=("", "_e"))
    assert len(merged) and np.array_equal(merged["score"],
                                          merged["score_e"])

    # graph + fused + rerank compose; threshold applies on exact scores
    g = VectorPool(path, n_clusters=4, graph_R=8, quantize="pq", pq_m=8,
                   graph_fused=True, rerank_k=50)
    beam = g.knn(q, 10, nprobe=2, ef=48)
    m2 = beam.merge(exact, on=["qid", "vec_id"], how="inner",
                    suffixes=("", "_e"))
    assert len(m2) and np.array_equal(m2["score"], m2["score_e"])
    thr = float(exact["score"].median())
    t = g.knn(q, 10, nprobe=4, ef=96, threshold=thr)
    assert (t["score"] >= thr).all()

    # NVQ pools share the same sidecar path
    nv = VectorPool(path, quantize="nvq", rerank_k=n)
    assert nv.knn(q, 10).equals(exact)


def test_rerank_k_validation(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from jvector_spark.serve import VectorPool

    rng = np.random.RandomState(3)
    X = rng.normal(size=(40, 8)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("rrv")) + "/emb.parquet"
    pq_mod.write_table(pa.table({
        "vec_id": np.arange(40, dtype=np.int64), "embedding": list(X)}),
        path)
    with pytest.raises(ValueError, match="rerank_k"):
        VectorPool(path, rerank_k=10)  # float pool: already exact
    with pytest.raises(ValueError, match="rerank_k"):
        VectorPool(path, quantize="nvq", rerank_k=0)

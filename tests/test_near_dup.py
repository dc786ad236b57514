"""Near-duplicate pipeline tests on the driver fixtures: the bucketed
candidate-generate -> verify paths (text minhash-LSH and embedding
hyperplane-LSH) against their all-pairs recall oracles, plus plan-shape
assertions that the production paths never go quadratic.

Reference contract: JVector trades recall for visited nodes via beam width
(GraphSearcher.java README.md:19-24); here the knobs are (num_hashes,
band_size) / (n_planes, band_bits), and recall is measured against the
exact all-pairs truth the same way SiftSmall.testRecall measures against
groundtruth ivecs.
"""

from __future__ import annotations

import pandas as pd
import pytest

from jvector_spark.operators.ann import (
    embedding_lsh_near_dup,
    embedding_near_dup_pairs,
)
from jvector_spark.operators.dedup import lsh_verified_pairs, ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(pdf, cols=("doc_a", "doc_b")):
    return set(zip(pdf[cols[0]], pdf[cols[1]]))


def test_lsh_verified_subset_and_recall(docs):
    """LSH->verify returns a SUBSET of the all-pairs truth (precision 1.0 —
    verification is exact) with recall >= 0.9 on the planted near-dups.
    The fixture's one known miss is a j=0.9 pair with 10-element shingle
    sets, where minhash agreement deviates far from its expectation."""
    truth = ngram_jaccard_pairs(docs, min_jaccard=0.5).toPandas()
    got = lsh_verified_pairs(docs, min_jaccard=0.5).toPandas()
    t, g = _pairs(truth), _pairs(got)
    assert len(t) >= 20, "fixture should plant near-dup docs"
    assert g <= t, f"false positives: {g - t}"
    assert len(g) / len(t) >= 0.9, f"recall {len(g)}/{len(t)}"
    # verified jaccard values are the exact ones
    m = got.merge(truth, on=["doc_a", "doc_b"], suffixes=("_g", "_t"))
    assert (m["jaccard_ppm_g"] == m["jaccard_ppm_t"]).all()


def test_embed_lsh_subset_and_recall(emb):
    """Hyperplane-LSH near-dup: subset of all-pairs truth with exact
    scores; recall >= 0.5 at threshold 0.4 on random (worst-case,
    structureless) embeddings."""
    truth = embedding_near_dup_pairs(emb, threshold=0.4).toPandas()
    got = embedding_lsh_near_dup(emb, threshold=0.4).toPandas()
    t, g = _pairs(truth, ("id_a", "id_b")), _pairs(got, ("id_a", "id_b"))
    assert len(g) > 0 and g <= t
    assert len(g) / len(t) >= 0.5, f"recall {len(g)}/{len(t)}"
    m = got.merge(truth, on=["id_a", "id_b"], suffixes=("_g", "_t"))
    assert (m["score_g"] == m["score_t"]).all()


def test_embed_lsh_plan_never_quadratic(emb):
    """The production near-dup path must contain NO cartesian/nested-loop
    join — candidates come from the bucketed band equi-join only (the
    round-1 all-pairs crossJoin is demoted to a test-only verifier)."""
    plan = embedding_lsh_near_dup(emb, threshold=0.4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_verified_plan_never_quadratic(docs):
    plan = lsh_verified_pairs(docs, min_jaccard=0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compressed_rerank_exact_on_fixtures(spark):
    """rerank_k=100 of 500 fixture vectors: BOTH two-phase compressed
    tiers (pq ADC and nvq dequantized scan) return the EXACT cosine
    top-10 (rank-identical to brute force) at both sf fixtures — the
    basis for giving ann_compressed_rerank the brute-force oracle."""
    import __spark_entry__ as entry
    from jvector_spark.operators.ann import brute_force_topk
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        queries = e.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        res = entry.q_ann_compressed_rerank(spark, sf).toPandas()
        exact = brute_force_topk(e, queries, k=10).toPandas() \
            .sort_values(["qid", "rank"]).reset_index(drop=True)
        for tier in ("pq", "nvq"):
            got = res[res["tier"] == tier].drop(columns="tier") \
                .sort_values(["qid", "rank"]).reset_index(drop=True)
            assert got[["qid", "rank", "vec_id"]].equals(
                exact[["qid", "rank", "vec_id"]].astype(
                    got[["qid", "rank", "vec_id"]].dtypes)
            ), f"{tier} rerank not exact at {sf}"


def test_near_dup_groups_transitive(spark):
    """Connected components over the pair graph: a chain A~B~C where A,C
    never collide directly must still cluster under min-label A."""
    import numpy as np

    from jvector_spark.operators.dedup import near_dup_groups

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    # A and B share all-but-one shingles; B and C likewise; A vs C differ
    # in two places (lower jaccard) — transitivity must bridge them
    a = " ".join(base)
    b = " ".join(base[:-1] + ["CHANGED1"])
    c = " ".join(base[:10] + ["CHANGED2"] + base[11:-1] + ["CHANGED1"])
    fillers = [
        " ".join(f"w{i}_{j}" for j in range(20)) for i in range(30)
    ]
    pdf = pd.DataFrame({
        "doc_id": np.arange(33, dtype=np.int64),
        "text": [a, b, c] + fillers,
    })
    docs = spark.createDataFrame(pdf)
    groups = near_dup_groups(docs, min_jaccard=0.5).toPandas() \
        .set_index("doc_id")["dup_group"].to_dict()
    assert groups.get(0) == 0 and groups.get(1) == 0, groups
    assert groups.get(2) == 0, f"transitivity failed: {groups}"
    assert all(d < 3 for d in groups), f"fillers clustered: {groups}"


def test_embedding_lsh_rejects_nondivisible_planes(spark):
    """n_planes not a multiple of band_bits would compute trailing
    hyperplane dots per row but never band them (silent recall loss +
    wasted scan cost) — rejected up front (review finding)."""
    import pandas as pd

    from jvector_spark.operators.ann import embedding_lsh_near_dup

    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]}))
    with pytest.raises(ValueError, match="multiple of"):
        embedding_lsh_near_dup(df, n_planes=18, band_bits=4)

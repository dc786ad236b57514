"""Physical-plan regression guards for the load-bearing plan shapes
documented in docs/PLANS.md — the properties that make operators survive
a 100x scale-up. Assertions target structural invariants (broadcast
sides, pushed filters, no cartesian products, no memory pins), not exact
plan text, so they are robust to Catalyst version drift."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jvector_spark.operators.bm25 import bm25_topk
from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pipe(spark, corpus_df):
    docs = assign_dense_docids(corpus_df)
    postings = build_postings(docs)
    return postings, term_stats(postings), corpus_stats(doc_lengths(postings))


def test_bm25_df_plan_broadcasts_queries(spark, pipe):
    """Query terms broadcast into the postings join: the corpus-sized side
    must never hash-shuffle FOR THE JOIN, and nothing goes cartesian."""
    postings, ts, cs = pipe
    q = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "terms": [["import", "def"]], "k": [10]}))
    plan = _plan(bm25_topk(postings, ts, cs, q))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_brute_pushes_query_filter(spark):
    """The query-side vec_id predicate must reach the parquet scan."""
    import __spark_entry__ as entry

    df = entry.q_ann_brute_topk(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "vec_id" in plan.split("PushedFilters")[1][:200]


def _assert_map_side_only(plan: str) -> None:
    """Pure per-row projections: no aggregation/join shuffle (hash or range
    exchange). One round-robin exchange is allowed — that is scale_out
    widening a narrow one-file scan; on a wide scan it disappears
    (test_signature_fusion::test_scale_out_identity_when_wide)."""
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1


def test_minhash_is_shuffle_free(spark):
    """Signatures are pure map-side projects: no agg/join Exchange."""
    from jvector_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _assert_map_side_only(_plan(minhash_signatures(docs)))


def test_textstats_are_shuffle_free(spark):
    from jvector_spark.operators.textstats import doc_fingerprints, quality_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (quality_scores, doc_fingerprints):
        _assert_map_side_only(_plan(op(docs)))


def test_sequence_pack_has_no_single_partition_stage(spark):
    """sequence_pack's running total must be the two-phase range-partition
    + prefix-sum scheme: no global Window, no Exchange SinglePartition
    (the round-2 scale-killer this guard pins fixed)."""
    from jvector_spark.operators.textstats import sequence_pack

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(sequence_pack(docs))
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_doc_keywords_df_join_not_forced_broadcast(spark):
    """The term-df dictionary join must not carry a forced broadcast hint:
    on code corpora the vocabulary is corpus-sized. The logical plan must
    show no user ResolvedHint on the df side (AQE may still *choose*
    broadcast at this SF — that is fine and not asserted either way)."""
    from jvector_spark.operators.textstats import doc_keywords

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = doc_keywords(docs)
    logical = df._jdf.queryExecution().analyzed().toString()
    # exactly one hint remains: the 1-row corpus-count crossJoin
    assert logical.count("ResolvedHint") <= 1


def test_near_dup_paths_have_no_cartesian(spark):
    """The production near-dup paths must stay bucketed (this is also
    asserted in test_near_dup; duplicated here so the plan-guard file is
    the one place listing every no-cartesian invariant)."""
    from jvector_spark.operators.ann import embedding_lsh_near_dup
    from jvector_spark.operators.dedup import lsh_verified_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for df in (lsh_verified_pairs(docs), embedding_lsh_near_dup(emb)):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

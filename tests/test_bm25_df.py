"""End-to-end slice: corpus -> docids -> postings -> stats -> top-k BM25,
rank-identical to the brute-force oracle (SURVEY §7.2 step 2)."""

from __future__ import annotations

import numpy as np
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
    term_stats_salted,
)


@pytest.fixture(scope="module")
def pipeline(spark, corpus_df):
    docs = assign_dense_docids(corpus_df).persist()
    postings = build_postings(docs).persist()
    ts = term_stats(postings).persist()
    st = corpus_stats(doc_lengths(postings)).persist()
    return docs, postings, ts, st


def test_dense_docids_match_sort_order(pipeline, corpus_pdf):
    docs, *_ = pipeline
    got = docs.select("repo", "path", "commit", "docid").toPandas()
    got = got.sort_values("docid").reset_index(drop=True)
    exp = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert list(got["docid"]) == list(range(len(exp)))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit"]], exp[["repo", "path", "commit"]]
    )


def test_docids_stable_across_parallelism(spark, corpus_df):
    a = assign_dense_docids(corpus_df.repartition(2), num_partitions=3)
    b = assign_dense_docids(corpus_df.repartition(13), num_partitions=11)
    pa = a.select("repo", "path", "commit", "docid").toPandas().sort_values("docid")
    pb = b.select("repo", "path", "commit", "docid").toPandas().sort_values("docid")
    pd.testing.assert_frame_equal(pa.reset_index(drop=True), pb.reset_index(drop=True))


def test_postings_match_oracle(pipeline, oracle):
    _, postings, *_ = pipeline
    got = postings.toPandas()
    n_postings = sum(len(d) for d, _ in oracle.postings.values())
    assert len(got) == n_postings
    # spot-check a few terms
    for term in list(oracle.postings)[:5] + ["import", "def"]:
        d_exp, tf_exp = oracle.postings[term]
        sub = got[got["term"] == term].sort_values("docid")
        assert list(sub["docid"]) == list(d_exp)
        assert list(sub["tf"]) == list(tf_exp.astype(int))


def test_doclen_and_stats_match_oracle(pipeline, oracle):
    _, postings, _, st = pipeline
    row = st.collect()[0]
    assert row["n_docs"] == oracle.n_docs
    assert np.isclose(row["avgdl"], oracle.avgdl, rtol=1e-12)
    dl = doc_lengths(postings).toPandas().sort_values("docid")
    assert np.array_equal(dl["dl"].to_numpy(), oracle.doclen.astype(int))


def test_salted_term_stats_equal_plain(pipeline):
    _, postings, ts, _ = pipeline
    plain = ts.toPandas().sort_values("term").reset_index(drop=True)
    salted = term_stats_salted(postings, 8).toPandas().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)


def test_topk_rank_identical_to_oracle(spark, pipeline, oracle, queries_pdf):
    _, postings, ts, st = pipeline
    qdf = spark.createDataFrame(queries_pdf)
    got = bm25_topk(postings, ts, st, qdf).toPandas()
    golden = oracle.golden(queries_pdf)
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    golden = golden.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert len(got) == len(golden), f"{len(got)} != {len(golden)}"
    assert list(got["qid"]) == list(golden["qid"])
    assert list(got["docid"]) == list(golden["docid"]), "rank-identical docids"
    assert np.allclose(got["score"], golden["score"], rtol=1e-12, atol=1e-12)


def test_content_sha_invariant(pipeline, corpus_pdf):
    from jvector_spark.corpus import content_sha_table

    docs, *_ = pipeline
    got = docs.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha")
    ).toPandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    exp = content_sha_table(corpus_pdf).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_docids_stable_across_partition_counts(spark, corpus_pdf):
    """North-rule determinism: dense docids are a pure function of the sort
    keys — identical at any parallelism/partitioning (the property that
    makes N vs 4N runs produce identical results)."""
    from jvector_spark.operators.ids import assign_dense_docids

    outs = []
    for n_part, n_input in [(4, 3), (16, 11)]:
        df = spark.createDataFrame(corpus_pdf).repartition(n_input)
        ids = (
            assign_dense_docids(df, num_partitions=n_part)
            .select("repo", "path", "commit", "docid")
            .toPandas()
            .sort_values(["repo", "path", "commit"])
            .reset_index(drop=True)
        )
        outs.append(ids)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_fielded_bm25(spark, pipeline, corpus_pdf):
    """bm25_fielded_topk: with a zero-weight second field it equals plain
    BM25 exactly; boosting a metadata field re-ranks docs that match it."""
    from jvector_spark.operators.bm25 import bm25_fielded_topk

    docs, postings, tstats, cstats = pipeline
    # metadata field: repo name as a single token per doc
    repo_p = docs.select(
        "docid", F.col("repo").alias("term"),
        F.lit(1).cast("int").alias("tf"), F.lit(1).cast("int").alias("dl"),
    )
    r_tstats = term_stats(repo_p)
    r_cstats = corpus_stats(doc_lengths(repo_p))
    some_repo = docs.select("repo").first()["repo"]
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "terms": [["import", some_repo]], "k": [15]}))

    base = bm25_topk(postings, tstats, cstats, queries).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    zerow = bm25_fielded_topk(
        [(postings, tstats, cstats, 1.0)], queries,
    ).toPandas().sort_values("rank").reset_index(drop=True)
    assert base["docid"].tolist() == zerow["docid"].tolist()
    assert np.array_equal(base["score"].to_numpy(), zerow["score"].to_numpy())

    boosted = bm25_fielded_topk(
        [(postings, tstats, cstats, 1.0), (repo_p, r_tstats, r_cstats, 5.0)],
        queries,
    ).toPandas().sort_values("rank").reset_index(drop=True)
    # every doc of the boosted repo outranks same-content docs elsewhere:
    # the top results must all come from `some_repo`
    repo_docs = set(docs.where(F.col("repo") == some_repo)
                    .select("docid").toPandas()["docid"])
    top = boosted["docid"].head(min(5, len(repo_docs))).tolist()
    assert all(d in repo_docs for d in top), (top, some_repo)
    assert boosted["docid"].tolist() != base["docid"].tolist()

"""Aggressive (approximate) pruning mode — the relaxed-monotonicity
analog (ScoreTracker.java:26-143; toggled off by default exactly as the
reference defaults builders' searchers to usePruning(false),
GraphIndexBuilder.java:330-334).

Contract under prune_epsilon > 0: scores of every RETURNED doc are exact
(a subset of the exact result's score assignments); only recall is
traded; pruning work (blocks generating candidates) must not increase."""

from __future__ import annotations

import numpy as np
import pytest

from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.wand import (
    make_metrics_accumulator,
    read_metrics,
    search_index,
)
from jvector_spark.sources.segment import build_index


@pytest.fixture(scope="module")
def index(spark, corpus_df, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_prune"))
    build_index(assign_dense_docids(corpus_df), idx, num_segments=6)
    return idx


def _run(spark, index, queries_pdf, eps):
    acc = make_metrics_accumulator(spark)
    res = search_index(
        spark, index, queries_pdf, metrics_acc=acc, prune_epsilon=eps
    ).toPandas()
    return res, read_metrics(acc)


def test_epsilon_zero_is_exact_path(spark, index, queries_pdf):
    """prune_epsilon=0.0 must be bit-identical to the default call."""
    base = search_index(spark, index, queries_pdf).toPandas()
    zero, _ = _run(spark, index, queries_pdf, 0.0)
    cols = ["qid", "rank", "docid", "score"]
    a = base[cols].sort_values(["qid", "rank"]).reset_index(drop=True)
    b = zero[cols].sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_aggressive_pruning_recall_and_work(spark, index, oracle,
                                            queries_pdf):
    eps = 0.25
    exact, m_exact = _run(spark, index, queries_pdf, 0.0)
    approx, m_approx = _run(spark, index, queries_pdf, eps)

    # (1) every returned score is the exact score for that (qid, docid)
    merged = approx.merge(
        exact, on=["qid", "docid"], how="left", suffixes=("", "_exact")
    )
    in_exact = merged["score_exact"].notna()
    assert np.allclose(
        merged.loc[in_exact, "score"],
        merged.loc[in_exact, "score_exact"], rtol=0, atol=0,
    )
    for q in queries_pdf.itertuples():
        got = approx[approx["qid"] == q.qid]
        d, s = oracle.score_query(list(q.terms))
        exp = dict(zip(d.tolist(), s.tolist()))
        for row in got.itertuples():
            assert row.score == exp[row.docid], (q.qid, row.docid)

    # (2) recall@k stays high on the fixture corpus
    hits = total = 0
    for q in queries_pdf.itertuples():
        e = set(exact[exact["qid"] == q.qid]["docid"])
        a = set(approx[approx["qid"] == q.qid]["docid"])
        hits += len(e & a)
        total += len(e)
    recall = hits / max(total, 1)
    assert recall >= 0.9, recall

    # (3) strictly-tighter pruning: candidate-generating block count and
    # candidate totals must not increase for any query
    for qid, me in m_exact.items():
        ma = m_approx.get(qid, {})
        assert ma.get("blocks_gen", 0) <= me.get("blocks_gen", 0)
        assert ma.get("candidates", 0) <= me.get("candidates", 0)

"""More-like-this + in-search self-exclusion.

Reference parity: the engine filters the query's own node out of results
inside the search (Bits accept predicate, GraphSearcher.java:202-214) —
NOT post-hoc — so an excluded doc never displaces a returned one and a
query still yields a full k results. more_like_this layers Lucene-style
query-by-document on top: top tf*idf source terms -> OR query -> search
with the source self-excluded."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.functions.tokenizer import tokenize_series
from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.mlt import mlt_select_terms, more_like_this
from jvector_spark.operators.wand import search_index
from jvector_spark.sources.segment import build_index


@pytest.fixture(scope="module")
def docs_ids(spark, corpus_df):
    return assign_dense_docids(corpus_df).persist()


@pytest.fixture(scope="module")
def index(docs_ids, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_mlt"))
    build_index(docs_ids, idx, num_segments=6)
    return idx


def _oracle_full_ranking(oracle, terms):
    docids, scores = oracle.score_query(list(terms))
    hit = scores > 0.0
    d, s = docids[hit], scores[hit]
    order = np.lexsort((d, -s))
    return d[order], s[order]


def test_exclude_is_in_search(spark, index, oracle, queries_pdf):
    """Excluding the top-1 doc of each query returns the oracle ranking
    over corpus-minus-that-doc — crucially still k results (the k+1-th
    doc back-fills), which a post-hoc filter could not guarantee."""
    exclude = {}
    for q in queries_pdf.itertuples():
        d, _ = _oracle_full_ranking(oracle, q.terms)
        if len(d):
            exclude[int(q.qid)] = np.array([d[0]], dtype=np.int64)
    res = search_index(spark, index, queries_pdf, exclude=exclude).toPandas()
    for q in queries_pdf.itertuples():
        d, s = _oracle_full_ranking(oracle, q.terms)
        if int(q.qid) in exclude:
            keep = d != exclude[int(q.qid)][0]
            d, s = d[keep], s[keep]
        got = res[res["qid"] == q.qid].sort_values("rank")
        assert got["docid"].tolist() == d[: q.k].tolist(), f"qid={q.qid}"
        assert np.allclose(
            got["score"].to_numpy(), s[: q.k], rtol=0, atol=0
        )
        if int(q.qid) in exclude:
            assert exclude[int(q.qid)][0] not in got["docid"].to_numpy()


def test_more_like_this_matches_oracle(spark, index, oracle, corpus_pdf,
                                       docs_ids):
    """End-to-end MLT: term selection (round(tf*idf,6) desc, term asc)
    replicated here independently, then ranking vs the brute-force oracle
    with the source doc removed."""
    keyed = corpus_pdf.sort_values(
        ["repo", "path", "commit"], kind="mergesort"
    ).reset_index(drop=True)
    src_ids = [3, 57, 111]
    k, num_terms = 8, 6
    res = more_like_this(
        spark, index, docs_ids, src_ids, k=k, num_terms=num_terms,
        id_col="docid", content_col="content",
    ).toPandas()
    for sid in src_ids:
        text = keyed.loc[sid, "content"]
        toks = tokenize_series(pd.Series([text]), "code").iloc[0]
        tf = pd.Series(toks).value_counts()
        cand = sorted(
            (-(round(float(n) * oracle.idf(t), 6)), t)
            for t, n in tf.items() if oracle.df.get(t)
        )
        terms = [t for _, t in cand[:num_terms]]
        d, s = _oracle_full_ranking(oracle, terms)
        keep = d != sid
        d, s = d[keep], s[keep]
        got = res[res["qid"] == sid].sort_values("rank")
        assert sid not in got["docid"].to_numpy()
        assert got["docid"].tolist() == d[:k].tolist(), f"src={sid}"
        assert np.allclose(got["score"].to_numpy(), s[:k], rtol=0, atol=0)


def test_mlt_select_terms_deterministic(oracle, corpus_pdf):
    """Tie-break is (weight desc, term asc) — permuting input text token
    order cannot change the selection."""
    keyed = corpus_pdf.sort_values(
        ["repo", "path", "commit"], kind="mergesort"
    ).reset_index(drop=True)
    text = keyed.loc[5, "content"]
    idfs = {t: oracle.idf(t) for t in oracle.df}
    a = mlt_select_terms({5: text}, idfs, 6, "code")[5]
    shuffled = " ".join(
        np.random.RandomState(0).permutation(text.split()).tolist()
    )
    b = mlt_select_terms({5: shuffled}, idfs, 6, "code")[5]
    assert a == b and len(a) == 6

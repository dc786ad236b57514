"""Snippet extraction: exact window semantics on hand-built docs."""

from __future__ import annotations

import pandas as pd
import pytest

from jvector_spark.operators.snippets import first_match_snippets


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c TARGET d e f g",      # interior match
            "TARGET x y z",               # match at start (window clips)
            "p q r s TARGET",             # match at end (window clips)
            "no hits here at all",        # no match
        ],
    }))
    results = spark.createDataFrame(pd.DataFrame({
        "qid": [0, 0, 0, 0], "docid": [0, 1, 2, 3]}))
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "terms": [["TARGET", "zz"]]}))
    return docs, results, queries


def test_snippet_windows(spark, tiny):
    docs, results, queries = tiny
    out = first_match_snippets(docs, results, queries, window=2) \
        .toPandas().set_index("docid")
    assert out.loc[0, "first_pos"] == 4
    assert out.loc[0, "snippet"] == "b c TARGET d e"
    assert out.loc[1, "first_pos"] == 1
    assert out.loc[1, "snippet"] == "TARGET x y"
    assert out.loc[2, "first_pos"] == 5
    assert out.loc[2, "snippet"] == "r s TARGET"
    assert out.loc[3, "first_pos"] == 0
    assert out.loc[3, "snippet"] == ""


def test_snippet_first_of_multiple_terms(spark, tiny):
    docs, results, queries = tiny
    q2 = spark.createDataFrame(pd.DataFrame({
        "qid": [0], "terms": [["d", "b"]]}))
    out = first_match_snippets(docs, results, q2, window=1) \
        .toPandas().set_index("docid")
    # 'b' (pos 2) precedes 'd' (pos 5): FIRST match of ANY term wins
    assert out.loc[0, "first_pos"] == 2
    assert out.loc[0, "snippet"] == "a b c"

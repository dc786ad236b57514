"""Boolean query language: parser, per-segment evaluation, distributed
search vs a brute-force oracle, and the SQL predicate translator.

Mirrors the reference's composable-query testing style (randomized
assertions vs exact ground truth, TestVectorGraph.java:89-330)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.boolquery import (
    And, Not, Or, QueryParseError, Term, all_terms, ast_to_sql_predicate,
    boolean_search_index, parse_query, positive_leaves,
)
from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.sources.segment import build_index

QUERIES = [
    "import AND def",
    "import def",                       # implicit AND
    "import AND (def OR return)",
    "import NOT def",
    "(import OR class) AND NOT (def AND return)",
    "def^2.5 OR return",
    "import AND zz_no_such_term",       # OOV under AND -> empty
    "zz_no_such_term OR return",        # OOV under OR -> other side
    "import AND NOT zz_no_such_term",   # OOV negation -> no-op
    "for AND if AND NOT class",
]


@pytest.fixture(scope="module")
def index(spark, corpus_df, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_bool"))
    build_index(assign_dense_docids(corpus_df), idx, num_segments=6,
                key_cols=("repo", "path", "commit", "lang"))
    return idx


def _brute(oracle, ast, k, accept=None):
    """Driver-side boolean evaluation straight off the oracle's postings."""

    def dset(node):
        if isinstance(node, Term):
            d = oracle.postings.get(node.text)
            return set() if d is None else set(d[0].tolist())
        if isinstance(node, Or):
            out = set()
            for c in node.children:
                out |= dset(c)
            return out
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        cur = dset(pos[0])
        for c in pos[1:]:
            cur &= dset(c)
        for c in neg:
            cur -= dset(c)
        return cur

    matched = dset(ast)
    if accept is not None:
        matched &= accept
    if not matched:
        return [], []
    md = np.array(sorted(matched), dtype=np.int64)
    scores = np.zeros(len(md))
    for leaf in positive_leaves(ast):
        if leaf.text not in oracle.postings:
            continue
        d, tf = oracle.postings[leaf.text]
        from jvector_spark import B, K1

        norm = tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * oracle.doclen[d] / oracle.avgdl))
        contrib = oracle.idf(leaf.text) * norm
        pos = np.searchsorted(d, md)
        ok = pos < len(d)
        ok[ok] &= d[pos[ok]] == md[ok]
        scores[ok] += leaf.boost * contrib[pos[ok]]
    top = np.lexsort((md, -scores))[:k]
    return md[top].tolist(), scores[top].tolist()


# --- parser ---------------------------------------------------------------

def test_precedence_or_binds_loosest():
    assert parse_query("a b OR c") == Or((And((Term("a"), Term("b"))),
                                          Term("c")))
    assert parse_query("a OR b c") == Or((Term("a"),
                                          And((Term("b"), Term("c")))))


def test_parens_and_not():
    q = parse_query("a AND NOT (b OR c)")
    assert q == And((Term("a"), Not(Or((Term("b"), Term("c"))))))


def test_boost_parse():
    assert parse_query("a^2.5 b") == And((Term("a", 2.5), Term("b")))


def test_parse_errors():
    for bad in ["NOT a", "NOT a AND NOT b", "a OR NOT b", "(a", "a)",
                "a AND", "AND a", "a^x", "NOT NOT a"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_leaf_extraction():
    q = parse_query("a^2 AND (b OR a) AND NOT c")
    assert [(t.text, t.boost) for t in positive_leaves(q)] == [
        ("a", 1.0), ("a", 2.0), ("b", 1.0)]
    assert all_terms(q) == ["a", "b", "c"]


# --- end-to-end vs brute force -------------------------------------------

def test_boolean_search_matches_bruteforce(spark, index, oracle):
    qpdf = pd.DataFrame(
        [(i, q, 10) for i, q in enumerate(QUERIES)],
        columns=["qid", "query", "k"],
    )
    res = boolean_search_index(spark, index, qpdf).toPandas()
    for i, q in enumerate(QUERIES):
        exp_d, exp_s = _brute(oracle, parse_query(q), 10)
        got = res[res["qid"] == i].sort_values("rank")
        assert got["docid"].tolist() == exp_d, f"query={q!r}"
        assert np.allclose(got["score"].to_numpy(), exp_s, rtol=0, atol=1e-12), q


def test_boolean_filtered(spark, index, oracle, corpus_pdf):
    keyed = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    accept = set(np.flatnonzero((keyed["lang"] == "python").to_numpy()).tolist())
    qpdf = pd.DataFrame([(0, "import AND (def OR return)", 10)],
                        columns=["qid", "query", "k"])
    res = boolean_search_index(spark, index, qpdf,
                               doc_filter={"lang": "python"}).toPandas()
    exp_d, _ = _brute(oracle, parse_query(qpdf["query"][0]), 10, accept)
    assert res.sort_values("rank")["docid"].tolist() == exp_d


def test_boost_changes_ranking(spark, index, oracle):
    plain, _ = _brute(oracle, parse_query("def OR return"), 10)
    boosted, _ = _brute(oracle, parse_query("def OR return^100"), 10)
    assert plain != boosted  # boost must actually reweight
    qpdf = pd.DataFrame([(0, "def OR return^100", 10)],
                        columns=["qid", "query", "k"])
    res = boolean_search_index(spark, index, qpdf).toPandas()
    assert res.sort_values("rank")["docid"].tolist() == boosted


# --- SQL translator -------------------------------------------------------

def test_sql_predicate_matches_engine_matchset(oracle):
    duckdb = pytest.importorskip("duckdb")
    rows = [(int(d), t) for t, (ds, _) in oracle.postings.items()
            for d in ds]
    tf = pd.DataFrame(rows, columns=["doc_id", "term"])
    con = duckdb.connect()
    con.register("tf", tf)
    for q in QUERIES:
        ast = parse_query(q)
        terms = ", ".join("'" + t + "'" for t in all_terms(ast))
        got = con.execute(
            f"SELECT doc_id FROM tf WHERE term IN ({terms}) "
            f"GROUP BY doc_id HAVING {ast_to_sql_predicate(ast)} "
            "ORDER BY doc_id"
        ).fetchnumpy()["doc_id"].tolist()
        exp = sorted(
            {int(x) for x in _brute(oracle, ast, 10**9)[0]}
        )
        assert got == exp, f"query={q!r}"

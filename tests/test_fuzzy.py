"""Fuzzy search: vectorized Levenshtein expansion + BM25 rank identity.

The DP must agree exactly with a scalar Wagner-Fischer reference AND with
DuckDB's `levenshtein` (the driver-oracle function); the end-to-end
search must be rank-identical to the BM25 oracle run on the same expanded
term set (a fuzzy query IS a term query after expansion)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.fuzzy import (
    expand_fuzzy,
    fuzzy_search_index,
    levenshtein_leq,
)
from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.sources.segment import build_index


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    alpha = list("abcde_")
    terms = np.array(
        ["".join(rng.choice(alpha, rng.integers(1, 9))) for _ in range(300)]
        + ["", "abc"],
        dtype=object,
    )
    for q in ["abc", "cab_e", "x", "abcdeabc", "dedb"]:
        for d in (0, 1, 2):
            got = levenshtein_leq(q, terms, d)
            exp = np.array([_lev(q, t) <= d for t in terms])
            assert (got == exp).all(), (q, d)


def test_levenshtein_matches_duckdb():
    """The engine's distance IS the oracle's: plain Levenshtein, where a
    transposition costs 2."""
    duckdb = pytest.importorskip("duckdb")
    terms = np.array(
        ["table", "tabel", "tble", "cable", "tables", "bat", "batch", ""],
        dtype=object,
    )
    for q in ["table", "bat", "tabel"]:
        duck = np.array([
            duckdb.sql(f"SELECT levenshtein('{q}', '{t}')").fetchone()[0]
            for t in terms
        ])
        for d in (0, 1, 2):
            assert (levenshtein_leq(q, terms, d) == (duck <= d)).all(), (q, d)


@pytest.fixture(scope="module")
def fzindex(spark, corpus_df, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fzidx"))
    docs = assign_dense_docids(corpus_df)
    build_index(docs, idx, num_segments=5)
    return idx


def test_expansion_matches_vocabulary_truth(fzindex, oracle):
    vocab = np.array(sorted(oracle.df), dtype=object)
    got = expand_fuzzy(fzindex, {0: ("hash_post50", 2), 1: ("zz_oov", 1)})
    exp = sorted(t for t in vocab if _lev("hash_post50", t) <= 2)
    assert got[0] == exp and len(exp) >= 2  # the planted *_post50 family
    assert got[1] == []


def test_expansion_cap_keeps_heaviest_df(fzindex, oracle):
    got = expand_fuzzy(fzindex, {0: ("hash_post50", 2)}, max_terms=1)
    full = expand_fuzzy(fzindex, {0: ("hash_post50", 2)})[0]
    assert len(got[0]) == 1 and got[0][0] in full
    assert got[0][0] == max(full, key=lambda t: (oracle.df[t], [-ord(c) for c in t]))


def test_fuzzy_search_rank_identical_to_expanded_oracle(
    spark, fzindex, oracle
):
    queries = pd.DataFrame({
        "qid": [0, 1, 2],
        "term": ["hash_post50", "if", "zz_oov"],
        "dist": [2, 1, 1],
        "k": [10, 5, 5],
    })
    got = fuzzy_search_index(spark, fzindex, queries).toPandas()
    for qid, term, dist, k in queries.itertuples(index=False):
        exp_terms = [t for t in oracle.df if _lev(term, t) <= dist]
        exp = oracle.topk(exp_terms, k)
        g = got[got["qid"] == qid].sort_values("rank").reset_index(drop=True)
        assert list(g["docid"]) == list(exp["docid"]), f"qid={qid}"
        np.testing.assert_allclose(g["score"], exp["score"], rtol=1e-12)
    assert (got["qid"] != 2).all()  # OOV neighborhood is empty


def test_suggest_terms_matches_bruteforce(fzindex, oracle):
    """Suggestion ranking (dist asc, df desc, term asc) vs an independent
    scalar-DP brute force over the full vocabulary."""
    from jvector_spark.operators.fuzzy import suggest_terms

    queries = {0: ("improt", 2), 1: ("return", 1), 2: ("def", 0)}
    n = 6
    got = suggest_terms(fzindex, queries, n=n)
    vocab = sorted(oracle.df)
    for qid, (qterm, maxd) in queries.items():
        cand = [(_lev(qterm, t), -oracle.df[t], t)
                for t in vocab if _lev(qterm, t) <= maxd]
        cand.sort()
        exp = [(t, d, -negdf) for d, negdf, t in cand[:n]]
        g = got[got["qid"] == qid].sort_values("rank")
        assert list(zip(g["term"], g["dist"], g["df"])) == exp, qid


def test_suggest_in_vocab_term_ranks_itself_first(fzindex, oracle):
    from jvector_spark.operators.fuzzy import suggest_terms

    term = "import"
    got = suggest_terms(fzindex, {0: (term, 1)}, n=3)
    top = got[got["rank"] == 0].iloc[0]
    assert top["term"] == term and top["dist"] == 0
    assert top["df"] == oracle.df[term]


def test_fuzzy_without_term_stats_falls_back(fzindex, tmp_path_factory):
    """expand_fuzzy and suggest_terms must serve indexes without (or
    with a torn) term_stats.parquet from the per-segment dictionaries,
    with per-segment df summed to the same global values (review
    finding: both crashed with FileNotFoundError)."""
    import os
    import shutil

    from jvector_spark.operators.fuzzy import suggest_terms

    q = {0: ("hash_post50", 2), 1: ("zz_oov", 1)}
    want_exp = expand_fuzzy(fzindex, q)
    want_sug = suggest_terms(fzindex, {0: ("hash_post50", 2)}, n=5)
    dup = os.path.join(str(tmp_path_factory.mktemp("fz_nostats")), "idx")
    shutil.copytree(fzindex, dup)
    os.remove(os.path.join(dup, "term_stats.parquet"))
    assert expand_fuzzy(dup, q) == want_exp
    got_sug = suggest_terms(dup, {0: ("hash_post50", 2)}, n=5)
    pd.testing.assert_frame_equal(got_sug.reset_index(drop=True),
                                  want_sug.reset_index(drop=True))

"""Regex token search: dictionary-driven expansion + posting aggregation,
against a pure-python oracle over the same tokenizer output."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from jvector_spark.functions.tokenizer import tokenize_series
from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.regex import expand_pattern, regex_token_topk
from jvector_spark.sources.segment import build_index


@pytest.fixture(scope="module")
def rx_index(spark, corpus_df, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_rx"))
    manifest = build_index(assign_dense_docids(corpus_df), idx, num_segments=4)
    return idx, manifest


PATTERNS = ["^run_", "get", r"\d\d$", "^zzz_nothing$"]


def _python_oracle(corpus_pdf, pattern, k=50):
    keyed = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    toks = tokenize_series(keyed["content"], "code")
    rx = re.compile(pattern)
    rows = []
    for docid, ts in enumerate(toks):
        n = sum(1 for t in ts if rx.search(t))
        if n:
            rows.append((docid, n))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


def test_regex_matches_oracle(spark, rx_index, corpus_pdf):
    idx, _ = rx_index
    queries = pd.DataFrame({
        "qid": np.arange(len(PATTERNS), dtype=np.int64),
        "pattern": PATTERNS, "k": [50] * len(PATTERNS),
    })
    got = regex_token_topk(spark, idx, queries, merge="driver")
    hits = 0
    for qid, pat in enumerate(PATTERNS):
        exp = _python_oracle(corpus_pdf, pat)
        g = got[got["qid"] == qid].sort_values("rank")
        assert g["docid"].tolist() == [d for d, _ in exp], pat
        assert g["n_occ"].tolist() == [n for _, n in exp], pat
        hits += len(g)
    assert hits > 0


def test_expansion_cap_keeps_heaviest(rx_index):
    """An adversarial pattern matching everything is capped at max_terms,
    keeping the heaviest-df terms deterministically."""
    idx, _ = rx_index
    full = expand_pattern(idx, ".", max_terms=10**9)
    capped = expand_pattern(idx, ".", max_terms=5)
    assert len(capped) == 5 and len(full) > 5
    assert set(capped) <= set(full)
    again = expand_pattern(idx, ".", max_terms=5)
    assert capped == again  # deterministic


def test_regex_spark_merge_equals_driver(spark, rx_index):
    idx, _ = rx_index
    q = pd.DataFrame({"qid": [0], "pattern": ["^run_"], "k": [20]})
    a = regex_token_topk(spark, idx, q, merge="driver") \
        .sort_values("rank").reset_index(drop=True)
    b = regex_token_topk(spark, idx, q).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    assert a[["docid", "n_occ"]].values.tolist() == \
        b[["docid", "n_occ"]].values.tolist()


def test_expand_distributed_matches_driver(spark, rx_index):
    """Vocabulary-scale path: with a zero driver budget, expansion runs as
    a Spark job (rlike + bounded per-pattern top-k) and must return the
    exact same term lists as the in-driver Arrow/RE2 scan — incl. the
    (df desc, term asc) cap tie-break."""
    from jvector_spark.operators.regex import expand_patterns

    idx, _ = rx_index
    pats = {0: "^run_", 1: "get", 2: ".", 3: "^zzz_nothing$"}
    local = expand_patterns(idx, pats, max_terms=7)
    dist = expand_patterns(idx, pats, max_terms=7, spark=spark,
                           driver_budget_bytes=0)
    assert local == dist


def test_expand_python_fallback_non_re2(rx_index, corpus_pdf):
    """Backreferences aren't RE2: the Arrow kernel refuses them and the
    python-per-batch fallback must take over with identical semantics."""
    from jvector_spark.functions.tokenizer import tokenize_series
    from jvector_spark.operators.regex import expand_patterns

    idx, _ = rx_index
    pat = r"(\w)\1"  # any doubled word-char: needs a backreference
    got = expand_patterns(idx, {0: pat}, max_terms=10**9)[0]
    rx = re.compile(pat)
    vocab = set()
    for ts in tokenize_series(corpus_pdf["content"], "code"):
        vocab.update(ts)
    exp = sorted(t for t in vocab if rx.search(t))
    assert got == exp and len(got) > 0


def test_expand_without_term_stats_falls_back(spark, rx_index,
                                              tmp_path_factory):
    """An index whose hot-tier term_stats.parquet is absent (pre-stats
    index) or torn (sha mismatch) must expand from the manifest's
    per-segment dictionaries with identical results — previously both
    states crashed or silently used the untrusted file (review
    finding)."""
    import os
    import shutil

    from jvector_spark.operators.regex import expand_patterns

    idx, _ = rx_index
    pats = {0: "^run_", 1: "get", 2: "^zzz_nothing$"}
    want = expand_patterns(idx, pats, max_terms=7)
    dup = os.path.join(str(tmp_path_factory.mktemp("rx_nostats")), "idx")
    shutil.copytree(idx, dup)
    os.remove(os.path.join(dup, "term_stats.parquet"))
    assert expand_patterns(dup, pats, max_terms=7) == want
    # torn stats: corrupt the file so the sha check fails
    dup2 = os.path.join(str(tmp_path_factory.mktemp("rx_torn")), "idx")
    shutil.copytree(idx, dup2)
    with open(os.path.join(dup2, "term_stats.parquet"), "ab") as f:
        f.write(b"xx")
    assert expand_patterns(dup2, pats, max_terms=7) == want
    # distributed path over the per-segment fallback source agrees too
    assert expand_patterns(dup, pats, max_terms=7, spark=spark,
                           driver_budget_bytes=0) == want


def test_expand_distributed_empty_patterns(spark, rx_index):
    from jvector_spark.operators.regex import expand_patterns

    idx, _ = rx_index
    assert expand_patterns(idx, {}, spark=spark,
                           driver_budget_bytes=0) == {}

"""Fuzzy term search: edit-distance dictionary expansion + exact BM25.

Lucene-style FuzzyQuery semantics re-expressed for the segment index: a
query term matches every DICTIONARY term within a bounded Levenshtein
distance (insert/delete/substitute, unit cost — the same function DuckDB
exposes as `levenshtein`, which is what makes the driver oracle a plain
vocabulary join), and the query scores as the OR of the expanded terms
with each term's own idf — exactly `wand.search_index` over the expanded
term list, so block-max pruning, tombstones, filters, and the merge
contract all come for free.

Scale shape (same as regex.expand_patterns): the expansion runs over the
index-level term_stats.parquet hot tier — one Arrow scan for ALL queries,
never touching postings; vocabulary candidates are length-filtered
(|len(t) - len(q)| <= dist) before a VECTORIZED Wagner-Fischer DP that
advances all surviving candidates one query-character per step — O(len(q)
* maxlen) numpy ops per batch regardless of candidate count. `max_terms`
caps adversarial expansions (dist 2 on a 2-char term) keeping highest-df
terms, deterministic tie-break on the term string.

Reference anchor: dictionary-driven candidate expansion (hierarchy
descent -> dictionary seek, SURVEY §2.3); the fuzzy surface itself is the
text-engine extension row (§2.11), sibling of regex/phrase.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow.dataset as ds
from pyspark.sql import DataFrame, SparkSession


def levenshtein_leq(query: str, terms: np.ndarray, max_dist: int) -> np.ndarray:
    """Boolean mask: levenshtein(query, terms[i]) <= max_dist, computed
    for ALL candidates at once (rows advance together through the DP).

    Plain Levenshtein — a transposition costs 2, matching DuckDB."""
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=bool)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    keep = np.abs(lens - len(q)) <= max_dist
    if not keep.any():
        return keep
    cand = terms[keep]
    clens = lens[keep]
    maxlen = int(clens.max())
    mat = np.zeros((len(cand), maxlen), dtype=np.uint32)
    for i, t in enumerate(cand):
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    # dp[i, j] = distance(q[:row], cand[i][:j]); advance row-by-row
    dp = np.broadcast_to(
        np.arange(maxlen + 1, dtype=np.int64), (len(cand), maxlen + 1)
    ).copy()
    for r, qc in enumerate(q, start=1):
        new = np.empty_like(dp)
        new[:, 0] = r
        sub = dp[:, :-1] + (mat != qc)
        for j in range(1, maxlen + 1):
            new[:, j] = np.minimum(
                np.minimum(dp[:, j] + 1, new[:, j - 1] + 1), sub[:, j - 1]
            )
        dp = new
    dist = dp[np.arange(len(cand)), clens]
    out = np.zeros(n, dtype=bool)
    out[keep] = dist <= max_dist
    return out


def expand_fuzzy(
    index_dir: str,
    queries: dict[int, tuple[str, int]],
    max_terms: int = 10000,
) -> dict[int, list[str]]:
    """{qid: (term, max_dist)} -> {qid: matching dictionary terms} in ONE
    scan of term_stats.parquet (all queries per Arrow batch). Over-cap
    expansions keep the highest-df terms (tie-break on term string)."""
    from jvector_spark.sources.segment import vocab_dataset_paths

    # validated vocabulary source (hot tier when sha-consistent, else
    # the manifest's per-segment dictionaries — see vocab_dataset_paths)
    paths, aggregated = vocab_dataset_paths(index_dir)
    hits: dict[int, list[tuple[int, str]]] = {qid: [] for qid in queries}
    if not paths:  # zero-segment index: ds.dataset([]) has no columns
        return {qid: [] for qid in queries}
    for batch in ds.dataset(paths).to_batches(columns=["term", "df"]):
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy()
        for qid, (qterm, dist) in queries.items():
            m = levenshtein_leq(qterm, terms, int(dist))
            if m.any():
                hits[qid].extend(zip(dfs[m].tolist(), terms[m].tolist()))
    out: dict[int, list[str]] = {}
    for qid, h in hits.items():
        if not aggregated and h:
            # per-segment dictionaries repeat a term per segment: sum to
            # global df so the cap ranks like the hot-tier path
            agg: dict[str, int] = {}
            for df, t in h:
                agg[t] = agg.get(t, 0) + int(df)
            h = [(df, t) for t, df in agg.items()]
        if len(h) > max_terms:
            h.sort(key=lambda x: (-x[0], x[1]))
            h = h[:max_terms]
        out[qid] = sorted(t for _, t in h)
    return out


def fuzzy_search_index(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    max_terms: int = 10000,
    merge: str = "spark",
    doc_filter: dict | None = None,
) -> DataFrame | pd.DataFrame:
    """queries(qid, term, dist, k) -> (qid, rank, docid, score).

    Expansion then exact BM25 OR-search over the expanded terms via
    wand.search_index — identical scoring/tie-break/merge contract to the
    plain term search (a fuzzy query IS a term query after expansion)."""
    from jvector_spark.operators.wand import search_index

    expansions = expand_fuzzy(
        index_dir,
        {int(q.qid): (str(q.term), int(q.dist)) for q in queries.itertuples()},
        max_terms,
    )
    qpdf = pd.DataFrame({
        "qid": [int(q.qid) for q in queries.itertuples()],
        "terms": [expansions[int(q.qid)] for q in queries.itertuples()],
        "k": [int(q.k) for q in queries.itertuples()],
    })
    return search_index(spark, index_dir, qpdf, num_tasks=num_tasks,
                        merge=merge, doc_filter=doc_filter)


def suggest_terms(
    index_dir: str,
    queries: dict[int, tuple[str, int]],
    n: int = 5,
) -> pd.DataFrame:
    """Spell suggestion ("did you mean"): for each query term, the top-n
    dictionary terms ranked (edit distance asc, df desc, term asc) —
    Lucene DirectSpellChecker semantics over the term_stats hot tier.

    Same one-scan shape as expand_fuzzy; the distance of a candidate is
    the smallest d in [0, max_dist] whose DP mask admits it (max_dist is
    small — <=2 in practice — so this costs at most 3 vectorized DP
    passes per query per batch). Returns (qid, rank, term, dist, df)."""
    from jvector_spark.sources.segment import vocab_dataset_paths

    paths, aggregated = vocab_dataset_paths(index_dir)
    hits: dict[int, list[tuple[int, int, str]]] = {q: [] for q in queries}
    if not paths:  # zero-segment index: same guard as expand_fuzzy
        return pd.DataFrame({
            "qid": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int32"),
            "term": pd.Series([], dtype=object),
            "dist": pd.Series([], dtype="int64"),
            "df": pd.Series([], dtype="int64")})
    for batch in ds.dataset(paths).to_batches(columns=["term", "df"]):
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        dfs = batch.column("df").to_numpy()
        for qid, (qterm, max_dist) in queries.items():
            assigned = np.zeros(len(terms), dtype=bool)
            for d in range(int(max_dist) + 1):
                m = levenshtein_leq(qterm, terms, d) & ~assigned
                if m.any():
                    assigned |= m
                    hits[qid].extend(
                        (d, int(df), t)
                        for df, t in zip(dfs[m].tolist(), terms[m].tolist())
                    )
    outs = []
    for qid in sorted(queries):
        h = hits[qid]
        if not aggregated and h:
            # a candidate's distance is segment-independent; only its df
            # needs summing across the per-segment dictionaries
            agg: dict[tuple[int, str], int] = {}
            for d, df, t in h:
                agg[(d, t)] = agg.get((d, t), 0) + df
            h = [(d, df, t) for (d, t), df in agg.items()]
        h = sorted(h, key=lambda x: (x[0], -x[1], x[2]))[:n]
        outs.append(pd.DataFrame({
            "qid": np.int64(qid),
            "rank": np.arange(len(h), dtype=np.int32),
            "term": [t for _, _, t in h],
            "dist": np.array([d for d, _, _ in h], dtype=np.int64),
            "df": np.array([df for _, df, _ in h], dtype=np.int64),
        }))
    return (pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
        {"qid": pd.Series([], dtype="int64"),
         "rank": pd.Series([], dtype="int32"),
         "term": pd.Series([], dtype=object),
         "dist": pd.Series([], dtype="int64"),
         "df": pd.Series([], dtype="int64")}))

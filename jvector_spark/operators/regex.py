"""Regex token search: grep-style identifier queries over the index.

The code-search capability a source-code index owes its users (north
star: "PySpark-native full-text index ... source-code corpora"): find
documents containing any TOKEN matching a regular expression, ranked by
total matching-token occurrences. The reference's analog surface is
dictionary-driven candidate expansion (hierarchy descent -> dictionary
seek, SURVEY §2.3): the regex never touches postings — it runs over the
TERM DICTIONARY (vocabulary-sized, the hot tier), then the matched terms'
posting lists aggregate per doc.

Scale shape:
  * expansion reads the index-level term_stats.parquet (one sorted file,
    ~one row per distinct term) driver-side in Arrow batches — at 10^12
    docs the vocabulary is millions of rows, still a single scan;
  * `max_terms` caps adversarial expansions (`.*` would match the whole
    vocabulary) — the heaviest-df terms win the cap, deterministically;
  * per segment, only matched terms decode; per-doc occurrence sums are
    partial-top-k bounded before the merge, same as wand.search_index.

Match semantics: UNANCHORED search (python re.search), the same semantics
as DuckDB/RE2 regexp_matches — which is what makes the driver oracle a
plain `JOIN ... ON regexp_matches(term, pat)`.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow.dataset as ds
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jvector_spark.sources.segment import SegmentReader, load_manifest


def expand_patterns(
    index_dir: str, patterns: dict[int, str], max_terms: int = 10000
) -> dict[int, list[str]]:
    """{key: pattern} -> {key: matching dictionary terms} in ONE scan of
    term_stats.parquet: every pattern compiles up front and each Arrow
    batch is matched against all of them, so Q queries cost one vocabulary
    pass, not Q. Expansions exceeding max_terms keep the highest-df terms
    (deterministic tie-break on the term string)."""
    path = os.path.join(index_dir, "term_stats.parquet")
    rxs = {key: re.compile(p) for key, p in patterns.items()}
    hits: dict[int, list[tuple[int, str]]] = {key: [] for key in patterns}
    for batch in ds.dataset(path).to_batches(columns=["term", "df"]):
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_pylist()
        for key, rx in rxs.items():
            hits[key].extend(
                (d, t) for t, d in zip(terms, dfs) if rx.search(t))
    out: dict[int, list[str]] = {}
    for key, h in hits.items():
        if len(h) > max_terms:
            h.sort(key=lambda x: (-x[0], x[1]))
            h = h[:max_terms]
        out[key] = sorted(t for _, t in h)
    return out


def expand_pattern(
    index_dir: str, pattern: str, max_terms: int = 10000
) -> list[str]:
    """Single-pattern convenience wrapper over expand_patterns."""
    return expand_patterns(index_dir, {0: pattern}, max_terms)[0]


def regex_token_topk(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    max_terms: int = 10000,
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """queries(qid, pattern, k) -> (qid, rank, docid, n_occ).

    n_occ = total occurrences of matching tokens in the doc (sum of tf
    over matched terms); rank: n_occ desc, docid asc, top-k per query.
    """
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    expansions = expand_patterns(
        index_dir,
        {int(q.qid): str(q.pattern) for q in queries.itertuples()},
        max_terms,
    )
    from jvector_spark.operators.wand import (
        empty_topk, merge_topk, scatter_paths)
    from jvector_spark.plans.merge import load_tombstones

    if not seg_paths:  # valid empty index
        return empty_topk(spark, "n_occ", merge)
    tomb = np.array(load_tombstones(index_dir), dtype=np.int64)
    sc = spark.sparkContext
    b_q = sc.broadcast(
        [(int(q.qid), expansions[int(q.qid)], int(q.k))
         for q in queries.itertuples()]
    )
    b_tomb = sc.broadcast(tomb)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        out = []
        for path in paths:
            reader = SegmentReader(path)
            for qid, terms, k in b_q.value:
                present = [t for t in terms if reader.has_term(t)]
                if not present:
                    continue
                parts_d, parts_n = [], []
                for t in present:
                    d, tf = reader.decode_term(t)
                    parts_d.append(d)
                    parts_n.append(tf)
                d = np.concatenate(parts_d)
                n = np.concatenate(parts_n)
                # per-doc occurrence sum (docids repeat across terms)
                uniq, inv = np.unique(d, return_inverse=True)
                occ = np.zeros(len(uniq), dtype=np.int64)
                np.add.at(occ, inv, n)
                tombs = b_tomb.value
                if len(tombs):
                    live = ~np.isin(uniq, tombs)
                    uniq, occ = uniq[live], occ[live]
                if not len(uniq):
                    continue
                # partial top-k bounds the shuffle
                top = np.lexsort((uniq, -occ))[:k]
                out.append(pd.DataFrame({
                    "qid": qid, "docid": uniq[top], "n_occ": occ[top]}))
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = paths_df.mapInPandas(run, "qid long, docid long, n_occ long")
    ks = {int(q.qid): int(q.k) for q in queries.itertuples()}
    return merge_topk(partial, ks, "n_occ", merge)

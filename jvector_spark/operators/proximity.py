"""Proximity (sloppy-window) queries over positional postings.

The second consumer of the per-posting payload stream (SURVEY §2.11
Feature plugin; phrase.py is the first): a document matches an UNORDERED
term set {t1..tm} at window-start i iff every term has at least one
occurrence inside [i, i+W-1].  `n_matches` counts the matching window
starts — the sloppy-phrase analog of Lucene's proximity scoring, with a
count ranking that keeps the operator ANSI-SQL-oracle-checkable
(n_matches desc, docid asc, like phrase_search).

Window-start domain: i in [0, max(dl-W, 0)] — a doc SHORTER than the
window is a single clipped window, so a 3-token doc containing both
terms of a W=8 query counts 1, not 0 (mirrors the oracle's
`greatest(len(ts)-W+1, 1)` range with clipped list_slice).

Scale shape: identical scatter/gather to phrase_search — queries
broadcast, segments the parallel dimension, candidates from the
conjunctive docid intersection FIRST (positions decode only for blocks
holding survivors), per-(segment,query) top-k cut before the shuffle.
The per-candidate window count is O(m * dl) numpy work via two
searchsorted sweeps per term, no per-token Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from jvector_spark.operators.phrase import _positions_by_doc
from jvector_spark.sources.segment import SegmentReader, load_manifest


def window_match_count(
    plists: list[np.ndarray], dl: int, window: int
) -> int:
    """Number of window starts i in [0, max(dl-window, 0)] whose span
    [i, i+window-1] contains ≥1 position from EVERY list in `plists`
    (each sorted ascending). Two searchsorted sweeps per term — O(m·dl)
    vectorized, no per-token Python."""
    n_starts = max(int(dl) - window + 1, 1)
    i = np.arange(n_starts, dtype=np.int64)
    ok = np.ones(n_starts, dtype=bool)
    for pj in plists:
        # term present in [i, i+W-1]  <=>  count of pj in [i, i+W) > 0
        ok &= np.searchsorted(pj, i + window, "left") > np.searchsorted(
            pj, i, "left"
        )
        if not ok.any():
            return 0
    return int(ok.sum())


def match_window_on_segment(
    reader: SegmentReader,
    terms: list[str],
    window: int,
    tombstones: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, n_matches) for one proximity query against one segment."""
    terms = sorted(set(terms))
    if not terms or not all(reader.has_term(t) for t in terms):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lists = {}
    for t in terms:
        d, _ = reader.decode_term(t)
        lists[t] = d
    cand = None
    for t in sorted(terms, key=lambda t: len(lists[t])):
        cand = lists[t] if cand is None else cand[
            np.isin(cand, lists[t], assume_unique=True)
        ]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if tombstones is not None and len(tombstones):
        cand = cand[~np.isin(cand, tombstones)]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)

    # positions per (term, candidate doc): list-of-arrays keyed by doc
    pos_by_doc: dict[int, list[np.ndarray]] = {int(c): [] for c in cand}
    for t in terms:
        d, tf, pos = _positions_by_doc(reader, t, cand)
        keep = np.isin(d, cand, assume_unique=True)
        occ = np.repeat(keep, tf)
        doc_of_occ = np.repeat(d, tf)[occ]
        p = pos[occ]
        order = np.argsort(doc_of_occ, kind="stable")
        doc_of_occ, p = doc_of_occ[order], p[order]
        bounds = np.searchsorted(doc_of_occ, cand)
        bounds = np.append(bounds, len(doc_of_occ))
        for ci, c in enumerate(cand):
            pos_by_doc[int(c)].append(np.sort(p[bounds[ci]:bounds[ci + 1]]))

    dls = reader.doclen(cand).astype(np.int64)
    out_d, out_n = [], []
    for c, dl in zip(cand, dls):
        n = window_match_count(pos_by_doc[int(c)], int(dl), window)
        if n:
            out_d.append(int(c))
            out_n.append(n)
    return (
        np.array(out_d, dtype=np.int64),
        np.array(out_n, dtype=np.int64),
    )


def proximity_search(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """queries(qid, terms:list[str], window:int, k) ->
    (qid, rank, docid, n_matches), ranked n_matches desc, docid asc."""
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    from jvector_spark.operators.wand import (
        empty_topk, merge_topk, scatter_paths)
    from jvector_spark.plans.merge import tombstone_view

    if not seg_paths:
        return empty_topk(spark, "n_matches", merge)
    if not manifest.get("has_positions"):
        raise ValueError(
            "index was built without positions=True — proximity queries "
            "need the positional payload stream")
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    sc = spark.sparkContext
    b_q = sc.broadcast(queries[["qid", "terms", "window", "k"]])
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        out = []
        for path in paths:
            reader = SegmentReader(path)
            if not reader.has_positions:
                continue
            tomb_l = tomb_view.for_segment(path)
            for q in b_q.value.itertuples():
                d, n = match_window_on_segment(
                    reader, list(q.terms), int(q.window), tomb_l)
                if len(d):
                    top = np.lexsort((d, -n))[: int(q.k)]
                    out.append(pd.DataFrame({
                        "qid": int(q.qid), "docid": d[top],
                        "n_matches": n[top]}))
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = paths_df.mapInPandas(run, "qid long, docid long, n_matches long")
    ks = {int(q.qid): int(q.k) for q in queries.itertuples()}
    return merge_topk(partial, ks, "n_matches", merge)

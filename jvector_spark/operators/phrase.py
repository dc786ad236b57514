"""Phrase queries over positional postings (the per-posting-payload path).

Reference mapping (SURVEY §2.11 Feature plugin): JVector attaches
per-node payloads via the Feature plugin surface (graph/disk/feature/
Feature.java, FusedADC/NVQ/SeparatedNVQ implementations — extra bytes
co-located with each record, read back during search). The inverted-index
analog is per-POSTING payloads: token positions, stored as a third
varint stream in the v2 segment format (`build_index(positions=True)`),
enabling exact phrase matching — the canonical consumer of positional
payloads.

Semantics: a phrase [t1..tm] matches doc d at anchor position p iff
position p+j-1 is in postings(tj, d) for every j. `n_matches` counts the
anchors. Scoring/ranking: n_matches desc, docid asc (count ranking keeps
the operator ANSI-SQL-oracle-checkable; feed matches into bm25 downstream
if a score is wanted).

Scale shape (same scatter/gather as wand.search_index): phrases broadcast;
segments are the parallel dimension; per segment, candidate docs come from
the docid-intersection of the phrase's term postings FIRST — positions
(the big stream) decode only for blocks containing surviving candidates.
Partial results are bounded at k per (segment, query) — a per-segment
lexsort cut in rank order, mergeable because top-k of n_matches composes
across segments — then merged by a window/driver rank like search_index.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from jvector_spark.functions.tokenizer import tokenize_series
from jvector_spark.sources.segment import SegmentReader, load_manifest


def _positions_by_doc(
    reader: SegmentReader, term: str, cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docids, tfs, flat_positions) restricted to blocks overlapping the
    sorted candidate docids (block-selective payload read)."""
    r = reader.term_row(term)
    first = np.asarray(r["block_first"], dtype=np.int64)
    last = np.asarray(r["block_last"], dtype=np.int64)
    lo = np.searchsorted(cand, first, side="left")
    overlap = lo < len(cand)
    overlap[overlap] &= cand[lo[overlap]] <= last[overlap]
    if not overlap.any():
        z = np.zeros(0, np.int64)
        return z, z, z
    return reader.decode_term_positions(term, overlap)


def match_phrase_on_segment(
    reader: SegmentReader,
    terms: list[str],
    tombstones: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, n_matches) of one phrase against one segment (exact)."""
    if not terms or not all(reader.has_term(t) for t in terms):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # candidate docs: intersect docid lists cheapest-first (no positions)
    lists = {}
    for t in set(terms):
        d, _ = reader.decode_term(t)
        lists[t] = d
    cand = None
    for t in sorted(set(terms), key=lambda t: len(lists[t])):
        cand = lists[t] if cand is None else cand[
            np.isin(cand, lists[t], assume_unique=True)
        ]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if tombstones is not None and len(tombstones):
        cand = cand[~np.isin(cand, tombstones)]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)

    # anchor set per candidate: positions of t1 shifted by 0, t2 by -1, ...
    # kept as (doc, anchor) pairs packed into one int64 key space. Docids
    # pack SEGMENT-RELATIVE (docids are dense-contiguous per segment), so
    # the key never overflows even at 10^12 global docids — segment spans
    # stay far below 2^31, positions below 2^32.
    base = np.int64(reader.meta["min_docid"])
    anchors = None
    # decode the positional payload once per UNIQUE term: a phrase like
    # "do re do re do" otherwise block-reads and varint-decodes the big
    # positions stream once per SLOT (5x instead of 2x here)
    pos_cache: dict[str, tuple] = {}
    for j, t in enumerate(terms):
        if t not in pos_cache:
            pos_cache[t] = _positions_by_doc(reader, t, cand)
        d, tf, pos = pos_cache[t]
        keep = np.isin(d, cand, assume_unique=True)
        occ = np.repeat(keep, tf)
        doc_of_occ = np.repeat(d, tf)[occ]
        p = pos[occ] - j  # anchor = position of tj minus its offset
        valid = p >= 0
        key = (doc_of_occ[valid] - base) * np.int64(1 << 32) + p[valid]
        key = np.unique(key)
        anchors = key if anchors is None else anchors[
            np.isin(anchors, key, assume_unique=True)
        ]
        if not len(anchors):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
    docs = (anchors >> np.int64(32)).astype(np.int64) + base
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq, counts.astype(np.int64)


def phrase_search(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """queries(qid, phrase:str, k) -> (qid, rank, docid, n_matches).

    The phrase tokenizes with the INDEX's tokenizer mode, so query and
    index agree on token boundaries. Ranking: n_matches desc, docid asc,
    top-k per query. Same distribution shape as wand.search_index.
    """
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    from jvector_spark.operators.wand import (
        empty_topk, merge_topk, scatter_paths)
    from jvector_spark.plans.merge import tombstone_view

    if not seg_paths:  # valid empty index (nothing can match any phrase)
        return empty_topk(spark, "n_matches", merge)
    if not manifest.get("has_positions"):
        raise ValueError(
            "index was built without positions=True — phrase queries need "
            "the positional payload stream")
    mode = manifest["tokenizer_mode"]
    qp = queries.copy()
    qp["terms"] = tokenize_series(qp["phrase"].astype(str), mode)
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    sc = spark.sparkContext
    b_q = sc.broadcast(qp[["qid", "terms", "k"]])
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
                d, n = match_phrase_on_segment(
                    reader, list(q.terms), tomb_l)
                if len(d):
                    # Bound the shuffle: per-(segment, query) top-k cut in
                    # rank order (n_matches desc, docid asc) — top-k is
                    # mergeable across segments, so a stop-word-ish phrase
                    # over a big segment emits k rows, not millions
                    # (mirrors regex.py's per-segment cut).
                    top = np.lexsort((d, -n))[: int(q.k)]
                    out.append(pd.DataFrame({
                        "qid": int(q.qid), "docid": d[top],
                        "n_matches": n[top]}))
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = paths_df.mapInPandas(run, "qid long, docid long, n_matches long")
    ks = {int(q.qid): int(q.k) for q in qp.itertuples()}
    return merge_topk(partial, ks, "n_matches", merge)

"""Block-max pruned top-k BM25 over segments (the GraphSearcher analog).

Reference mapping (SURVEY §3):
  * GraphSearcher beam search with bounded NodeQueue k-heap + early
    termination (GraphSearcher.searchOneLayer:387-451, stopSearch:340-351,
    NodeQueue.java:42-101) -> MaxScore/block-max pruned term-at-a-time
    scoring with a bounded per-query top-k and threshold θ.
  * Two-phase approx+rerank (reranking:465-501) -> block-max upper bounds
    (cheap, metadata-only) decide what to decode; exact BM25 scores what
    survives.
  * Multi-index combine with rerankFloor (GraphSearcher.java:368-385) ->
    θ propagates across segments scored sequentially in one task; the global
    merge is a partial-top-k union (per-segment top-k is a superset of each
    segment's contribution to the global top-k).
  * Tie-break contract (SearchResult.NodeScore.compareTo:101-106):
    score desc, docid asc — enforced via lexsort everywhere.

Exactness: pruning never changes results. A doc is only skipped when the sum
of block-max upper bounds of every term it could contain is STRICTLY below
θ (the current kth score), so it cannot enter the top-k even on a tie.
Scores accumulate in canonical sorted-term order in float64 — bit-identical
to the brute-force oracle.

All inner loops are numpy-vectorized; Python iterates only over query terms
(<=5) and segments.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jvector_spark import B, K1
from jvector_spark.sources.segment import (
    SegmentReader,
    block_meta_bounds,
    load_manifest,
)


def idf_map(n_docs: int, df_by_term: dict[str, int]) -> dict[str, float]:
    """Lucene-flavor idf per term (same constants as the oracle)."""
    return {
        t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
        for t, df in df_by_term.items()
    }


def global_term_stats(
    spark: SparkSession, index_dir: str, terms: list[str]
) -> dict[str, int]:
    """Global df for the query terms.

    Fast path: one driver-side pyarrow read of the index's hot-tier
    term_stats.parquet (written at build/compaction — the in-memory upper
    layer analog, OnDiskGraphIndex.java:83-84). Fallback for indexes
    without it: distributed aggregation over the per-segment dictionaries
    (term-filtered parquet scan, row-group pruned).
    """
    from jvector_spark.sources.segment import read_global_term_stats

    fast = read_global_term_stats(index_dir, list(terms))
    if fast is not None:
        return fast
    # enumerate the MANIFEST's segments, never a `seg-*` glob: a glob
    # also matches seg-*.tmp staging dirs (write_segment_files stages
    # terms.parquet there first) and crashed/unpublished orphan segments,
    # double-counting their df and silently skewing idf vs the
    # manifest's n_docs
    manifest = load_manifest(index_dir)
    dict_paths = [os.path.join(s["path"], "terms.parquet")
                  for s in manifest["segments"]]
    if not dict_paths:
        return {}
    rows = (
        spark.read.parquet(*dict_paths)
        .where(F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    return {r["term"]: int(r["df"]) for r in rows}


from pyspark.accumulators import AccumulatorParam


class _MetricsParam(AccumulatorParam):
    """AccumulatorParam for per-PARTITION {pid: {qid: counters}} maps.
    Each partition's entry REPLACES any previous one, so task retries,
    speculative attempts, and re-materializations of the result DataFrame
    cannot double-count (accumulators in transformations are at-least-
    once; replacement makes the per-partition contribution idempotent).
    The accumulation analog of the reference's per-search visited/expanded
    counters (GraphSearcher.java:67-69,93-103; SearchResult.java:27-31)."""

    def zero(self, value):
        return {}

    def addInPlace(self, a: dict, b: dict) -> dict:
        a.update(b)  # partition-keyed: last attempt wins
        return a


def make_metrics_accumulator(spark: SparkSession):
    """Create a per-query search-metrics accumulator to pass as
    search_index(metrics_acc=...). Read via read_metrics(acc) AFTER the
    result DataFrame is materialized (Spark accumulator semantics)."""
    return spark.sparkContext.accumulator({}, _MetricsParam())


def read_metrics(acc) -> dict:
    """{qid: counters} summed across partitions from a metrics
    accumulator (each partition contributed exactly once)."""
    out: dict = {}
    for counters_by_qid in acc.value.values():
        for qid, counters in counters_by_qid.items():
            dst = out.setdefault(qid, {})
            for k, v in counters.items():
                dst[k] = dst.get(k, 0) + v
    return out


def scatter_paths(spark: SparkSession, seg_paths: list[str],
                  num_tasks: int | None) -> DataFrame:
    """Segment paths -> a small DataFrame pre-sliced into num_tasks
    partitions (explicit numSlices — no repartition shuffle). Shared by
    every index-scatter operator (BM25/phrase/regex)."""
    if num_tasks is None:
        num_tasks = min(len(seg_paths),
                        int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    num_tasks = max(1, num_tasks)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(p,) for p in seg_paths], numSlices=num_tasks
        ),
        "path string",
    )


def _empty_result(value_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        "qid": pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int32"),
        "docid": pd.Series([], dtype="int64"),
        value_col: pd.Series(
            [], dtype="float64" if value_col == "score" else "int64"),
    })


def merge_topk(
    partial: DataFrame,
    ks: dict[int, int],
    value_col: str = "score",
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """Global top-k merge of per-task partial rows (qid, docid, value):
    rank by value desc, docid asc, bounded per query. merge="spark" is a
    lazy window (composable); merge="driver" collects the bounded partial
    rows and merges with one numpy lexsort per query — the caller-thread
    multi-index combine (GraphSearcher.java:368-385). Shared by
    search_index / phrase_search / regex_token_topk."""
    if merge == "driver":
        pdf = partial.toPandas()
        outs = []
        for qid, g in pdf.groupby("qid", sort=True):
            d = g["docid"].to_numpy(np.int64)
            v = g[value_col].to_numpy()
            order = np.lexsort((d, -v))[: ks[int(qid)]]
            outs.append(pd.DataFrame({
                "qid": np.int64(qid),
                "rank": np.arange(len(order), dtype=np.int32),
                "docid": d[order], value_col: v[order],
            }))
        return (pd.concat(outs, ignore_index=True)
                if outs else _empty_result(value_col))
    kmap = F.create_map(*[x for qid, k in ks.items()
                          for x in (F.lit(qid), F.lit(k))])
    w = Window.partitionBy("qid").orderBy(F.desc(value_col), F.asc("docid"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= kmap[F.col("qid")])
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"),
                "docid", value_col)
    )


def empty_topk(spark: SparkSession, value_col: str,
               merge: str) -> DataFrame | pd.DataFrame:
    """A valid empty result in either merge mode (zero-segment indexes —
    e.g. after an everything-tombstoned compaction — are legal)."""
    pdf = _empty_result(value_col)
    if merge == "driver":
        return pdf
    typ = "double" if value_col == "score" else "long"
    return spark.createDataFrame(
        pdf, f"qid long, rank int, docid long, {value_col} {typ}")


def _tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))


def score_query_on_segment(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    k: int,
    theta: float,
    avgdl: float,
    tombstones: np.ndarray | None = None,
    cache: dict | None = None,
    accept: np.ndarray | None = None,
    stats: dict | None = None,
    prune_epsilon: float = 0.0,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k (docids, scores) of one query against one segment,
    pruning with block-max bounds against incoming threshold theta.

    `prune_epsilon` > 0 switches to APPROXIMATE aggressive pruning (the
    relaxed-monotonicity analog, ScoreTracker.java:26-143 — skip
    expansion earlier than provably safe): every pruning decision
    (segment skip, MaxScore split, block generation) tests against
    theta * (1 + prune_epsilon) instead of theta, so borderline blocks
    whose upper bound clears theta by less than the margin never
    generate candidates. Scores of SURVIVING candidates stay exact —
    only recall is traded. Defaults to 0.0 (rank-identical mode), as
    the reference defaults builders to usePruning(false)
    (GraphIndexBuilder.java:330-334).

    `tombstones` (sorted int64) is the Bits-acceptOrds analog
    (GraphSearcher.search:202-214): excluded docids are dropped from the
    candidate set BEFORE scoring, applied inside the search, not post-hoc —
    deletes are visible to queries immediately while stats stay unchanged
    until compaction (2-phase delete, GraphIndexBuilder.java:684-805).

    `cache` (per-segment dict, shared across the queries of one task) holds
    term rows, block upper-bound arrays, and full-term decodes — the analog
    of the reference's pooled searcher scratch reused across queries
    (GraphSearcher.java:51-57, ExplicitThreadLocal)."""
    terms = sorted({t for t in terms if t in idfs and reader.has_term(t)})
    if not terms:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if cache is None:
        cache = {}

    def term_row(t):
        key = ("row", t)
        if key not in cache:
            cache[key] = reader.term_row(t)
        return cache[key]

    def decode_full(t):
        key = ("full", t)
        if key not in cache:
            cache[key] = reader.decode_term(t)
        return cache[key]

    def contrib_full(t):
        """Full posting list scored once per segment, shared by every query
        containing t (precomputed-query-table analog, SURVEY §4 row 5)."""
        key = ("contrib", t)
        if key not in cache:
            d, tf = decode_full(t)
            cache[key] = (d, idfs[t] * _tf_norm(tf, reader.doclen(d), avgdl))
        return cache[key]

    rows = {t: term_row(t) for t in terms}
    block_ub: dict[str, np.ndarray] = {}
    term_ub = np.empty(len(terms))
    for i, t in enumerate(terms):
        key = ("ub", t)
        if key not in cache:
            r = rows[t]
            # (max_tf, min_dl) per block — exact, or sound dequantized
            # bounds from an NVQ-quantized dictionary (tf ≥ true max,
            # dl ≤ true min; block_meta_bounds)
            mtf, mdl = block_meta_bounds(r)
            # same code path as the exact score (tf-norm is monotone in tf,
            # anti-monotone in dl, so (max_tf, min_dl) bounds every posting
            # in the block), inflated by 1e-9 relative so float rounding can
            # never put the bound below a real score — pruning must stay
            # sound at ties.
            cache[key] = idfs[t] * _tf_norm(mtf, mdl, avgdl) * (1.0 + 1e-9)
        block_ub[t] = cache[key]
        term_ub[i] = cache[key].max()

    blocks_total = int(sum(len(block_ub[t]) for t in terms))
    total_ub = float(term_ub.sum())
    # pruning threshold only — result membership still uses the true theta
    # upstream, and surviving candidates score exactly
    theta_p = theta * (1.0 + prune_epsilon) if prune_epsilon > 0.0 else theta
    if total_ub < theta_p:
        if stats is not None:
            stats["segments_skipped_ub"] = stats.get("segments_skipped_ub", 0) + 1
            stats["blocks_skipped"] = stats.get("blocks_skipped", 0) + blocks_total
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if stats is not None:
        stats["segments_visited"] = stats.get("segments_visited", 0) + 1
        stats["blocks_total"] = stats.get("blocks_total", 0) + blocks_total

    # MaxScore split: terms that cannot (even jointly) introduce a new
    # top-k doc generate no candidates; their postings are only gathered
    # for docs already in the candidate set.
    order = np.argsort(term_ub, kind="stable")
    csum = np.cumsum(term_ub[order])
    n_nonessential = int(np.searchsorted(csum, theta_p, side="left"))
    nonessential = {terms[i] for i in order[:n_nonessential]}

    # candidate generation with per-block skipping (BMW): a block whose
    # upper bound plus every other term's upper bound stays below theta
    # cannot introduce a new top-k doc by itself.
    gen: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    gen_mask: dict[str, np.ndarray] = {}
    cand_parts = []
    for i, t in enumerate(terms):
        if t in nonessential:
            gen_mask[t] = np.zeros(len(block_ub[t]), dtype=bool)
            continue
        other = total_ub - term_ub[i]
        mask = block_ub[t] + other >= theta_p
        gen_mask[t] = mask
        if stats is not None:
            stats["blocks_gen"] = stats.get("blocks_gen", 0) + int(mask.sum())
        if mask.all():
            d, tf = decode_full(t)
        elif (("full", t) in cache or t in cache.get("_hot", ())
              or cache.get("_pooled") or mask.mean() > 0.5):
            # slice the masked blocks out of the (cached) full decode —
            # pruning semantics preserved, decode amortized across queries
            d_full, tf_full = decode_full(t)
            ex = np.repeat(mask, np.asarray(rows[t]["block_n"], dtype=np.int64))
            d, tf = d_full[ex], tf_full[ex]
        else:
            d, tf = reader.decode_term(t, mask)
        gen[t] = (d, tf)
        cand_parts.append(d)
    if not cand_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    candidates = np.unique(np.concatenate(cand_parts))
    if accept is not None:
        # attribute-filter bitmap (acceptOrds): applied inside the search
        candidates = candidates[
            np.isin(candidates, accept, assume_unique=True)
        ]
    if tombstones is not None and len(tombstones):
        candidates = candidates[
            ~np.isin(candidates, tombstones, assume_unique=False)
        ]
    if not len(candidates):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if stats is not None:
        stats["candidates"] = stats.get("candidates", 0) + int(len(candidates))

    # exact scoring in canonical sorted-term order (oracle bit-parity)
    scores = np.zeros(len(candidates), dtype=np.float64)
    for t in terms:
        r = rows[t]
        if (("full", t) in cache or t in cache.get("_hot", ())
                or cache.get("_pooled")):
            d, c = contrib_full(t)
            pos = np.searchsorted(candidates, d)
            valid = pos < len(candidates)
            valid[valid] &= candidates[pos[valid]] == d[valid]
            scores[pos[valid]] += c[valid]
            if stats is not None:
                stats["postings_scored"] = (
                    stats.get("postings_scored", 0) + int(valid.sum())
                )
            continue
        parts_d, parts_tf = [], []
        if t in gen:
            parts_d.append(gen[t][0])
            parts_tf.append(gen[t][1])
        # gather pass: non-generating blocks that overlap the candidate
        # set (a fully-cached term can't reach here — the loop already
        # took the contrib_full shortcut above)
        gmask = ~gen_mask[t]
        if gmask.any():
            first = np.asarray(r["block_first"], dtype=np.int64)
            last = np.asarray(r["block_last"], dtype=np.int64)
            lo = np.searchsorted(candidates, first, side="left")
            overlap = (lo < len(candidates)) & gmask
            overlap[overlap] &= candidates[lo[overlap]] <= last[overlap]
            d, tf = (
                reader.decode_term(t, overlap)
                if overlap.any()
                else (np.zeros(0, np.int64), np.zeros(0, np.int64))
            )
            if len(d):
                idx = np.searchsorted(candidates, d)
                keep = (idx < len(candidates))
                keep[keep] &= candidates[idx[keep]] == d[keep]
                parts_d.append(d[keep])
                parts_tf.append(tf[keep])
        if not parts_d:
            continue
        d = np.concatenate(parts_d)
        tf = np.concatenate(parts_tf)
        if len(d) == 0:
            continue
        # membership check is mandatory: generated docids may have been
        # dropped from `candidates` by the tombstone filter
        pos = np.searchsorted(candidates, d)
        valid = pos < len(candidates)
        valid[valid] &= candidates[pos[valid]] == d[valid]
        if not valid.all():
            d, tf, pos = d[valid], tf[valid], pos[valid]
        if len(d) == 0:
            continue
        contrib = idfs[t] * _tf_norm(tf, reader.doclen(d), avgdl)
        # docids are unique within a term (gen/gather block sets are
        # disjoint), so fancy-index add is safe and faster than np.add.at
        scores[pos] += contrib
        if stats is not None:
            stats["postings_scored"] = (
                stats.get("postings_scored", 0) + int(len(d))
            )

    if after is not None:
        # cursor filter BEFORE the top-k cut: the segment may hold more
        # than k results at-or-before the cursor, and cutting first would
        # silently drop valid after-cursor rows (resume correctness)
        a_s, a_d = after
        keep = (scores < a_s) | ((scores == a_s) & (candidates > a_d))
        candidates, scores = candidates[keep], scores[keep]
    top = np.lexsort((candidates, -scores))[:k]
    return candidates[top], scores[top]


def score_conjunctive_on_segment(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    k: int,
    avgdl: float,
    tombstones: np.ndarray | None = None,
    cache: dict | None = None,
    accept: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive (AND) top-k: only docs containing EVERY query term
    score; scores are the same exact BM25 sums as the disjunctive path.
    Doc-partitioned segments decide the conjunction locally (all of a
    doc's postings live in its segment). Strict semantics: a query term
    that is OOV corpus-wide (or absent from this segment) empties the
    result — matching `HAVING count(DISTINCT term) = m` in SQL.

    Candidates come from a cheapest-first docid-list intersection (no
    block-max machinery needed — the intersection is already a stronger
    filter than theta); scoring reuses the shared per-segment caches.
    """
    uniq_terms = sorted(set(terms))
    if not uniq_terms or any(
        t not in idfs or not reader.has_term(t) for t in uniq_terms
    ):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if cache is None:
        cache = {}

    def decode_full(t):
        key = ("full", t)
        if key not in cache:
            cache[key] = reader.decode_term(t)
        return cache[key]

    def contrib_full(t):
        key = ("contrib", t)
        if key not in cache:
            d, tf = decode_full(t)
            cache[key] = (d, idfs[t] * _tf_norm(tf, reader.doclen(d), avgdl))
        return cache[key]

    lists = {t: decode_full(t)[0] for t in uniq_terms}
    cand = None
    for t in sorted(uniq_terms, key=lambda t: len(lists[t])):
        cand = lists[t] if cand is None else cand[
            np.isin(cand, lists[t], assume_unique=True)
        ]
        if not len(cand):
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if accept is not None:
        cand = cand[np.isin(cand, accept, assume_unique=True)]
    if tombstones is not None and len(tombstones):
        cand = cand[~np.isin(cand, tombstones)]
    if not len(cand):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    scores = np.zeros(len(cand), dtype=np.float64)
    for t in uniq_terms:  # canonical sorted order (oracle bit-parity)
        d, c = contrib_full(t)
        pos = np.searchsorted(d, cand)
        scores += c[pos]  # every candidate is in every list by construction
    if after is not None:  # cursor filter before the cut (see disjunctive)
        a_s, a_d = after
        keep = (scores < a_s) | ((scores == a_s) & (cand > a_d))
        cand, scores = cand[keep], scores[keep]
    top = np.lexsort((cand, -scores))[:k]
    return cand[top], scores[top]


class _TopK:
    """Per-query bounded top-k accumulator across segments (the NodeQueue /
    BoundedLongHeap analog, util/BoundedLongHeap.java:33-80)."""

    __slots__ = ("k", "docids", "scores")

    def __init__(self, k: int):
        self.k = k
        self.docids = np.zeros(0, np.int64)
        self.scores = np.zeros(0, np.float64)

    def push(self, docids: np.ndarray, scores: np.ndarray) -> None:
        if len(docids) == 0:
            return
        d = np.concatenate([self.docids, docids])
        s = np.concatenate([self.scores, scores])
        order = np.lexsort((d, -s))[: self.k]
        self.docids, self.scores = d[order], s[order]

    @property
    def theta(self) -> float:
        """kth best score so far — the pruning threshold (WAND θ; analog of
        stopSearch's worst-of-topK, GraphSearcher.java:340-351). k=0 (a
        legal degenerate query) holds nothing: θ=+inf prunes every block
        and the query returns no rows instead of crashing on scores[-1]."""
        if self.k <= 0:
            return float("inf")
        return float(self.scores[-1]) if len(self.scores) >= self.k else 0.0


def _filter_key(doc_filter: dict) -> tuple:
    """Canonical hashable key for a doc-attribute filter (list/tuple/set
    values normalize to sorted tuples; range dicts to sorted op items)."""

    def canon(v):
        if isinstance(v, dict):
            return ("__range__",) + tuple(sorted(v.items()))
        if isinstance(v, (list, tuple, set)):
            return tuple(sorted(v))
        return v

    return tuple((c, canon(v)) for c, v in sorted(doc_filter.items()))


class SearcherPool:
    """Pooled per-segment readers, score caches and blooms for warm
    serving — the reference's pooled-searcher surface (ExplicitThreadLocal
    GraphSearchers in GraphSearcher.java:51-57; long-lived CREATE/SEARCH
    sessions in examples IPCService.java:80-87). One pool serves many
    request batches against one index GENERATION: term-row/upper-bound/
    full-decode caches persist across requests (they depend only on the
    index bytes + global idf, both fixed per generation), so a warm
    request pays zero dictionary re-reads. Call reset() when the manifest
    changes (append/compaction)."""

    __slots__ = ("readers", "caches", "blooms")

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.readers: dict[str, SegmentReader] = {}
        self.caches: dict[str, dict] = {}
        self.blooms: dict[str, object] = {}

    def reader(self, path: str) -> SegmentReader:
        r = self.readers.get(path)
        if r is None:
            r = self.readers[path] = SegmentReader(path)
        return r

    def cache(self, path: str) -> dict:
        c = self.caches.get(path)
        if c is None:
            c = self.caches[path] = {}
        return c

    def bloom(self, path: str):
        if path not in self.blooms:
            from jvector_spark.sources.segment import load_term_bloom

            self.blooms[path] = load_term_bloom(path)
        return self.blooms[path]


def search_partition(
    seg_paths: list[str],
    queries: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    tombstones=None,  # np.ndarray | plans.merge.TombstoneView | None
    doc_filter: dict | None = None,
    min_score: float = 0.0,
    after: dict | None = None,
    metrics: dict | None = None,
    mode: str = "or",
    pool: "SearcherPool | None" = None,
    exclude: dict | None = None,
    prune_epsilon: float = 0.0,
) -> pd.DataFrame:
    """Score all queries against a list of segments sequentially, θ
    propagating segment-to-segment (the multi-sstable rerankFloor pattern).

    `metrics`: optional {qid: counters} dict updated in place with
    per-query work counters (segments visited/skipped, block totals,
    candidates, postings scored) — see make_metrics_accumulator.

    doc_filter: attribute conjunction evaluated per segment (acceptOrds).
    min_score:  threshold-query mode — only scores >= min_score return,
                and the bound doubles as a pruning floor
                (GraphSearcher threshold queries, GraphSearcher.java:192-195).
    after:      {qid: (score, docid)} search-after cursors — only results
                strictly after the cursor in (score desc, docid asc) order
                return (the resume()/pagination analog,
                GraphSearcher.java:503-541).
    exclude:    {qid: array-of-docids} per-QUERY exclusions — the
                self-exclusion predicate (the reference's Bits.without /
                "don't return the query's own node" filter used by
                more-like-this style searches). Applied by unioning into
                the tombstone mask per query, i.e. INSIDE the segment
                scorer before its top-k cut, so an excluded doc can never
                displace a returned one.
    """
    states = {
        int(q.qid): _TopK(int(q.k)) for q in queries.itertuples()
    }
    qterms = {int(q.qid): list(q.terms) for q in queries.itertuples()}
    after = after or {}
    exclude = exclude or {}
    qex = {qid: np.asarray(exclude[qid], dtype=np.int64)
           for qid in states
           if exclude.get(qid) is not None and len(exclude[qid])}

    # tombstones may be a flat array (serving pool / tests) or a
    # TombstoneView resolving PER SEGMENT (the scale path: each task reads
    # only its segments' shards, never the global delete list)
    per_segment_tomb = hasattr(tombstones, "for_segment")
    if per_segment_tomb and getattr(tombstones, "inline", None) is not None:
        # inline regime: for_segment returns the SAME array for every
        # segment — hoist the per-query tombstone/exclude union out of the
        # segment loop (S×Q identical union1d calls on the warm hot path)
        tombstones = tombstones.inline
        per_segment_tomb = False

    def _qtomb(seg_tomb: np.ndarray | None) -> dict[int, np.ndarray | None]:
        out: dict[int, np.ndarray | None] = {}
        for qid in states:
            ex = qex.get(qid)
            if ex is None:
                out[qid] = seg_tomb
            elif seg_tomb is None or not len(seg_tomb):
                out[qid] = ex
            else:
                out[qid] = np.union1d(seg_tomb, ex)
        return out

    if not per_segment_tomb:
        qtomb = _qtomb(tombstones)
    # terms shared by >=2 queries always decode fully (once, cached) —
    # repeated partial block decodes of the same hot term cost more than
    # one full decode amortized across the batch
    from collections import Counter

    usage = Counter(t for ts in qterms.values() for t in set(ts))
    hot = frozenset(t for t, n in usage.items() if n >= 2)
    all_terms = [t for t in usage if t in idfs]
    from jvector_spark.sources.segment import bloom_may_contain, load_term_bloom

    for path in seg_paths:
        # term-presence bloom (BQ 1-bit sketch analog): a segment whose
        # bloom rejects EVERY query term never opens its dictionary —
        # at thousands of segments this skips whole-segment loads for
        # selective vocabularies (FP-safe: false positives only cost the
        # normal lookup; absent bloom.bin = pre-bloom segment, no skip)
        bloom = pool.bloom(path) if pool is not None else load_term_bloom(path)
        if bloom is not None and all_terms and not any(
            bloom_may_contain(bloom, t) for t in all_terms
        ):
            if metrics is not None:
                for qid in states:
                    qs = metrics.setdefault(qid, {})
                    qs["segments_bloom_skipped"] = (
                        qs.get("segments_bloom_skipped", 0) + 1
                    )
            continue
        if pool is not None:
            reader = pool.reader(path)
            seg_cache = pool.cache(path)
            seg_cache["_hot"] = hot  # hot set is per request batch
            # pooled caches outlive the batch: partial block decodes of a
            # term would repeat every request, so pooled mode decodes
            # terms FULLY into the generation-scoped cache and scores
            # from cached per-term contributions thereafter — the warm
            # in-memory index trade (results identical; only which bytes
            # get decoded when changes)
            seg_cache["_pooled"] = True
        else:
            reader = SegmentReader(path)
            seg_cache = {"_hot": hot}  # shared across this segment's queries
        if per_segment_tomb:
            # shard read bounded by THIS segment's deletes (one small
            # parquet, or the inline array when the index's delete list
            # is small enough to ship in the closure). With no per-query
            # excludes every entry is the same seg_tomb reference —
            # build that dict directly rather than S×Q union passes
            seg_tomb = tombstones.for_segment(path)
            qtomb = ({qid: seg_tomb for qid in states} if not qex
                     else _qtomb(seg_tomb))
        accept = None
        if doc_filter:
            # memo per (segment, filter): ONE docs-sidecar read per
            # segment per filter — across the batch's queries here, and
            # across request batches when a pool persists the cache
            # (the reference caches its Bits acceptOrds per View)
            fkey = ("accept", _filter_key(doc_filter))
            accept = seg_cache.get(fkey)
            if accept is None:
                accept = seg_cache[fkey] = reader.accepted_docids(doc_filter)
        for qid, st in states.items():
            qstats = metrics.setdefault(qid, {}) if metrics is not None else None
            # the cursor applies INSIDE the scorer, before its top-k cut —
            # a segment may hold more than k results at-or-before the
            # cursor, and a post-hoc filter on an already-cut top-k would
            # silently drop valid after-cursor rows
            q_after = after.get(qid)
            if mode == "and":
                d, s = score_conjunctive_on_segment(
                    reader, qterms[qid], idfs, st.k, avgdl, qtomb[qid],
                    seg_cache, accept, after=q_after,
                )
            else:
                d, s = score_query_on_segment(
                    reader, qterms[qid], idfs, st.k,
                    max(st.theta, min_score), avgdl, qtomb[qid],
                    seg_cache, accept, qstats, prune_epsilon,
                    after=q_after,
                )
            if min_score > 0.0 and len(s):
                # membership at the floor compares RAW float64 sums on
                # both engine and oracle sides; a doc whose true score
                # sits within ~1 ulp of min_score could flip between
                # engines with different summation orders (the same
                # boundary class the top-k cutoff neutralizes with
                # k_mult slack). Accepted: BM25 terms are irrational
                # idf×tf ratios, so fixture scores never land on the
                # round decimal thresholds queries use; a caller with a
                # score-derived floor should pad it by ~1e-9.
                keep = s >= min_score
                d, s = d[keep], s[keep]
            st.push(d, s)
    out = [
        pd.DataFrame({"qid": qid, "docid": st.docids, "score": st.scores})
        for qid, st in states.items()
        if len(st.docids)
    ]
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                           "docid": pd.Series([], dtype="int64"),
                           "score": pd.Series([], dtype="float64")})
    )


def search_index(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
    min_score: float = 0.0,
    after: dict | None = None,
    metrics_acc=None,
    merge: str = "spark",
    mode: str = "or",
    exclude: dict | None = None,
    prune_epsilon: float = 0.0,
) -> DataFrame | pd.DataFrame:
    """Distributed top-k BM25: scatter segments over tasks, per-task partial
    top-k (bounded k rows per query per task), global TakeOrderedAndProject
    merge. Returns (qid, rank, docid, score).

    merge="spark" (default): the global merge is a window row_number —
    composable lazily with downstream DataFrame ops. merge="driver":
    partial top-k rows (<= n_queries * k * n_tasks, bounded by
    construction) collect to the driver and merge in one numpy lexsort —
    the reference's own multi-index combine shape (GraphSearcher.java:
    368-385 merges per-index results on the caller thread). This removes
    a whole shuffle+window stage from the latency path and returns a
    PANDAS frame; use it for serving-style workloads where the result is
    consumed at the driver anyway.

    `metrics_acc` (from make_metrics_accumulator): per-query search-work
    counters accumulated across every task; read metrics_acc.value once the
    returned DataFrame has been materialized. This is the observability
    surface for pruning effectiveness in production (the reference's
    SearchResult.getVisitedCount contract, SearchResult.java:27-31).

    queries: pandas (qid:int, terms:list[str], k:int). Queries are broadcast
    (small); segments are the parallel dimension — at 10^12 docs this is
    thousands of segments fanned over the cluster, each task streaming its
    segments with θ propagation.

    prune_epsilon > 0 enables opt-in APPROXIMATE aggressive pruning
    (relaxed-monotonicity analog; see score_query_on_segment) — returned
    scores stay exact, recall is traded for fewer block decodes. Keep 0.0
    (default) for rank-identical mode.
    """
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    all_terms = sorted({t for ts in queries["terms"] for t in ts})
    dfm = global_term_stats(spark, index_dir, all_terms) if all_terms else {}
    idfs = idf_map(n_docs, dfm)
    from jvector_spark.plans.merge import tombstone_view

    # per-segment tombstone resolution: small delete lists ship inline in
    # the view; large ones resolve segment-side from parquet shards — the
    # driver never materializes (nor broadcasts) an unbounded delete list
    tomb = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))

    if not seg_paths:  # zero-segment index (everything-compacted) is valid
        return empty_topk(spark, "score", merge)
    sc = spark.sparkContext
    b_q = sc.broadcast(queries[["qid", "terms", "k"]])
    b_idfs = sc.broadcast(idfs)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        if paths:
            task_metrics: dict | None = {} if metrics_acc is not None else None
            yield search_partition(
                paths, b_q.value, b_idfs.value, avgdl, tomb,
                doc_filter, min_score, after, task_metrics, mode,
                exclude=exclude, prune_epsilon=prune_epsilon,
            )
            if metrics_acc is not None:
                from pyspark import TaskContext

                tc = TaskContext.get()
                pid = tc.partitionId() if tc is not None else -1
                # keyed by partition: a retried/speculative attempt or a
                # re-materialization OVERWRITES its partition's entry
                # instead of double-counting (Spark only guarantees
                # exactly-once accumulators in actions)
                metrics_acc.add({pid: task_metrics})

    partial = paths_df.mapInPandas(run, "qid long, docid long, score double")
    ks = {int(q.qid): int(q.k) for q in queries.itertuples()}
    return merge_topk(partial, ks, "score", merge)


def explain_score(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    docid: int,
) -> dict:
    """Score EXPLAIN for one (query, doc) — the Lucene Explanation API
    analog: per-term (tf, df, idf, tf_norm, contribution) plus the exact
    float64 total, summed in the engine's canonical sorted-term order so
    `total` is bit-identical to the score search_index returns for the
    same doc. Serving-sized driver work: one segment lookup by docid
    range, block-selective postings decode per term."""
    from jvector_spark.plans.merge import tombstone_view

    manifest = load_manifest(index_dir)
    docid = int(docid)
    seg = next(
        (s for s in manifest["segments"]
         if s["min_docid"] <= docid <= s["max_docid"]), None)
    if seg is None:
        raise KeyError(f"docid {docid} not in any segment of {index_dir}")
    # one segment's shard, not the global delete list
    if docid in tombstone_view(
            index_dir, epoch=manifest.get("docid_epoch", 0)).for_segment(
            seg["path"]):
        return {"docid": docid, "deleted": True, "terms": {}, "total": 0.0}
    reader = SegmentReader(seg["path"])
    uniq = sorted({t for t in terms})
    dfm = global_term_stats(spark, index_dir, uniq)
    idfs = idf_map(manifest["n_docs"], dfm)
    dl = float(reader.doclen(np.array([docid], dtype=np.int64))[0])
    out: dict = {"docid": docid, "deleted": False, "dl": dl,
                 "avgdl": manifest["avgdl"], "terms": {}}
    total = 0.0
    for t in uniq:  # canonical order = exact summation-order parity
        if t not in idfs or not reader.has_term(t):
            out["terms"][t] = {"tf": 0, "df": dfm.get(t, 0),
                               "contribution": 0.0}
            continue
        d, tf = reader.decode_term(t)
        pos = np.searchsorted(d, docid)
        if pos >= len(d) or d[pos] != docid:
            out["terms"][t] = {"tf": 0, "df": dfm[t], "contribution": 0.0}
            continue
        tfv = float(tf[pos])
        norm = float(_tf_norm(np.array([tfv]), np.array([dl]),
                              manifest["avgdl"])[0])
        contrib = idfs[t] * norm
        out["terms"][t] = {
            "tf": int(tfv), "df": int(dfm[t]),
            "idf": idfs[t], "tf_norm": norm, "contribution": contrib,
        }
        total += contrib
    out["total"] = total
    return out

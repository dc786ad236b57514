"""Faceted search + field collapsing over the segment index.

The two result-shaping surfaces every fulltext UI needs next to top-k:

  * facet_counts   — per query, the distribution of an attribute column
                     over ALL matching docs (match = any query term, the
                     engine's OR semantics). Counts are computed segment-
                     locally from the docs sidecar (one column read per
                     (segment, col), cached on the reader) and reduced by
                     a tiny (qid × facet-value) shuffle — corpus rows
                     never shuffle, so the plan holds at 10^12 docs.
  * collapse_topk  — top-k GROUPS: each group (e.g. repo) represented by
                     its best-scoring doc (score desc, docid asc within
                     the group). Per-segment partials emit one row per
                     (query, group) — bounded by the segment's distinct
                     group count, independent of match count — and the
                     global merge is two window functions over those
                     bounded partials. Group-best is max(), so a group's
                     lower-scoring docs can never change the result:
                     per-segment reduction is exact, not approximate.

Reference anchors: filtered-search attribute plumbing
(GraphSearcher.java:202-214 acceptOrds from doc attributes) and the
multi-index result combine (GraphSearcher.java:368-385); the facet/
collapse shapes themselves are the text-engine surface (Lucene facets /
Elasticsearch field collapsing) the survey's §2.11 extension row points
at.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _matched_docids(reader, terms: list[str], tombstones, accept) -> np.ndarray:
    parts = [reader.decode_term(t)[0] for t in terms if reader.has_term(t)]
    if not parts:
        return np.zeros(0, np.int64)
    d = np.unique(np.concatenate(parts))
    if accept is not None:
        d = d[np.isin(d, accept, assume_unique=True)]
    if tombstones is not None and len(tombstones):
        d = d[~np.isin(d, tombstones)]
    return d


def _attr_values(reader, attr: str,
                 d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(docids, int64 attr values) for matched docids `d`, with NULL-attr
    docs DROPPED — SQL aggregate semantics (the oracle's `WHERE attr IS
    NOT NULL`): a null sidecar value must be excluded from min/max/sum
    and histogram bins, not crash the int64 cast. `dl` (the engine's own
    doc-length array) is never null and skips the mask."""
    if attr == "dl":
        return d, reader.doclen(d).astype(np.int64)
    raw = pd.Series(reader.doc_attribute(attr)[d - reader._min_docid])
    ok = raw.notna().to_numpy()
    vals = (np.asarray(raw.to_numpy(), dtype=np.float64) if ok.all()
            else np.asarray(raw[ok].tolist(), dtype=np.float64))
    # the int64 cast is a CONTRACT, not a coercion: truncating 9.99 to 9
    # would silently corrupt sort order, stats, and histogram bins for a
    # float attribute — refuse loudly instead (int-typed columns that
    # reach pandas as float64 via nulls are integral and pass)
    if len(vals) and not np.all(vals == np.floor(vals)):
        raise ValueError(
            f"attribute {attr!r} holds non-integral values — the "
            "attribute surface is integer-keyed (cast/scale the column, "
            "e.g. cents instead of dollars, before indexing)")
    return (d if ok.all() else d[ok]), vals.astype(np.int64)


def facet_counts(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    facet_col: str,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Per-query facet-value match counts: (qid, facet, n_docs).

    queries: pandas (qid:int, terms:list[str]). A doc counts once per
    facet value if it contains ANY query term (deleted docs excluded,
    doc_filter honored — the counts agree with what filtered search
    would return)."""
    from jvector_spark.operators.wand import scatter_paths
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    schema = "qid long, facet string, n_docs long"
    if not seg_paths:
        return spark.createDataFrame([], schema)
    sc = spark.sparkContext
    b_q = sc.broadcast(qterms)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        qt = b_q.value
        probe = sorted({t for ts in qt.values() for t in ts})
        for path in paths:
            bloom = load_term_bloom(path)
            if bloom is not None and probe and not any(
                bloom_may_contain(bloom, t) for t in probe
            ):
                continue
            reader = SegmentReader(path)
            tomb_l = tomb_view.for_segment(path)
            accept = reader.accepted_docids(doc_filter) if doc_filter else None
            vals = reader.doc_attribute(facet_col)
            cache: dict = {}
            for qid, terms in qt.items():
                key = tuple(terms)
                if key in cache:
                    counts = cache[key]
                else:
                    d = _matched_docids(reader, terms, tomb_l, accept)
                    # dropna=False: SQL GROUP BY keeps one NULL group —
                    # silently omitting null-attribute matches would
                    # under-count vs the oracle (collapse_topk already
                    # preserves the distinct null group the same way)
                    counts = cache[key] = (
                        pd.Series(vals[d - reader._min_docid])
                        .value_counts(dropna=False)
                        if len(d) else None
                    )
                if counts is not None and len(counts):
                    facet_vals = [
                        None if (v is None or (isinstance(v, float)
                                               and v != v))
                        else str(v)
                        for v in counts.index.tolist()]
                    yield pd.DataFrame({
                        "qid": np.int64(qid),
                        "facet": pd.Series(facet_vals, dtype=object),
                        "n_docs": counts.to_numpy(np.int64),
                    })

    partial = paths_df.mapInPandas(run, schema)
    # the only shuffle: |queries| x |facet values| rows, corpus-size-free
    return partial.groupBy("qid", "facet").agg(
        F.sum("n_docs").alias("n_docs")
    )


def collapse_topk(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    collapse_col: str,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Top-k groups per query, each represented by its best doc:
    (qid, group, docid, score) — ranked by the caller (group-best score
    desc, docid asc).

    queries: pandas (qid:int, terms:list[str], k:int). Matched docs are
    scored exactly (full BM25 sums, no pruning — every group must see its
    true best) and reduced to one row per (query, group) inside the
    segment task; group-best selection uses (round(score, 6) desc, docid
    asc) so the chosen representative agrees with the SQL oracle even at
    sub-1e-6 score ties."""
    from jvector_spark.operators.wand import (
        global_term_stats, idf_map, scatter_paths, score_query_on_segment,
    )
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    ks = {int(r.qid): int(r.k) for r in queries.itertuples()}
    all_t = sorted({t for ts in qterms.values() for t in ts})
    idfs = idf_map(n_docs, global_term_stats(spark, index_dir, all_t)
                   if all_t else {})
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    schema = "qid long, grp string, docid long, score double"
    if not seg_paths:
        return spark.createDataFrame([], schema)
    sc = spark.sparkContext
    b_q = sc.broadcast((qterms, ks))
    b_idfs = sc.broadcast(idfs)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        (qt, _), idfs_l = b_q.value, b_idfs.value
        probe = sorted({t for ts in qt.values() for t in ts})
        for path in paths:
            bloom = load_term_bloom(path)
            if bloom is not None and probe and not any(
                bloom_may_contain(bloom, t) for t in probe
            ):
                continue
            reader = SegmentReader(path)
            tomb_l = tomb_view.for_segment(path)
            accept = reader.accepted_docids(doc_filter) if doc_filter else None
            grp = reader.doc_attribute(collapse_col)
            cache: dict = {}
            for qid, terms in qt.items():
                # k=n_docs + theta=0 => exact full scoring of every match
                d, s = score_query_on_segment(
                    reader, terms, idfs_l, 1 << 62, 0.0, avgdl, tomb_l,
                    cache, accept,
                )
                if not len(d):
                    continue
                g = grp[d - reader._min_docid]
                # segment-local group-best: rounded-score desc, docid asc.
                # HALF_UP rounding (floor(x*1e6+0.5) for the nonnegative
                # BM25 scores), NOT np.round's half-to-even: the global
                # merge orders by Spark F.round (HALF_UP), and the two
                # phases must agree on which group member survives even
                # at an exact .5e-6 boundary
                s_key = np.floor(s * 1e6 + 0.5)
                order = np.lexsort((d, -s_key))
                # null collapse values stay SQL NULL (one distinct null
                # group, like GROUP BY) — never stringified to "None",
                # which would collide with a legitimate 'None' value
                g_sel = pd.Series(g[order])
                g_col = np.where(g_sel.notna(),
                                 g_sel.astype(str), None)
                pdf = pd.DataFrame({
                    "qid": np.int64(qid), "grp": g_col,
                    "docid": d[order], "score": s[order],
                }).drop_duplicates("grp", keep="first")
                yield pdf

    return paths_df.mapInPandas(run, schema)


def _sidecar_attr_best_signv(seg_path: str, attr: str,
                             sign: int) -> int | None:
    """Best achievable sign*attr in a segment, from the docs-parquet
    row-group STATISTICS (metadata-only — no row reads). None = stats
    unavailable (remote fs, missing column, no stats) -> caller fails
    open to a full scan. sign=-1 (desc) wants the max; sign=1 the min."""
    import os

    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(
            os.path.join(seg_path, "docs.parquet")).metadata
        vals = []
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                if col.path_in_schema == attr:
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        return None
                    vals.append(st.max if sign < 0 else st.min)
        if not vals:
            return None
        return int(sign * (max(vals) if sign < 0 else min(vals)))
    except Exception:
        return None


def sorted_scan_partition(
    paths: list[str],
    qterms: dict[int, list[str]],
    ks: dict[int, int],
    tombstones,  # np.ndarray | plans.merge.TombstoneView | None
    doc_filter: dict | None,
    attr: str,
    sign: int,
    reader_cls=None,
) -> Iterator[pd.DataFrame]:
    """One task's sorted-search scan over its segment list, with θ
    propagation + stats-based segment skip (see sorted_search). Module-
    level so the skip behavior is directly testable in-process;
    `reader_cls` lets tests observe which segments actually open."""
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_term_bloom,
    )

    if reader_cls is None:
        reader_cls = SegmentReader
    probe = sorted({t for ts in qterms.values() for t in ts})
    # kept sign*v values per query across THIS task's segments (the θ
    # state); θ_q = worst kept value once k are held
    kept: dict[int, np.ndarray] = {q: np.zeros(0, np.int64) for q in qterms}
    for path in paths:
        best_signv = _sidecar_attr_best_signv(path, attr, sign)
        if best_signv is not None and all(
            ks[q] <= 0 or (len(kept[q]) >= ks[q]
                           and best_signv > kept[q][-1])
            for q in qterms
        ):
            continue  # no query can improve: metadata-only skip
        bloom = load_term_bloom(path)
        if bloom is not None and probe and not any(
            bloom_may_contain(bloom, t) for t in probe
        ):
            continue
        reader = reader_cls(path)
        seg_tomb = (tombstones.for_segment(path)
                    if hasattr(tombstones, "for_segment") else tombstones)
        accept = reader.accepted_docids(doc_filter) if doc_filter else None
        cache: dict = {}
        for qid, terms in qterms.items():
            if ks[qid] <= 0:
                continue  # k=0: legal degenerate query, returns no rows
            if (best_signv is not None and len(kept[qid]) >= ks[qid]
                    and best_signv > kept[qid][-1]):
                continue  # this query is already beyond the segment
            key = tuple(terms)
            d = cache.get(key)
            if d is None:
                d = cache[key] = _matched_docids(
                    reader, terms, seg_tomb, accept)
            if not len(d):
                continue
            d, v = _attr_values(reader, attr, d)
            if not len(d):
                continue
            top = np.lexsort((d, sign * v))[: ks[qid]]
            kept[qid] = np.sort(
                np.concatenate((kept[qid], sign * v[top]))
            )[: ks[qid]]
            yield pd.DataFrame({
                "qid": np.int64(qid), "docid": d[top],
                "sort_key": v[top]})


def sorted_search(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    attr: str = "dl",
    ascending: bool = False,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """Match set ordered by a NUMERIC doc attribute instead of relevance
    (the Lucene Sort-by-field / ES `sort` surface — think "matching docs,
    newest first" with a timestamp column): (qid, rank, docid, sort_key),
    ranked (attr desc|asc, docid asc), top-k per query.

    queries: pandas (qid:int, terms:list[str], k:int); OR match semantics
    (any query term present), deletes excluded, doc_filter honored. No
    scores are computed — term postings decode docids only, and the
    attribute comes from the doclen array (`attr="dl"`) or one cached
    docs-sidecar column read per (segment, attr). Top-k by attribute is
    mergeable, so partials are cut to k per (segment, query) before the
    shuffle — the same bounded-merge scale shape as search_index.

    Segment-skip pruning (the attribute-sort analog of BM25's block-max +
    θ propagation): each task carries its kept top-k values per query
    across its segments; a segment whose attribute RANGE — read from the
    docs-parquet row-group statistics, a metadata-only read, no rows —
    cannot strictly beat every query's current k-th kept value is never
    opened (no postings decode, no sidecar row read). Ties process the
    segment (a tied value with a smaller docid can still win), so the
    result stays exact. Stats-less sidecars fail open to the full scan."""
    from jvector_spark.operators.wand import (
        empty_topk, merge_topk, scatter_paths)
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    ks = {int(r.qid): int(r.k) for r in queries.itertuples()}
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    if not seg_paths:
        return empty_topk(spark, "sort_key", merge)
    sc = spark.sparkContext
    b_q = sc.broadcast((qterms, ks))
    paths_df = scatter_paths(spark, seg_paths, num_tasks)
    sign = 1 if ascending else -1  # lexsort ascending on sign*v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        (qt, ks_l) = b_q.value
        yield from sorted_scan_partition(
            paths, qt, ks_l, tomb_view, doc_filter, attr, sign)

    partial = paths_df.mapInPandas(run, "qid long, docid long, sort_key long")
    if ascending:
        merged = merge_topk(
            partial.withColumn("sort_key", -F.col("sort_key")), ks,
            "sort_key", merge)
        if merge == "driver":
            merged["sort_key"] = -merged["sort_key"]
            return merged
        return merged.withColumn("sort_key", -F.col("sort_key"))
    return merge_topk(partial, ks, "sort_key", merge)


def rank_collapsed(partial: DataFrame, ks: dict[int, int]) -> DataFrame:
    """Global merge of collapse partials: best row per (qid, grp), then
    top-k groups per qid by (round(score,6) desc, docid asc). Returns
    (qid, rank, grp, docid, score) with rounded display scores."""
    from pyspark.sql import Window

    kmap = F.create_map(*[x for qid, k in ks.items()
                          for x in (F.lit(qid), F.lit(k))])
    w_g = Window.partitionBy("qid", "grp").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid"))
    w_q = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("docid"))
    return (
        partial.withColumn("grn", F.row_number().over(w_g))
        .where(F.col("grn") == 1)
        .withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") <= kmap[F.col("qid")])
        .select(
            F.col("qid").cast("long").alias("qid"),
            (F.col("rn") - 1).cast("int").alias("rank"),
            F.col("grp"),
            F.col("docid").cast("long").alias("docid"),
            F.round("score", 6).alias("score"),
        )
    )


def attr_stats(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    attr: str = "dl",
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Numeric stats aggregation over the match set (the ES metrics-agg
    surface next to facet_counts' terms-agg): per query,
    (qid, n_docs, min_attr, max_attr, sum_attr, avg_attr) of a sidecar
    attribute over all OR-matched docs (deletes excluded, doc_filter
    honored). Classic partial+final shape: each segment task emits ONE
    row per query (its local n/min/max/sum); the final reduce is a
    |queries|-row groupBy — corpus rows never shuffle. avg is derived
    from (sum, n) after the merge and rounded to 6 for cross-engine
    display parity."""
    from jvector_spark.operators.wand import scatter_paths
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    schema = ("qid long, n_docs long, min_attr long, max_attr long, "
              "sum_attr long")
    if not seg_paths:
        partial = spark.createDataFrame([], schema)
    else:
        sc = spark.sparkContext
        b_q = sc.broadcast(qterms)
        paths_df = scatter_paths(spark, seg_paths, num_tasks)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            paths = [p for pdf in batches for p in pdf["path"].tolist()]
            qt = b_q.value
            probe = sorted({t for ts in qt.values() for t in ts})
            for path in paths:
                bloom = load_term_bloom(path)
                if bloom is not None and probe and not any(
                    bloom_may_contain(bloom, t) for t in probe
                ):
                    continue
                reader = SegmentReader(path)
                tomb_l = tomb_view.for_segment(path)
                accept = (reader.accepted_docids(doc_filter)
                          if doc_filter else None)
                for qid, terms in qt.items():
                    d = _matched_docids(reader, terms, tomb_l, accept)
                    if not len(d):
                        continue
                    _, v = _attr_values(reader, attr, d)
                    if not len(v):
                        continue  # every matched doc had a null attr
                    yield pd.DataFrame({
                        "qid": [np.int64(qid)], "n_docs": [len(v)],
                        "min_attr": [int(v.min())],
                        "max_attr": [int(v.max())],
                        "sum_attr": [int(v.sum())]})

        partial = paths_df.mapInPandas(run, schema)
    return (
        partial.groupBy("qid").agg(
            F.sum("n_docs").alias("n_docs"),
            F.min("min_attr").alias("min_attr"),
            F.max("max_attr").alias("max_attr"),
            F.sum("sum_attr").alias("sum_attr"),
        )
        .withColumn("avg_attr", F.round(
            F.col("sum_attr") / F.col("n_docs"), 6))
    )


def attr_histogram(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    attr: str = "dl",
    bin_width: int = 10,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Histogram aggregation over the match set (the ES date_histogram /
    histogram-agg shape, with a numeric sidecar attribute standing in for
    the timestamp): (qid, bin, n_docs) where bin = floor(attr/width)*width.
    Same scale shape as facet_counts — per-segment binned counts, then a
    (qid × bins)-row final reduce; corpus rows never shuffle."""
    from jvector_spark.operators.wand import scatter_paths
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    schema = "qid long, bin long, n_docs long"
    if not seg_paths:
        return spark.createDataFrame([], schema)
    sc = spark.sparkContext
    b_q = sc.broadcast(qterms)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)
    w = int(bin_width)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        qt = b_q.value
        probe = sorted({t for ts in qt.values() for t in ts})
        for path in paths:
            bloom = load_term_bloom(path)
            if bloom is not None and probe and not any(
                bloom_may_contain(bloom, t) for t in probe
            ):
                continue
            reader = SegmentReader(path)
            tomb_l = tomb_view.for_segment(path)
            accept = (reader.accepted_docids(doc_filter)
                      if doc_filter else None)
            for qid, terms in qt.items():
                d = _matched_docids(reader, terms, tomb_l, accept)
                if not len(d):
                    continue
                _, v = _attr_values(reader, attr, d)
                if not len(v):
                    continue
                bins, counts = np.unique((v // w) * w, return_counts=True)
                yield pd.DataFrame({
                    "qid": np.int64(qid), "bin": bins,
                    "n_docs": counts.astype(np.int64)})

    partial = paths_df.mapInPandas(run, schema)
    return partial.groupBy("qid", "bin").agg(
        F.sum("n_docs").alias("n_docs"))


def match_export(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Exhaustive match export (the scroll/scan surface, and the corpus-
    filtering op a training-data pipeline runs: "every doc mentioning X"):
    (qid, docid) for ALL OR-matched docs — no top-k cut, deliberately.

    queries: pandas (qid:int, terms:list[str]). Output size is the true
    match cardinality; rows flow segment-task -> sink with NO shuffle at
    all (each docid belongs to exactly one segment, so no global dedup or
    merge is needed — the result is already disjoint across tasks). At
    10^12 docs this is the write-straight-to-parquet shape; bound it
    upstream with doc_filter if the match set must be narrowed."""
    from jvector_spark.operators.wand import scatter_paths
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    qterms = {int(r.qid): sorted(set(r.terms)) for r in queries.itertuples()}
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    schema = "qid long, docid long"
    if not seg_paths:
        return spark.createDataFrame([], schema)
    sc = spark.sparkContext
    b_q = sc.broadcast(qterms)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        qt = b_q.value
        probe = sorted({t for ts in qt.values() for t in ts})
        for path in paths:
            bloom = load_term_bloom(path)
            if bloom is not None and probe and not any(
                bloom_may_contain(bloom, t) for t in probe
            ):
                continue
            reader = SegmentReader(path)
            tomb_l = tomb_view.for_segment(path)
            accept = (reader.accepted_docids(doc_filter)
                      if doc_filter else None)
            for qid, terms in qt.items():
                d = _matched_docids(reader, terms, tomb_l, accept)
                if len(d):
                    yield pd.DataFrame({"qid": np.int64(qid), "docid": d})

    return paths_df.mapInPandas(run, schema)


def match_count(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
) -> DataFrame:
    """Total-hits count per query (the ES `_count` endpoint): (qid,
    n_docs) over the OR-match set. Rides match_export's shuffle-free
    scatter; the count is a Catalyst partial+final aggregate, so the only
    shuffled rows are |tasks| x |queries| partial counts."""
    return (
        match_export(spark, index_dir, queries, num_tasks, doc_filter)
        .groupBy("qid").agg(F.count("*").alias("n_docs"))
    )

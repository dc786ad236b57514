"""Top-k BM25 entirely in DataFrame ops (the Catalyst-native query path).

This is the declarative twin of the segment/WAND path: Catalyst gets the
whole plan (broadcast the tiny query-terms dim, partial+final aggregation for
per-(qid,docid) score sums, TakeOrderedAndProject-style per-query top-k), so
predicate pushdown / column pruning / AQE all apply. The segment path
(operators/wand.py) exists for the latency-optimized index-serving shape;
both must return rank-identical results.

Analog of reference entry point A — GraphSearcher.search one-shot top-k with
exact scoring (GraphSearcher.java:132-139): 'bind scoring' = the BM25 column
expression; 'bounded k-heap' = row_number over (score desc, docid asc) <= k,
the same tie-break as NodeQueue.encode (smaller id wins,
graph/NodeQueue.java:106-129).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark import B, K1


def bm25_score_expr(tf="tf", dl="dl", df="df", n_docs="n_docs", avgdl="avgdl"):
    """BM25 as a single JVM-side column expression (whole-stage codegen).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   [Lucene flavor]
    norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    tf_, dl_, df_ = (F.col(c).cast("double") for c in (tf, dl, df))
    n_, avg_ = F.col(n_docs).cast("double"), F.col(avgdl).cast("double")
    idf = F.log(F.lit(1.0) + (n_ - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))
    norm = tf_ * F.lit(K1 + 1.0) / (tf_ + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_ / avg_))
    return idf * norm


def bm25_scores(
    postings: DataFrame,
    term_stats: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Uncut per-doc scores: queries(qid, terms[, k]) ->
    (qid[, k], docid, score) for every doc matching >= 1 term.

    Plan shape (scale notes):
      * query terms exploded then BROADCAST into the postings join — the big
        side (postings) never shuffles for the join;
      * term_stats is joined into the broadcast side first (dictionary-sized);
      * score sum per (qid, docid) is a partial+final hash aggregate.
    """
    keep = ["qid", "k"] if "k" in queries.columns else ["qid"]
    qt = (
        queries.select(*keep, F.explode("terms").alias("term"))
        .dropDuplicates([*keep, "term"])
    )
    # dictionary-sized joins: (qid, term[, k], df); stays broadcast-able
    qt = qt.join(term_stats, "term", "inner")
    matched = F.broadcast(qt).join(postings, "term", "inner").crossJoin(
        F.broadcast(stats))
    scored = matched.select(
        *keep, "docid", bm25_score_expr().alias("contrib"),
    )
    return scored.groupBy(*keep, "docid").agg(F.sum("contrib").alias("score"))


def bm25_topk(
    postings: DataFrame,
    term_stats: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    default_k: int | None = None,
) -> DataFrame:
    """queries(qid, terms array<string>[, k]) -> (qid, rank, docid, score).
    Top-k per qid = window row_number bounded by k (rank-identical
    tie-break: score desc, docid asc) over `bm25_scores`."""
    if default_k is not None and "k" not in queries.columns:
        queries = queries.withColumn("k", F.lit(default_k))
    per_doc = bm25_scores(postings, term_stats, stats, queries)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        per_doc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("k"))
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), "docid", "score")
    )


def bm25_fielded_topk(
    fields: list[tuple[DataFrame, DataFrame, DataFrame, float]],
    queries: DataFrame,
) -> DataFrame:
    """Fielded (BM25F-style weighted-field) top-k: score(doc) =
    sum over fields of weight_f * BM25_f(query, doc), each field with its
    OWN postings/stats (content vs filename/source/title fields — the
    code-search pattern of boosting metadata matches).

    `fields`: [(postings, term_stats, corpus_stats, weight), ...].
    Combination happens on the UNCUT per-field scores (a doc strong in
    only one field must still compete), then one bounded window per qid.
    The per-(qid,docid) outer-merge is a hash aggregate over docs that
    matched >= 1 field — never corpus-sized.
    """
    parts = []
    for postings, tstats, cstats, weight in fields:
        s = bm25_scores(postings, tstats, cstats,
                        queries.select("qid", "terms"))
        parts.append(s.select(
            "qid", "docid", (F.col("score") * F.lit(float(weight))).alias("ws")
        ))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    per_doc = union.groupBy("qid", "docid").agg(F.sum("ws").alias("score"))
    ks = queries.select("qid", "k")
    per_doc = per_doc.join(F.broadcast(ks), "qid")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        per_doc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("k"))
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"), "docid", "score")
    )

"""Snippet / highlight extraction for search results.

Joins top-k results back to the source table and extracts, per (query,
doc), the first position where ANY query term occurs plus a +-window
token context — the result-rendering step every search engine owes its
users (the index stores postings, not text, so snippets read the source
of truth — same separation as the reference, whose index stores vectors
while payload rendering happens caller-side).

Pure Catalyst: tokens materialize once as a column attribute (the
standing re-inlining rule, docs/PLANS.md), the first-match scan is one
transform+filter over the token array, the context slice is
`slice(toks, start, len)`. Results (small) join docs by id; at scale the
docs side is the big table and the join is a broadcast of the results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jvector_spark.operators.textstats import with_tokens


def _first_match_pos(toks: Column, terms: Column) -> Column:
    """1-based position of the first token contained in `terms`
    (0 when none match)."""
    hits = F.filter(
        F.transform(
            toks,
            lambda t, i: F.when(F.array_contains(terms, t), i + 1).otherwise(0),
        ),
        lambda x: x > 0,
    )
    # F.get is null-safe on empty arrays (ANSI element_at throws)
    return F.coalesce(F.get(hits, 0), F.lit(0))


def first_match_snippets(
    docs: DataFrame,
    results: DataFrame,
    queries: DataFrame,
    window: int = 3,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(qid, docid, first_pos, snippet) for each result row.

    docs:    source table with `id_col` + `text`;
    results: (qid, docid) — e.g. top-k BM25 output;
    queries: (qid, terms array<string>) — broadcast (dictionary-sized).
    first_pos is the 1-based token index of the first query-term hit
    (0 if the doc matches no term — possible for conjunctive/filter
    pipelines feeding arbitrary doc lists); snippet is the +-window token
    context around it, space-joined.
    """
    toked = with_tokens(docs, id_col, text).select(
        F.col(id_col).alias("docid"), F.col("_toks")
    )
    joined = (
        results.select("qid", "docid")
        .join(toked, "docid")
        .join(F.broadcast(queries.select("qid", "terms")), "qid")
    )
    first = _first_match_pos(F.col("_toks"), F.col("terms"))
    n = F.size("_toks")
    start = F.greatest(F.lit(1), first - F.lit(window))
    end = F.least(n, first + F.lit(window))
    snippet = F.when(
        first > 0,
        F.concat_ws(" ", F.slice(F.col("_toks"), start, end - start + 1)),
    ).otherwise(F.lit(""))
    return joined.select(
        "qid", "docid",
        first.cast("long").alias("first_pos"),
        snippet.alias("snippet"),
    )

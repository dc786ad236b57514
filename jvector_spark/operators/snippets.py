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

from jvector_spark.operators.textstats import scale_out, tokens_col


def _mode_tokens_col(text: str, mode: str) -> Column:
    """Token-array expression matching the index's OWN analyzer: an index
    built in 'code' mode lowercases and extracts identifier runs, so
    snippets must tokenize the same way or array_contains never sees the
    query terms and every highlight renders empty. 'code' is the Catalyst
    twin of functions/tokenizer.CODE_TOKEN_RE (Spark lower() may disagree
    with Python str.lower() on exotic codepoints like U+0130 — a
    highlight-position concern only, never a correctness gate)."""
    if mode == "simple":
        return tokens_col(text)
    if mode == "code":
        return F.regexp_extract_all(
            F.lower(F.col(text)), F.lit("[A-Za-z_][A-Za-z0-9_]*"), F.lit(0))
    raise ValueError(f"unknown tokenizer mode {mode!r}")


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
    mode: str = "simple",
) -> DataFrame:
    """(qid, docid, first_pos, snippet) for EVERY result row.

    docs:    source table with `id_col` + `text`;
    results: (qid, docid) — e.g. top-k BM25 output;
    queries: (qid, terms array<string>) — broadcast (dictionary-sized);
    mode:    the INDEX's tokenizer mode ('simple' | 'code') — must match
             or highlights silently render empty.
    first_pos is the 1-based token index of the first query-term hit
    (0 if the doc matches no term — possible for conjunctive/filter
    pipelines feeding arbitrary doc lists); snippet is the +-window token
    context around it, space-joined. Result rows whose docid is missing
    from `docs` (stale index vs source) or whose qid is missing from
    `queries` keep their row with first_pos=0 and an empty snippet — the
    rendering layer must never show fewer rows than the ranked list it
    was handed.
    """
    toked = scale_out(docs).select(
        F.col(id_col).alias("docid"),
        _mode_tokens_col(text, mode).alias("_toks"),
    )
    empty_s = F.array().cast("array<string>")
    joined = (
        results.select("qid", "docid")
        .join(toked, "docid", "left")
        .join(F.broadcast(queries.select("qid", "terms")), "qid", "left")
        .select(
            "qid", "docid",
            F.coalesce(F.col("_toks"), empty_s).alias("_toks"),
            F.coalesce(F.col("terms"), empty_s).alias("terms"),
        )
        # materialize the O(n_tokens) first-match scan ONCE behind a
        # projection boundary — inlined it would evaluate 4x (condition,
        # start, end, output), the re-inlining rule this module cites
        .withColumn("_first",
                    _first_match_pos(F.col("_toks"), F.col("terms")))
    )
    first = F.col("_first")
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

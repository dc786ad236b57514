"""Posting construction + corpus statistics as DataFrame operators.

The analog of the reference's build fan-out (GraphIndexBuilder.build:441-453
parallel addGraphNode over ordinals) expressed as vectorized map-side work:
tokenize + per-doc term counting happen inside ONE mapInPandas pass with no
per-row Python (pandas explode + groupby are C-level), emitting
(docid, term, tf, dl) — tf is pre-aggregated map-side, so the only shuffles
left downstream are dictionary-sized (term stats), never token-stream-sized.

Skew mitigation (north rule: 'salted repartition of heavy terms, two-phase
DF aggregation'): `term_stats_salted` aggregates df/cf in two phases via an
explicit salt column, so a 10^11-posting term ('import') never lands on one
reducer. Catalyst's partial aggregation already does map-side combine for
groupBy.agg; the salted variant additionally randomizes the *reduce* fan-in
and is property-tested equal to the plain one.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jvector_spark.functions.tokenizer import tokenize_series

POSTINGS_SCHEMA = "docid long, term string, tf int, dl int"


def build_postings(docs: DataFrame, mode: str = "code",
                   content_col: str = "content") -> DataFrame:
    """(docid, content, ...) -> (docid, term, tf, dl), computed map-side."""

    def to_postings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_series(pdf[content_col], mode)
            lens = toks.map(len)
            if lens.sum() == 0:
                continue
            ex = pd.DataFrame({
                "docid": pdf["docid"].to_numpy().repeat(lens.to_numpy()),
                "term": [t for lst in toks for t in lst],
            })
            tf = ex.groupby(["docid", "term"], sort=False).size().rename("tf").reset_index()
            dl = pd.Series(lens.to_numpy(), index=pdf["docid"].to_numpy())
            if not dl.index.is_unique:
                # .map() on a duplicated index raises an opaque pandas
                # InvalidIndexError deep in the executor — name the
                # contract violation instead
                dupes = dl.index[dl.index.duplicated()][:5].tolist()
                raise ValueError(
                    f"duplicate docids in build_postings input: {dupes} "
                    "— docids must be unique (assign_dense_docids)")
            tf["dl"] = tf["docid"].map(dl)
            yield tf[["docid", "term", "tf", "dl"]]

    return docs.select("docid", content_col).mapInPandas(to_postings, POSTINGS_SCHEMA)


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(docid, dl) — one row per doc that has at least one token."""
    return postings.groupBy("docid").agg(F.first("dl").alias("dl"))


def corpus_stats(docs_with_len: DataFrame, dl_col: str = "dl") -> DataFrame:
    """Global N + avgdl (analog of approximateCentroid's full-corpus agg,
    BuildScoreProvider.java:112-123). Single-row result; partial+final agg."""
    return docs_with_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col(dl_col).cast("double")).alias("avgdl"),
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) dictionary — plain two-phase groupBy (Catalyst emits
    partial_count map-side + final merge)."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def term_stats_salted(postings: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Explicit two-phase salted aggregation for heavy-term skew.

    Phase 1 groups by (term, salt) — heavy terms fan out over `salt_buckets`
    reducers; phase 2 merges the per-salt partials. Equivalent results to
    `term_stats` (tested); use when a term's postings exceed one reducer.
    """
    salted = postings.withColumn(
        "_salt", (F.abs(F.hash("docid")) % F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy("term", "_salt").agg(
        F.count(F.lit(1)).alias("pdf"),
        F.sum("tf").alias("pcf"),
    )
    return partial.groupBy("term").agg(
        F.sum("pdf").alias("df"),
        F.sum("pcf").alias("cf"),
    )

"""Skew hardening (north rule: explicit term-frequency skew mitigation).

The doc-partitioned build is skew-immune by construction (a heavy term's
postings are spread across every docid-range segment — no task ever holds
one term's full posting list), so the skew surface is the TERM-KEYED
aggregations (df/cf dictionary) and the LSH bucket join. This file attacks
both with an adversarial corpus where one term dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from jvector_spark.operators.dedup import minhash_lsh_pairs
from jvector_spark.operators.postings import (
    build_postings,
    term_stats,
    term_stats_salted,
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """2,000 docs where 'import' appears in every doc with tf up to 200 —
    one term carries ~50% of all postings."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(2000):
        heavy = " ".join(["import"] * int(rng.integers(50, 201)))
        rare = f"uniq_{i} tail_{i % 97}"
        rows.append((i, f"{heavy} {rare}"))
    pdf = pd.DataFrame(rows, columns=["docid", "content"])
    return spark.createDataFrame(pdf).repartition(16)


def test_salted_stats_on_adversarial_skew(skewed_docs):
    postings = build_postings(skewed_docs)
    plain = term_stats(postings).toPandas().set_index("term")
    salted = term_stats_salted(postings, salt_buckets=16).toPandas().set_index("term")
    assert plain["df"].loc["import"] == 2000
    pd.testing.assert_frame_equal(
        plain.sort_index(), salted.sort_index(), check_like=True
    )


def test_salted_partials_actually_fan_out(skewed_docs, spark):
    """The salt must spread the heavy term over many reducers: the phase-1
    groupBy(term, salt) for 'import' must produce >1 partial row."""
    postings = build_postings(skewed_docs)
    salted = postings.withColumn(
        "_salt", (F.abs(F.hash("docid")) % F.lit(16)).cast("int")
    )
    partials = (
        salted.where(F.col("term") == "import")
        .groupBy("term", "_salt").count().toPandas()
    )
    assert len(partials) == 16  # heavy term fans out over all salt buckets


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """All-identical docs put every doc in the same LSH buckets; the bucket
    cap must bound the pair blowup to max_bucket choose 2."""
    pdf = pd.DataFrame({
        "doc_id": range(500),
        "text": ["the same exact document body repeated verbatim here"] * 500,
    })
    docs = spark.createDataFrame(pdf).repartition(8)
    pairs = minhash_lsh_pairs(docs, max_bucket=20).toPandas()
    assert len(pairs) == 20 * 19 // 2  # capped, not 500*499/2


def test_stratified_sample_deterministic_and_balanced(spark):
    """Hash-based stratified sampling: exact repeatability (no RNG state),
    per-stratum rates near the requested fractions, absent strata drop."""
    from jvector_spark.operators.textstats import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fr = {"en": 0.3, "de": 0.5}
    a = stratified_sample(docs, fr).select("doc_id").toPandas()
    b = stratified_sample(docs, fr).select("doc_id").toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # deterministic
    counts = (stratified_sample(docs, fr).groupBy("lang").count()
              .toPandas().set_index("lang")["count"].to_dict())
    totals = docs.groupBy("lang").count().toPandas() \
        .set_index("lang")["count"].to_dict()
    assert set(counts) <= set(fr)  # absent strata fully dropped
    for lang, f in fr.items():
        rate = counts.get(lang, 0) / totals[lang]
        assert abs(rate - f) < 0.15, (lang, rate)

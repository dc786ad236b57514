"""The fused single-pass signature/quality tables must equal the composed
per-family operators exactly (same values, zero shuffles): the fusion is a
plan optimization, never a semantic change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jvector_spark.operators.dedup import minhash_signatures, simhash
from jvector_spark.operators.textstats import (
    content_sha,
    doc_fingerprints,
    lang_id,
    quality_lang_table,
    quality_scores,
    signature_table,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)[sorted(pdf.columns)]


def test_signature_table_equals_composition(docs):
    fused = signature_table(docs)
    mh = (minhash_signatures(docs).groupBy("doc_id")
          .agg(F.expr("bit_xor(minhash)").cast("long").alias("minhash_xor")))
    composed = (doc_fingerprints(docs)
                .join(content_sha(docs), "doc_id")
                .join(simhash(docs).select(
                    "doc_id", F.col("simhash").cast("long")), "doc_id")
                .join(mh, "doc_id")
                .select("doc_id", "content_md5", "winnow_fp", "content_sha",
                        "simhash", "minhash_xor"))
    a, b = _sorted(fused), _sorted(composed)
    assert a.columns.tolist() == b.columns.tolist()
    assert a.equals(b)


def _assert_map_side_only(df):
    """No aggregation/join shuffle (hash or range exchange). The single
    round-robin exchange is scale_out widening a one-file scan — allowed,
    and absent on wide inputs (see test_scale_out_identity_when_wide)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1


def test_signature_table_shuffle_free(docs):
    _assert_map_side_only(signature_table(docs))


def test_scale_out_identity_when_wide(spark, docs):
    from jvector_spark.operators.textstats import scale_out

    wide = docs.repartition(spark.sparkContext.defaultParallelism)
    assert scale_out(wide) is wide


def test_quality_lang_table_equals_composition(docs):
    fused = quality_lang_table(docs)
    composed = quality_scores(docs).join(
        lang_id(docs).select("doc_id", "pred_lang"), "doc_id")
    a, b = _sorted(fused), _sorted(composed)
    assert a.columns.tolist() == b.columns.tolist()
    assert a.equals(b)


def test_quality_lang_table_shuffle_free(docs):
    _assert_map_side_only(quality_lang_table(docs))


def test_zero_token_docs_do_not_abort(spark):
    """Empty/whitespace documents yield NULL ppm ratios (try_divide —
    SQL's NULLIF divisor) instead of aborting the whole job under ANSI
    mode's DIVIDE_BY_ZERO; pred_lang falls to 'other' (review finding)."""
    from jvector_spark.operators.textstats import (
        lang_id, quality_lang_table, quality_scores)

    df = spark.createDataFrame(
        [(1, "hello world the of and"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    q = quality_scores(df).orderBy("doc_id").collect()
    assert q[0]["uniq_ppm"] is not None
    assert q[1]["uniq_ppm"] is None and q[1]["n_tokens"] == 0
    assert q[2]["quality_ppm"] is None
    li = lang_id(df).orderBy("doc_id").collect()
    assert li[0]["pred_lang"] == "en"
    assert li[1]["stop_ppm"] is None and li[1]["pred_lang"] == "other"
    ql = quality_lang_table(df).orderBy("doc_id").collect()
    assert ql[2]["pred_lang"] == "other" and ql[2]["uniq_ppm"] is None


def test_subword_stats_accepts_any_column_name(spark):
    """Column names are passed via native functions, not interpolated
    into SQL text — a name with a space must work (review finding)."""
    from jvector_spark.operators.textstats import subword_stats

    df = spark.createDataFrame(
        [(1, "abc123 def")], "doc_id long, `my text` string")
    got = subword_stats(df, text="my text").collect()[0]
    assert (got["n_subwords"], got["n_alpha"], got["n_num"]) == (3, 2, 1)


def test_doc_fingerprints_share_hash_with_dedup(spark):
    """doc_fingerprints' gram hash IS dedup.md5_hash60 (one oracle-synced
    definition): winnow_fp of a short doc equals md5_hash60(text)."""
    from pyspark.sql import functions as F

    from jvector_spark.operators.dedup import md5_hash60
    from jvector_spark.operators.textstats import doc_fingerprints

    df = spark.createDataFrame([(1, "short doc")], "doc_id long, text string")
    got = doc_fingerprints(df, shingle=8).collect()[0]
    exp = df.select(md5_hash60(F.col("text")).alias("h")).collect()[0]["h"]
    assert got["winnow_fp"] == exp

"""Per-vector 8-bit quantization (NVQ) for the ANN rerank tier.

Reference mapping: quantization/NVQuantization.java:42-155 — per-(sub)vector
8-bit codes with per-vector affine parameters (bias + scale), decoded on
the fly by NVQScorer (NVQScorer.java) for approximate similarity, with
exact rerank above it (the two-phase search contract,
GraphSearcher.search:209). Re-expressed Spark-first: encode / dequantize /
approximate-score are PURE Catalyst expressions (array_min / array_max /
transform / aggregate — whole-stage codegen, zero Python), so the
compressed scan is a map-side expression over the base table and the exact
rerank joins float vectors back for the SURVIVOR SET only.

Contract parity notes:
  * codes are floor((x - vmin) / delta + 0.5) with delta = (vmax - vmin)/255
    — explicit half-up rounding, identical in Spark and ANSI SQL (numpy
    round / DuckDB round would disagree on .5 ties);
  * a constant vector (vmax == vmin) encodes to all-zero codes with
    delta = 0 and dequantizes to vmin exactly;
  * approximate scores are round(cosine, 6) like every ANN surface here;
    the exact rerank re-scores survivors from the float column, so final
    top-k is EXACT whenever the survivor set covers it (rerank_k >= k
    coverage contract — same as the PQ/ADC tier).

vs PQ: NVQ has no codebook to train (encode is stateless per vector) and
reconstruction error is per-element bounded by delta/2, which makes it the
better rerank-tier memory format; PQ compresses harder (sub-byte per
dimension) and suits the first-pass scan. The reference ships both for the
same reason.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark.operators.ann import cosine_expr

LEVELS = 255  # 8-bit code range [0, 255]


def nvq_encode(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """+ (vmin double, delta double, codes array<int>): per-vector affine
    8-bit quantization, entirely map-side Catalyst (no shuffle, no UDF).

    The codes transform references the MATERIALIZED vmin/delta columns,
    never the array_min/array_max expressions directly — inlined, those
    re-evaluate per array ELEMENT inside the lambda (O(d²) per row; a
    measured ~40x slowdown at d=512), the re-inlining hazard
    docs/PLANS.md names."""
    v = F.col(vec_col)
    vmin = F.array_min(v).cast("double")
    vmax = F.array_max(v).cast("double")
    with_params = (vectors
                   .withColumn("vmin", vmin)
                   .withColumn("delta",
                               (vmax - F.col("vmin"))
                               / F.lit(float(LEVELS))))
    vmin_c, delta_c = F.col("vmin"), F.col("delta")
    code = F.transform(
        v,
        lambda x: F.when(delta_c == 0.0, F.lit(0)).otherwise(
            F.floor((x.cast("double") - vmin_c) / delta_c + F.lit(0.5))
        ).cast("int"),
    )
    return with_params.withColumn("codes", code)


def nvq_dequant_expr(codes="codes", vmin="vmin", delta="delta"):
    """array<double> reconstruction: vmin + code * delta (NVQScorer's
    on-the-fly decode)."""
    vmin_c, delta_c = F.col(vmin), F.col(delta)
    return F.transform(
        F.col(codes), lambda c: vmin_c + c.cast("double") * delta_c)


def nvq_rerank_topk(
    encoded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_k: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Two-phase search over NVQ codes: approximate cosine against the
    DEQUANTIZED vectors selects rerank_k survivors per query, partial
    top-k BEFORE the qid exchange — Spark's WindowGroupLimit rewrite
    places a Partial rank<=rerank_k cut BELOW the Exchange (visible in
    the executed plan), so only bounded survivors per (qid, scan
    partition) ever cross the wire — then the survivors' float vectors
    rerank exactly. (qid, rank, vec_id, score); scores are exact
    round(cosine, 6).

    `encoded` must carry both the NVQ columns (nvq_encode) and the float
    `vec_col` — the float column is only READ for survivor rows (column
    pruning keeps it out of the phase-1 scan when the source is parquet).
    """
    dq = nvq_dequant_expr()
    approx = encoded.join(F.broadcast(queries)).select(
        F.col(qid_col).alias("qid"),
        F.col(id_col),
        F.round(cosine_expr(F.col(qvec_col), dq), 6).alias("approx"),
    )
    wp = Window.partitionBy("qid", F.spark_partition_id()).orderBy(
        F.desc("approx"), F.asc(id_col))
    survivors = (
        approx.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= rerank_k)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("approx"), F.asc(id_col))),
        )
        .where(F.col("rn") <= rerank_k)
        .select("qid", id_col)
    )
    exact = (
        survivors
        .join(encoded.select(id_col, vec_col), on=id_col)
        .join(F.broadcast(queries), on=[(F.col("qid") == F.col(qid_col))]
              if qid_col != "qid" else "qid")
        .select(
            "qid", id_col,
            F.round(cosine_expr(F.col(qvec_col), F.col(vec_col)), 6)
            .alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", (F.col("rn") - 1).cast("int").alias("rank"),
                id_col, "score")
    )


def nvq_encode_np(X: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver/serving-side encode: (codes uint8, vmin f32, delta f32) with
    the SAME half-up rounding as the Catalyst expression (parity-tested).
    Memory: 1 byte/dim + 8 bytes/vector vs 8 bytes/dim resident floats."""
    X = np.asarray(X, dtype=np.float64)
    vmin = X.min(axis=1)
    vmax = X.max(axis=1)
    delta = (vmax - vmin) / LEVELS
    safe = np.where(delta == 0.0, 1.0, delta)
    codes = np.floor((X - vmin[:, None]) / safe[:, None] + 0.5)
    codes[delta == 0.0] = 0.0
    return (codes.astype(np.uint8), vmin.astype(np.float32),
            delta.astype(np.float32))


def nvq_dequant_np(codes: np.ndarray, vmin: np.ndarray,
                   delta: np.ndarray) -> np.ndarray:
    """float64 reconstruction of the uint8 codes."""
    return (vmin.astype(np.float64)[:, None]
            + codes.astype(np.float64) * delta.astype(np.float64)[:, None])

"""Binary Quantization: the reference's 1-bit/dim vector tier, on Spark.

Analog of `quantization/BinaryQuantization.java:88-110` + `BQVectors.java`
(SURVEY §2.8): each float compresses to ONE bit (`v[i] > 0` — the
reference deliberately dropped mean-centering, BinaryQuantization.java:124
"recording the center of the dataset actually degrades performance"),
packed little-endian into ceil(dim/64) int64 words
(`encodeTo:97-110`). Approximate similarity is
`1 - hamming(a, b) / dim` (`ImmutableBQVectors`/`BQVectors.java:117`),
and search is the usual two-phase contract: cheap Hamming scan over the
codes, exact cosine rerank of the survivors (rerankK >= topK,
GraphSearcher.search:209).

Spark-first design — this tier is 100% Catalyst, zero Python on the
scan path:
  * encode      — one higher-order-function expression per row
                  (transform/aggregate/shiftleft), whole-stage codegen
  * hamming     — zip_with(xor) + bit_count + aggregate, JVM popcount
  * phase-1 cut — two windowed top-k passes: per (query, input
                  partition) first, survivors-only per query second, so
                  the full-corpus scan never shuffles more than
                  rerank_k rows per partition per query
At 100 TB the phase-1 scan reads ONLY (id, bq_code) — a 64x narrower
column than the float vectors (column pruning does this for free), and
the rerank joins fetch float rows for survivors only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BQ_CODE_COL = "bq_code"


def _infer_dim(vectors: DataFrame, vec_col: str) -> int:
    from jvector_spark.operators.ann import _vec_dim

    return _vec_dim(vectors, vec_col)


def bq_encode_expr(vec_col: str, dim: int) -> Column:
    """Pure-Catalyst encode expression: array<long> of ceil(dim/64)
    words, bit j of word w set iff vec[64w + j] > 0
    (BinaryQuantization.encodeTo:97-110, same bit order)."""
    n_words = (dim + 63) // 64
    return F.expr(
        f"transform(sequence(0, {n_words - 1}), w -> "
        f"aggregate(sequence(w * 64, least(w * 64 + 63, {dim - 1})), "
        f"cast(0 as bigint), (acc, j) -> acc | "
        f"if(element_at({vec_col}, cast(j + 1 as int)) > cast(0 as double), "
        f"shiftleft(cast(1 as bigint), cast(j - w * 64 as int)), "
        f"cast(0 as bigint))))"
    )


def bq_encode(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, float vector, bq_code: array<long>). The float column is kept
    for the rerank join — at scale the codes live in the same row group,
    and phase 1's column pruning still reads only (id, bq_code)."""
    if dim is None:
        dim = _infer_dim(vectors, vec_col)
    return vectors.select(
        id_col, vec_col, bq_encode_expr(vec_col, dim).alias(BQ_CODE_COL)
    )


def hamming_expr(a: Column, b: Column) -> Column:
    """Popcount of XOR across the packed words — VectorUtil
    .hammingDistance analog, entirely JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def encode_query_codes(Q: np.ndarray) -> list[list[int]]:
    """Driver-side encode of a (small) query batch to packed int64 words,
    bit-identical to bq_encode_expr."""
    n, dim = Q.shape
    n_words = (dim + 63) // 64
    bits = (Q > 0).astype(np.uint8)
    pad = np.zeros((n, n_words * 64), dtype=np.uint8)
    pad[:, :dim] = bits
    # little-endian within each 64-bit word, matching shiftleft(1, j-64w)
    weights = (1 << np.arange(64, dtype=np.uint64))
    words = (pad.reshape(n, n_words, 64).astype(np.uint64) * weights).sum(
        axis=2, dtype=np.uint64
    )
    return [[int(x) for x in row.astype(np.int64)] for row in words]


def bq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Two-phase BQ search: Hamming-similarity scan over the 1-bit codes
    (approx = 1 - hamming/dim, BQVectors.java:117), exact cosine rerank
    of the top-rerank_k survivors. Returns (qid, rank, vec_id, score)
    with score = exact cosine — so with a covering survivor set the
    result is rank-identical to brute force and the SQL oracle applies.

    NOTE on covering budgets: one sign bit per dimension is the coarsest
    tier the reference ships; its Hamming ordering correlates with (not
    tracks) cosine, so the covering rerank_k is larger than PQ/NVQ's for
    the same corpus (tests/test_bq.py asserts the entry-contract budget
    covers at the fixture SFs). The scan-cost win survives: phase 1
    reads a 64x narrower column and the floats are fetched for
    survivors only.
    """
    if rerank_k is None:
        rerank_k = 4 * k
    if rerank_k < k:
        # the reference enforces rerankK >= topK (GraphSearcher
        # .search:209) — a smaller survivor pool silently returns fewer
        # than k rows
        raise ValueError(f"rerank_k ({rerank_k}) must be >= k ({k})")
    spark = encoded.sparkSession
    qpdf = queries.select(qid_col, qvec_col).toPandas()
    Q = np.stack(qpdf[qvec_col].to_numpy()).astype(np.float64)
    qcodes = encode_query_codes(Q)
    dim = Q.shape[1]
    qdf = F.broadcast(
        spark.createDataFrame(
            list(zip(qpdf[qid_col].astype(int).tolist(), qcodes,
                     [[float(x) for x in row] for row in Q])),
            f"{qid_col} long, _qcode array<long>, _qv array<double>",
        )
    )
    scanned = (
        encoded.select(id_col, BQ_CODE_COL)
        .join(qdf.select(qid_col, "_qcode"))  # broadcast nested loop: tiny q-side
        .select(
            qid_col, id_col,
            (F.lit(1.0) - hamming_expr(F.col(BQ_CODE_COL), F.col("_qcode"))
             / F.lit(float(dim))).alias("approx"),
        )
    )
    # two-phase top-k: per (query, input partition) first so the global
    # per-query window only sees rerank_k rows per partition
    wp = Window.partitionBy(qid_col, "_pid").orderBy(
        F.desc("approx"), F.asc(id_col))
    wg = Window.partitionBy(qid_col).orderBy(F.desc("approx"), F.asc(id_col))
    survivors = (
        scanned.withColumn("_pid", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= rerank_k)
        .withColumn("rn2", F.row_number().over(wg))
        .where(F.col("rn2") <= rerank_k)
        .select(qid_col, id_col)
    )
    from jvector_spark.operators.ann import exact_rerank

    return exact_rerank(
        survivors.join(encoded.select(id_col, vec_col), id_col),
        qdf.select(qid_col, "_qv"), k, id_col=id_col, vec_col=vec_col,
        qid_col=qid_col, qvec_col="_qv")

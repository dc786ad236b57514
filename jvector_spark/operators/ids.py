"""Dense, parallelism-stable docid assignment.

Analog of the reference's dense ordinals + OrdinalMapper
(jvector-base/.../graph/disk/OrdinalMapper.java:30-109;
sequentialRenumbering AbstractGraphIndexWriter.java:104-117).

docid = global sort rank over the key columns. NOT monotonically_increasing_id
(sparse, partition-dependent) and NOT a single-partition Window (driver-side
bottleneck at 10^12 rows). Implementation is the scalable two-pass scheme:

  1. range-repartition + sortWithinPartitions on the keys (one shuffle —
     the same shuffle a global orderBy would do);
  2. count rows per partition (tiny job), prefix-sum on the driver;
  3. mapInPandas adds offset + within-partition running index.

Because step 1+2 reproduce the exact global sort order, docids are identical
at any parallelism level (local[8] vs local[32] vs 1000 executors) — required
for the rank-identical and N-vs-4N determinism contracts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_docids(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns df + `docid:long`, densely numbered by sort order of key_cols.

    CONTRACT: key tuples must be UNIQUE (they are the corpus primary key
    — the dedup/replace paths enforce this). With duplicated keys the
    relative order of the duplicates — and therefore their docids — is
    shuffle-arrival-dependent (sortWithinPartitions has no further
    tie-break), breaking the any-parallelism determinism this function
    promises. Null keys sort FIRST (Spark asc_nulls_first); the pandas
    oracle twin matches with na_position='first'."""
    spark = df.sparkSession
    if "docid" in df.columns:
        raise ValueError(
            "input already has a 'docid' column — re-assigning would "
            "produce a duplicate-name schema (drop or rename it first)")
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = [F.col(c) for c in key_cols]
    sorted_df = df.repartitionByRange(num_partitions, *keys).sortWithinPartitions(*keys)
    sorted_df = sorted_df.persist()
    counts = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    boffsets = spark.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(sorted_df.schema.fields) + [StructField("docid", LongType())])

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = boffsets.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["docid"] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    out = sorted_df.mapInPandas(add_ids, schema=schema)
    # the persist is load-bearing BETWEEN the count job above and the
    # caller's consuming action (without it the second job re-shuffles
    # the whole corpus), but it must not pin the corpus in executor
    # memory for the session's lifetime — expose the handle so callers
    # release it once their terminal action finishes
    out._jv_persisted_source = sorted_df
    return out


def release_docid_source(df: DataFrame) -> None:
    """Unpersist the cached sorted corpus behind an assign_dense_docids
    result. Call after the consuming action (e.g. build_index) has
    materialized — long-lived sessions (warm serving, repeated CLI
    builds) otherwise keep the whole corpus pinned in executor cache."""
    src = getattr(df, "_jv_persisted_source", None)
    if src is not None:
        src.unpersist()

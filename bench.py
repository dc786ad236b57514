"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall time of the headline suite. `queries` carries
per-query seconds plus derived throughputs (index_build_files_per_sec,
bm25_queries_per_sec) as metadata keys prefixed with "_".

Environment:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)

Usage:
  python bench.py                 # headline run, one JSON line
  python bench.py --scaling       # run build+query at local[8] and
                                  # local[32], print scaling efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
INDEX_DIR = "/tmp/jvector_bench_index"
N_BM25_QUERIES = 200


def bench_queries(corpus_pdf: pd.DataFrame | None = None) -> pd.DataFrame:
    """The reference query set over the bench corpus (seeded, 200 queries,
    k in {10,100} — mirrors Bench.java:47-52 topK grid)."""
    from jvector_spark.corpus import generate_queries

    return generate_queries(corpus_pdf, n_queries=N_BM25_QUERIES, seed=42,
                            mode="simple")


def run_suite(spark, sf_dir: str, index_dir: str) -> dict[str, float]:
    """Build + query + pipeline operators; returns name -> seconds."""
    import __spark_entry__ as entry
    from jvector_spark.operators.wand import search_index
    from jvector_spark.sources.segment import build_index, load_manifest

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_files = docs.count()

    # 1. index build (files/sec headline)
    shutil.rmtree(index_dir, ignore_errors=True)
    sel = docs.select(F.col("doc_id").cast("long").alias("docid"), "text",
                      "source", "lang")
    timed("index_build", lambda: build_index(
        sel, index_dir, mode="simple",
        num_segments=int(spark.conf.get("spark.sql.shuffle.partitions")),
        content_col="text", key_cols=("source", "lang")))
    times["_index_build_files_per_sec"] = round(n_files / times["index_build"], 1)

    # 2. BM25 top-k via compressed segments + block-max pruning (q/s headline)
    docs_pdf = docs.select(F.col("text").alias("content")).toPandas()
    queries = bench_queries(docs_pdf)
    res = timed("bm25_search", lambda: search_index(
        spark, index_dir, queries).toPandas())
    assert len(res) > 0
    times["_bm25_queries_per_sec"] = round(N_BM25_QUERIES / times["bm25_search"], 1)

    # 3. declarative-path BM25 (Catalyst end to end)
    timed("bm25_df", lambda: entry.q_bm25_topk_df(spark, sf_dir).toPandas())

    # 4. dedup pipeline: minhash LSH candidate pairs
    timed("dedup_minhash_lsh",
          lambda: entry.q_minhash_lsh_pairs(spark, sf_dir).toPandas())

    # 5. ANN: brute-force cosine top-k
    timed("ann_brute_topk",
          lambda: entry.q_ann_brute_topk(spark, sf_dir).toPandas())

    # 6. text analysis sweep (quality + langid + fingerprint in one pass)
    timed("text_analysis", lambda: (
        entry.q_quality_score(spark, sf_dir).toPandas(),
        entry.q_doc_fingerprint(spark, sf_dir).toPandas()))

    return times


def one_run(master_cpus: str, sf_dir: str, index_dir: str) -> dict[str, float]:
    from jvector_spark.session import get_spark

    spark = get_spark(f"bench_local{master_cpus}", master=f"local[{master_cpus}]")
    try:
        return run_suite(spark, sf_dir, index_dir)
    finally:
        spark.stop()


def main() -> None:
    if "--scaling" in sys.argv:
        # N vs 4N scaling evidence (sandbox proxy for 2 cluster sizes)
        out = {}
        for n in ("8", "32"):
            t = one_run(n, SF_DIR, INDEX_DIR + f"_c{n}")
            out[f"local[{n}]"] = t
        b8 = out["local[8]"]["index_build"] + out["local[8]"]["bm25_search"]
        b32 = out["local[32]"]["index_build"] + out["local[32]"]["bm25_search"]
        eff = (b8 / b32) / 4.0
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cores",
            "value": round(eff, 3), "unit": "ratio",
            "detail": out, "sf": SF_DIR,
        }))
        return

    times = one_run(CPUS, SF_DIR, INDEX_DIR)
    total = round(sum(v for k, v in times.items() if not k.startswith("_")), 3)
    print(json.dumps({
        "metric": "bm25_index_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    main()

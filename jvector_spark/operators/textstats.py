"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over a `documents(doc_id, text, ...)` table. All
operators are pure Catalyst column expressions (whole-stage codegen; no
Python in the hot path) so they scale to 100 TB as a single map-side pass —
zero shuffles except where an aggregation is the semantics.

The reference has no string functions at all (its row value is a float32
vector, jvector-base/.../vector/types/VectorFloat.java); these operators are
the corpus-preparation stage that would feed the index build.

Every helper mirrors an ANSI-SQL oracle in __spark_entry__.py; keep the
expressions in sync (same constants, same rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic English stopword list shared with the SQL oracles.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]


def tokens_col(text: str = "text") -> Column:
    """split-on-space token array, empties dropped (simple-mode tokenizer as
    a JVM expression — the declarative twin of functions/tokenizer.py)."""
    return F.filter(F.split(F.col(text), " "), lambda x: x != F.lit(""))


def scale_out(docs: DataFrame) -> DataFrame:
    """Widen a narrow scan before a CPU-heavy map-side projection.

    A small input (one parquet file / one row group) arrives as ONE task,
    serialising per-row work that is embarrassingly parallel — at sf0.1
    the whole signature family runs on 1 of 32 cores without this. At
    full scale the scan already has thousands of splits and this is a
    no-op (getNumPartitions >= defaultParallelism → identity). Round-robin
    repartition is sound above any per-row deterministic expression; the
    one small-input shuffle costs ~ms against seconds of hashing.
    """
    sess = docs.sparkSession
    target = sess.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def with_tokens(docs: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """(id, _toks) — tokens materialized through a projection boundary.

    Every downstream expression references the `_toks` ATTRIBUTE instead of
    re-inlining split+filter: without this, an expression like a shingle
    transform re-evaluates the full tokenization per element_at —
    O(doc_len) work per shingle, quadratic per document (visible in
    .explain as repeated `filter(split(text..))` subtrees). CollapseProject
    keeps the boundary because the non-cheap expression is referenced more
    than once.
    """
    return scale_out(docs).select(F.col(id_col), tokens_col(text).alias("_toks"))


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — token counting, one map-side pass."""
    toks = F.col("_toks")
    return with_tokens(docs, id_col, text).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, uniq_ppm, stop_ppm, quality_ppm) — heuristic
    quality scoring: lexical diversity up, stopword saturation down.

    quality = 0.5 * uniq_ratio + 0.5 * (1 - stop_ratio). Ratios are emitted
    as floor(x * 1e6) longs ("ppm"), not round(x, 6): these are small-int
    rationals that land exactly on .5 rounding boundaries, where engines'
    round() implementations disagree — floor of the identical double is
    engine-invariant.
    """
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    # try_divide: a zero-token doc (empty/whitespace text) yields NULL
    # ratios instead of aborting the whole job under ANSI mode's
    # DIVIDE_BY_ZERO (SQL semantics — the oracle's NULLIF(n, 0) divisor)
    uniq, stop = F.try_divide(n_uniq, n), F.try_divide(n_stop, n)
    ppm = lambda c: F.floor(c * F.lit(1e6)).cast("long")
    return with_tokens(docs, id_col, text).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        ppm(uniq).alias("uniq_ppm"),
        ppm(stop).alias("stop_ppm"),
        ppm(F.lit(0.5) * uniq + F.lit(0.5) * (F.lit(1.0) - stop)).alias("quality_ppm"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text: str = "text") -> DataFrame:
    """(doc_id, stop_ppm, pred_lang) — n-gram-free language-ID heuristic:
    English-stopword density threshold (deterministic; a real model slots in
    behind the same signature)."""
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.try_divide(  # NULL (not a job abort) on zero-token docs
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double"),
        F.size(toks).cast("double"),
    )
    ppm = F.floor(ratio * F.lit(1e6)).cast("long")
    return with_tokens(docs, id_col, text).select(
        F.col(id_col),
        ppm.alias("stop_ppm"),
        F.when(ppm >= 120000, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                     text: str = "text", shingle: int = 8) -> DataFrame:
    """(doc_id, content_md5, winnow_fp) — exact fingerprint (md5 of text) +
    a winnowing-style rolling fingerprint: min over `shingle`-gram windows of
    a 60-bit md5-derived hash. Both reproducible in ANSI SQL (md5 + substr +
    hex cast), both pure JVM expressions here.
    """
    toks = F.col("_toks")
    n = F.size(toks)
    # k element_at lookups per window, NOT slice+concat_ws: slice allocates
    # a fresh k-array per window and measured ~25% slower warm (sf0.1 A/B)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(shingle)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int"))
                   for j in range(shingle)]),
    )
    # the one 60-bit-hash definition (oracle-synced '15 hex chars'
    # contract) — function-local import, same cycle-safe pattern as
    # signature_table
    from jvector_spark.operators.dedup import md5_hash60 as gram_hash
    base = scale_out(docs).select(
        F.col(id_col), F.col(text), tokens_col(text).alias("_toks"))
    return base.select(
        F.col(id_col),
        F.md5(F.col(text)).alias("content_md5"),
        F.when(n >= shingle, F.array_min(F.transform(grams, gram_hash)))
        .otherwise(gram_hash(F.col(text)))
        .alias("winnow_fp"),
    )


SUBWORD_RE = "[A-Za-z]+|[0-9]+"


def subword_stats(docs: DataFrame, id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
    """(doc_id, n_subwords, n_alpha, n_num) — BPE-ish subword counting:
    maximal alpha runs and digit runs (`[A-Za-z]+|[0-9]+`), the pre-merge
    unit stream a byte-pair tokenizer starts from. Regex chosen to behave
    identically under Java regex (Spark) and RE2 (SQL oracles). Pure
    map-side expression."""
    # native function, not an F.expr f-string: an interpolated column
    # name breaks (ParseException) for any non-identifier name, while
    # every other operator here accepts arbitrary names via F.col
    sw = F.regexp_extract_all(F.col(text), F.lit(SUBWORD_RE), F.lit(0))
    alpha = F.filter(sw, lambda x: x.rlike("^[A-Za-z]"))
    return scale_out(docs).select(
        F.col(id_col),
        F.size(sw).cast("long").alias("n_subwords"),
        F.size(alpha).cast("long").alias("n_alpha"),
        (F.size(sw) - F.size(alpha)).cast("long").alias("n_num"),
    )


def content_sha(docs: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """(doc_id, content_sha) — the per-row sha256 invariant column
    (BASELINE.json input_hint; analog of the reference's CRC-checksummed
    writes, OnDiskGraphIndexWriter.checksum:247-250)."""
    return docs.select(
        F.col(id_col), F.sha2(F.col(text), 256).alias("content_sha")
    )


def signature_table(docs: DataFrame, id_col: str = "doc_id",
                    text: str = "text", shingle: int = 8,
                    bits: int = 16) -> DataFrame:
    """(doc_id, content_md5, winnow_fp, content_sha, simhash, minhash_xor)
    — the FULL per-doc signature family in ONE map-side pass.

    Semantically identical to joining doc_fingerprints + content_sha +
    simhash + the XOR-fold of minhash_signatures, but computed as a single
    projection over one tokenization scan: at 100 TB the joined form costs
    four extra corpus scans and four doc_id shuffles for columns that are
    all map-side expressions. XOR over the minhash lanes is order-free, so
    the fold here equals the exploded bit_xor aggregate exactly.
    """
    from jvector_spark.operators.dedup import (
        NUM_MINHASHES, SHINGLE_K, affine_hash_fn, md5_hash60,
        shingles_from, simhash_vote_fn)

    toks = F.col("_toks")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(shingle)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int"))
                   for j in range(shingle)]),
    )
    # layer 2: hash arrays (token hashes for simhash, k-shingle hashes for
    # minhash) materialized behind a projection boundary; winnow_fp folds
    # to a scalar here so the 8-gram array never crosses the boundary
    hashed = scale_out(docs).select(
        F.col(id_col), F.col(text), tokens_col(text).alias("_toks")
    ).select(
        F.col(id_col), F.col(text),
        F.transform(toks, md5_hash60).alias("_th"),
        F.transform(shingles_from(toks, SHINGLE_K), md5_hash60).alias("_shh"),
        F.when(n >= shingle, F.array_min(F.transform(grams, md5_hash60)))
        .otherwise(md5_hash60(F.col(text)))
        .alias("winnow_fp"),
    )

    # the hash family and vote rule are dedup's OWN factories — shared,
    # not copied, so a tweak there can never desynchronize this fused
    # twin from minhash_signatures/simhash
    mh_xor = None
    for j in range(NUM_MINHASHES):
        m = F.array_min(F.transform(F.col("_shh"), affine_hash_fn(j)))
        mh_xor = m if mh_xor is None else mh_xor.bitwiseXOR(m)

    sim = None
    for b in range(bits):
        v = F.aggregate(F.col("_th"), F.lit(0).cast("long"),
                        simhash_vote_fn(b))
        term = F.when(v > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term

    return hashed.select(
        F.col(id_col),
        F.md5(F.col(text)).alias("content_md5"),
        F.col("winnow_fp"),
        F.sha2(F.col(text), 256).alias("content_sha"),
        sim.alias("simhash"),
        mh_xor.cast("long").alias("minhash_xor"),
    )


def quality_lang_table(docs: DataFrame, id_col: str = "doc_id",
                       text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, uniq_ppm, stop_ppm, quality_ppm, pred_lang) —
    quality_scores + lang_id fused into one projection (both derive from
    the same stopword/uniq counts; the joined form re-scans and shuffles
    for what is a single map-side pass at scale)."""
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, x))
    ).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    # try_divide: see quality_scores — zero-token docs get NULL ppm and
    # fall to the pred_lang 'other' branch (NULL >= threshold is false)
    uniq, stop = F.try_divide(n_uniq, n), F.try_divide(n_stop, n)
    ppm = lambda c: F.floor(c * F.lit(1e6)).cast("long")
    stop_ppm = ppm(stop)
    return with_tokens(docs, id_col, text).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        ppm(uniq).alias("uniq_ppm"),
        stop_ppm.alias("stop_ppm"),
        ppm(F.lit(0.5) * uniq + F.lit(0.5) * (F.lit(1.0) - stop))
        .alias("quality_ppm"),
        F.when(stop_ppm >= 120000, F.lit("en"))
        .otherwise(F.lit("other")).alias("pred_lang"),
    )


def doc_keywords(docs: DataFrame, id_col: str = "doc_id",
                 text: str = "text", top_k: int = 5) -> DataFrame:
    """(doc_id, rank, term, tfidf_ppm) — each doc's top_k keywords by
    smoothed tf-idf (the standard training-data summarization/labeling
    primitive: what is this document about?).

    tfidf = (tf / dl) * ln((1 + N) / (1 + df)); emitted as floor-ppm longs
    (engine-invariant — see quality_scores). Rank ties break on the term
    string. Plan: one tokenize pass -> explode -> two partial+final
    aggregates (tf per (doc, term); df per term) -> shuffle equi-join of
    the df dictionary back on `term` (no broadcast hint: code vocabulary
    is corpus-sized; AQE may still choose broadcast at small SF) ->
    per-doc window bounded at top_k. The explode shuffles on (doc, term)
    — the same shape as posting construction, the proven 100 TB path.
    """
    from pyspark.sql import Window

    tok = with_tokens(docs, id_col, text).select(
        F.col(id_col), F.explode("_toks").alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # 1-row doc count stays LAZY (broadcast cross join) — a .count() here
    # would run the whole tokenize+aggregate lineage a second time
    nd = dl.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # The term-df dictionary is NOT broadcast: on source code the
    # vocabulary (identifiers) grows near-linearly with the corpus, so at
    # 100 TB it exceeds any broadcast threshold. Plain equi-join on `term`
    # — same uniform key as posting construction — and AQE may still
    # downgrade it to broadcast at small SF.
    scored = (
        tf.join(dl, id_col)
        .join(df, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            F.col(id_col), "term",
            F.floor(
                (F.col("tf").cast("double") / F.col("dl").cast("double"))
                * F.log((1.0 + F.col("_n")) / (1.0 + F.col("df").cast("double")))
                * 1e6
            ).cast("long").alias("tfidf_ppm"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf_ppm"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(F.col(id_col), (F.col("rn") - 1).cast("int").alias("rank"),
                "term", "tfidf_ppm")
    )


def stratified_sample(docs: DataFrame, fractions: dict,
                      strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling — the balanced-corpus primitive
    (downsample over-represented languages/sources in training data).

    Membership is a pure function of the row: keep iff
    hash60(stratum ':' id) % 1e6 < fraction(stratum)*1e6 — reproducible
    across runs, engines, and cluster sizes (no RNG state, unlike
    df.sample), and trivially map-side (one filter, no shuffle). Strata
    absent from `fractions` drop entirely (fraction 0).
    """
    from jvector_spark.operators.dedup import md5_hash60

    frac_map = F.create_map(*[
        x for k, v in sorted(fractions.items())
        for x in (F.lit(k), F.lit(int(round(v * 1_000_000))))
    ])
    bucket = md5_hash60(
        F.concat(F.col(strata_col).cast("string"), F.lit(":"),
                 F.col(id_col).cast("string"))
    ) % F.lit(1_000_000)
    thresh = F.coalesce(frac_map[F.col(strata_col)], F.lit(0))
    return docs.where(bucket < thresh)


def sequence_pack(docs: DataFrame, max_tokens: int = 2048,
                  id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, bin, offset) — contiguous token-budget packing:
    docs in id order stream into training bins of `max_tokens`; a doc's
    bin is where its FIRST token lands (offset = position within the
    bin's budget). The deterministic skeleton of LLM pretraining sequence
    packing (greedy in-order concat; long docs overflow their bin and the
    next doc starts downstream — same running-total contract).

    Scale shape: the global running total is computed with the SAME
    two-phase scheme as dense docid assignment (ids.assign_dense_docids)
    — range-repartition on doc order + sortWithinPartitions (the one
    shuffle a global orderBy would also do), a tiny per-partition
    token-sum job, a driver prefix-sum over ≤num_partitions longs, then
    a mapInPandas running total per partition. No single-partition
    Window anywhere in the plan (the round-2 version's scale-killer);
    results are bit-identical at any parallelism because the range sort
    reproduces the exact global order.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql.types import LongType, StructField, StructType

    spark = docs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    counts = token_counts(docs, id_col, text).select(
        F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)  # empty docs carry nothing to pack

    # Phase 1: one range shuffle reproducing the global id order.
    sorted_counts = counts.repartitionByRange(
        nparts, F.col(id_col)
    ).sortWithinPartitions(id_col).persist()
    # Phase 2: per-partition token totals (tiny job: ≤nparts rows).
    part_sums = (
        sorted_counts.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.sum("n_tokens").alias("_tok")).collect()
    )
    by_pid = {r["_pid"]: r["_tok"] for r in part_sums}
    offsets, acc = {}, 0
    for pid in range(nparts):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    boffsets = spark.sparkContext.broadcast(offsets)

    schema = StructType([
        StructField(id_col, sorted_counts.schema[id_col].dataType),
        StructField("n_tokens", LongType()),
        StructField("bin", LongType()),
        StructField("offset", LongType()),
    ])

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Phase 3: token-offset running total = partition prefix + local
        # cumsum; bin/offset are pure functions of the doc's start token.
        pos = boffsets.value.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            n = pdf["n_tokens"].to_numpy()
            start = pos + n.cumsum() - n
            pos = int(pos + n.sum()) if len(n) else pos
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_tokens": n,
                "bin": start // max_tokens,
                "offset": start % max_tokens,
            })

    out = sorted_counts.mapInPandas(pack, schema=schema)
    # the persist is load-bearing between the part_sums job above and the
    # caller's consuming action (and pins the range partitioning the
    # prefix offsets were computed for); long-lived sessions release it
    # via release_pack_source after materializing — same discipline as
    # ids.assign_dense_docids/release_docid_source
    out._jv_persisted_source = sorted_counts
    return out


def release_pack_source(df) -> None:
    """Unpersist the cached sorted counts behind a sequence_pack result.
    Call after the consuming action has materialized — repeated packs in
    one session otherwise accumulate pinned executor cache."""
    src = getattr(df, "_jv_persisted_source", None)
    if src is not None:
        src.unpersist()

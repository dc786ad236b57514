"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard — over `documents(doc_id, text)`.

Scale notes (100 TB design):
  * every per-doc signature (md5, minhash, simhash, shingle set) is computed
    MAP-SIDE as a Catalyst expression — one pass over the corpus, no Python;
  * the only shuffles are the semantic ones: groupBy(signature) for exact
    dup groups, groupBy(band_hash) for LSH buckets, and the candidate-pair
    join — all keyed on hashes, which are uniformly distributed, so no skew
    (adversarial mega-buckets are capped via `max_bucket`);
  * pair verification (exact Jaccard) runs only on LSH candidates, never on
    the n² corpus.

All hash functions are md5-derived 60-bit ints (`conv(substr(md5(x),1,15),
16,10)`) so the DuckDB oracles in __spark_entry__.py compute bit-identical
values (`('0x'||substr(md5(x),1,15))::BIGINT`). Spark's murmur3 `F.hash`
is NOT used anywhere correctness-gated, since oracles can't reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark.operators.textstats import tokens_col, with_tokens

NUM_MINHASHES = 8
SHINGLE_K = 3

# fixed affine-universal hash family over the 60-bit md5 base hash:
#   h_j(x) = (A_j * (h >> 30) + B_j * (h & 2^30-1) + C_j) mod (2^61 - 1)
# products stay < 2^61, sums < 2^62 — exact in int64 in BOTH Spark and any
# ANSI-SQL oracle (no murmur dependence, one md5 per shingle instead of 8).
# Constants from numpy default_rng(1234); keep in sync with __spark_entry__.
MERSENNE61 = (1 << 61) - 1
LO30 = (1 << 30) - 1
AFFINE_HASH_PARAMS: list[tuple[int, int, int]] = [
    (2103139804, 2097446776, 2121586239),
    (816464123, 367992410, 1982656189),
    (225255239, 561980201, 298028865),
    (685255715, 1151155068, 253598991),
    (1709091010, 519189161, 1688041804),
    (684046403, 1704011245, 2070344413),
    (2057996156, 566183643, 1193176983),
    (947053435, 547003393, 1309687589),
    # extension family (default_rng(5678)): used by the high-recall
    # LSH->verify pipeline (16 hashes, 8 bands); the 8-hash signature /
    # LSH-pairs operators and their oracles use only the first 8
    (94465680, 1981755518, 925633364),
    (1440725603, 370342781, 1446379831),
    (642793978, 1138999762, 390980399),
    (1715383446, 1398971114, 1671426607),
    (1213099704, 395723297, 1967522368),
    (1086412139, 1894752494, 1540380801),
    (596675009, 1217313958, 365898427),
    (631821620, 1543808693, 1999287732),
]


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash from md5 — reproducible in ANSI SQL."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def affine_hash_fn(j: int):
    """Column fn h -> affine_j(h) over the 60-bit base hash — THE hash
    family (AFFINE_HASH_PARAMS) shared by minhash_sig_array and
    textstats.signature_table; a closure factory, NOT a default-arg
    lambda (a 2-param lambda would make pyspark pass the array index as
    the second argument and silently shadow the binding)."""
    a, b, c = AFFINE_HASH_PARAMS[j]
    return lambda h: (
        F.lit(a) * F.shiftright(h, 30)
        + F.lit(b) * h.bitwiseAND(F.lit(LO30))
        + F.lit(c)
    ) % F.lit(MERSENNE61)


def simhash_vote_fn(b: int):
    """(acc, h) -> acc ± 1 vote fn for simhash bit b — shared by simhash
    and textstats.signature_table (same closure-factory discipline)."""
    mask = F.lit(1 << b)
    return lambda acc, h: acc + F.when(
        h.bitwiseAND(mask) != 0, F.lit(1)
    ).otherwise(F.lit(-1))


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """(doc_id, dup_group, group_size) — exact dedup: dup_group is the min
    doc_id sharing the same md5(text). Window over the hash == groupBy the
    hash; uniform key, no skew."""
    w = Window.partitionBy("content_md5")
    return (
        docs.select(F.col(id_col), F.md5(F.col(text)).alias("content_md5"))
        .withColumn("dup_group", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .select(id_col, "dup_group", "group_size")
    )


def shingles_from(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-gram shingles over a MATERIALIZED token attribute.

    Always pass an attribute (see textstats.with_tokens), never an inline
    tokenizer expression — element_at per shingle would re-tokenize the
    whole document (quadratic; visible as repeated filter(split(..)) in
    .explain)."""
    n = F.size(toks)
    # k element_at lookups per window, NOT slice+concat_ws: slice allocates
    # a fresh k-array per window and measured ~25% slower warm (sf0.1 A/B)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + F.lit(j + 1)).cast("int"))
                   for j in range(k)]),
    )
    # docs shorter than k shingle to the whole text (never empty)
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingles_col(text: str = "text", k: int = SHINGLE_K) -> Column:
    """Convenience wrapper for one-shot use; prefer shingles_from."""
    return shingles_from(tokens_col(text), k)


def minhash_sig_array(docs: DataFrame, id_col: str = "doc_id",
                      text: str = "text",
                      num_hashes: int = NUM_MINHASHES,
                      k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sig: array<long>) — the minhash signature VECTOR, map-side.

    minhash_j(doc) = min over distinct k-shingles s of affine_j(hash60(s)):
    ONE md5 per shingle, then `num_hashes` cheap integer affine transforms
    (AFFINE_HASH_PARAMS). Entirely map-side: the min runs inside array
    expressions, so no (doc x shingle x hash) shuffle ever materializes.
    """
    # materialize the md5 base hashes behind a projection boundary so the
    # num_hashes affine mins reference ONE computed array (higher-order
    # funcs are not reliably CSE'd inside a single Project)
    hashed = (
        with_tokens(docs, id_col, text)
        .select(F.col(id_col), shingles_from(F.col("_toks"), k).alias("_sh"))
        .select(F.col(id_col), F.transform(F.col("_sh"), md5_hash60).alias("_hs"))
    )

    sig = F.array(*[
        F.array_min(F.transform(F.col("_hs"), affine_hash_fn(j)))
        for j in range(num_hashes)
    ])
    return hashed.select(F.col(id_col), sig.alias("sig"))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text: str = "text",
                       num_hashes: int = NUM_MINHASHES,
                       k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, h, minhash) — one row per hash function; the exploded view
    of minhash_sig_array (kept as the row-oriented API surface)."""
    return (
        minhash_sig_array(docs, id_col, text, num_hashes, k)
        .select(F.col(id_col), F.posexplode(F.col("sig")).alias("h", "minhash"))
        .select(id_col, F.col("h").cast("int").alias("h"), "minhash")
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text: str = "text",
                      num_hashes: int = NUM_MINHASHES,
                      band_size: int = 2,
                      k: int = SHINGLE_K,
                      max_bucket: int = 1000) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs via LSH banding.

    Signature split into bands of `band_size`; docs agreeing on any full band
    collide. Bucket key is a hash of the band values — uniformly distributed,
    and adversarial mega-buckets (a degenerate corpus of identical docs) are
    capped at `max_bucket` docs per bucket so the self-join can't go
    quadratic on one key (the dedup analog of the north rule's heavy-term
    skew mitigation).
    """
    # bucket key = md5 of "band:mh_h0,mh_h1,..." (minhashes in h order),
    # computed MAP-SIDE from the signature array: the band values are
    # contiguous sig positions, so no explode + groupBy(doc, band) shuffle
    # ever materializes (bit-identical keys to the exploded formulation;
    # reproducible in ANSI SQL as string_agg ORDER BY h)
    sigs = minhash_sig_array(docs, id_col, text, num_hashes, k)
    n_bands = -(-num_hashes // band_size)  # ceil: trailing partial band kept

    def bucket_expr(b: int) -> Column:
        lanes = range(b * band_size, min((b + 1) * band_size, num_hashes))
        return md5_hash60(
            F.concat(
                F.lit(str(b)), F.lit(":"),
                F.concat_ws(",", *[
                    F.element_at(F.col("sig"), i + 1).cast("string")
                    for i in lanes
                ]),
            )
        )

    buckets = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).cast("int").alias("band"),
                     bucket_expr(b).alias("bucket"))
            for b in range(n_bands)
        ])).alias("_bb"),
    ).select(F.col(id_col), F.col("_bb.band").alias("band"),
             F.col("_bb.bucket").alias("bucket"))
    w = Window.partitionBy("bucket").orderBy(id_col)
    capped = buckets.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= max_bucket
    )
    a = capped.select(F.col(id_col).alias("doc_a"), "bucket")
    b = capped.select(F.col(id_col).alias("doc_b"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_verified_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text: str = "text",
                       min_jaccard: float = 0.5,
                       num_hashes: int = 2 * NUM_MINHASHES,
                       band_size: int = 2,
                       k: int = SHINGLE_K,
                       max_bucket: int = 1000) -> DataFrame:
    """(doc_a, doc_b, jaccard_ppm) — the composed near-dup pipeline:
    MinHash-LSH candidate generation, then EXACT n-gram Jaccard verification
    of the candidates only (never the n² corpus).

    This is the production dedup path at scale: candidates come from the
    bucketed band join (minhash_lsh_pairs); verification precomputes each
    doc's distinct-shingle array ONCE and scores candidate pairs with
    array_intersect — per-pair cost is O(|A|+|B|), only on candidates.
    LSH recall at jaccard j with b bands of r rows is 1-(1-j^r)^b: the
    default here is 16 hashes -> 8 bands of 2 (P(miss) ~ 1.7e-6 at j=0.9 —
    the 4-band default of `minhash_lsh_pairs` measurably missed planted
    pairs); the all-pairs `ngram_jaccard_pairs` is the recall oracle.
    """
    cands = minhash_lsh_pairs(docs, id_col, text, num_hashes, band_size, k,
                              max_bucket)
    sh = with_tokens(docs, id_col, text).select(
        F.col(id_col), shingles_from(F.col("_toks"), k).alias("shs")
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("shs").alias("_sa"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("shs").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    union = F.size("_sa") + F.size("_sb") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            # floor-ppm (engine-invariant) — see ngram_jaccard_pairs
            F.floor(inter.cast("double") / union.cast("double") * 1e6)
            .cast("long").alias("jaccard_ppm"),
        )
        .where(F.col("jaccard_ppm") >= int(min_jaccard * 1e6))
    )


def near_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                    text: str = "text",
                    min_jaccard: float = 0.5,
                    max_iters: int = 20) -> DataFrame:
    """(doc_id, dup_group) — near-duplicate CLUSTERS: connected components
    over the verified LSH pair graph, labeled by the component's min
    doc_id (the canonical representative a curation pipeline keeps).

    The full dedup story: exact groups come from `exact_dup_groups`;
    NEAR-dup groups need transitivity (A~B, B~C => one cluster even when
    A,C never collide in LSH), which pairs alone don't give. Components
    compute by iterative min-label propagation — each round is one
    neighbor join + min aggregate, converging in O(log diameter) rounds
    (the standard large-graph CC shape; near-dup components are tiny, so
    this is 2-3 rounds in practice, `max_iters` bounds adversarial
    chains). Each round materializes via localCheckpoint so lineage
    doesn't snowball.

    Only docs participating in >= 1 pair return (singletons are their own
    trivial group — join back if needed).
    """
    pairs = lsh_verified_pairs(docs, id_col, text, min_jaccard)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst")))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    ).localCheckpoint()
    converged = False
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("lbl").alias("nmin"))
        )
        jump = labels.select(F.col("node").alias("jnode"),
                             F.col("lbl").alias("jlbl"))
        new_labels = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .join(jump, labels.lbl == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"),
                    F.coalesce("nmin", "lbl"),
                    F.coalesce("jlbl", "lbl"),
                ).alias("lbl"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"near_dup_groups did not converge in {max_iters} rounds — "
            "raise max_iters (components deeper than 2^max_iters hops)")
    return labels.select(F.col("node").alias(id_col),
                         F.col("lbl").alias("dup_group"))


def simhash(docs: DataFrame, id_col: str = "doc_id", text: str = "text",
            bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over tokens.

    bit b of simhash = 1 iff sum over token occurrences of
    (+1 if hash60(token) & (1<<b) else -1) > 0  — occurrence-summing is
    exactly tf-weighting.

    The per-bit vote runs inside array expressions map-side (tokens never
    explode into a shuffle); bit tests are integer bitwiseAND (never float
    division — 60-bit hashes don't survive float64), exactly reproducible
    in the SQL oracle as `(hv & (1<<b)) <> 0`.
    """
    hashed = with_tokens(docs, id_col, text).select(
        F.col(id_col), F.transform(F.col("_toks"), md5_hash60).alias("_hs")
    )
    hashes = F.col("_hs")
    votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), simhash_vote_fn(b))
        for b in range(bits)
    ]
    sim = None
    for b, v in enumerate(votes):
        term = F.when(v > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term
    return hashed.select(F.col(id_col), sim.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text: str = "text", k: int = SHINGLE_K,
                        min_jaccard: float = 0.0) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact n-gram Jaccard for all pairs of the
    input. Meant for *verification of candidate pairs* (feed it the LSH
    candidates joined back to text) or small subsets — the all-pairs form is
    O(n²) by definition.

    Implemented as shingle-explode + pair-join on shingle (the set
    intersection is a join, not a crossJoin): |A∩B| via groupBy(pair),
    |A|,|B| from per-doc sizes.
    """
    sh = with_tokens(docs, id_col, text).select(
        F.col(id_col), F.explode(shingles_from(F.col("_toks"), k)).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "s")
    b = sh.select(F.col(id_col).alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({id_col: "doc_b", "sz": "sz_b"}), "doc_b")
        .select(
            "doc_a", "doc_b",
            # floor-ppm, not round: jaccard is a small-int rational, which
            # lands exactly on .5 rounding boundaries where Spark (BigDecimal
            # HALF_UP) and other engines (multiply-shift) disagree; floor of
            # the identical double is engine-invariant
            F.floor(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
                * 1e6
            ).cast("long").alias("jaccard_ppm"),
        )
        .where(F.col("jaccard_ppm") >= int(min_jaccard * 1e6))
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text: str = "text",
                  eval_id_col: str = "doc_id", eval_text: str = "text",
                  k: int = 8) -> DataFrame:
    """(doc_id, n_hits) — training docs sharing >= 1 k-gram shingle with
    ANY eval-set document (n_hits = distinct overlapping shingles). The
    standard pretraining decontamination gate: k-gram collision with an
    evaluation benchmark flags a training doc for removal.

    Scale shape: the eval side is benchmark-sized (thousands of docs) —
    its distinct shingles broadcast into a map-side semi-join against the
    corpus shingle stream, so the corpus never shuffles; the only
    aggregate is per flagged doc. k=8 matches the winnowing fingerprint
    window (doc_fingerprints) — long enough that natural collisions are
    rare, short enough to catch paraphrase-free inclusion.
    """
    corpus_sh = with_tokens(docs, id_col, text).select(
        F.col(id_col), F.explode(shingles_from(F.col("_toks"), k)).alias("s")
    )
    eval_sh = (
        with_tokens(eval_docs, eval_id_col, eval_text)
        .select(F.explode(shingles_from(F.col("_toks"), k)).alias("s"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(eval_sh), "s")
        .groupBy(id_col)
        .agg(F.count_distinct("s").alias("n_hits"))
    )

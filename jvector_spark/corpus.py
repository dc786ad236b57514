"""Deterministic synthetic source-code corpus + reference query set.

The analog of the reference's test fixtures: seeded random vectors
(jvector-tests/.../LuceneTestCase.java:23-25) and the siftsmall dataset with
exact ground truth (/root/reference/siftsmall/, SiftSmall.java:381-396).

Shape per BASELINE.json input_hint:
    (repo:string, path:string, commit:string, lang:string, content:string)

Content is synthetic source code built from a seeded Zipfian vocabulary
(heavy terms like ``import``/``def``/``return`` exercise skew mitigation)
plus per-doc rare terms. Everything is a pure function of (seed, n_docs):
regenerating at any time or any parallelism yields byte-identical rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "go", "js", "rust"]
LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}
KEYWORDS = ["import", "def", "return", "if", "for", "class", "let", "fn", "func", "var"]

VOCAB_SIZE = 5000
ZIPF_S = 1.1


def _vocab(rng: np.random.Generator) -> np.ndarray:
    """Seeded identifier vocabulary: v0000..v4999 shuffled syllable names."""
    syll = np.array(
        ["get", "set", "run", "load", "parse", "node", "index", "query", "score",
         "merge", "block", "term", "doc", "list", "heap", "scan", "read", "write",
         "util", "map", "buf", "seg", "post", "rank", "hash"]
    )
    a = rng.integers(0, len(syll), VOCAB_SIZE)
    b = rng.integers(0, len(syll), VOCAB_SIZE)
    c = rng.integers(0, 100, VOCAB_SIZE)
    return np.array([f"{syll[i]}_{syll[j]}{k}" for i, j, k in zip(a, b, c)])


def _zipf_probs(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def generate_corpus(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    """Build the corpus as a pandas DataFrame (driver-side; fixtures are small).

    At real scale the corpus is an Iceberg/parquet table; this generator only
    feeds tests and benches (BASELINE.json: no external data).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)
    rows = [generate_doc(i, vocab, probs, seed) for i in range(n_docs)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_doc(i: int, vocab: np.ndarray, probs: np.ndarray,
                 seed: int = 42) -> tuple[str, str, str, str, str]:
    """One corpus row — a pure function of (seed, i). Factored out so the
    distributed generator produces byte-identical rows to generate_corpus."""
    drng = np.random.default_rng(seed * 1_000_003 + i)
    repo = f"org{i % 7}/repo{i % 23}"
    lang = LANGS[min(int(drng.zipf(2.0)) - 1, 4)]
    ext = LANG_EXT[lang]
    path = f"src/d{i % 50}/f{i}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    n_lines = int(drng.integers(20, 401))
    kw = drng.integers(0, len(KEYWORDS), n_lines)
    idents = vocab[drng.choice(VOCAB_SIZE, size=(n_lines, 3), p=probs)]
    rare = f"rare_{i}_{drng.integers(0, 1 << 30)}"
    lines = [
        f"{KEYWORDS[kw[j]]} {idents[j, 0]}({idents[j, 1]}, {idents[j, 2]})"
        for j in range(n_lines)
    ]
    lines[int(drng.integers(0, n_lines))] += f"  # {rare}"
    return (repo, path, commit, lang, "\n".join(lines))


def generate_corpus_distributed(spark, n_docs: int, seed: int = 42,
                                num_partitions: int | None = None):
    """Same corpus as generate_corpus, built ON THE CLUSTER: each partition
    generates its doc-index range independently (per-doc seeded RNG), so a
    200k-doc bench corpus doesn't bottleneck on the driver. Deterministic
    at any parallelism."""
    from pyspark.sql import functions as F

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches):
        vocab = None
        for pdf in batches:
            if vocab is None:
                rng = np.random.default_rng(seed)
                vocab = _vocab(rng)
                probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)
            rows = [generate_doc(int(i), vocab, probs, seed) for i in pdf["i"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    idx = spark.range(n_docs).select(F.col("id").alias("i")).repartition(
        num_partitions
    )
    return idx.mapInPandas(
        gen,
        "repo string, path string, commit string, lang string, content string",
    )


def content_sha_table(corpus: pd.DataFrame) -> pd.DataFrame:
    """Per-row invariant fixture: sha256(content) (BASELINE.json input_hint)."""
    sha = corpus["content"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    return corpus[["repo", "path", "commit"]].assign(content_sha=sha)


def generate_queries(
    corpus: pd.DataFrame, n_queries: int = 200, seed: int = 42, mode: str = "code"
) -> pd.DataFrame:
    """Reference query set (analog of siftsmall_query.fvecs).

    1-5 terms each: 60% mid-frequency, 20% heavy (skew), 20% rare; k in
    {10, 100} mirroring the reference Bench topK grid (Bench.java:47-52).
    """
    from jvector_spark.functions.tokenizer import tokenize_series

    toks = tokenize_series(corpus["content"], mode)
    tf = toks.explode().value_counts()
    terms = tf.index.to_numpy()
    if len(terms) == 0:
        raise ValueError("generate_queries: corpus tokenizes to zero terms")
    heavy = terms[: max(1, len(terms) // 100)]
    mid = terms[len(terms) // 100 : len(terms) // 2]
    rare = terms[len(terms) // 2 :]
    # tiny/degenerate corpora can leave a band empty (e.g. <2 distinct
    # terms) — fall back to the full vocabulary rather than crash on
    # rng.integers(0, 0)
    heavy = heavy if len(heavy) else terms
    mid = mid if len(mid) else terms
    rare = rare if len(rare) else terms
    rng = np.random.default_rng(seed + 7)
    rows = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        pool_choice = rng.random(n_terms)
        picked = []
        for p in pool_choice:
            pool = mid if p < 0.6 else (heavy if p < 0.8 else rare)
            picked.append(str(pool[rng.integers(0, len(pool))]))
        k = 10 if rng.random() < 0.5 else 100
        rows.append((qid, sorted(set(picked)), k))
    return pd.DataFrame(rows, columns=["qid", "terms", "k"])

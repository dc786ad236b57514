"""Brute-force BM25 oracle (pure numpy/pandas) — the 'reference engine'.

Analog of the reference's exact ground truth: siftsmall_groundtruth.ivecs and
the randomized recall assertions in TestVectorGraph.java:89-330. The engine's
distributed results must be **rank-identical** (same docids, same float64
scores) to this oracle.

Determinism contract (from SearchResult.NodeScore.compareTo,
jvector-base/.../graph/SearchResult.java:101-106): sort by score descending,
ties broken by docid ascending. Scores are float64 with canonical summation
order = sorted query terms.

BM25 (Lucene flavor): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jvector_spark import B, K1
from jvector_spark.functions.tokenizer import tokenize_series


class BM25Oracle:
    def __init__(self, corpus: pd.DataFrame, mode: str = "code",
                 key_cols: tuple[str, ...] = ("repo", "path", "commit"),
                 content_col: str = "content"):
        # na_position='first' matches Spark's asc_nulls_first in
        # assign_dense_docids' range sort — pandas' NaN-last default
        # would shift every docid after a null key by one vs the engine
        corpus = corpus.sort_values(
            list(key_cols), kind="mergesort", na_position="first"
        ).reset_index(drop=True)
        self.docids = np.arange(len(corpus), dtype=np.int64)
        self.keys = corpus[list(key_cols)]
        toks = tokenize_series(corpus[content_col], mode)
        self.doclen = toks.map(len).to_numpy(dtype=np.float64)
        self.n_docs = len(corpus)
        self.avgdl = float(self.doclen.mean()) if self.n_docs else 0.0
        # postings: term -> (docids sorted asc, tfs)
        ex = pd.DataFrame({
            "docid": np.repeat(self.docids,
                               toks.map(len).to_numpy(dtype=np.int64)),
            "term": np.concatenate(toks.to_numpy()) if self.n_docs else np.array([], dtype=object),
        })
        tf = ex.groupby(["term", "docid"], sort=True).size().rename("tf").reset_index()
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {
            t: (g["docid"].to_numpy(np.int64), g["tf"].to_numpy(np.float64))
            for t, g in tf.groupby("term", sort=True)
        }
        self.df = {t: len(d) for t, (d, _) in self.postings.items()}

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def score_query(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Dense scores over all docs, canonical (sorted unique term) order."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for t in sorted(set(terms)):
            if t not in self.postings:
                continue
            d, tf = self.postings[t]
            norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * self.doclen[d] / self.avgdl))
            scores[d] += self.idf(t) * norm
        return self.docids, scores

    def topk(self, terms: list[str], k: int) -> pd.DataFrame:
        docids, scores = self.score_query(terms)
        hit = scores > 0.0
        d, s = docids[hit], scores[hit]
        # rank-identical tie-break: score desc, docid asc
        order = np.lexsort((d, -s))[:k]
        return pd.DataFrame({
            "rank": np.arange(len(order), dtype=np.int32),
            "docid": d[order],
            "score": s[order],
        })

    def golden(self, queries: pd.DataFrame) -> pd.DataFrame:
        """golden_topk fixture: (qid, rank, docid, score) for every query."""
        out = []
        for _, q in queries.iterrows():
            t = self.topk(list(q["terms"]), int(q["k"]))
            t.insert(0, "qid", q["qid"])
            out.append(t)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            columns=["qid", "rank", "docid", "score"])

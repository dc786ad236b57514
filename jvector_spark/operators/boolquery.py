"""Boolean query language over the inverted index: parse → evaluate → rank.

The user-facing query surface of a fulltext engine: ``spark AND (join OR
window) NOT slow``, with Lucene-style semantics (the reference exposes its
search through composable query objects; a text engine's equivalent is the
boolean clause tree — MUST / SHOULD / MUST_NOT — that Lucene's
BooleanQuery models):

  * grammar     expr := and ('OR' and)* ; and := unary (('AND')? unary)* ;
                unary := 'NOT' unary | '(' expr ')' | TERM['^'boost]
                Adjacency is implicit AND; precedence NOT > AND > OR.
  * matching    a doc matches a term leaf iff the term occurs in it;
                AND/OR/NOT are set intersection/union/difference over
                doc sets. Every OR operand and at least one AND operand
                must be positive (no pure-negation queries — same
                restriction Lucene enforces without MatchAllDocsQuery).
  * scoring     matched docs score the sum over POSITIVE leaves of
                boost × the exact BM25 contribution of that leaf's term
                (MUST_NOT clauses never score — Lucene contract).
  * execution   doc-partitioned segments decide match + score locally
                (all of a doc's postings live in its segment); per-segment
                bounded top-k partials merge globally — the same scatter
                shape as wand.search_index, so the shuffle stays
                ≤ n_queries × k × n_tasks rows at any corpus size.

``ast_to_sql`` emits the equivalent DuckDB predicate (``bool_or`` per leaf
under ``GROUP BY doc_id HAVING ...``) so every boolean query is oracle-
checkable end-to-end.

Reference parity anchors: clause trees and two-phase match/score
(jvector-base/.../graph/GraphSearcher.java:192-214 filtered search,
SearchResult.java:101-106 tie-break contract).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# --- AST ------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    child: "Term | And | Or"


Node = Term | And | Or | Not

_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


class QueryParseError(ValueError):
    pass


def _tokenize(q: str) -> list[str]:
    return _TOKEN_RE.findall(q)


class _Parser:
    """Recursive descent over the token list; NOT > AND(implicit) > OR."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.expr()
        if self.peek() is not None:
            raise QueryParseError(f"trailing token {self.peek()!r}")
        return node

    def expr(self) -> Node:
        kids = [self.conj()]
        while self.peek() == "OR":
            self.next()
            kids.append(self.conj())
        return kids[0] if len(kids) == 1 else Or(tuple(kids))

    def conj(self) -> Node:
        kids = [self.unary()]
        while True:
            t = self.peek()
            if t == "AND":
                self.next()
                kids.append(self.unary())
            elif t is not None and t not in ("OR", ")"):
                kids.append(self.unary())  # adjacency = implicit AND
            else:
                break
        return kids[0] if len(kids) == 1 else And(tuple(kids))

    def unary(self) -> Node:
        t = self.next()
        if t == "NOT":
            return Not(self.unary())
        if t == "(":
            node = self.expr()
            if self.next() != ")":
                raise QueryParseError("expected ')'")
            return node
        if t == ")":
            raise QueryParseError("unexpected ')'")
        if t in ("AND", "OR"):
            raise QueryParseError(f"operator {t!r} needs a left operand")
        if "^" in t:
            text, _, b = t.partition("^")
            try:
                boost = float(b)
            except ValueError:
                raise QueryParseError(f"bad boost in {t!r}") from None
            if not text:
                raise QueryParseError(f"bad term {t!r}")
            return Term(text, boost)
        return Term(t)


def parse_query(q: str) -> Node:
    """Parse + validate. Raises QueryParseError on syntax errors, pure-
    negation queries, or NOT directly under OR (un-scorable without a
    match-all scan — same restriction as Lucene BooleanQuery)."""
    node = _Parser(_tokenize(q)).parse()
    if isinstance(node, Not):
        raise QueryParseError("query needs at least one positive clause")
    _validate(node)
    return node


def _validate(node: Node, under_or: bool = False) -> None:
    if isinstance(node, Term):
        return
    if isinstance(node, Not):
        if under_or:
            raise QueryParseError("NOT directly under OR is not scorable")
        if isinstance(node.child, Not):
            raise QueryParseError("double negation; rewrite the query")
        _validate(node.child, under_or=False)
        return
    if isinstance(node, Or):
        for c in node.children:
            if isinstance(c, Not):
                raise QueryParseError("NOT directly under OR is not scorable")
            _validate(c, under_or=True)
        return
    if isinstance(node, And):
        if all(isinstance(c, Not) for c in node.children):
            raise QueryParseError("query needs at least one positive clause")
        for c in node.children:
            _validate(c, under_or=False)
        return
    raise QueryParseError(f"unknown node {node!r}")


def positive_leaves(node: Node) -> list[Term]:
    """All scoring leaves (term, boost) — everything not under a NOT —
    in canonical (term, boost) order (oracle summation parity)."""
    out: list[Term] = []

    def walk(n: Node, neg: bool) -> None:
        if isinstance(n, Term):
            if not neg:
                out.append(n)
        elif isinstance(n, Not):
            walk(n.child, True)
        else:
            for c in n.children:
                walk(c, neg)

    walk(node, False)
    return sorted(out, key=lambda t: (t.text, t.boost))


def all_terms(node: Node) -> list[str]:
    """Every distinct term referenced (incl. negated — the oracle's tf
    scan and the engine's posting reads both need them)."""
    out: set[str] = set()

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            out.add(n.text)
        elif isinstance(n, Not):
            walk(n.child)
        else:
            for c in n.children:
                walk(c)

    walk(node)
    return sorted(out)


# --- per-segment evaluation ----------------------------------------------


def _doc_set(node: Node, docs: dict[str, np.ndarray]) -> np.ndarray:
    """Sorted unique docids matching `node` in this segment. `docs` maps
    term -> sorted docid array (empty for absent terms)."""
    if isinstance(node, Term):
        return docs[node.text]
    if isinstance(node, Or):
        parts = [_doc_set(c, docs) for c in node.children]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.zeros(0, np.int64)
        return np.unique(np.concatenate(parts))
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        cur: np.ndarray | None = None
        # cheapest-first intersection (same policy as the conjunctive
        # scorer: the smallest list drives)
        sets = sorted((_doc_set(c, docs) for c in pos), key=len)
        for s in sets:
            cur = s if cur is None else cur[np.isin(cur, s, assume_unique=True)]
            if not len(cur):
                return cur
        assert cur is not None  # _validate: >=1 positive child
        for n in neg:
            ex = _doc_set(n, docs)
            if len(ex):
                cur = cur[~np.isin(cur, ex, assume_unique=True)]
            if not len(cur):
                break
        return cur
    raise QueryParseError(f"unexpected node in evaluation: {node!r}")


def score_boolean_on_segment(
    reader,
    node: Node,
    idfs: dict[str, float],
    k: int,
    avgdl: float,
    tombstones: np.ndarray | None = None,
    cache: dict | None = None,
    accept: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k (docids, scores) of one boolean query on one segment.

    Match = the clause tree over posting docid sets; score = Σ over
    positive leaves of boost × BM25 contribution (leaves summed in
    canonical order for oracle bit-parity). Reuses the shared per-segment
    decode/contribution caches of wand.score_query_on_segment.
    """
    from jvector_spark.operators.wand import _tf_norm

    if cache is None:
        cache = {}

    def decode_full(t: str):
        key = ("full", t)
        if key not in cache:
            cache[key] = (
                reader.decode_term(t)
                if reader.has_term(t)
                else (np.zeros(0, np.int64), np.zeros(0, np.int64))
            )
        return cache[key]

    def contrib_full(t: str):
        key = ("contrib", t)
        if key not in cache:
            d, tf = decode_full(t)
            idf = idfs.get(t, 0.0)
            cache[key] = (d, idf * _tf_norm(tf, reader.doclen(d), avgdl)
                          if len(d) else np.zeros(0, np.float64))
        return cache[key]

    docs = {t: decode_full(t)[0] for t in all_terms(node)}
    cand = _doc_set(node, docs)
    if accept is not None and len(cand):
        cand = cand[np.isin(cand, accept, assume_unique=True)]
    if tombstones is not None and len(tombstones) and len(cand):
        cand = cand[~np.isin(cand, tombstones)]
    if not len(cand):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    scores = np.zeros(len(cand), dtype=np.float64)
    for leaf in positive_leaves(node):
        d, c = contrib_full(leaf.text)
        if not len(d):
            continue
        pos = np.searchsorted(d, cand)
        valid = pos < len(d)
        valid[valid] &= d[pos[valid]] == cand[valid]
        scores[valid] += leaf.boost * c[pos[valid]]
    top = np.lexsort((cand, -scores))[:k]
    return cand[top], scores[top]


# --- distributed search ---------------------------------------------------


def boolean_search_index(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    num_tasks: int | None = None,
    doc_filter: dict | None = None,
    merge: str = "spark",
) -> DataFrame | pd.DataFrame:
    """Distributed boolean top-k over a segment index.

    queries: pandas (qid:int, query:str, k:int). ASTs parse once on the
    driver (syntax errors surface before any job launches) and broadcast;
    segments scatter over tasks exactly like wand.search_index — per-task
    bounded partials, global merge. Returns (qid, rank, docid, score)-less
    raw (qid, docid, score) like search_index; callers rank/round.
    """
    from collections.abc import Iterator

    from jvector_spark.operators.wand import (
        _TopK, _filter_key, empty_topk, global_term_stats, idf_map,
        merge_topk, scatter_paths,
    )
    from jvector_spark.plans.merge import tombstone_view
    from jvector_spark.sources.segment import (
        SegmentReader, bloom_may_contain, load_manifest, load_term_bloom,
    )

    asts = {int(r.qid): parse_query(str(r.query))
            for r in queries.itertuples()}
    ks = {int(r.qid): int(r.k) for r in queries.itertuples()}
    pos_terms = sorted({leaf.text for a in asts.values()
                        for leaf in positive_leaves(a)})
    manifest = load_manifest(index_dir)
    seg_paths = [s["path"] for s in manifest["segments"]]
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    idfs = idf_map(n_docs, global_term_stats(spark, index_dir, pos_terms)
                   if pos_terms else {})
    tomb_view = tombstone_view(index_dir, epoch=manifest.get("docid_epoch", 0))
    if not seg_paths:
        return empty_topk(spark, "score", merge)

    sc = spark.sparkContext
    b_asts = sc.broadcast(asts)
    b_ks = sc.broadcast(ks)
    b_idfs = sc.broadcast(idfs)
    paths_df = scatter_paths(spark, seg_paths, num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        paths = [p for pdf in batches for p in pdf["path"].tolist()]
        if not paths:
            return
        asts_l, idfs_l = b_asts.value, b_idfs.value
        states = {qid: _TopK(b_ks.value[qid]) for qid in asts_l}
        # positive terms drive the bloom skip: every match has >=1
        # positive term, so a segment whose bloom rejects ALL of them
        # cannot contribute (negated terms never create matches)
        probe = sorted({leaf.text for a in asts_l.values()
                        for leaf in positive_leaves(a)})
        for path in paths:
            bloom = load_term_bloom(path)
            if bloom is not None and probe and not any(
                bloom_may_contain(bloom, t) for t in probe
            ):
                continue
            reader = SegmentReader(path)
            tomb_l = tomb_view.for_segment(path)
            seg_cache: dict = {}
            accept = None
            if doc_filter:
                accept = reader.accepted_docids(doc_filter)
                seg_cache[("accept", _filter_key(doc_filter))] = accept
            for qid, st in states.items():
                d, s = score_boolean_on_segment(
                    reader, asts_l[qid], idfs_l, st.k, avgdl, tomb_l,
                    seg_cache, accept,
                )
                st.push(d, s)
        out = [
            pd.DataFrame({"qid": qid, "docid": st.docids, "score": st.scores})
            for qid, st in states.items() if len(st.docids)
        ]
        if out:
            yield pd.concat(out, ignore_index=True)

    partial = paths_df.mapInPandas(run, "qid long, docid long, score double")
    return merge_topk(partial, ks, "score", merge)


# --- oracle SQL generation ------------------------------------------------


def _sql_quote(t: str) -> str:
    return "'" + t.replace("'", "''") + "'"


def ast_to_sql_predicate(node: Node) -> str:
    """The match predicate as a HAVING clause over per-doc term presence:
    each leaf becomes bool_or(term = 'x') under GROUP BY doc_id (the tf
    scan must include every referenced term, see all_terms)."""
    if isinstance(node, Term):
        return f"bool_or(term = {_sql_quote(node.text)})"
    if isinstance(node, Not):
        return f"NOT ({ast_to_sql_predicate(node.child)})"
    op = " AND " if isinstance(node, And) else " OR "
    return "(" + op.join(ast_to_sql_predicate(c) for c in node.children) + ")"


def leaves_values_sql(asts: dict[int, Node]) -> str:
    """VALUES rows (qid, term, boost) for every positive leaf — the
    scoring join side of the oracle."""
    rows = [
        f"({qid}, {_sql_quote(leaf.text)}, {leaf.boost!r})"
        for qid, a in sorted(asts.items())
        for leaf in positive_leaves(a)
    ]
    return ", ".join(rows)

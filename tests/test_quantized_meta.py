"""NVQ-analog quantized block-max metadata (SURVEY §2.8 NVQ row;
reference quantization/NVQuantization.java:42-155, NVQScorer.java).

The contract is the reference's lossy-metadata-plus-exact-rerank
discipline transplanted to the inverted index: per-block (max_tf, min_dl)
pruning metadata stores as uint8 affine codes, quantized DIRECTIONALLY
(tf up, dl down) so every quantized block upper bound ≥ the exact bound.
Pruning with it is therefore sound, and because exact scores always come
from decoded postings, search results are RANK- AND SCORE-IDENTICAL to a
full-precision index — the quantization must be invisible in results and
only visible in dictionary size."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.wand import search_index
from jvector_spark.oracle import BM25Oracle
from jvector_spark.sources.segment import (
    SegmentReader,
    _quantize_meta_stream,
    block_meta_bounds,
    build_index,
)


def test_quantizer_directional_soundness_property():
    """Randomized property: dequantized tf ≥ value, dequantized dl ≤
    value, codes fit uint8 — across skewed magnitudes and constant runs."""
    rng = np.random.default_rng(42)
    for trial in range(20):
        n_terms = rng.integers(1, 50)
        nblocks = rng.integers(1, 40, size=n_terms)
        b_term = np.repeat(np.arange(n_terms), nblocks)
        tstarts = np.concatenate(([0], np.cumsum(nblocks)[:-1]))
        # heavy-tailed values incl. constant-per-term edge case
        vals = np.where(
            rng.random(len(b_term)) < 0.2,
            1.0,
            np.exp(rng.normal(3, 2, len(b_term))).round(),
        )
        for up in (True, False):
            codes, lo, scale = _quantize_meta_stream(
                vals.astype(np.float64), b_term, tstarts, up=up)
            assert codes.dtype == np.uint8
            deq = lo[b_term] + codes.astype(np.float64) * scale[b_term]
            if up:
                assert (deq >= vals).all()
                # and not uselessly loose: within one quantization step
                assert (deq - vals <= scale[b_term] * 1.001).all()
            else:
                assert (deq <= vals).all()
                assert (vals - deq <= scale[b_term] * 1.001).all()


@pytest.fixture(scope="module")
def twin_indexes(spark, corpus_df, tmp_path_factory):
    docs = assign_dense_docids(corpus_df)
    full = str(tmp_path_factory.mktemp("idx_full"))
    quant = str(tmp_path_factory.mktemp("idx_quant"))
    m_full = build_index(docs, full, num_segments=4)
    m_quant = build_index(docs, quant, num_segments=4, quantize_meta=True)
    return full, quant, m_full, m_quant


def test_quantized_dictionary_drops_fp_columns(twin_indexes):
    _, quant, _, mq = twin_indexes
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(mq["path"].iloc[0], "terms.parquet"))
    assert "block_qtf" in t.column_names and "block_qdl" in t.column_names
    assert "block_max_tf" not in t.column_names
    assert "block_min_dl" not in t.column_names
    r = SegmentReader(mq["path"].iloc[0])
    assert r.meta.get("quantize_meta") is True


def test_quantized_bounds_dominate_exact(twin_indexes):
    """Per (term, block): quantized tf-bound ≥ exact max_tf and quantized
    dl-bound ≤ exact min_dl — the pruning-soundness invariant, checked on
    real dictionaries rather than synthetic arrays."""
    full, quant, mf, mq = twin_indexes
    rf = SegmentReader(mf["path"].iloc[0])
    rq = SegmentReader(mq["path"].iloc[0])
    assert rf.terms == rq.terms
    for t in rf.terms:
        tf_e, dl_e = block_meta_bounds(rf.term_row(t))
        tf_q, dl_q = block_meta_bounds(rq.term_row(t))
        assert (tf_q >= tf_e - 1e-12).all(), t
        assert (dl_q <= dl_e + 1e-12).all(), t


def test_quantized_search_rank_and_score_identical(spark, twin_indexes,
                                                   oracle, queries_pdf):
    full, quant, _, _ = twin_indexes
    a = search_index(spark, full, queries_pdf, merge="driver")
    b = search_index(spark, quant, queries_pdf, merge="driver")
    assert a["docid"].tolist() == b["docid"].tolist()
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                       rtol=0, atol=0)  # bit-identical scores
    for q in queries_pdf.itertuples():
        got = b[b["qid"] == q.qid].sort_values("rank")
        exp = oracle.topk(list(q.terms), int(q.k))
        assert got["docid"].tolist() == exp["docid"].tolist(), f"qid={q.qid}"


def test_quantized_meta_shrinks_hot_tier():
    """The point of NVQ: the in-memory block-metadata bill shrinks. On a
    dictionary with realistic posting-list lengths (many 128-posting
    blocks per term — the shape that dominates memory at 10^12 docs, not
    the 1-block-per-term fixture shape where per-term scalars dominate),
    the quantized meta columns must be ≤ 1/3 of full precision (uint8
    codes + 4 float64/term vs two int32 lists)."""
    import pyarrow as pa

    from jvector_spark.sources.segment import encode_postings_frame

    rng = np.random.default_rng(7)
    n_terms, df = 50, 16000  # ~125 blocks per term
    p_term = np.repeat(
        np.array([f"t{i:03d}" for i in range(n_terms)], object), df)
    p_doc = np.tile(np.arange(df, dtype=np.int64) * 3, n_terms)
    p_tf = rng.integers(1, 30, n_terms * df).astype(np.int64)
    p_dl = rng.integers(20, 3000, n_terms * df).astype(np.int64)

    def meta_bytes(tbl: pa.Table, cols) -> int:
        return sum(tbl.column(c).nbytes for c in cols if c in tbl.column_names)

    tf_full, _ = encode_postings_frame(p_term, p_doc, p_tf, p_dl)
    tf_q, _ = encode_postings_frame(p_term, p_doc, p_tf, p_dl,
                                    quantize_meta=True)
    full_b = meta_bytes(tf_full, ["block_max_tf", "block_min_dl"])
    quant_b = meta_bytes(tf_q, ["block_qtf", "block_qdl", "q_tf_lo",
                                "q_tf_scale", "q_dl_lo", "q_dl_scale"])
    assert quant_b * 3 <= full_b, (quant_b, full_b)


def test_quantized_survives_compaction(spark, corpus_df, corpus_pdf,
                                       queries_pdf, tmp_path_factory):
    from jvector_spark.plans.merge import compact_in_place, mark_deleted

    idx = str(tmp_path_factory.mktemp("idx_q_compact"))
    build_index(assign_dense_docids(corpus_df), idx, num_segments=4,
                quantize_meta=True)
    deleted = [2, 9, 77]
    mark_deleted(idx, deleted)
    m = compact_in_place(spark, idx, target_segments=2,
                         vacuum_min_age_sec=0)
    r = SegmentReader(m["path"].iloc[0])
    assert r.meta.get("quantize_meta") is True  # stayed quantized
    keyed = corpus_pdf.sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    live = keyed[~keyed.index.isin(deleted)].reset_index(drop=True)
    oracle2 = BM25Oracle(live)
    res = search_index(spark, idx, queries_pdf).toPandas()
    for q in queries_pdf.itertuples():
        got = res[res["qid"] == q.qid].sort_values("rank")
        exp = oracle2.topk(list(q.terms), int(q.k))
        assert got["docid"].tolist() == exp["docid"].tolist(), f"qid={q.qid}"

"""Segment-side tombstone shards: the read path must never materialize
(or broadcast) an unbounded global delete list on the driver.

Reference analog: the per-view liveNodes bitmap
(ImmutableGraphIndex.java:157, ThreadSafeGrowableBitSet) — deletes are
resolved against the segment being read, not a global structure shipped
with every query."""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest

from jvector_spark.operators.ids import assign_dense_docids
from jvector_spark.operators.wand import search_index
from jvector_spark.plans.merge import (
    TOMBSTONES_FILE,
    _shard_dir,
    load_segment_tombstones,
    load_tombstones,
    mark_deleted,
    tombstone_view,
    vacuum_index,
)
from jvector_spark.sources.segment import build_index, load_manifest


@pytest.fixture(scope="module")
def idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_tshards"))
    build_index(assign_dense_docids(corpus_df), d, num_segments=4)
    return d


def _expected(oracle_fn, corpus_pdf, terms, k, excluded):
    from jvector_spark.oracle import BM25Oracle

    keyed = corpus_pdf.sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    orc = BM25Oracle(keyed)
    docids, scores = orc.score_query(terms)
    hit = scores > 0
    d, s = docids[hit], scores[hit]
    live = ~np.isin(d, list(excluded))
    d, s = d[live], s[live]
    order = np.lexsort((d, -s))[:k]
    return d[order].tolist()


def test_shards_mirror_journal(idx):
    doomed = [0, 5, 77, 150]
    mark_deleted(idx, doomed)
    man = load_manifest(idx)
    epoch = int(man.get("docid_epoch", 0))
    got = np.concatenate([
        load_segment_tombstones(idx, epoch, s["path"])
        for s in man["segments"]
    ])
    assert sorted(got.tolist()) == sorted(load_tombstones(idx))
    # each shard holds only docids inside its segment's range
    for s in man["segments"]:
        t = load_segment_tombstones(idx, epoch, s["path"])
        assert ((t >= s["min_docid"]) & (t <= s["max_docid"])).all()


def test_sharded_view_search_matches_inline(spark, idx, corpus_pdf,
                                            monkeypatch):
    """Force the sharded regime (inline budget 0): search results must be
    identical to the inline regime, and the view must pickle WITHOUT the
    delete list (the no-driver-materialization contract)."""
    import jvector_spark.plans.merge as merge_mod

    q = pd.DataFrame({"qid": [0], "terms": [["import"]], "k": [10]})
    inline_res = search_index(spark, idx, q, merge="driver")

    monkeypatch.setattr(merge_mod, "TOMBSTONE_INLINE_MAX_BYTES", 0)
    view = tombstone_view(idx)
    assert view.inline is None  # sharded regime engaged
    assert len(pickle.dumps(view)) < 1024  # ships as a reference, not data
    shard_res = search_index(spark, idx, q, merge="driver")
    pd.testing.assert_frame_equal(
        inline_res.reset_index(drop=True), shard_res.reset_index(drop=True))
    exp = _expected(None, corpus_pdf, ["import"], 10, {0, 5, 77, 150})
    assert shard_res.sort_values("rank")["docid"].tolist() == exp


def test_million_tombstones_stay_off_driver(spark, idx, monkeypatch):
    """10^6 marked deletes: the journal is ~7 MB, so the view must choose
    the sharded regime on its own (default budget) — queries run green
    while the driver ships only (index_dir, epoch)."""
    man = load_manifest(idx)
    hi = max(s["max_docid"] for s in man["segments"])
    # mark 10^6 synthetic docids beyond the live range plus 3 real ones
    # (a just-compacted-away range: legal journal content)
    ids = np.arange(hi + 1, hi + 1_000_001, dtype=np.int64).tolist()
    mark_deleted(idx, ids + [1, 2, 3])
    try:
        view = tombstone_view(idx)
        assert view.inline is None  # big journal -> sharded, unparsed
        assert len(pickle.dumps(view)) < 1024
        q = pd.DataFrame({"qid": [0], "terms": [["import"]], "k": [5]})
        res = search_index(spark, idx, q, merge="driver")
        assert len(res) == 5
        assert not res["docid"].isin([1, 2, 3]).any()
    finally:
        # reset journal + shards for the other tests in this module
        os.remove(os.path.join(idx, TOMBSTONES_FILE))
        mark_deleted(idx, [0, 5, 77, 150])


def test_stale_shard_stamp_falls_back_to_journal(idx):
    """Crash window: journal rewritten without a shard sync -> stamp
    mismatch -> the view parses the journal (correct, inline) instead of
    trusting stale shards."""
    path = os.path.join(idx, TOMBSTONES_FILE)
    with open(path) as f:
        data = json.load(f)
    data["docids"] = sorted(set(data["docids"]) | {42})
    with open(path, "w") as f:
        json.dump(data, f)  # journal write WITHOUT sync_tombstone_shards
    import jvector_spark.plans.merge as merge_mod

    view = merge_mod.tombstone_view(idx, inline_max_bytes=0)
    assert view.inline is not None  # fallback engaged
    assert 42 in view.inline.tolist()
    mark_deleted(idx, [])  # re-sync for later tests


def test_compaction_moves_shards_to_new_epoch_and_vacuum_gcs(
        spark, corpus_df, tmp_path_factory):
    from jvector_spark.plans.merge import compact_in_place

    d = str(tmp_path_factory.mktemp("idx_tsh_epoch"))
    build_index(assign_dense_docids(corpus_df), d, num_segments=3)
    mark_deleted(d, [0, 1])
    compact_in_place(spark, d, vacuum_min_age_sec=10**9)
    # post-flip: a delete marked late lands in the NEW epoch's shards
    mark_deleted(d, [7])
    man = load_manifest(d)
    epoch = int(man["docid_epoch"])
    assert epoch == 1
    got = np.concatenate([
        load_segment_tombstones(d, epoch, s["path"])
        for s in man["segments"]
    ])
    assert 7 in got.tolist()
    # old epoch dir survives until vacuum's age gate clears it
    old_dir = _shard_dir(d, 0)
    if os.path.isdir(old_dir):
        removed = vacuum_index(d, min_age_sec=0, lease_timeout_sec=0)
        assert old_dir in removed
        assert not os.path.isdir(old_dir)


def test_compaction_sharded_regime_matches_inline(spark, corpus_df,
                                                  tmp_path_factory,
                                                  monkeypatch):
    """compact_index under the SHARDED journal regime (inline budget 0)
    must produce the same surviving index as the inline regime: seg_live
    offsets come from shard parquet FOOTERS and each merge task reads its
    own segments' shards — the driver never parses the journal."""
    import jvector_spark.plans.merge as merge_mod
    from jvector_spark.plans.merge import compact_index

    d1 = str(tmp_path_factory.mktemp("idx_cshard_a"))
    d2 = str(tmp_path_factory.mktemp("idx_cshard_b"))
    for d in (d1, d2):
        build_index(assign_dense_docids(corpus_df), d, num_segments=4)
        mark_deleted(d, [3, 7, 20, 21, 22, 150])
    out1 = str(tmp_path_factory.mktemp("out_inline")) + "/v"
    out2 = str(tmp_path_factory.mktemp("out_shard")) + "/v"
    m1 = compact_index(spark, d1, out1, target_segments=2)

    monkeypatch.setattr(merge_mod, "TOMBSTONE_INLINE_MAX_BYTES", 0)
    # guard: the sharded path must not read the journal on the driver
    orig = merge_mod.load_tombstones
    calls = []

    def spy(path, epoch=None):
        calls.append(path)
        return orig(path, epoch)

    monkeypatch.setattr(merge_mod, "load_tombstones", spy)
    m2 = compact_index(spark, d2, out2, target_segments=2)
    assert not any(c == d2 for c in calls), "journal parsed on the driver"

    assert m1["n_docs"].tolist() == m2["n_docs"].tolist()
    assert m1["min_docid"].tolist() == m2["min_docid"].tolist()
    q = pd.DataFrame({"qid": [0], "terms": [["import"]], "k": [50]})
    r1 = search_index(spark, out1, q, merge="driver")
    r2 = search_index(spark, out2, q, merge="driver")
    assert r1["docid"].tolist() == r2["docid"].tolist()
    assert np.allclose(r1["score"], r2["score"], atol=0)

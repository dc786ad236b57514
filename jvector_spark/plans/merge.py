"""Segment merge-compaction + tombstone deletes (the LSM maintenance path).

Reference mapping (SURVEY §2.9):
  * `GraphIndexBuilder.buildAndMergeNewNodes` + `sequentialRenumbering`
    (jvector-base/.../graph/GraphIndexBuilder.java:992-1029,
    AbstractGraphIndexWriter.java:104-117) -> sort-merge-compaction of
    doc-partitioned segments with dense docid renumbering that fills
    deletion holes while preserving order;
  * 2-phase deletes — `markNodeDeleted` tombstone then
    `removeDeletedNodes` purge (GraphIndexBuilder.java:684-805) ->
    a tombstone docid set applied as a filter bitmap at query time
    (live immediately, like the reference's deleted-bits in search,
    ImmutableGraphIndex.liveNodes) and physically purged at compaction;
  * `NodeArray.merge` score-sorted merge/dedup (graph/NodeArray.java:63-132)
    -> k-way docid-ordered posting merge. Because our segments are
    DOC-partitioned on disjoint docid ranges, per-term posting lists
    concatenate in segment order after remapping — the merge "sort" is free
    by construction, which is exactly why the build partitions by docid
    range (same reason ODGI records are ordinal-ordered).

Scale shape: compaction = one task per OUTPUT segment group; each task
streams its input segments' postings through the same vectorized
encode_postings_frame used at build. No shuffle at all — grouping is on
contiguous docid ranges, the remap is order-preserving, and term
dictionaries merge via pandas concat/groupby inside the task. At 10^12 docs
you compact O(thousands) of segments in parallel groups, each group bounded
by its input bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jvector_spark import BLOCK_SIZE
from jvector_spark.sources.segment import (
    MANIFEST_SCHEMA,
    SegmentReader,
    encode_postings_frame,
    load_manifest,
    write_index_manifest,
    write_segment_files,
)

TOMBSTONES_FILE = "tombstones.json"
LEASES_DIR = "_leases"


def acquire_lease(index_dir: str, purpose: str = "build") -> str:
    """Positive ownership marker for in-flight index mutations.

    An appender/compactor acquires a lease BEFORE staging any segment or
    generation dirs and releases it after its atomic manifest write.
    vacuum_index skips every dir created after the oldest live lease
    started, so a build that outlives any mtime grace period is still
    protected — mtime age alone cannot distinguish a slow in-flight build
    from a crash leftover. Heartbeat = the lease file's mtime
    (refresh_lease); a lease not refreshed within `lease_timeout_sec`
    (vacuum arg) is considered dead, which is how crashed writers'
    leftovers eventually become collectable."""
    import uuid

    ldir = os.path.join(index_dir, LEASES_DIR)
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, f"lease-{uuid.uuid4().hex}.json")
    with open(path, "w") as f:
        json.dump({"purpose": purpose, "start": time.time()}, f)
    return path


def refresh_lease(lease_path: str) -> None:
    """Heartbeat: bump the lease's mtime (call between long build stages)."""
    os.utime(lease_path)


def release_lease(lease_path: str) -> None:
    try:
        os.remove(lease_path)
    except FileNotFoundError:
        pass


def _live_lease_floor(index_dir: str, lease_timeout_sec: float) -> float:
    """Earliest start time among live leases (heartbeat within timeout),
    or +inf when none — dirs whose mtime is at/after this floor belong to
    a possibly-in-flight writer and must not be vacuumed."""
    ldir = os.path.join(index_dir, LEASES_DIR)
    floor = float("inf")
    if not os.path.isdir(ldir):
        return floor
    now = time.time()
    for name in os.listdir(ldir):
        path = os.path.join(ldir, name)
        try:
            if now - os.path.getmtime(path) > lease_timeout_sec:
                continue  # dead writer: heartbeat expired
            with open(path) as f:
                floor = min(floor, float(json.load(f).get("start", now)))
        except (OSError, ValueError):
            continue
    return floor


def _manifest_epoch(index_dir: str) -> int:
    try:
        return int(load_manifest(index_dir).get("docid_epoch", 0))
    except FileNotFoundError:
        return 0


class _tombstone_lock:
    """Serializes ALL writers of tombstones.json within and across
    processes on one host (fcntl.flock on a sibling lock file). Without
    it, compact_in_place's late-delete carry-over (read snapshot ->
    translate -> os.replace) races a concurrent mark_deleted: a delete
    acked between the re-read and the replace is clobbered, silently
    resurrecting the doc. Reads stay lock-free (os.replace is atomic)."""

    def __init__(self, index_dir: str) -> None:
        self._path = os.path.join(index_dir, TOMBSTONES_FILE + ".lock")
        self._f = None

    def __enter__(self):
        self._f = open(self._path, "a")
        try:
            import fcntl

            fcntl.flock(self._f, fcntl.LOCK_EX)
        except ImportError:  # non-posix: single-writer discipline applies
            pass
        return self

    def __exit__(self, *exc):
        try:
            import fcntl

            fcntl.flock(self._f, fcntl.LOCK_UN)
        except ImportError:
            pass
        self._f.close()
        return False


def mark_deleted(index_dir: str, docids: Sequence[int]) -> list[int]:
    """Phase-1 delete: record tombstones in the index manifest dir
    (markNodeDeleted analog). Queries must exclude these immediately;
    the postings bytes are untouched until compaction.

    Tombstones are EPOCH-SCOPED: they carry the manifest's docid_epoch,
    and load_tombstones ignores them once a compaction bumps the epoch
    (docids renumber — old-numbering tombstones applied to new docids
    would silently delete the wrong live docs). This makes the
    in-place-compaction manifest flip atomic w.r.t. deletes: a crash
    between the flip and the tombstone-file removal leaves stale-epoch
    tombstones that every reader ignores."""
    path = os.path.join(index_dir, TOMBSTONES_FILE)
    with _tombstone_lock(index_dir):
        cur: set[int] = set(load_tombstones(index_dir))
        cur.update(int(d) for d in docids)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"docid_epoch": _manifest_epoch(index_dir),
                       "docids": sorted(cur)}, f)
        os.replace(tmp, path)
        sync_tombstone_shards(index_dir)
    return sorted(cur)


def _read_raw_tombstones(index_dir: str) -> tuple[int, set[int]]:
    """(epoch, docids) exactly as stored — no epoch-validity filtering.
    Used by compaction to detect deletes acked AFTER its snapshot."""
    path = os.path.join(index_dir, TOMBSTONES_FILE)
    if not os.path.exists(path):
        return -1, set()
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, list):  # legacy epoch-less format == epoch 0
        data = {"docid_epoch": 0, "docids": data}
    return int(data.get("docid_epoch", 0)), set(data["docids"])


def load_tombstones(index_dir: str, epoch: int | None = None) -> list[int]:
    """Deletes scoped to one docid numbering. `epoch` is the CALLER's
    manifest-snapshot epoch; omitting it re-reads the live manifest,
    which is only safe when no compaction can flip between the caller's
    segment-list read and this call (see tombstone_view)."""
    if epoch is None:
        epoch = _manifest_epoch(index_dir)
    jepoch, docids = _read_raw_tombstones(index_dir)
    if jepoch != epoch:
        return []  # different numbering than the caller's snapshot
    return sorted(docids)


# --------------------------------------------------------------------------
# segment-side tombstone shards
#
# tombstones.json is the MARK-PHASE JOURNAL (commit point, epoch scope,
# carry-over diffing). For the READ path it is the wrong shape at scale:
# a high-churn 10^12-doc corpus accumulates an unbounded delete list
# between compactions, and broadcasting it to every search task is
# unbounded driver memory + broadcast bytes. So every journal write also
# projects the list into PER-SEGMENT parquet shards
# (tombstones.d/epoch=<E>/<md5(seg_path)>.parquet, sorted docid column):
# a search task scoring segment S reads only S's shard — bytes bounded by
# S's own deletes, never the global list (the per-segment liveNodes bitmap
# the reference keeps per index view, ImmutableGraphIndex.java:157).
# --------------------------------------------------------------------------

TOMBSTONE_SHARD_ROOT = "tombstones.d"
#: journal bytes at/below which searches ship the delete list inline in the
#: task closure (one driver read, zero per-task IO) — above it, only
#: (index_dir, epoch) ships and tasks read their segment's shard
TOMBSTONE_INLINE_MAX_BYTES = 1 << 20

_EMPTY_TOMB = np.array([], dtype=np.int64)


def _shard_dir(index_dir: str, epoch: int) -> str:
    return os.path.join(index_dir, TOMBSTONE_SHARD_ROOT, f"epoch={epoch}")


def _shard_name(seg_path: str) -> str:
    """Shard file for one segment, keyed by a digest of the manifest's
    path string (basenames collide across generations — gen-A/seg-00003
    vs seg-00003 — so the full normalized path is the identity)."""
    import hashlib

    h = hashlib.md5(os.path.normpath(seg_path).encode()).hexdigest()[:20]
    return f"{h}.parquet"


def _journal_stamp(index_dir: str) -> tuple[int, int] | None:
    """(size, mtime_ns) of the journal, or None if absent — the cheap
    consistency token binding a shard tree to the journal state it was
    projected from."""
    path = os.path.join(index_dir, TOMBSTONES_FILE)
    try:
        st = os.stat(path)
    except FileNotFoundError:
        return None
    return (int(st.st_size), int(st.st_mtime_ns))


def sync_tombstone_shards(index_dir: str) -> None:
    """Project the CURRENT journal into the current epoch's shard tree.
    Idempotent; call under _tombstone_lock after any journal write.

    Update discipline is per-FILE atomic (tmp + os.replace), never a
    whole-dir swap: within an epoch a segment's tombstone set only GROWS,
    so a lock-free reader racing an update sees either the old shard or
    the new superset — more deletes early is safe, a transiently missing
    shard (a dir swap's window) would silently resurrect docs. Old epoch
    dirs are left for vacuum_index (an in-flight search over the
    pre-flip manifest may still be reading them). `_META.json` is written
    LAST and records the journal stamp: readers seeing a stale stamp
    (crash between journal write and this sync) fall back to parsing the
    journal — correct, just not cheap."""
    import pyarrow as pa

    epoch = _manifest_epoch(index_dir)
    sdir = _shard_dir(index_dir, epoch)
    tomb = np.array(load_tombstones(index_dir), dtype=np.int64)
    if not len(tomb):
        import shutil

        shutil.rmtree(sdir, ignore_errors=True)
        return
    os.makedirs(sdir, exist_ok=True)
    keep: set[str] = set()
    manifest = load_manifest(index_dir)
    for s in manifest["segments"]:
        lo = int(np.searchsorted(tomb, int(s["min_docid"]), side="left"))
        hi = int(np.searchsorted(tomb, int(s["max_docid"]), side="right"))
        if hi <= lo:
            continue
        name = _shard_name(s["path"])
        keep.add(name)
        dst = os.path.join(sdir, name)
        tmpf = dst + ".tmp"
        pq.write_table(pa.table({"docid": tomb[lo:hi]}), tmpf)
        os.replace(tmpf, dst)
    for name in os.listdir(sdir):  # shards of merged-away segments
        if name.endswith(".parquet") and name not in keep:
            try:
                os.remove(os.path.join(sdir, name))
            except FileNotFoundError:
                pass
    meta = os.path.join(sdir, "_META.json")
    with open(meta + ".tmp", "w") as f:
        json.dump({"journal_stamp": _journal_stamp(index_dir),
                   "docid_epoch": epoch, "n": int(len(tomb))}, f)
    os.replace(meta + ".tmp", meta)


def _read_shard_file(path: str) -> np.ndarray:
    """One shard file's docids (sorted int64); missing file = no deletes."""
    if not os.path.exists(path):
        return _EMPTY_TOMB
    return pq.read_table(path, columns=["docid"])["docid"].to_numpy(
        zero_copy_only=False).astype(np.int64, copy=False)


def load_segment_tombstones(
    index_dir: str, epoch: int, seg_path: str
) -> np.ndarray:
    """Executor-side: this segment's tombstoned docids (sorted int64).
    Missing shard file = no deletes in this segment."""
    return _read_shard_file(
        os.path.join(_shard_dir(index_dir, epoch), _shard_name(seg_path)))


class TombstoneView:
    """Per-segment tombstone resolver shipped into search tasks.

    Two regimes (chosen by tombstone_view from the journal's SIZE, without
    parsing it): small delete lists travel inline (`inline` array — one
    driver read, no per-task IO); large ones ship only (index_dir, epoch)
    and each task resolves its segment's shard. Pickles to a few hundred
    bytes in the sharded regime regardless of delete count."""

    __slots__ = ("index_dir", "epoch", "inline")

    def __init__(self, index_dir: str, epoch: int,
                 inline: np.ndarray | None) -> None:
        self.index_dir = index_dir
        self.epoch = epoch
        self.inline = inline

    def for_segment(self, seg_path: str) -> np.ndarray:
        if self.inline is not None:
            return self.inline
        return load_segment_tombstones(self.index_dir, self.epoch, seg_path)

    def __len__(self) -> int:  # truthiness: "are there ANY deletes"
        return len(self.inline) if self.inline is not None else 1


def tombstone_view(
    index_dir: str,
    inline_max_bytes: int | None = None,
    epoch: int | None = None,
) -> TombstoneView:
    """Build the read-path view WITHOUT materializing a large journal on
    the driver: journals at/below `inline_max_bytes` parse and ship
    inline; larger ones ship as shard references after a stamp check
    (journal size+mtime recorded at the last shard sync). A stamp
    mismatch — possible only in the crash window between a journal write
    and its shard sync — falls back to parsing the journal, trading
    driver memory for correctness.

    `epoch` MUST be the docid_epoch of the manifest snapshot whose
    segments the caller is about to score (search paths pass
    manifest["docid_epoch"]): re-reading the live manifest here instead
    would race a concurrent compact_in_place flip — a flip landing
    between the caller's segment-list read and this call makes the
    journal's epoch look stale (or carries NEW-epoch docids) while the
    caller still scores the OLD segments, transiently resurrecting
    deleted docs. None re-reads the live manifest, acceptable only for
    mutators serialized against compaction."""
    if inline_max_bytes is None:  # late bind: tests monkeypatch the module
        inline_max_bytes = TOMBSTONE_INLINE_MAX_BYTES
    if epoch is None:
        epoch = _manifest_epoch(index_dir)
    stamp = _journal_stamp(index_dir)
    if stamp is None or stamp[0] <= inline_max_bytes:
        return TombstoneView(
            index_dir, epoch,
            np.array(load_tombstones(index_dir, epoch), dtype=np.int64))
    meta_path = os.path.join(_shard_dir(index_dir, epoch), "_META.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        ok = (tuple(meta.get("journal_stamp") or ()) == stamp
              and int(meta.get("docid_epoch", -1)) == epoch)
    except (OSError, ValueError):
        ok = False
    if not ok:
        # shards stale for this exact journal state (crash window, or a
        # pre-shard index with a huge journal): correctness over memory
        return TombstoneView(
            index_dir, epoch,
            np.array(load_tombstones(index_dir, epoch), dtype=np.int64))
    return TombstoneView(index_dir, epoch, None)


def _merge_group(
    seg_paths: list[str],
    out_dir: str,
    group_id: int,
    docid_offset: int,
    tombstones: np.ndarray,
    block_size: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Merge one group of docid-contiguous segments into one output segment.

    Returns (manifest_row, docid_map rows old->new); (None, None) for a
    group whose docs are ALL tombstoned (caller skips it — no segment dir,
    no manifest row). Dense renumbering: new docid = docid_offset + rank of
    old docid among survivors in this group (order-preserving —
    sequentialRenumbering semantics).

    Memory shape: postings accumulate as parallel numpy arrays (term codes
    via np.repeat over per-term lengths, docids, tfs) — never one pandas
    DataFrame per term — so peak memory is the group's postings arrays,
    matching the chunked discipline of _build_segment_stream.
    """
    t0 = time.time()
    doc_frames = []
    t_parts: list[np.ndarray] = []
    d_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    readers = [SegmentReader(p) for p in seg_paths]
    # positions survive compaction iff EVERY input segment carries them
    # (position values are within-doc indices — docid remapping does not
    # touch them, only the posting reorder does). Segments WITH terms
    # decide; a group of all-empty dictionaries falls back to the metas'
    # AND — a vacuous all() over the filtered iterator would default to
    # True and stamp has_positions on a merge of a position-LESS index
    _term_readers = [r for r in readers if r.terms]
    with_positions = (all(r.has_positions for r in _term_readers)
                      if _term_readers
                      else bool(readers)
                      and all(r.has_positions for r in readers))
    # NVQ-quantized dictionaries stay quantized through compaction (the
    # codes re-derive from exact merged (max_tf, min_dl) — no error
    # accumulation across generations)
    with_qmeta = bool(readers) and all(
        r.meta.get("quantize_meta") for r in readers)
    for p, r in zip(seg_paths, readers):
        docs = pq.read_table(os.path.join(p, "docs.parquet")).to_pandas()
        doc_frames.append(docs)
        if not r.terms:
            continue
        seg_d, seg_tf, lens = [], [], np.empty(len(r.terms), np.int64)
        for ti, t in enumerate(r.terms):
            if with_positions:
                d, tf, pos = r.decode_term_positions(t)
                pos_parts.append(pos)
            else:
                d, tf = r.decode_term(t)
            seg_d.append(d)
            seg_tf.append(tf)
            lens[ti] = len(d)
        t_parts.append(np.repeat(np.array(r.terms, dtype=object), lens))
        d_parts.append(np.concatenate(seg_d))
        tf_parts.append(np.concatenate(seg_tf))
    docs_all = pd.concat(doc_frames, ignore_index=True).sort_values(
        "docid", kind="mergesort"
    )
    live_mask = ~docs_all["docid"].isin(tombstones).to_numpy()
    docs_live = docs_all[live_mask].reset_index(drop=True)
    if not len(docs_live):
        return None, None
    old = docs_live["docid"].to_numpy(np.int64)  # sorted ascending
    new = docid_offset + np.arange(len(old), dtype=np.int64)

    if t_parts:
        all_t = np.concatenate(t_parts)
        all_d = np.concatenate(d_parts)
        all_tf = np.concatenate(tf_parts)
        # live filter + remap via one searchsorted against the sorted
        # survivor ids (new docid = offset + rank)
        rpos = np.searchsorted(old, all_d)
        keep = rpos < len(old)
        keep[keep] &= old[rpos[keep]] == all_d[keep]
        p_term = all_t[keep]
        p_doc = docid_offset + rpos[keep]
        p_tf = all_tf[keep].astype(np.int64)
        # (term, docid) order via factorize + int sort (no string sort of
        # the posting stream — same pattern as _build_segment_stream)
        codes, uniq = pd.factorize(p_term, sort=False)
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[np.argsort(uniq, kind="stable")] = np.arange(len(uniq))
        span = len(old)
        order = np.argsort(rank[codes] * max(span, 1) + (p_doc - docid_offset),
                           kind="stable")
        p_term, p_doc, p_tf = p_term[order], p_doc[order], p_tf[order]
        p_pos = None
        if with_positions:
            from jvector_spark.sources.segment import _scatter_positions

            all_pos = (np.concatenate(pos_parts) if pos_parts
                       else np.zeros(0, np.int64))
            occ_off = np.concatenate(([0], np.cumsum(all_tf)))[:-1]
            p_pos = all_pos[_scatter_positions(occ_off[keep][order], p_tf)]
    else:
        p_term = np.array([], dtype=object)
        p_doc = p_tf = np.array([], dtype=np.int64)
        p_pos = np.array([], dtype=np.int64) if with_positions else None

    docs_live = docs_live.copy()
    docs_live["docid"] = new
    dl_arr = docs_live["dl"].to_numpy(np.int64)
    seg_id = f"seg-{docid_offset:012d}"
    seg_dir = os.path.join(out_dir, seg_id)
    if len(p_doc):
        terms_tbl, blob = encode_postings_frame(
            p_term, p_doc, p_tf, dl_arr[p_doc - docid_offset], block_size,
            p_pos=p_pos, quantize_meta=with_qmeta,
        )
    else:
        terms_tbl, blob = encode_postings_frame(
            np.array(["\x00dummy"]), np.array([0], np.int64),
            np.array([1], np.int64), np.array([1], np.int64), block_size,
        )
        terms_tbl = terms_tbl.slice(0, 0)
        blob = b""
    # committed-keys bloom carries through the merge when every input
    # agrees on the key columns (legacy inputs without key_cols just
    # produce a bloom-less merged segment — appends fail open on those)
    kc_sets = {tuple(r.meta.get("key_cols") or ()) for r in readers}
    key_cols = list(kc_sets.pop()) if len(kc_sets) == 1 else []
    # content_col survives the merge the same way (index_config reads it
    # from segment metas for build_index-built indexes)
    cc_sets = {r.meta.get("content_col") for r in readers}
    content_col = cc_sets.pop() if len(cc_sets) == 1 else None
    meta_extra = {
        "segment_id": seg_id, "block_size": block_size,
        "merged_from": [os.path.basename(p) for p in seg_paths],
        "fingerprint": f"merge-{group_id}-{len(old)}",
        "has_positions": bool(with_positions),
        "key_cols": key_cols,
        "quantize_meta": bool(with_qmeta),
    }
    if content_col:
        meta_extra["content_col"] = content_col
    meta = write_segment_files(seg_dir, terms_tbl, blob, docs_live,
                               meta_extra)
    man = pd.DataFrame([{
        "segment_id": seg_id, "path": seg_dir, "status": "merged",
        "min_docid": meta["min_docid"], "max_docid": meta["max_docid"],
        "n_docs": meta["n_docs"], "n_terms": meta["n_terms"],
        "n_postings": meta["n_postings"], "bytes_postings": meta["bytes_postings"],
        "build_sec": time.time() - t0, "fingerprint": meta["fingerprint"],
    }])
    docid_map = pd.DataFrame({"old_docid": old, "new_docid": new})
    return man, docid_map


def compact_in_place(
    spark: SparkSession,
    index_dir: str,
    target_segments: int | None = None,
    target_bytes: int | None = None,
    block_size: int = BLOCK_SIZE,
    vacuum_after: bool = True,
    vacuum_min_age_sec: float = 600.0,
) -> pd.DataFrame:
    """Compact an index INTO ITSELF: merged segments build under a
    generation subdirectory, then ONE atomic manifest write flips
    visibility to them (readers hold the old snapshot until then — the
    same read-while-write discipline as the streaming append), tombstones
    reset (they are now physically purged), and the superseded segment
    dirs are vacuumed. The LSM minor->major compaction lifecycle without
    a second index location.
    """
    import time as _time

    from jvector_spark.sources.segment import write_index_manifest

    gen = os.path.join(index_dir, f"gen-{int(_time.time() * 1000):013d}")
    old_epoch = _manifest_epoch(index_dir)
    # segments live BEFORE the flip: their supersession moment is the
    # flip, not their build time — see the mtime bump below
    old_live = [s["path"] for s in load_manifest(index_dir)["segments"]]
    # Snapshot of what compact_index will physically purge. Deletes acked
    # AFTER this read must not be lost (they carry the old epoch, so
    # post-flip readers rightly ignore them — but dropping the file would
    # silently resurrect them).
    snap_epoch, snap = _read_raw_tombstones(index_dir)
    # Ownership lease: the gen dir must survive a concurrent vacuum even
    # if the merge takes longer than the vacuum grace period.
    lease = acquire_lease(index_dir, purpose="compact")
    try:
        manifest = compact_index(spark, index_dir, gen, target_segments,
                                 block_size, target_bytes)
    except BaseException:
        release_lease(lease)
        raise
    mode = load_manifest(gen)["tokenizer_mode"]
    # The tombstone lock covers the manifest flip AND the late-delete
    # carry-over as one critical section against concurrent mark_deleted
    # (user-reachable via the warm serve 'delete' op). Without it, (a) a
    # delete acked between the carry-over's re-read and its os.replace is
    # clobbered, and (b) a post-flip delete that wins the race rewrites
    # the file under the NEW epoch before pre-flip late deletes are
    # translated, dropping them — either way silently resurrecting docs.
    tomb = os.path.join(index_dir, TOMBSTONES_FILE)
    try:
        _flip_and_carry_over(index_dir, gen, manifest, mode, old_epoch,
                             snap_epoch, snap, tomb)
    finally:
        # the lease must die on EVERY exit: a failure inside the flip /
        # carry-over section would otherwise leave a dead lease whose
        # start-time floor blocks vacuum of everything newer than the
        # compaction start (including the orphaned gen dir) until the
        # 1h lease timeout
        release_lease(lease)
    # restart the superseded dirs' vacuum grace clock at the FLIP:
    # vacuum's min_age_sec guard reads mtime, which until now was the
    # BUILD time — a segment built an hour ago and superseded a second
    # ago would be rmtree'd out from under a reader holding the
    # pre-flip manifest snapshot, despite the documented grace. Touch
    # each superseded dir (and its hosting gen dir) so "age" means
    # time-since-supersession for exactly the dirs the flip orphaned.
    now = _time.time()
    for p in old_live:
        for tgt in (p, os.path.dirname(p)):
            if (os.path.basename(tgt).startswith(("seg-", "gen-"))
                    and os.path.isdir(tgt)):
                try:
                    os.utime(tgt, (now, now))
                except OSError:
                    pass
    if vacuum_after:
        vacuum_index(index_dir, min_age_sec=vacuum_min_age_sec)
    return manifest


def _flip_and_carry_over(index_dir, gen, manifest, mode, old_epoch,
                         snap_epoch, snap, tomb) -> None:
    from jvector_spark.sources.segment import (
        write_global_term_stats, write_index_manifest)

    # Hoist the O(vocabulary) dictionary aggregation OUT of the critical
    # section — the lock otherwise blocks every concurrent mark_deleted
    # (the serve 'delete' op) for its duration. Window semantics: the new
    # stats file lands beside the OLD manifest for a moment; its recorded
    # sha no longer matches, so readers take the documented torn-stats
    # fallback (distributed aggregation — correct, just slower) until the
    # flip below records the new sha.
    stats_sha = write_global_term_stats(index_dir, manifest)
    with _tombstone_lock(index_dir):
        # flip the PARENT manifest to the new generation's segments (paths
        # are absolute). The epoch bump makes the flip atomic w.r.t.
        # deletes: the old tombstones carry the old epoch and every reader
        # ignores them the instant the new manifest lands (no
        # wrong-results window at any crash point).
        write_index_manifest(index_dir, manifest, mode,
                             docid_epoch=old_epoch + 1,
                             stats_sha=stats_sha)
        # Late-delete carry-over: diff the file against the snapshot and
        # translate survivors through the compaction's docid_map into the
        # new epoch, instead of unconditionally removing the file.
        cur_epoch, cur = _read_raw_tombstones(index_dir)
        if cur_epoch == old_epoch:
            late_old = cur - snap if snap_epoch == old_epoch else cur
            if late_old:
                import glob as _glob

                maps = sorted(
                    _glob.glob(os.path.join(gen, "docid_map", "*.parquet")))
                remap: dict[int, int] = {}
                for mp in maps:
                    t = pq.read_table(mp, columns=["old_docid", "new_docid"])
                    remap.update(zip(t["old_docid"].to_pylist(),
                                     t["new_docid"].to_pylist()))
                translated = sorted(
                    remap[d] for d in late_old if d in remap)
                tmp = tomb + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"docid_epoch": old_epoch + 1,
                               "docids": translated}, f)
                os.replace(tmp, tomb)
            elif os.path.exists(tomb):
                os.remove(tomb)  # fully-purged snapshot: pure GC
        elif cur_epoch == old_epoch + 1:
            pass  # a post-flip mark already rewrote it under the new epoch
        elif os.path.exists(tomb):
            os.remove(tomb)  # stale older-epoch leftovers: GC
        # project carried-over deletes into the NEW epoch's shard tree
        # (old epoch dirs stay for in-flight pre-flip readers; vacuum GCs)
        sync_tombstone_shards(index_dir)


def vacuum_index(index_dir: str, dry_run: bool = False,
                 min_age_sec: float = 3600.0,
                 lease_timeout_sec: float = 3600.0) -> list[str]:
    """Garbage-collect segment directories not referenced by the live
    manifest: crash leftovers (a failed append builds segment dirs but
    dies before the atomic manifest write), `.tmp` staging dirs, and
    superseded compaction generations. Returns the removed (or
    would-remove) paths.

    Two independent guards protect concurrent work:
      * LEASES (positive ownership): any dir whose mtime is at/after the
        oldest LIVE lease's start time is skipped — this protects an
        in-flight build of ANY duration (appenders/compactors acquire a
        lease before staging; a lease whose heartbeat is older than
        `lease_timeout_sec` is dead and stops protecting).
      * `min_age_sec` (mtime grace): dirs younger than it are skipped —
        a fallback for writers that predate the lease protocol and for
        long-running readers holding a pre-compaction manifest snapshot.
    Pass min_age_sec=0 only when nothing else can be touching the index."""
    manifest = load_manifest(index_dir)
    live = {os.path.realpath(s["path"]) for s in manifest["segments"]}
    removed = []
    now = time.time()
    lease_floor = _live_lease_floor(index_dir, lease_timeout_sec)
    for name in sorted(os.listdir(index_dir)):
        full = os.path.join(index_dir, name)
        if not os.path.isdir(full) or name == LEASES_DIR:
            continue
        try:
            mtime = os.path.getmtime(full)
            if now - mtime < min_age_sec:
                continue  # grace period: possibly still referenced
            if mtime >= lease_floor:
                continue  # owned by an in-flight writer (live lease)
        except OSError:
            continue
        if name.startswith("seg-"):
            if name.endswith(".tmp") or os.path.realpath(full) not in live:
                removed.append(full)
                if not dry_run:
                    shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("gen-"):
            # compaction generation: removable iff it hosts no live segment
            gen_real = os.path.realpath(full)
            if not any(p.startswith(gen_real + os.sep) for p in live):
                removed.append(full)
                if not dry_run:
                    shutil.rmtree(full, ignore_errors=True)
    # stale-epoch tombstone shard dirs (same age/lease guards as above:
    # an in-flight search over a pre-flip manifest snapshot may still be
    # reading its epoch's shards)
    root = os.path.join(index_dir, TOMBSTONE_SHARD_ROOT)
    cur = f"epoch={int(manifest.get('docid_epoch', 0))}"
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            full = os.path.join(root, name)
            if name == cur or not os.path.isdir(full):
                continue
            try:
                mtime = os.path.getmtime(full)
                if now - mtime < min_age_sec or mtime >= lease_floor:
                    continue
            except OSError:
                continue
            removed.append(full)
            if not dry_run:
                shutil.rmtree(full, ignore_errors=True)
    return removed


def _seg_digest(seg_path: str) -> str:
    """The 20-hex segment identity used by both the tombstone shard tree
    and the bulk-doomed partition dirs."""
    return _shard_name(seg_path)[: -len(".parquet")]


def _load_bulk_doomed(doomed_dir: str, seg_path: str) -> np.ndarray | None:
    """Executor-side: one segment's bulk-doomed docids (written by
    replace_docs_bulk as segd=<digest> parquet partitions). None if the
    segment has no doomed rows."""
    part = os.path.join(doomed_dir, f"segd={_seg_digest(seg_path)}")
    if not os.path.isdir(part):
        return None
    import pyarrow.parquet as _pq

    return _pq.read_table(part, columns=["docid"])["docid"].to_numpy(
        zero_copy_only=False).astype(np.int64, copy=False)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    target_segments: int | None = None,
    block_size: int = BLOCK_SIZE,
    target_bytes: int | None = None,
    doomed_dir: str | None = None,
    doomed_counts: dict[str, int] | None = None,
) -> pd.DataFrame:
    """Sort-merge-compact an index: group docid-adjacent segments, purge
    tombstones, renumber docids densely, write a fresh index + docid_map
    parquet (old->new) for external id stability.

    Distribution: one Spark task per output group (mapInPandas over the
    group list). Offsets are computed driver-side from METADATA ONLY:
    live(segment) = meta n_docs − |tombstones ∩ [min_docid, max_docid]|
    (segment docids are dense-contiguous by construction, so the range
    count is exact) — the driver never reads posting or docid data, only
    prefix-sums one scalar per segment. Groups with zero live docs are
    dropped up front, so output seg-{offset} dirs are strictly increasing
    (no collisions) and no task ever builds an empty segment.

    `doomed_dir` / `doomed_counts` (replace_docs_bulk): an EXTRA doomed
    set that never touched the journal — parquet partitions
    doomed_dir/segd=<digest>/ written distributed, resolved per segment
    INSIDE each merge task (the driver sees only the per-segment counts
    needed for offsets). The caller guarantees doomed ∩ journal = ∅, or
    the metadata-only live counts double-subtract and docid offsets
    collide."""
    manifest = load_manifest(index_dir)
    segs = sorted(manifest["segments"], key=lambda s: s["min_docid"])
    # journal regime mirrors the SEARCH path's (tombstone_view): a small
    # journal parses and broadcasts inline; a large one never
    # materializes on the driver — seg_live counts come from the shard
    # files' parquet FOOTERS (num_rows, metadata-only reads) and each
    # merge task reads its own segments' shards
    tv = tombstone_view(index_dir,
                        epoch=manifest.get("docid_epoch", 0))
    sharded_tomb = tv.inline is None
    tomb_snap_dir = None
    if sharded_tomb:
        tomb_u = _EMPTY_TOMB
        shard_epoch = tv.epoch
        # Pin the EXACT shard bytes the live counts are computed from:
        # a concurrent mark_deleted (in-contract — the serve 'delete' op)
        # rewrites shard files via os.replace, and a merge task
        # re-reading the LIVE shard would purge more rows than the
        # driver's offset accounting assumed, leaving gaps between output
        # segments' docid ranges (breaking the dense-renumbering
        # contract the metadata-only live-count math relies on). The
        # inline regime is immune (one driver snapshot); here we hardlink
        # the current shard inodes into the output gen dir (same
        # filesystem for in-place compaction: zero copy; cross-fs falls
        # back to a bounded copy) and BOTH the counts and the tasks read
        # the snapshot. Deletes acked mid-compaction stay journaled and
        # are carried over by compact_in_place's epoch translation.
        tomb_snap_dir = os.path.join(out_dir, "_tombstone_snapshot")
        os.makedirs(tomb_snap_dir, exist_ok=True)
        for s in segs:
            src = os.path.join(_shard_dir(index_dir, shard_epoch),
                               _shard_name(s["path"]))
            if os.path.exists(src):
                dst = os.path.join(tomb_snap_dir, _shard_name(s["path"]))
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)

        def seg_tomb_count(s: dict) -> int:
            p = os.path.join(tomb_snap_dir, _shard_name(s["path"]))
            if not os.path.exists(p):
                return 0
            return int(pq.ParquetFile(p).metadata.num_rows)
    else:
        tomb_u = np.unique(tv.inline)

        def seg_tomb_count(s: dict) -> int:
            lo = int(np.searchsorted(tomb_u, s["min_docid"], side="left"))
            hi = int(np.searchsorted(tomb_u, s["max_docid"], side="right"))
            return hi - lo
    doomed_counts = doomed_counts or {}
    if target_bytes is not None:
        # size-bounded policy (the LSM merge-policy surface): greedily
        # pack ADJACENT segments (groups must stay docid-contiguous for
        # order-preserving renumbering) until the next one would push the
        # group past target_bytes — bounds each merge task's input bytes
        # regardless of segment-size skew. An oversized single segment
        # becomes its own group.
        groups = []
        cur: list[dict] = []
        cb = 0
        for s in segs:
            b = int(s["bytes_postings"])
            if cur and cb + b > target_bytes:
                groups.append(cur)
                cur, cb = [], 0
            cur.append(s)
            cb += b
        if cur:
            groups.append(cur)
    else:
        if target_segments is None:
            target_segments = max(1, len(segs) // 2)
        groups = [[] for _ in range(target_segments)]
        per = (len(segs) + target_segments - 1) // target_segments
        for i, s in enumerate(segs):
            groups[min(i // per, target_segments - 1)].append(s)
        groups = [g for g in groups if g]

    # live-doc count per group from manifest metadata + the (tiny, sorted)
    # tombstone array — zero data reads on the driver
    def seg_live(s: dict) -> int:
        return (int(s["n_docs"]) - seg_tomb_count(s)
                - doomed_counts.get(_seg_digest(s["path"]), 0))

    live_counts = [sum(seg_live(s) for s in g) for g in groups]
    groups = [g for g, n in zip(groups, live_counts) if n > 0]
    live_counts = [n for n in live_counts if n > 0]

    os.makedirs(out_dir, exist_ok=True)
    mode = manifest["tokenizer_mode"]
    if not groups:  # everything tombstoned: a valid, empty index
        if tomb_snap_dir is not None:
            # the early return must not skip the snapshot cleanup below,
            # or the hardlinked shard pin lives forever inside the new
            # live generation (vacuum never looks inside live gen dirs)
            shutil.rmtree(tomb_snap_dir, ignore_errors=True)
        empty = pd.DataFrame(
            columns=["segment_id", "path", "status", "min_docid", "max_docid",
                     "n_docs", "n_terms", "n_postings", "bytes_postings",
                     "build_sec", "fingerprint"]
        )
        write_index_manifest(out_dir, empty, mode)
        return empty
    offsets = np.concatenate(([0], np.cumsum(live_counts)[:-1]))

    tasks = [
        (gi, json.dumps([s["path"] for s in g]), int(offsets[gi]))
        for gi, g in enumerate(groups)
    ]
    tasks_df = spark.createDataFrame(
        tasks, "group_id int, paths string, offset long"
    ).repartition(len(tasks))
    b_tomb = spark.sparkContext.broadcast(tomb_u)

    map_dir = os.path.join(out_dir, "docid_map")
    os.makedirs(map_dir, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples():
                paths = json.loads(row.paths)
                tomb_task = b_tomb.value
                if sharded_tomb:
                    # read the pinned snapshot, NOT the live shard tree —
                    # count/purge consistency (see the snapshot comment
                    # at seg_tomb_count)
                    shards = [_read_shard_file(
                        os.path.join(tomb_snap_dir, _shard_name(p)))
                        for p in paths]
                    shards = [a for a in shards if len(a)]
                    if shards:
                        tomb_task = np.unique(np.concatenate(shards))
                if doomed_dir is not None:
                    # bulk-doomed resolution is PER TASK: each group reads
                    # only its own segments' doomed partitions
                    extra = [d for p in paths
                             if (d := _load_bulk_doomed(doomed_dir, p))
                             is not None]
                    if extra:
                        tomb_task = np.unique(
                            np.concatenate([tomb_task, *extra]))
                man, dmap = _merge_group(
                    paths, out_dir, int(row.group_id),
                    int(row.offset), tomb_task, block_size,
                )
                if man is None:  # defensive: group emptied under our feet
                    continue
                dmap.to_parquet(
                    os.path.join(map_dir, f"part-{int(row.group_id):05d}.parquet")
                )
                yield man

    out_manifest = tasks_df.mapInPandas(run, MANIFEST_SCHEMA).toPandas()
    out_manifest = out_manifest.sort_values("min_docid").reset_index(drop=True)
    if tomb_snap_dir is not None:
        # the pinned snapshot served its purpose once every merge task
        # has read it; don't ship it inside the new live generation
        shutil.rmtree(tomb_snap_dir, ignore_errors=True)
    write_index_manifest(out_dir, out_manifest, mode)
    return out_manifest


def optimize_index(
    spark: SparkSession,
    index_dir: str,
    target_bytes: int | None = None,
    block_size: int = BLOCK_SIZE,
    vacuum_min_age_sec: float = 600.0,
) -> pd.DataFrame:
    """Standalone refinement pass — the reference's optional second-pass
    graph refinement (GraphIndexBuilder cleanup/refine after bulk build;
    SURVEY §2.9 'graph refinement') re-expressed for segments: rewrite
    every segment through the CURRENT encoder without requiring deletes
    or a segment-count change.

    What a pass refreshes:
      * codec upgrade — v1/varint-forced segments re-encode with the
        adaptive per-(term, stream) codec (typically ~2x smaller);
      * block metadata recomputed (incl. NVQ quantization if the inputs
        carry it) and segment sizes rebalanced to `target_bytes` groups;
      * tombstones, if any, are purged as a side effect (it IS a
        compaction underneath — same atomic generation-flip machinery).

    Results are rank- and score-identical before/after ON AN INDEX WITH
    NO PENDING TOMBSTONES: the pass then changes bytes, not semantics
    (the refine-must-not-change-ranks contract the reference's
    rank-identical mode imposes on refinement). When tombstones exist
    they are purged as a side effect — purging shrinks n_docs/avgdl,
    hence idf and every BM25 score, so scores (not the deleted-excluded
    RESULT SET) legitimately shift exactly as a compaction's would.
    """
    manifest = load_manifest(index_dir)
    if target_bytes is None:
        total = sum(int(s["bytes_postings"]) for s in manifest["segments"])
        n = max(1, len(manifest["segments"]))
        # keep the segment count roughly stable by default: rebalance,
        # don't collapse (callers wanting fewer segments use compact)
        target_bytes = max(1, (total + n - 1) // n)
    return compact_in_place(
        spark, index_dir, target_bytes=target_bytes, block_size=block_size,
        vacuum_min_age_sec=vacuum_min_age_sec,
    )


def index_config(index_dir: str) -> dict:
    """The live index's build configuration, read from the manifest plus
    the first segment's meta.json: {tokenizer_mode, has_positions,
    key_cols}. Mutating operations (replace/append through the serve
    protocol) MUST default to this — tokenizing new docs with a different
    analyzer, or appending a position-less segment to a positional index,
    silently corrupts subsequent search/phrase results (the manifest's
    has_positions is ANDed over segment metas)."""
    from jvector_spark.sources.segment import load_manifest

    manifest = load_manifest(index_dir)
    # a serve-session CREATE records its intended config in create.json
    # BEFORE any segment exists (the manifest's has_positions is ANDed
    # over segment metas, so an empty index always reads False there) —
    # it is the fallback tier below segment metas, above hard defaults
    created: dict = {}
    try:
        with open(os.path.join(index_dir, "create.json")) as f:
            created = json.load(f)
    except (OSError, ValueError):
        pass
    key_cols: tuple[str, ...] = tuple(
        created.get("key_cols") or ("repo", "path", "commit"))
    # content_col: segment metas (recorded at build since format they
    # were written with it) outrank create.json, which outranks the
    # default — the one setting that used to be create.json-only, so
    # replace_docs on a build_index(content_col='body') index silently
    # tokenized the wrong column
    content_col = str(created.get("content_col", "content"))
    for s in manifest["segments"]:
        try:
            with open(os.path.join(s["path"], "meta.json")) as f:
                sm = json.load(f)
            if sm.get("key_cols"):
                key_cols = tuple(sm["key_cols"])
            if sm.get("content_col"):
                content_col = str(sm["content_col"])
            if sm.get("key_cols") or sm.get("content_col"):
                break
        except (OSError, ValueError):
            continue
    has_positions = bool(manifest.get("has_positions", False))
    if not manifest["segments"]:
        has_positions = bool(created.get("positions", False))
    return {
        "tokenizer_mode": manifest.get("tokenizer_mode", "code"),
        "has_positions": has_positions,
        "key_cols": key_cols,
        "content_col": content_col,
    }


def replace_docs(
    spark: SparkSession,
    index_dir: str,
    new_docs,
    key_cols: tuple[str, ...] | None = None,
    mode: str | None = None,
    content_col: str | None = None,
    positions: bool | None = None,
) -> dict:
    """Document UPDATE as the reference's 2-phase delete+insert cycle
    (GraphIndexBuilder.markNodeDeleted -> addGraphNode, §2.9): tombstone
    every LIVE doc whose key matches an incoming row, then append the new
    versions as a micro segment. Old versions become invisible the moment
    the tombstone file lands; space reclaims at the next compaction.

    mode / positions / key_cols / content_col default to the LIVE index's own config
    (index_config) — never to fixed constants: replacing into a
    mode='simple' or positions=True index with hardcoded 'code'/False
    would tokenize the new docs with the wrong analyzer and flip the
    manifest's has_positions, corrupting search and disabling warm
    phrase serving. Explicit arguments still override.

    At-least-once safe: a retry after any crash point re-tombstones
    whatever live copy exists (old or the just-appended new one) and
    re-appends — the index converges to exactly ONE live copy per key.
    Returns {"replaced": n_tombstoned, "appended": bool}.
    """
    from jvector_spark.streaming.micro_segments import append_micro_segment

    cfg = index_config(index_dir)
    if mode is None:
        mode = cfg["tokenizer_mode"]
    if positions is None:
        positions = cfg["has_positions"]
    if key_cols is None:
        key_cols = cfg["key_cols"]
    if content_col is None:
        content_col = cfg["content_col"]
    from jvector_spark.sources.segment import load_manifest

    manifest = load_manifest(index_dir)
    n_replaced = 0
    if manifest["segments"]:
        existing = spark.read.parquet(
            *[os.path.join(s["path"], "docs.parquet")
              for s in manifest["segments"]]
        ).select("docid", *key_cols)
        tomb = set(load_tombstones(index_dir))
        # null-safe, NaN-canonical key equality: a null/NaN key column
        # must still match its committed copy (plain = never matches
        # null, leaving the old version live next to the replacement)
        from jvector_spark.sources.segment import key_join_cond

        incoming = new_docs.select(*key_cols).distinct()
        hits = (
            existing.join(incoming,
                          on=key_join_cond(existing, incoming, key_cols),
                          how="left_semi")
            .select("docid").collect()
        )
        doomed = [int(r["docid"]) for r in hits
                  if int(r["docid"]) not in tomb]
        if doomed:
            mark_deleted(index_dir, doomed)
            n_replaced = len(doomed)
    append_micro_segment(
        new_docs, batch_id=-1, index_dir=index_dir, mode=mode,
        content_col=content_col, key_cols=key_cols, positions=positions,
    )
    return {"replaced": n_replaced, "appended": True}


def replace_docs_bulk(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    out_dir: str,
    segments_per_batch: int = 8,
    block_size: int = BLOCK_SIZE,
    mode: str | None = None,
    positions: bool | None = None,
    key_cols: tuple[str, ...] | None = None,
    content_col: str | None = None,
) -> dict:
    """Bulk upsert — the MERGE-INTO-shaped big sibling of replace_docs
    (the buildAndMergeNewNodes regime, GraphIndexBuilder.java:992-1029,
    vs addGraphNode's incremental one). replace_docs journals a tombstone
    per replaced doc and is therefore driver-bounded by the journal (its
    stated serving-sized-CRUD contract); THIS path never materializes the
    doomed set on the driver:

    1. doomed = existing ⋉ incoming-keys, computed AND WRITTEN
       distributed as parquet partitions doomed/segd=<digest>/ — the
       driver collects only one COUNT per affected segment (needed for
       the compaction's metadata-only docid offsets).
    2. compact_index(doomed_dir=...) rewrites the index into `out_dir`
       with each merge task resolving its own segments' doomed ids
       executor-side (journal tombstones purge in the same pass).
    3. the new docs append to the fresh index (multi-segment build; the
       old copies are gone, so the committed-key dedup passes them).

    Cost model: O(index) rewrite like any major compaction — right when
    the incoming batch is a meaningful fraction of the corpus (a 10^8-key
    re-ingest), wrong for point updates (use replace_docs). Docids
    renumber (epoch bump via the fresh manifest), same contract as
    compact_index; out_dir/docid_map preserves old->new. Crash-safe: the
    source index is read-only throughout; a crash leaves it intact and
    out_dir incomplete (no _SUCCESS-equivalent manifest until the end).

    `new_docs` must be key-unique; duplicate keys would both survive
    (first-writer-wins is not defined for a bulk batch).
    """
    from jvector_spark.sources.segment import key_join_cond
    from jvector_spark.streaming.micro_segments import append_micro_segment

    cfg = index_config(index_dir)
    # same default discipline as replace_docs: the LIVE index's own
    # config, explicit arguments override (the config-drift guard)
    if mode is None:
        mode = cfg["tokenizer_mode"]
    if positions is None:
        positions = cfg["has_positions"]
    if key_cols is None:
        key_cols = cfg["key_cols"]
    if content_col is None:
        content_col = cfg["content_col"]
    manifest = load_manifest(index_dir)
    if not manifest["segments"]:
        raise ValueError("replace_docs_bulk needs a non-empty index; "
                         "bulk-load an empty one instead")
    segs = manifest["segments"]
    doomed_dir = out_dir.rstrip("/") + "._doomed"

    # --- 1. distributed doomed set ------------------------------------
    # segment identity travels WITH each row (input_file_name -> segment
    # dir -> digest via a broadcast map); the driver never sees docids
    existing = (
        spark.read.parquet(
            *[os.path.join(s["path"], "docs.parquet") for s in segs])
        .withColumn(
            "_segdir",
            F.regexp_replace(
                F.regexp_extract(F.input_file_name(),
                                 r"(.*)/docs\.parquet", 1),
                "^file:/+", "/"))
        .select("docid", "_segdir", *key_cols)
    )
    seg_map = F.broadcast(spark.createDataFrame(
        [(os.path.normpath(s["path"]), _seg_digest(s["path"]))
         for s in segs],
        "_segdir string, segd string"))
    incoming = new_docs.select(*key_cols).distinct()
    hits = existing.join(incoming,
                         on=key_join_cond(existing, incoming, key_cols),
                         how="left_semi")
    # keep doomed ∩ journal = ∅ (compact_index's offset contract) WITHOUT
    # materializing a large journal on the driver: the inline regime
    # broadcast-anti-joins the small array, the sharded regime anti-joins
    # the shard parquet read distributed (tombstone_view picks the regime
    # and handles the crash-window stamp check)
    view = tombstone_view(index_dir)
    if view.inline is not None:
        if len(view.inline):
            tomb_df = spark.createDataFrame(
                [(int(t),) for t in view.inline], "docid long")
            hits = hits.join(F.broadcast(tomb_df), "docid", "left_anti")
    else:
        shard_df = (spark.read.schema("docid long")
                    .parquet(_shard_dir(index_dir, view.epoch))
                    .select("docid").distinct())
        hits = hits.join(shard_df, "docid", "left_anti")
    # LEFT join so a hit whose _segdir maps to no known segment survives
    # into a sentinel partition — the path-normalization drift check
    # rides the same job as the doomed write instead of re-running the
    # full scan + semi-join for a second count
    doomed = hits.join(seg_map, "_segdir", "left").select(
        "docid", F.coalesce("segd", F.lit("__unmapped__")).alias("segd"))
    doomed.write.mode("overwrite").partitionBy("segd").parquet(doomed_dir)
    # read the counts back from the COMMITTED files (what the merge tasks
    # will actually see); explicit schema — an all-new-keys batch commits
    # zero doomed rows and inference has nothing to look at
    back = spark.read.schema("docid long, segd string").parquet(doomed_dir)
    counts = {r["segd"]: int(r["n"])
              for r in back.groupBy("segd").agg(
                  F.count("*").alias("n")).collect()}
    # every hit must have mapped to a known segment dir: a URI-vs-path
    # normalization drift between input_file_name and the manifest would
    # otherwise silently drop doomed rows and resurrect old copies
    n_unmapped = counts.pop("__unmapped__", 0)
    if n_unmapped:
        raise RuntimeError(
            f"segment-dir mapping dropped {n_unmapped} doomed rows "
            "(path normalization drift between input_file_name and the "
            "manifest)")
    n_doomed = int(sum(counts.values()))

    # --- 2. rewrite, purging doomed + journal tombstones in-task -------
    compact_index(spark, index_dir, out_dir, block_size=block_size,
                  doomed_dir=doomed_dir, doomed_counts=counts)

    # --- 3. append the replacements to the fresh index -----------------
    append_micro_segment(
        new_docs, batch_id=-2, index_dir=out_dir,
        mode=mode, content_col=content_col,
        key_cols=tuple(key_cols), positions=positions,
        segments_per_batch=segments_per_batch,
    )
    shutil.rmtree(doomed_dir, ignore_errors=True)
    return {"replaced": n_doomed, "index": out_dir}

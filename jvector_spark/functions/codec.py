"""Posting-block codecs: docID-delta + varint / FOR-bitpack, numpy-vectorized.

The analog of the reference's compression operators (SURVEY §2.8):
ProductQuantization encode/decode (quantization/ProductQuantization.java:
418-450 — vector -> compact codes -> approximate vector) becomes here
*lossless* docid-gap compression (postings must decode exactly; BM25 is
exact, unlike ANN). Block structure mirrors PQLayout chunking
(PQVectors.java:430-492): fixed-size blocks (default 128 postings) with
per-block metadata enabling O(1) addressing and block-max pruning
(the FusedADC-style inline metadata, graph/disk/feature/FusedADC.java:39-59).

All encode/decode paths are numpy-vectorized (no per-value Python loops in
the hot path): varint encode is <=10 masked scatter passes; decode is a
flatnonzero/segment-sum; FOR bitpack uses packbits/unpackbits.

Wire format of one block payload (self-describing):
    [docid_codec:1B][len:4B LE][docid-gap bytes]
    [tf_codec:1B]  [len:4B LE][tf bytes]
Gaps are np.diff(docids) (n-1 values); the block's first docid lives in the
dictionary metadata (block_first_docid), like the ODGI header/offset scheme.
"""

from __future__ import annotations

import numpy as np

CODEC_VARINT = 0
CODEC_FOR = 1

_U64 = np.uint64
_SEVEN = _U64(7)


def varint_nbytes(vals: np.ndarray) -> np.ndarray:
    """Per-value LEB128 encoded byte count (vectorized) — lets callers compute
    section offsets into a stream without encoding section-by-section."""
    vals = np.ascontiguousarray(vals, dtype=_U64)
    nb = np.ones(len(vals), dtype=np.int64)
    for i in range(1, 10):
        nb += (vals >= (_U64(1) << _U64(7 * i))).astype(np.int64)
    return nb


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128 encode an array of uint64, fully vectorized."""
    vals = np.ascontiguousarray(vals, dtype=_U64)
    n = len(vals)
    if n == 0:
        return b""
    nb = varint_nbytes(vals)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for pos in range(10):
        mask = nb > pos
        if not mask.any():
            break
        byte = ((vals[mask] >> _U64(7 * pos)) & _U64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > pos).astype(np.uint8) << 7
        out[offsets[mask] + pos] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array, vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=_U64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
    vid = np.repeat(np.arange(len(ends), dtype=np.int64), lens)
    out = np.zeros(len(ends), dtype=_U64)
    np.add.at(out, vid, (b & 0x7F).astype(_U64) << (pos.astype(_U64) * _SEVEN))
    if n is not None and len(out) != n:
        raise ValueError(f"varint_decode: expected {n} values, got {len(out)}")
    return out


def for_encode(vals: np.ndarray) -> bytes:
    """Frame-of-reference bitpack: [width:1B][packed bits]. Lossless."""
    vals = np.ascontiguousarray(vals, dtype=_U64)
    if len(vals) == 0:
        return bytes([0])
    w = int(vals.max()).bit_length()
    if w == 0:
        return bytes([0])
    shifts = np.arange(w - 1, -1, -1, dtype=_U64)
    bits = ((vals[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return bytes([w]) + np.packbits(bits.ravel()).tobytes()


def for_decode(buf: bytes, n: int) -> np.ndarray:
    w = buf[0]
    if w == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8, offset=1))[: n * w]
    bits = bits.reshape(n, w).astype(_U64)
    shifts = np.arange(w - 1, -1, -1, dtype=_U64)
    return (bits << shifts).sum(axis=1, dtype=_U64)


def _encode_section(vals: np.ndarray, codec: int) -> bytes:
    payload = varint_encode(vals) if codec == CODEC_VARINT else for_encode(vals)
    return bytes([codec]) + len(payload).to_bytes(4, "little") + payload


def _decode_section(buf: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    codec = buf[off]
    ln = int.from_bytes(buf[off + 1 : off + 5], "little")
    payload = buf[off + 5 : off + 5 + ln]
    vals = varint_decode(payload, n) if codec == CODEC_VARINT else for_decode(payload, n)
    return vals, off + 5 + ln


def choose_codec(vals: np.ndarray) -> int:
    """Pick the smaller encoding (PFOR-style adaptivity, cheap heuristic):
    FOR wins on dense uniform gaps, varint on skewed ones."""
    if len(vals) == 0:
        return CODEC_FOR
    w = int(vals.max()).bit_length()
    for_bytes = 1 + (len(vals) * w + 7) // 8
    nb = 1 + np.floor_divide(
        np.maximum(np.log2(np.maximum(vals.astype(np.float64), 1.0)), 0.0), 7.0
    )
    return CODEC_FOR if for_bytes <= nb.sum() else CODEC_VARINT


def encode_block(docids: np.ndarray, tfs: np.ndarray) -> bytes:
    """One posting block (docids sorted ascending, parallel tfs) -> payload."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    gaps = np.diff(docids).astype(_U64)
    tfs = np.ascontiguousarray(tfs, dtype=_U64)
    return _encode_section(gaps, choose_codec(gaps)) + _encode_section(
        tfs, choose_codec(tfs)
    )


def decode_block(buf: bytes, n: int, first_docid: int) -> tuple[np.ndarray, np.ndarray]:
    """Payload -> (docids int64 asc, tfs int64). Exact round-trip."""
    gaps, off = _decode_section(buf, 0, n - 1)
    tfs, _ = _decode_section(buf, off, n)
    docids = np.empty(n, dtype=np.int64)
    docids[0] = first_docid
    if n > 1:
        np.cumsum(gaps.astype(np.int64), out=docids[1:])
        docids[1:] += first_docid
    return docids, tfs.astype(np.int64)

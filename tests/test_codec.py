"""Codec round-trip property tests — analog of TestProductQuantization
round-trips (TestProductQuantization.java:57-346) and PQLayout chunk-boundary
edge cases (PQVectors.java:430-492), per FIXTURES.md §6."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jvector_spark.functions.codec import (
    CODEC_FOR,
    CODEC_VARINT,
    decode_block,
    encode_block,
    for_decode,
    for_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(0, 2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr) or len(vals) == 0


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_for_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(for_decode(for_encode(arr), len(arr)), arr)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 100_000])
def test_block_roundtrip_fixture_lengths(n):
    """FIXTURES.md §6: mixed geometric gaps (dense runs + sparse jumps)."""
    rng = np.random.default_rng(n)
    dense = rng.geometric(0.9, n)
    sparse = rng.geometric(1e-5, n)
    pick = rng.random(n) < 0.9
    gaps = np.where(pick, dense, sparse).astype(np.int64)
    docids = np.cumsum(gaps) + 17
    tfs = rng.integers(1, 1000, n)
    payload = encode_block(docids, tfs)
    d2, t2 = decode_block(payload, n, int(docids[0]))
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)


def test_varint_known_values():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    big = np.array([2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(big)), big)


def test_for_zero_width():
    arr = np.zeros(40, dtype=np.uint64)
    enc = for_encode(arr)
    assert enc == bytes([0])
    assert np.array_equal(for_decode(enc, 40), arr)


def test_compression_ratio_on_dense_gaps():
    """Dense posting lists must actually compress (sanity, not a perf test)."""
    rng = np.random.default_rng(0)
    docids = np.sort(rng.choice(100_000, 50_000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 5, len(docids))
    payload = encode_block(docids, tfs)
    raw = len(docids) * 16
    assert len(payload) < raw / 4, f"{len(payload)} vs raw {raw}"

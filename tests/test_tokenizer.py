"""tokenize_factorized (Arrow C++ build-path tokenizer) must produce a
token stream byte-identical to tokenize_series (the pandas twin shared
with the oracle) — the build's rank-identity vs the reference rests on
the two never diverging."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from jvector_spark.functions.tokenizer import (
    tokenize_factorized,
    tokenize_series,
)


def _assert_equivalent(content: pd.Series, mode: str) -> None:
    ref = tokenize_series(content, mode)
    ref_lens = ref.map(len).to_numpy(np.int64)
    ref_flat = [t for toks in ref for t in toks]
    codes, uniq, lens = tokenize_factorized(content, mode)
    assert lens.tolist() == ref_lens.tolist()
    assert uniq[codes].tolist() == ref_flat


def test_code_mode_matches_pandas_twin_on_fixtures():
    from jvector_spark.corpus import generate_corpus

    corpus = generate_corpus(60, seed=13)
    _assert_equivalent(corpus["content"], "code")


def test_simple_mode_matches_pandas_twin_on_fixtures():
    texts = pd.Series(["alpha beta  gamma", "", " x ", "solo",
                       None, "a b c d e"])
    _assert_equivalent(texts, "simple")


def test_code_mode_edge_cases():
    texts = pd.Series([
        "9abc 123 _x 1a2b x9y9 __init__ A9B",   # leading digits / all-digit
        "", "   ", "éclair naïve 日本語 foo",    # non-ASCII separators
        "UPPER lower MiXeD", None, "a" * 5000,
        "tab\tsep\nnewline,comma;semi(paren)",
        # unicode lowering that INTRODUCES ascii letters: U+0130 (İ) lowers
        # to 'i' + combining dot, U+212A (Kelvin K) lowers to plain 'k' —
        # the two paths' lowering (str.lower vs utf8proc) must agree on the
        # ascii residue or the token streams diverge
        "İstanbul Kelvin İİ xK",
    ])
    _assert_equivalent(texts, "code")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=8))
def test_code_mode_property(texts):
    _assert_equivalent(pd.Series(texts, dtype=object), "code")


def test_factorize_handles_sliced_arrow_array():
    # The byte-level walk assumes a zero-offset array; a sliced input must
    # be rematerialized, not silently misparsed off the parent's buffers.
    import pyarrow as pa

    from jvector_spark.functions.tokenizer import _factorize_code_bytes

    full = pa.array(["skip me", "alpha beta1", "x_y 9digit"],
                    type=pa.large_utf8())
    sliced = full.slice(1)
    assert sliced.offset == 1
    codes, uniq, lens = _factorize_code_bytes(sliced)
    assert lens.tolist() == [2, 2]
    assert uniq[codes].tolist() == ["alpha", "beta1", "x_y", "digit"]


def test_factorize_ignores_padding_past_offsets_end():
    # Data buffers may be padded past off[-1]; token runs must stop at the
    # offsets-declared end, not the physical buffer end. Build the padded
    # layout explicitly: offsets say 6 bytes, data buffer carries "fg" past
    # the declared end — a buffer-size-derived nbytes would emit "defg".
    import pyarrow as pa

    from jvector_spark.functions.tokenizer import _factorize_code_bytes

    offsets = pa.array([0, 6], type=pa.int64()).buffers()[1]
    data = pa.py_buffer(b"abc defg")
    padded = pa.Array.from_buffers(pa.large_utf8(), 1,
                                   [None, offsets, data])
    assert padded.to_pylist() == ["abc de"]
    codes, uniq, lens = _factorize_code_bytes(padded)
    assert uniq[codes].tolist() == ["abc", "de"]
    assert lens.tolist() == [2]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    # bias toward the case-mapping troublemakers: İ (full-casing expansion),
    # Kelvin K / Å (lower into non-run chars), Σ (final-sigma context rule)
    alphabet=st.sampled_from(list("İKÅΣab0_ İİK.")), max_size=30), max_size=6))
def test_code_mode_property_special_casing(texts):
    _assert_equivalent(pd.Series(texts, dtype=object), "code")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(codec="ascii"), max_size=40), max_size=8))
def test_simple_mode_property_ascii(texts):
    _assert_equivalent(pd.Series(texts, dtype=object), "simple")

"""Codec roundtrip tests (delta + varbyte)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mwmbl_spark.functions.codec import (
    decode_block,
    delta_decode_blocked,
    delta_encode_blocked,
    slice_block,
    vb_encode_blocked,
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**14 - 1, 2**14, 2**32, 2**63], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_vb_single_byte_values_compact():
    vals = np.arange(128, dtype=np.uint64)
    assert len(vb_encode(vals)) == 128  # one byte each


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 10**12, 10**12 + 1], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_delta_compresses_dense_ids():
    ids = np.arange(10_000, dtype=np.uint64) + 10**15
    enc = delta_encode(ids)
    # gaps of 1 -> ~1 byte per id after the first
    assert len(enc) < 10_020


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63), min_size=1, max_size=200, unique=True
    )
)
def test_delta_roundtrip_property(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


# --- blocked codec (block-addressable streams for WAND skip decode) ----------

def test_delta_encode_blocked_roundtrip_and_block_independence():
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 10**9, size=1000).astype(np.uint64))
    for bs in (4, 128, 7):
        data, offs = delta_encode_blocked(ids, bs)
        assert np.array_equal(delta_decode_blocked(data, bs), ids)
        n_blocks = (len(ids) + bs - 1) // bs
        assert len(offs) == n_blocks
        # every block decodes standalone from its byte slice
        for b in range(n_blocks):
            want = ids[b * bs:(b + 1) * bs]
            assert np.array_equal(decode_block(data, offs, b), want), (bs, b)


def test_vb_encode_blocked_offsets_slice_blocks():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 2**40, size=300).astype(np.uint64)
    bs = 64
    data, offs = vb_encode_blocked(vals, bs)
    assert np.array_equal(vb_decode(data), vals)
    for b in range((len(vals) + bs - 1) // bs):
        got = vb_decode(slice_block(data, offs, b))
        assert np.array_equal(got, vals[b * bs:(b + 1) * bs])


def test_blocked_empty():
    data, offs = delta_encode_blocked(np.empty(0, dtype=np.uint64), 128)
    assert data == b"" and len(offs) == 0
    assert delta_decode_blocked(b"", 128).size == 0


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True
    ),
    st.sampled_from([1, 3, 64, 128]),
)
def test_blocked_roundtrip_property(vals, bs):
    ids = np.sort(np.array(vals, dtype=np.uint64))
    data, offs = delta_encode_blocked(ids, bs)
    assert np.array_equal(delta_decode_blocked(data, bs), ids)
    # every block independently
    n_blocks = (len(ids) + bs - 1) // bs
    blk = np.random.default_rng(0).integers(0, n_blocks)
    assert np.array_equal(
        decode_block(data, offs, int(blk)), ids[blk * bs:(blk + 1) * bs]
    )

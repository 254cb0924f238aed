"""Codec roundtrip tests (delta + varbyte)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mwmbl_spark.functions.codec import (
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

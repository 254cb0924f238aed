"""Posting-list compression codec: delta + varbyte, vectorized NumPy.

The reference compresses each index page with zstd over JSON
(/root/reference/mwmbl/tinysearchengine/indexer.py:161-176). For a
columnar posting store the standard IR codec is delta-encoding the
sorted docID gaps then variable-byte packing (Zobel & Moffat,
"Inverted files for text search engines"); Parquet's zstd then squeezes
the byte stream further. Everything here is vectorized NumPy — these
run inside Arrow-batched ``applyInPandas`` groups, never per-row
Python at the Spark boundary.

Encoding: little-endian base-128 with a continuation bit (MSB set on
every byte except the last byte of each value).
"""

from __future__ import annotations

import numpy as np

_MAX_VB_BYTES = 10  # 64-bit values need at most ceil(64/7) = 10 septets


def vb_encode(values: np.ndarray) -> bytes:
    """Variable-byte encode an array of non-negative int64/uint64."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = values.size
    if n == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit thresholds crossed
    nb = np.ones(n, dtype=np.int64)
    for j in range(1, _MAX_VB_BYTES):
        nb += (values >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    ends = np.cumsum(nb)
    total = int(ends[-1])
    starts = ends - nb
    out = np.empty(total, dtype=np.uint8)
    for j in range(_MAX_VB_BYTES):
        mask = nb > j
        if not mask.any():
            break
        septet = ((values[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = septet | cont
    return out.tobytes()


def vb_decode(data: bytes) -> np.ndarray:
    """Inverse of ``vb_encode`` -> uint64 array."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = raw < 128
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    pos_within = np.arange(raw.size, dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_within.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta + varbyte encode a strictly-increasing uint64 array."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return vb_encode(gaps)


def delta_decode(data: bytes) -> np.ndarray:
    gaps = vb_decode(data)
    return np.cumsum(gaps, dtype=np.uint64)

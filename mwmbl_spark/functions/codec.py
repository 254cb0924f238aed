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


def _vb_encode_raw(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode + per-value byte START offsets (for block-addressable
    streams)."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = values.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
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
    return out.tobytes(), starts


def vb_encode(values: np.ndarray) -> bytes:
    """Variable-byte encode an array of non-negative int64/uint64."""
    return _vb_encode_raw(values)[0]


def vb_encode_blocked(values: np.ndarray, block_size: int) -> tuple[bytes, np.ndarray]:
    """(stream, block byte offsets): the byte offset of every
    ``block_size``-th value, so any block decodes standalone from its
    slice — the skip-pointer structure driving block-max pruning."""
    data, starts = _vb_encode_raw(values)
    return data, starts[::block_size].astype(np.int64)


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


def delta_encode_blocked(
    sorted_ids: np.ndarray, block_size: int
) -> tuple[bytes, np.ndarray]:
    """Blocked delta + varbyte: the delta chain RESTARTS at every block
    boundary (each block's first value is stored absolute), so a block
    decodes from its byte slice alone — no prefix scan. Returns
    (stream, per-block byte offsets)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[::block_size] = ids[::block_size]  # absolute at block starts
    return vb_encode_blocked(gaps, block_size)


def delta_decode_blocked(data: bytes, block_size: int) -> np.ndarray:
    """Full-stream inverse of ``delta_encode_blocked`` (cumsum with a
    reset at every block boundary, vectorized)."""
    gaps = vb_decode(data)
    n = gaps.size
    if n == 0:
        return gaps
    c = np.cumsum(gaps, dtype=np.uint64)
    starts = np.arange(0, n, block_size)
    # at each block start the stored value is absolute; subtract the
    # spurious prefix the global cumsum added, per block
    prefix = c[starts] - gaps[starts]
    reps = np.diff(np.append(starts, n))
    return c - np.repeat(prefix, reps)


def decode_block(data: bytes, offsets: np.ndarray, block: int) -> np.ndarray:
    """Decode ONE block of a blocked delta+varbyte stream (uint64 ids)."""
    end = int(offsets[block + 1]) if block + 1 < len(offsets) else len(data)
    gaps = vb_decode(data[int(offsets[block]):end])
    return np.cumsum(gaps, dtype=np.uint64)


def slice_block(data: bytes, offsets: np.ndarray, block: int) -> bytes:
    """Byte slice of one block of any blocked varbyte stream."""
    end = int(offsets[block + 1]) if block + 1 < len(offsets) else len(data)
    return data[int(offsets[block]):end]

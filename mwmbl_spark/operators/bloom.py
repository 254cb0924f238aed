"""Distributed Bloom-filter build for seen-set membership.

The reference's crawler de-duplicates candidate URLs against the
URL store with database EXISTS checks
(/root/reference/mwmbl/indexer/update_urls.py:60-81 — the seen-set is
a Postgres table) and the engine's J6 analogue here is a left_anti
join (operators/urls.py:79). Both re-shuffle the candidate stream
against the full seen-set every epoch. A Bloom filter is the classic
third option: build once over the seen-set, ship ~1.2 GB of bits for
a BILLION seen URLs at 1% FPR, and pre-filter candidates locally with
zero shuffle — the anti-join then only runs over the (tiny)
maybe-seen residue, or is skipped entirely where the crawl tolerates
a bounded re-fetch rate.

Build plan (the 100 TB lens): k hash positions per item (JVM
``xxhash64`` with per-hash tweak columns, no Python), explode ->
(word_idx, bit) -> ``bit_or`` hash aggregation WITH map-side partial
combine: the shuffle carries at most ``m_bits/64`` rows PER PARTITION
regardless of input size, and the collected result is bounded by the
filter size, never the data. Membership (``filter_unseen``) computes
the same positions JVM-side — hash parity between build and probe is
by construction, not by twin maintenance — and only the O(1) bitset
gather runs in Python (vectorized numpy over Arrow batches, broadcast
bitset).

Bloom guarantees: no false negatives ever (a seen item is always
flagged maybe-seen); false positives at the designed rate drop
genuinely-new items — acceptable for crawl scheduling (a URL skipped
this epoch surfaces next epoch), NOT for correctness-critical dedup;
use the exact anti-join there.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAGIC = b"MWBF1\x00"


def bloom_parameters(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2
    hashes, m rounded up to a whole 64-bit word."""
    if n_items <= 0:
        return 64, 1
    m = math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(col: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """k independent bit positions: Spark chains multi-arg xxhash64
    (each arg hashed with the running hash as seed), so (col, i) gives
    k decorrelated 64-bit hashes of the same value, JVM-side."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k_hashes)
    ]


@dataclass
class BloomFilter:
    words: np.ndarray  # uint64, len = m_bits // 64
    m_bits: int
    k_hashes: int

    def contains(self, positions: np.ndarray) -> np.ndarray:
        """positions: (n, k) int64 -> (n,) bool, True = maybe-seen
        (all k bits set)."""
        w = self.words[positions >> 6]
        bits = (w >> (positions & 63).astype(np.uint64)) & np.uint64(1)
        return bits.all(axis=1)

    def to_bytes(self) -> bytes:
        head = (
            _MAGIC
            + int(self.m_bits).to_bytes(8, "little")
            + int(self.k_hashes).to_bytes(4, "little")
        )
        return head + self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        if raw[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a mwmbl_spark bloom filter blob")
        m_bits = int.from_bytes(raw[6:14], "little")
        k = int.from_bytes(raw[14:18], "little")
        words = np.frombuffer(raw[18:], dtype="<u8").copy()
        return cls(words=words, m_bits=m_bits, k_hashes=k)


def build_bloom(
    seen: DataFrame, col: str, m_bits: int, k_hashes: int
) -> BloomFilter:
    """Aggregate the seen-set into a BloomFilter. The collect is
    bounded by the filter size (m_bits/64 rows max), not the data."""
    pos = seen.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, k_hashes))).alias("pos")
    )
    words = (
        pos.select(
            F.expr("pos DIV 64").alias("word_idx"),
            # F.shiftleft takes a python-int bit count; column shifts
            # need the SQL form
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words.collect():
        arr[r.word_idx] = np.uint64(r.word & ((1 << 64) - 1))
    return BloomFilter(words=arr, m_bits=m_bits, k_hashes=k_hashes)


def filter_unseen(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """Rows whose ``col`` is DEFINITELY not in the seen-set (>= 1 of
    the k bits unset). Positions are computed by the same JVM
    expressions as the build; Python only gathers from the broadcast
    bitset, vectorized per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    k = bloom.k_hashes
    out_schema = df.schema
    staged = df.withColumn(
        "_bpos", F.array(*_positions(F.col(col), bloom.m_bits, k))
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter.from_bytes(bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = np.stack(pdf["_bpos"].to_numpy()).astype(np.int64)
            maybe_seen = bf.contains(pos)
            yield pdf.loc[~maybe_seen, [f.name for f in out_schema.fields]]

    return staged.mapInPandas(gate, schema=out_schema)

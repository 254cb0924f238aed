"""Block-max posting segments — the engine's index storage format.

The reference's TinyIndex is a hashed array of fixed 4 KiB zstd pages,
one page per ``hash(term) % N``, docs stored best-first and truncated
to fit (/root/reference/mwmbl/tinysearchengine/indexer.py:128-176,
219-221). The Spark-native analogue is a bucketed segment table:

    segments(bucket, term, salt, n_postings, max_partial,
             block_maxes array<double>, doc_ids binary, tfs binary,
             doc_lens binary)

- ``bucket  = pmod(xxhash64(term), NUM_BUCKETS)`` — partition column;
  query-time scans prune to the buckets of the query's terms (the
  Spark analogue of the reference's page lookup).
- ``salt    = pmod(xxhash64(doc_id), NSALT)`` — a GLOBAL doc-space
  partitioning shared by every term. Hot (Zipf-head) terms are thereby
  split into NSALT bounded segments (skew control, the analogue of the
  reference's per-domain caps redis_url_queue.py:31-34), and because
  the doc->salt mapping is term-independent, per-salt top-k is exact:
  each doc's full score lives in exactly one salt partition.
- postings are sorted by doc_id and delta+varbyte compressed
  (functions/codec.py); tf and doc_len ride along varbyte-encoded.
- ``max_partial`` / ``block_maxes`` (blocks of 128 postings) store the
  segment/block upper bound of the BM25 term contribution at build
  time — the block-max metadata driving dynamic pruning at query time
  (operators/wand.py).

Everything heavy is a DataFrame op; the encode kernel is an
Arrow-batched ``applyInPandas`` with vectorized NumPy inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark import BM25_B, BM25_K1, DEFAULT_NUM_BUCKETS
from mwmbl_spark.functions.codec import delta_encode, vb_encode

DEFAULT_NSALT = 8
BLOCK_SIZE = 128

SEGMENT_SCHEMA = (
    "bucket int, term string, salt int, n_postings long, max_partial double, "
    "block_maxes array<double>, doc_ids binary, tfs binary, doc_lens binary"
)


def bucket_of(term_col, num_buckets: int = DEFAULT_NUM_BUCKETS):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def salt_of(doc_col, nsalt: int = DEFAULT_NSALT):
    return F.pmod(F.xxhash64(doc_col), F.lit(nsalt)).cast("int")


def _bm25_partial_np(tf: np.ndarray, doc_len: np.ndarray, idf: float, avg_len: float) -> np.ndarray:
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len / avg_len)
    return idf * tf * (BM25_K1 + 1.0) / denom


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame,
    stats: DataFrame,
    n_docs: int,
    avg_len: float,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    nsalt: int = DEFAULT_NSALT,
) -> DataFrame:
    """postings + doc_lens + stats -> compressed block-max segments.

    Shuffle profile: one join on doc_id (doc_lens side), one broadcast
    (stats), then a single repartition-by-(term, salt) into the encode
    kernel. Hot terms split across NSALT groups, so no reducer sees
    more than df(term)/NSALT postings.
    """
    enriched = (
        postings.join(doc_lens, "doc_id")
        .join(F.broadcast(stats.select("term", "df")), "term")
        .select(
            "term",
            "doc_id",
            "tf",
            "doc_len",
            "df",
            salt_of(F.col("doc_id"), nsalt).alias("salt"),
        )
    )

    n_docs_f, avg_len_f = float(n_docs), float(avg_len)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
        tf = pdf["tf"].to_numpy()[order].astype(np.uint64)
        dlen = pdf["doc_len"].to_numpy()[order].astype(np.uint64)
        df_val = float(pdf["df"].iloc[0])
        idf = np.log((n_docs_f - df_val + 0.5) / (df_val + 0.5) + 1.0)
        partial = _bm25_partial_np(tf.astype(np.float64), dlen.astype(np.float64), idf, avg_len_f)
        n = len(ids)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        block_maxes = [
            float(partial[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max())
            for i in range(n_blocks)
        ]
        return pd.DataFrame(
            {
                "bucket": [0],  # recomputed below as a column expr
                "term": [term],
                "salt": [salt],
                "n_postings": [n],
                "max_partial": [float(partial.max())],
                "block_maxes": [block_maxes],
                "doc_ids": [delta_encode(ids)],
                "tfs": [vb_encode(tf)],
                "doc_lens": [vb_encode(dlen)],
            }
        )

    segs = enriched.groupBy("term", "salt").applyInPandas(encode, schema=SEGMENT_SCHEMA)
    return segs.withColumn("bucket", bucket_of(F.col("term"), num_buckets))


def write_segments(segs: DataFrame, path: str) -> None:
    """Persist partitioned by bucket (zstd Parquet): query-side scans
    prune to ``bucket IN (hash(term) % N for term in query)`` — the
    Spark analogue of the reference's page lookup, but with Catalyst
    partition pruning doing the seek."""
    segs.write.mode("overwrite").partitionBy("bucket").parquet(path)


def prune_segments(
    segs: DataFrame, terms_df: DataFrame, num_buckets: int = DEFAULT_NUM_BUCKETS
) -> DataFrame:
    """Bucket-pruned scan: filter on the (small, collected) bucket set of
    the query terms — becomes a partition filter on the parquet scan —
    then exact term membership via broadcast semi join. ``num_buckets``
    must match the value the segments were built with."""
    buckets = [
        r["b"]
        for r in terms_df.select(bucket_of(F.col("term"), num_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    return segs.where(F.col("bucket").isin(buckets)).join(
        F.broadcast(terms_df.select("term").distinct()), "term", "left_semi"
    )

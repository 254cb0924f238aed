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
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

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


@pandas_udf(BinaryType())
def _delta_vb_pd(ids: pd.Series) -> pd.Series:
    """delta+varbyte encode per row (row = one segment's sorted doc_id
    array); Arrow hands each element as a NumPy array."""
    return ids.map(lambda a: delta_encode(np.asarray(a, dtype=np.uint64)))


@pandas_udf(BinaryType())
def _vb_pd(vals: pd.Series) -> pd.Series:
    return vals.map(lambda a: vb_encode(np.asarray(a, dtype=np.uint64)))


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame | None,
    stats: DataFrame,
    n_docs: int,
    avg_len: float,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    nsalt: int = DEFAULT_NSALT,
) -> DataFrame:
    """postings (+ doc_lens) + stats -> compressed block-max segments.

    When postings already carry ``doc_len``
    (postings.build_postings_with_len) pass ``doc_lens=None`` and the
    doc_id join is skipped entirely. Shuffle profile then: one broadcast
    (stats), one groupBy(term, salt) collect. Hot terms split across
    NSALT groups, so no reducer sees more than ~df(term)/NSALT postings.

    The per-segment assembly (sort by doc_id, per-posting BM25 partial,
    block maxima) is ALL JVM column expressions — sort_array over
    collect_list'ed structs, transform/slice/array_max for block-max.
    Python appears only in the Arrow-batched varbyte codec UDFs (one
    call per ~10k segments, NumPy inside), not per group — the earlier
    applyInPandas version paid ~1ms pandas overhead per (term, salt)
    group, which dominated the build at high group counts.
    """
    k1, b = BM25_K1, BM25_B
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_d = F.col("tf").cast("double")
    partial = (
        idf * tf_d * (k1 + 1.0)
        / (tf_d + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / F.lit(float(avg_len))))
    )
    with_len = postings if doc_lens is None else postings.join(doc_lens, "doc_id")
    enriched = (
        with_len
        .join(F.broadcast(stats.select("term", "df")), "term")
        .select(
            "term",
            "doc_id",
            "tf",
            "doc_len",
            salt_of(F.col("doc_id"), nsalt).alias("salt"),
            partial.alias("partial"),
        )
    )
    grouped = enriched.groupBy("term", "salt").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tf", "doc_len", "partial"))
        ).alias("posts"),
        F.count(F.lit(1)).alias("n_postings"),
        F.max("partial").alias("max_partial"),
    )
    n_blocks = F.ceil(F.col("n_postings") / BLOCK_SIZE).cast("int")
    return grouped.select(
        bucket_of(F.col("term"), num_buckets).alias("bucket"),
        "term",
        "salt",
        "n_postings",
        "max_partial",
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda blk: F.array_max(
                F.transform(
                    F.slice(F.col("posts"), blk * BLOCK_SIZE + 1, BLOCK_SIZE),
                    lambda p: p["partial"],
                )
            ),
        ).alias("block_maxes"),
        _delta_vb_pd(F.transform("posts", lambda p: p["doc_id"])).alias("doc_ids"),
        _vb_pd(F.transform("posts", lambda p: p["tf"])).alias("tfs"),
        _vb_pd(F.transform("posts", lambda p: p["doc_len"])).alias("doc_lens"),
    )


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

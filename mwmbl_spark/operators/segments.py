"""Block-max posting segments — the engine's index storage format.

The reference's TinyIndex is a hashed array of fixed 4 KiB zstd pages,
one page per ``hash(term) % N``, docs stored best-first and truncated
to fit (/root/reference/mwmbl/tinysearchengine/indexer.py:128-176,
219-221). The Spark-native analogue is a bucketed segment table:

    segments(bucket, term, salt, n_postings, avg_len_build,
             max_tfn, block_maxes array<double>, block_last array<long>,
             boffs_ids/boffs_tfs/boffs_lens array<int>,
             doc_ids binary, tfs binary, doc_lens binary)

- ``bucket  = pmod(xxhash64(term), NUM_BUCKETS)`` — partition column;
  query-time scans prune to the buckets of the query's terms (the
  Spark analogue of the reference's page lookup).
- ``salt    = pmod(xxhash64(doc_id), NSALT)`` — a GLOBAL doc-space
  partitioning shared by every term. Hot (Zipf-head) terms are thereby
  split into NSALT bounded segments (skew control, the analogue of the
  reference's per-domain caps redis_url_queue.py:31-34), and because
  the doc->salt mapping is term-independent, per-salt top-k is exact:
  each doc's full score lives in exactly one salt partition.
- postings are sorted by doc_id and compressed with BLOCKED
  delta+varbyte (functions/codec.py): the delta chain restarts every
  BLOCK_SIZE postings and ``boffs_*`` store each block's byte offset,
  so the query kernel decodes ONLY the blocks it touches. ``block_last``
  (last doc_id per block) locates a candidate's block by binary search
  without any decode.
- ``max_tfn`` / ``block_maxes`` store the segment/block maximum of the
  idf-FREE BM25 tf-normalization component
  tfn = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl_build)); the query-time
  upper bound is idf_query · tfn_max · max(1, avgdl_query/avgdl_build)
  — exact idf from current stats, and provably conservative under
  corpus growth (see operators/wand.py for the proof), so stored
  bounds never go stale. ``avg_len_build`` rides along per segment.

Everything heavy is a DataFrame op; the encode kernel is a single
Arrow-batched struct-returning pandas UDF with vectorized NumPy inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mwmbl_spark import BM25_B, BM25_K1, DEFAULT_NUM_BUCKETS
from mwmbl_spark.functions.codec import delta_encode_blocked, vb_encode_blocked

DEFAULT_NSALT = 8
BLOCK_SIZE = 128

SEGMENT_SCHEMA = (
    "bucket int, term string, salt int, n_postings long, avg_len_build double, "
    "max_tfn double, block_maxes array<double>, block_last array<long>, "
    "boffs_ids array<int>, boffs_tfs array<int>, boffs_lens array<int>, "
    "doc_ids binary, tfs binary, doc_lens binary"
)

_ENC_SCHEMA = StructType(
    [
        StructField("doc_ids", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("doc_lens", BinaryType()),
        StructField("block_last", ArrayType(LongType())),
        StructField("boffs_ids", ArrayType(IntegerType())),
        StructField("boffs_tfs", ArrayType(IntegerType())),
        StructField("boffs_lens", ArrayType(IntegerType())),
    ]
)


def bucket_of(term_col, num_buckets: int = DEFAULT_NUM_BUCKETS):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def salt_of(doc_col, nsalt: int = DEFAULT_NSALT):
    return F.pmod(F.xxhash64(doc_col), F.lit(nsalt)).cast("int")


@pandas_udf(_ENC_SCHEMA)
def _encode_pd(ids: pd.Series, tfs: pd.Series, lens: pd.Series) -> pd.DataFrame:
    """Blocked delta+varbyte encode per row (row = one segment's sorted
    posting arrays); Arrow hands each element as a NumPy array. One UDF
    call per ~10k segments, NumPy inside — never per-row Python."""
    out = {k.name: [] for k in _ENC_SCHEMA.fields}
    for a_ids, a_tfs, a_lens in zip(ids, tfs, lens):
        signed = np.asarray(a_ids, dtype=np.int64)
        if signed.size and signed[0] < 0:  # sorted asc: first is the min
            raise ValueError(
                "doc_id must be non-negative: the kernel's binary search "
                "requires signed order == uint64 order (synth.with_doc_id "
                "clears the sign bit; do the same for custom id schemes)"
            )
        v_ids = signed.astype(np.uint64)
        d_ids, o_ids = delta_encode_blocked(v_ids, BLOCK_SIZE)
        d_tfs, o_tfs = vb_encode_blocked(np.asarray(a_tfs, dtype=np.uint64), BLOCK_SIZE)
        d_lens, o_lens = vb_encode_blocked(np.asarray(a_lens, dtype=np.uint64), BLOCK_SIZE)
        n = v_ids.size
        last_idx = np.minimum(
            np.arange(BLOCK_SIZE - 1, n + BLOCK_SIZE - 1, BLOCK_SIZE), n - 1
        )
        out["doc_ids"].append(d_ids)
        out["tfs"].append(d_tfs)
        out["doc_lens"].append(d_lens)
        out["block_last"].append(v_ids[last_idx].astype(np.int64))
        out["boffs_ids"].append(o_ids.astype(np.int32))
        out["boffs_tfs"].append(o_tfs.astype(np.int32))
        out["boffs_lens"].append(o_lens.astype(np.int32))
    return pd.DataFrame(out)


_POS_SCHEMA = StructType(
    [
        StructField("pos_offs", ArrayType(IntegerType())),
        StructField("positions", BinaryType()),
    ]
)


@pandas_udf(_POS_SCHEMA)
def _encode_positions_pd(plists: pd.Series) -> pd.DataFrame:
    """Per-segment positional payload (round-6): each posting's sorted
    1-based token positions, delta-encoded WITHIN the posting (first
    value absolute) and varbyte-packed into one blob; ``pos_offs``
    holds n_postings+1 byte offsets so the phrase kernel decodes ONLY
    the postings surviving the candidate intersection. Fully
    vectorized: one concatenate + one vb_encode per segment row."""
    from mwmbl_spark.functions.codec import _vb_encode_raw

    offs_out, blob_out = [], []
    for plist in plists:
        counts = np.fromiter((len(x) for x in plist), dtype=np.int64, count=len(plist))
        if counts.sum() == 0:
            offs_out.append(np.zeros(len(plist) + 1, dtype=np.int32))
            blob_out.append(b"")
            continue
        flat = np.concatenate([np.asarray(x, dtype=np.uint64) for x in plist])
        starts_idx = np.zeros(len(plist) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts_idx[1:])
        deltas = flat.copy()
        deltas[1:] -= flat[:-1]
        heads = starts_idx[:-1][counts > 0]
        deltas[heads] = flat[heads]  # restart the chain at each posting
        blob, val_starts = _vb_encode_raw(deltas)
        byte_offs = np.empty(len(plist) + 1, dtype=np.int32)
        # a zero-count posting shares its successor's offset (empty slice)
        ends = np.append(val_starts, len(blob))
        byte_offs[:] = ends[np.minimum(starts_idx, len(flat))]
        offs_out.append(byte_offs)
        blob_out.append(blob)
    return pd.DataFrame({"pos_offs": offs_out, "positions": blob_out})


def decode_positions(blob: bytes, pos_offs: np.ndarray, i: int) -> np.ndarray:
    """Positions (1-based, sorted) of posting ``i`` — the phrase
    kernel's survivor-grain decode (one varbyte slice + cumsum)."""
    from mwmbl_spark.functions.codec import vb_decode

    lo, hi = int(pos_offs[i]), int(pos_offs[i + 1])
    if hi <= lo:
        return np.empty(0, dtype=np.uint64)
    return np.cumsum(vb_decode(bytes(blob[lo:hi])), dtype=np.uint64)


def decode_all_positions(blob: bytes, pos_offs: np.ndarray) -> list[np.ndarray]:
    """EVERY posting's position array of one segment row, vectorized —
    the compaction-path inverse of ``_encode_positions_pd`` (a
    per-posting ``decode_positions`` loop would be O(n_postings)
    interpreted Python; a compaction decodes whole fragments).

    One ``vb_decode`` over the whole blob gives the flat delta stream;
    per-posting value counts come from counting varbyte TERMINATOR
    bytes (high bit clear) inside each posting's byte range, and the
    per-posting cumsum (the delta chain restarts at each posting) is
    the grouped-cumsum trick: global cumsum minus each group head's
    spurious prefix."""
    from mwmbl_spark.functions.codec import vb_decode

    pos_offs = np.asarray(pos_offs, dtype=np.int64)
    n_post = len(pos_offs) - 1
    raw = np.frombuffer(bytes(blob), dtype=np.uint8)
    if raw.size == 0:
        return [np.empty(0, dtype=np.int32)] * max(n_post, 0)
    vals = vb_decode(bytes(blob))
    cum_last = np.zeros(raw.size + 1, dtype=np.int64)
    np.cumsum(raw < 128, out=cum_last[1:])
    counts = cum_last[pos_offs[1:]] - cum_last[pos_offs[:-1]]
    c = np.cumsum(vals, dtype=np.uint64)
    heads = np.concatenate(([0], np.cumsum(counts)))[:-1]
    nz = counts > 0
    prefix = np.zeros(n_post, dtype=np.uint64)
    prefix[nz] = c[heads[nz]] - vals[heads[nz]]
    flat = c - np.repeat(prefix, counts)
    bounds = np.cumsum(counts)[:-1]
    return [a.astype(np.int32) for a in np.split(flat, bounds)]


def build_segments(
    postings: DataFrame,
    doc_lens: DataFrame | None,
    stats: DataFrame,
    n_docs: int,
    avg_len: float,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    nsalt: int = DEFAULT_NSALT,
    positions_col: str | None = None,
) -> DataFrame:
    """postings (+ doc_lens) + stats -> compressed block-max segments.

    ``positions_col`` (round-6, OPTIONAL positional payload): name of an
    array<int> column on ``postings`` holding each (term, doc)'s sorted
    1-based token positions (positional_postings builds it). The output
    then carries two extra columns — ``pos_offs array<int>`` and
    ``positions binary`` (per-posting delta+varbyte, offset-addressable)
    — enabling index-side phrase serving (operators/positional.py);
    the WAND kernel ignores them, so ONE table serves both paths.

    When postings already carry ``doc_len``
    (postings.build_postings_with_len) pass ``doc_lens=None`` and the
    doc_id join is skipped entirely. Shuffle profile then: one broadcast
    (stats... unused beyond pass-through), one groupBy(term, salt)
    collect. Hot terms split across NSALT groups, so no reducer sees
    more than ~df(term)/NSALT postings.

    The per-segment assembly (sort by doc_id, per-posting tfn, block
    maxima) is ALL JVM column expressions — sort_array over
    collect_list'ed structs, transform/slice/array_max for block-max.
    Python appears only in the Arrow-batched blocked-varbyte codec UDF.

    tfn is stored idf-free: idf changes as the corpus grows, tfn's only
    corpus dependency is avgdl — captured by ``avg_len_build``, so the
    query-time bound correction is a single multiply (wand.py).
    """
    k1, b = BM25_K1, BM25_B
    tf_d = F.col("tf").cast("double")
    # EXACT float-expression twin of the kernel's NumPy computation
    # (same association order -> bitwise-identical doubles)
    tfn = (tf_d * (k1 + 1.0)) / (
        tf_d + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / F.lit(float(avg_len)))
    )
    with_len = postings if doc_lens is None else postings.join(doc_lens, "doc_id")
    pos_cols = [F.col(positions_col).alias("plist")] if positions_col else []
    enriched = with_len.select(
        "term",
        "doc_id",
        "tf",
        "doc_len",
        salt_of(F.col("doc_id"), nsalt).alias("salt"),
        tfn.alias("tfn"),
        *pos_cols,
    )
    struct_cols = ["doc_id", "tf", "doc_len", "tfn"] + (["plist"] if positions_col else [])
    grouped = enriched.groupBy("term", "salt").agg(
        F.sort_array(
            F.collect_list(F.struct(*struct_cols))
        ).alias("posts"),
        F.count(F.lit(1)).alias("n_postings"),
        F.max("tfn").alias("max_tfn"),
    )
    n_blocks = F.ceil(F.col("n_postings") / BLOCK_SIZE).cast("int")
    enc = _encode_pd(
        F.transform("posts", lambda p: p["doc_id"]),
        F.transform("posts", lambda p: p["tf"]),
        F.transform("posts", lambda p: p["doc_len"]),
    )
    pos_enc = (
        [_encode_positions_pd(F.transform("posts", lambda p: p["plist"])).alias("penc")]
        if positions_col
        else []
    )
    pos_out = (
        [F.col("penc.pos_offs").alias("pos_offs"),
         F.col("penc.positions").alias("positions")]
        if positions_col
        else []
    )
    return grouped.select(
        bucket_of(F.col("term"), num_buckets).alias("bucket"),
        "term",
        "salt",
        "n_postings",
        F.lit(float(avg_len)).alias("avg_len_build"),
        "max_tfn",
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda blk: F.array_max(
                F.transform(
                    F.slice(F.col("posts"), blk * BLOCK_SIZE + 1, BLOCK_SIZE),
                    lambda p: p["tfn"],
                )
            ),
        ).alias("block_maxes"),
        enc.alias("enc"),
        *pos_enc,
    ).select(
        "bucket", "term", "salt", "n_postings", "avg_len_build", "max_tfn",
        "block_maxes",
        F.col("enc.block_last").alias("block_last"),
        F.col("enc.boffs_ids").alias("boffs_ids"),
        F.col("enc.boffs_tfs").alias("boffs_tfs"),
        F.col("enc.boffs_lens").alias("boffs_lens"),
        F.col("enc.doc_ids").alias("doc_ids"),
        F.col("enc.tfs").alias("tfs"),
        F.col("enc.doc_lens").alias("doc_lens"),
        *pos_out,
    )


def write_segments(segs: DataFrame, path: str) -> None:
    """Persist partitioned by bucket (zstd Parquet): query-side scans
    prune to ``bucket IN (hash(term) % N for term in query)`` — the
    Spark analogue of the reference's page lookup, but with Catalyst
    partition pruning doing the seek."""
    segs.write.mode("overwrite").partitionBy("bucket").parquet(path)


def prune_segments(
    segs: DataFrame,
    terms_df: DataFrame,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Bucket-pruned scan: filter on the (small) bucket set of the
    query terms — becomes a partition filter on the parquet scan —
    then exact term membership via broadcast semi join. ``num_buckets``
    must match the value the segments were built with.

    ``buckets``: pass the precomputed bucket list (e.g. from the
    driver-side xxhash64 twin, functions/xxhash.py) to skip the collect
    job entirely — the serving fast path. When collected here, the
    collect deliberately has NO distinct: deduping a query-batch-sized
    list driver-side avoids a 32-partition exchange whose scheduling
    costs ~1 s per batch (measured); the semi join still deduplicates
    term membership exactly."""
    if buckets is None:
        buckets = sorted(
            {
                r["b"]
                for r in terms_df.select(
                    bucket_of(F.col("term"), num_buckets).alias("b")
                ).collect()
            }
        )
    return segs.where(F.col("bucket").isin(list(buckets))).join(
        F.broadcast(terms_df.select("term").distinct()), "term", "left_semi"
    )

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

Everything heavy is a DataFrame op; per-segment assembly + blocked
varbyte encode run in one Arrow-NATIVE ``applyInArrow`` kernel over
(bucket, salt) groups — posting columns stay contiguous Arrow buffers,
vectorized NumPy inside, no per-posting Python objects (r7: one
exchange end-to-end — see ``build_segments``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def bucket_of(term_col, num_buckets: int = DEFAULT_NUM_BUCKETS):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def salt_of(doc_col, nsalt: int = DEFAULT_NSALT):
    return F.pmod(F.xxhash64(doc_col), F.lit(nsalt)).cast("int")


def _encode_posting_arrays(
    signed_ids: np.ndarray, tfs: np.ndarray, lens: np.ndarray
) -> tuple:
    """Blocked delta+varbyte encode of ONE segment's doc_id-sorted
    posting arrays -> (doc_ids, tfs, doc_lens, block_last, boffs_ids,
    boffs_tfs, boffs_lens). Vectorized NumPy — never per-row Python."""
    if signed_ids.size and signed_ids[0] < 0:  # sorted asc: first is the min
        raise ValueError(
            "doc_id must be non-negative: the kernel's binary search "
            "requires signed order == uint64 order (synth.with_doc_id "
            "clears the sign bit; do the same for custom id schemes)"
        )
    v_ids = signed_ids.astype(np.uint64)
    d_ids, o_ids = delta_encode_blocked(v_ids, BLOCK_SIZE)
    d_tfs, o_tfs = vb_encode_blocked(tfs.astype(np.uint64), BLOCK_SIZE)
    d_lens, o_lens = vb_encode_blocked(lens.astype(np.uint64), BLOCK_SIZE)
    n = v_ids.size
    last_idx = np.minimum(
        np.arange(BLOCK_SIZE - 1, n + BLOCK_SIZE - 1, BLOCK_SIZE), n - 1
    )
    return (
        d_ids,
        d_tfs,
        d_lens,
        v_ids[last_idx].astype(np.int64),
        o_ids.astype(np.int32),
        o_tfs.astype(np.int32),
        o_lens.astype(np.int32),
    )


def _encode_positions_flat(
    flat: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, bytes]:
    """Per-segment positional payload (round-6): each posting's sorted
    1-based token positions, delta-encoded WITHIN the posting (first
    value absolute) and varbyte-packed into one blob; ``pos_offs``
    holds n_postings+1 byte offsets so the phrase kernel decodes ONLY
    the postings surviving the candidate intersection. Takes the FLAT
    concatenated position stream plus per-posting counts (the Arrow
    list-array layout, so the kernel never materializes per-posting
    Python objects); fully vectorized — one vb_encode per segment."""
    from mwmbl_spark.functions.codec import _vb_encode_raw

    n_post = counts.size
    if flat.size == 0:
        return np.zeros(n_post + 1, dtype=np.int32), b""
    flat = flat.astype(np.uint64, copy=False)
    starts_idx = np.zeros(n_post + 1, dtype=np.int64)
    np.cumsum(counts, out=starts_idx[1:])
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    heads = starts_idx[:-1][counts > 0]
    deltas[heads] = flat[heads]  # restart the chain at each posting
    blob, val_starts = _vb_encode_raw(deltas)
    byte_offs = np.empty(n_post + 1, dtype=np.int32)
    # a zero-count posting shares its successor's offset (empty slice)
    ends = np.append(val_starts, len(blob))
    byte_offs[:] = ends[np.minimum(starts_idx, flat.size)]
    return byte_offs, blob


def _encode_positions_one(plist) -> tuple[np.ndarray, bytes]:
    """List-of-arrays convenience wrapper over
    ``_encode_positions_flat`` (tests / non-Arrow callers)."""
    counts = np.fromiter((len(x) for x in plist), dtype=np.int64, count=len(plist))
    if counts.sum() == 0:
        return np.zeros(len(plist) + 1, dtype=np.int32), b""
    flat = np.concatenate([np.asarray(x, dtype=np.uint64) for x in plist])
    return _encode_positions_flat(flat, counts)


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
    maxima) and the blocked-varbyte encode run in ONE Arrow-batched
    ``applyInPandas`` kernel grouped by (bucket, salt) — vectorized
    NumPy inside, never per-row Python at the Spark boundary.

    Round-7 plan shape (one exchange instead of two): raw posting rows
    shuffle ONCE, hash-partitioned on (bucket, salt) — an explicit
    ``repartition`` whose partition count adapts to the session's
    parallelism and the bucket×salt key space, pinned against AQE
    coalescing so the encode keeps its parallelism at small inputs.
    Because ``bucket`` is a pure function of ``term``, clustering by
    (bucket, salt) co-locates every (term, salt) group (knowledge
    Catalyst cannot derive), so the kernel groups by term in pandas and
    the output is ALREADY clustered by bucket for the partitioned
    write — the old plan's second full exchange of the encoded rows
    (groupBy(term, salt) then repartition(bucket)) is gone. Skew
    protection is unchanged: a Zipf-head term still splits across NSALT
    partitions.

    tfn is stored idf-free: idf changes as the corpus grows, tfn's only
    corpus dependency is avgdl — captured by ``avg_len_build``, so the
    query-time bound correction is a single multiply (wand.py).
    """
    with_len = postings if doc_lens is None else postings.join(doc_lens, "doc_id")
    pos_cols = [F.col(positions_col).alias("plist")] if positions_col else []
    enriched = with_len.select(
        bucket_of(F.col("term"), num_buckets).alias("bucket"),
        "term",
        salt_of(F.col("doc_id"), nsalt).alias("salt"),
        "doc_id",
        "tf",
        F.col("doc_len").cast("long").alias("doc_len"),
        *pos_cols,
    )
    out_schema = SEGMENT_SCHEMA + (
        ", pos_offs array<int>, positions binary" if positions_col else ""
    )
    try:
        par = postings.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — e.g. Connect sessions
        par = 8
    n_part = max(4, min(num_buckets * nsalt, par * 2))
    kernel = _make_segment_kernel(float(avg_len), bool(positions_col))
    return (
        enriched.repartition(n_part, "bucket", "salt")
        .groupBy("bucket", "salt")
        .applyInArrow(kernel, schema=out_schema)
    )


def _make_segment_kernel(avg_len: float, with_positions: bool):
    """Per-(bucket, salt) segment assembly + encode kernel, Arrow-native
    (``applyInArrow``): posting-grain columns arrive as contiguous Arrow
    buffers — numerics as zero-copy NumPy views, terms
    dictionary-encoded in C++, and the positional list column as ONE
    flat value buffer plus offsets — so no per-posting Python object is
    ever materialized (the pandas form paid exactly that conversion,
    measured 2.3x on the 10x-sf positional build). The tfn float
    computation is the EXACT NumPy twin of the WAND kernel's
    ``_partial`` (same association order -> bitwise-identical doubles,
    the discipline the rank-identity contracts rely on)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k1, b = BM25_K1, BM25_B

    def _scalar(x):
        return int(x.as_py()) if hasattr(x, "as_py") else int(x)

    def kern(key, table):
        bucket, salt = _scalar(key[0]), _scalar(key[1])
        ids = table.column("doc_id").to_numpy()
        tfs = table.column("tf").to_numpy()
        lens = table.column("doc_len").to_numpy()
        tf_d = tfs.astype(np.float64)
        # same association order as the former JVM expression twin:
        # (tf*(k1+1)) / (tf + k1*((1-b) + (b*dl)/avg))
        with np.errstate(divide="ignore", invalid="ignore"):
            tfn = (tf_d * (k1 + 1.0)) / (
                tf_d + k1 * ((1.0 - b) + (b * lens.astype(np.float64)) / avg_len)
            )
        dct = pc.dictionary_encode(table.column("term").combine_chunks())
        codes = dct.indices.to_numpy().astype(np.int64, copy=False)
        uniq = dct.dictionary
        order = np.lexsort((ids, codes))
        s_codes = codes[order]
        s_ids = ids[order].astype(np.int64, copy=False)
        s_tfs = tfs[order].astype(np.int64, copy=False)
        s_lens = lens[order].astype(np.int64, copy=False)
        s_tfn = tfn[order]
        if with_positions:
            lcol = table.column("plist").combine_chunks()
            l_offs = lcol.offsets.to_numpy().astype(np.int64, copy=False)
            l_vals = lcol.values.to_numpy().astype(np.int64, copy=False)
            p_starts = l_offs[:-1][order]
            p_counts = (l_offs[1:] - l_offs[:-1])[order]
        bounds = np.flatnonzero(np.diff(s_codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [s_codes.size]))
        n_terms = starts.size
        n_postings = (ends - starts).astype(np.int64)
        cols: dict[str, list] = {
            k: [None] * n_terms
            for k in (
                "block_maxes", "block_last", "boffs_ids", "boffs_tfs",
                "boffs_lens", "doc_ids", "tfs", "doc_lens",
            )
        }
        max_tfn = np.empty(n_terms, dtype=np.float64)
        if with_positions:
            cols["pos_offs"] = [None] * n_terms
            cols["positions"] = [None] * n_terms
        for i, (s, e) in enumerate(zip(starts, ends)):
            g_tfn = s_tfn[s:e]
            d_ids, d_tfs, d_lens, blast, o_ids, o_tfs, o_lens = (
                _encode_posting_arrays(s_ids[s:e], s_tfs[s:e], s_lens[s:e])
            )
            max_tfn[i] = g_tfn.max()
            cols["block_maxes"][i] = np.maximum.reduceat(
                g_tfn, np.arange(0, e - s, BLOCK_SIZE)
            )
            cols["block_last"][i] = blast
            cols["boffs_ids"][i] = o_ids
            cols["boffs_tfs"][i] = o_tfs
            cols["boffs_lens"][i] = o_lens
            cols["doc_ids"][i] = d_ids
            cols["tfs"][i] = d_tfs
            cols["doc_lens"][i] = d_lens
            if with_positions:
                st, cn = p_starts[s:e], p_counts[s:e]
                total = int(cn.sum())
                # vectorized gather of the postings' position runs from
                # the flat list buffer, in sorted-posting order
                base = np.repeat(st, cn)
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(cn) - cn, cn
                )
                flat = l_vals[base + within]
                offs, blob = _encode_positions_flat(
                    flat.astype(np.uint64), cn
                )
                cols["pos_offs"][i] = offs
                cols["positions"][i] = blob
        out = {
            "bucket": pa.array(
                np.full(n_terms, bucket, dtype=np.int32), pa.int32()
            ),
            "term": uniq.take(pa.array(s_codes[starts])),
            "salt": pa.array(np.full(n_terms, salt, dtype=np.int32), pa.int32()),
            "n_postings": pa.array(n_postings, pa.int64()),
            "avg_len_build": pa.array(
                np.full(n_terms, avg_len, dtype=np.float64), pa.float64()
            ),
            "max_tfn": pa.array(max_tfn, pa.float64()),
            "block_maxes": pa.array(cols["block_maxes"], pa.list_(pa.float64())),
            "block_last": pa.array(cols["block_last"], pa.list_(pa.int64())),
            "boffs_ids": pa.array(cols["boffs_ids"], pa.list_(pa.int32())),
            "boffs_tfs": pa.array(cols["boffs_tfs"], pa.list_(pa.int32())),
            "boffs_lens": pa.array(cols["boffs_lens"], pa.list_(pa.int32())),
            "doc_ids": pa.array(cols["doc_ids"], pa.binary()),
            "tfs": pa.array(cols["tfs"], pa.binary()),
            "doc_lens": pa.array(cols["doc_lens"], pa.binary()),
        }
        if with_positions:
            out["pos_offs"] = pa.array(cols["pos_offs"], pa.list_(pa.int32()))
            out["positions"] = pa.array(cols["positions"], pa.binary())
        return pa.table(out)

    return kern


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

"""Index copy / re-shard (reference S8: copy_index.copy_pages,
/root/reference/mwmbl/tinysearchengine/copy_index.py:14-45 +
background.py:50-71 cursor resume).

The reference copies an old index into a new one 1024 pages per pass,
re-deriving terms and re-hashing into the new page layout, with a
persisted ``last_page_copied`` cursor. Spark-natively this is:

    decode old segments -> posting rows -> rebuild segments under the
    new (num_buckets, nsalt) layout -> new index dir + manifest

The "cursor" is the target manifest: each source partition of the old
index re-commits independently, so a killed reshard resumes exactly
like a killed build (same machinery, plans/build_index.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.functions.codec import delta_decode_blocked, vb_decode
from mwmbl_spark.operators.segments import BLOCK_SIZE


DECODED_SCHEMA = "term string, doc_id long, tf long, doc_len long"


def decode_segments(segs: DataFrame) -> DataFrame:
    """Inverse of build_segments: segments -> (term, doc_id, tf,
    doc_len) posting rows. Arrow-batched; NumPy decode per segment."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            terms, ids, tfs, lens = [], [], [], []
            for r in pdf.itertuples():
                d_ids = delta_decode_blocked(r.doc_ids, BLOCK_SIZE).astype(np.int64)
                terms.append(np.repeat(r.term, len(d_ids)))
                ids.append(d_ids)
                tfs.append(vb_decode(r.tfs).astype(np.int64))
                lens.append(vb_decode(r.doc_lens).astype(np.int64))
            if not terms:
                yield pd.DataFrame(
                    {"term": pd.Series([], dtype=object),
                     "doc_id": pd.Series([], dtype="int64"),
                     "tf": pd.Series([], dtype="int64"),
                     "doc_len": pd.Series([], dtype="int64")}
                )
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(ids),
                    "tf": np.concatenate(tfs),
                    "doc_len": np.concatenate(lens),
                }
            )

    return segs.select("term", "doc_ids", "tfs", "doc_lens").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def reshard(spark, old_builder, new_cfg) -> "IndexBuilder":  # noqa: F821
    """Rebuild an index under a new layout. Stats carry over by
    re-aggregation from the decoded postings (df/cf/doc lengths are
    layout-independent), so no re-tokenization of the source corpus.

    Round-6 lifecycle fixes: the decode is ALIVE-only (the old index's
    delete vectors are applied — resharding an upserted index no longer
    resurrects superseded postings; stats re-aggregate from the same
    alive set, and doc_totals were already delta-corrected at upsert
    time, so the two stay consistent), and the positional payload rides
    through when ``new_cfg.positions`` (requires the old index to be
    positional — positions cannot be invented from a plain index;
    positional -> plain deliberately drops the payload)."""
    from mwmbl_spark.manifest import commit_partition, committed_partitions
    from mwmbl_spark.operators.segments import build_segments
    from mwmbl_spark.operators.upsert import decode_segments as decode_alive
    from mwmbl_spark.plans.build_index import IndexBuilder

    with_pos = bool(getattr(new_cfg, "positions", False))
    if with_pos and not getattr(old_builder.cfg, "positions", False):
        raise ValueError(
            "reshard cannot add a positional payload: the source index "
            "stores no positions — rebuild from the corpus with "
            "IndexConfig(positions=True)"
        )
    new_builder = IndexBuilder(spark, new_cfg)
    new_builder._ensure_meta()
    part = "reshard-0"
    if part in committed_partitions(spark, new_cfg.path):
        return new_builder

    import time

    t0 = time.perf_counter()
    dm = old_builder.delete_map() or None
    decoded = decode_alive(
        old_builder.segments(), dm, with_positions=with_pos
    ).persist()
    pos_cols = ["positions"] if with_pos else []
    try:
        postings = decoded.select("term", "doc_id", "tf", *pos_cols)
        doc_lens = decoded.select("doc_id", "doc_len").distinct()
        stats = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        # n_docs/sum_len carry over from the OLD index's doc_stats, not
        # re-derived from decoded postings: the posting relation can't
        # see zero-token docs, and the original build counted every
        # source row — re-deriving would shift BM25's N/avgdl after a
        # reshard of a corpus containing empty docs.
        n_docs, sum_len = old_builder.doc_totals()
        avg = sum_len / max(1, n_docs)
        segs = build_segments(
            postings, doc_lens, stats, n_docs, avg, new_cfg.num_buckets,
            new_cfg.nsalt,
            positions_col="positions" if with_pos else None,
        )
        base = new_cfg.path
        n_write = min(
            new_cfg.num_buckets,
            max(4, spark.sparkContext.defaultParallelism * 4),
        )
        (
            segs.repartition(n_write, F.col("bucket"))
            .sortWithinPartitions("bucket", "term", "salt")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{base}/segments/src_part={part}")
        )
        stats.write.mode("overwrite").parquet(f"{base}/stats/src_part={part}")
        from mwmbl_spark.plans.build_index import _write_doc_stats

        _write_doc_stats(f"{base}/doc_stats/src_part={part}", n_docs, sum_len)
        n_postings = postings.count()
    finally:
        decoded.unpersist(blocking=True)
    commit_partition(
        spark, new_cfg.path, part, n_docs, n_postings,
        int((time.perf_counter() - t0) * 1000),
    )
    return new_builder

"""Scoped WAND serving at a 10M-id allowlist — the round-6 distributed
doc-filter path vs the (refused-at-this-scope) broadcast-dict form.

Builds the wand_scale corpus shape, persists the segment index, then:
(a) writes a 10^7-id allowlist as per-salt parquet files (ONE Spark
    job, never collected driver-side),
(b) serves the query set through wand_topk(doc_filter=DocFilterFiles),
(c) as the small-scope reference, serves the same queries through a
    broadcast-dict filter restricted to a 100k-id scope.

Allowlist ids are synthesized over a range superset of the corpus ids —
ids absent from the corpus simply never match (allowlist semantics),
so the 10M-id FILE path (write + per-salt executor reads) is exercised
at its honest size regardless of corpus row count. Run:

    python bench/scoped_scale.py [n_conv] [cores]

Writes one JSON line; BENCH/BASELINE.md records results per round.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.operators import postings as post_ops  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.wand import (  # noqa: E402
    build_doc_filter,
    wand_topk,
    write_doc_filter,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

QUERIES = [
    (0, "the spark data query"),
    (1, "the w0042"),
    (2, "spark w0313 w0777"),
    (3, "w0042 w0313 w0777 w1500"),
]
N_BUCKETS = 32
NSALT = 8
BIG_SCOPE = 10_000_000
SMALL_SCOPE = 100_000


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("scoped-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scoped_scale_")
    try:
        docs = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8))
        p = post_ops.build_postings(docs)
        dl = post_ops.doc_lengths(docs)
        stats = post_ops.term_stats(p).persist()
        stats.count()
        cs = post_ops.corpus_stats(dl)
        segs_df = build_segments(
            p, dl, stats, cs.n_docs, cs.avg_doc_len, N_BUCKETS, NSALT
        )
        write_segments(
            segs_df.repartition(N_BUCKETS, "bucket").sortWithinPartitions(
                "bucket", "term", "salt"
            ),
            f"{tmp}/segments",
        )
        segs = spark.read.parquet(f"{tmp}/segments")
        qdf = spark.createDataFrame(QUERIES, "query_id long, query string")

        # honest 10M-id allowlist: every 3rd id over a 30M range (the
        # corpus ids are xxhash64-derived longs; the big scope also
        # includes 1/3 of the actual corpus via a union so results are
        # non-trivial)
        big_allow = (
            spark.range(0, BIG_SCOPE * 3, 3)
            .select(F.col("id").alias("doc_id"))
            .union(docs.select("doc_id").where(F.col("doc_id") % 3 == 0))
        )

        t0 = time.perf_counter()
        desc = write_doc_filter(big_allow, f"{tmp}/filter_big", NSALT)
        write_s = time.perf_counter() - t0

        def timed(fn, warm: int = 1, reps: int = 3) -> float:
            for _ in range(warm):
                fn()
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            return best

        t_big = timed(
            lambda: wand_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS, doc_filter=desc,
            ).count()
        )
        t_unscoped = timed(
            lambda: wand_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS,
            ).count()
        )

        small_allow = docs.select("doc_id").limit(SMALL_SCOPE)
        filt_small = build_doc_filter(small_allow, NSALT)
        t_small = timed(
            lambda: wand_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS, doc_filter=filt_small,
            ).count()
        )

        # sanity: file-scoped results only contain allowed ids
        rows = wand_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
            num_buckets=N_BUCKETS, doc_filter=desc,
        ).collect()
        ok = all(r["doc_id"] % 3 == 0 for r in rows) and len(rows) > 0

        print(json.dumps({
            "metric": "scoped_wand_10M",
            "n_docs": cs.n_docs,
            "cores": cores,
            "big_scope_ids": BIG_SCOPE,
            "filter_write_sec": round(write_s, 3),
            "scoped_10M_files_sec": round(t_big, 3),
            "scoped_100k_dict_sec": round(t_small, 3),
            "unscoped_sec": round(t_unscoped, 3),
            "scoped_overhead_x": round(t_big / t_unscoped, 3) if t_unscoped else -1,
            "results_respect_scope": ok,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Snapshot-history cost probe: what do time travel, diff, and restore
actually cost relative to a live query?

Protocol: build a base index, capture the snapshot seq, apply an upsert
(re-crawl of 1/5 of docs) and a delete (1/7), then measure (median of
reps):

  - live BM25 top-10 batch (the serving path, caches warm),
  - the SAME batch as_of the pre-mutation snapshot (pays its own stats
    jobs + a per-call delete-map broadcast by design — audit path),
  - snapshot_diff(pre, live) wall,
  - restore(pre) wall, and the post-restore live query.

Run:  python bench/snapshot_ops.py [n_conv] [cores] [reps]

Writes one JSON line; BENCH/BASELINE.md records results per round.

What "good" looks like at 100 TB: the as-of query should cost the live
query plus a bounded planning overhead (stats re-aggregation over the
snapshot's fragments — no extra data passes over segments); diff is two
doc_index scans + a join (never postings); restore is one compaction of
the snapshot, so its wall tracks snapshot size like compact() tracks
live size.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

QUERIES = [
    (0, "the spark data query"),
    (1, "w0001 w0002"),
    (2, "w0000 w0007 w0019"),
    (3, "the model"),
    (4, "w0003 pipeline"),
    (5, "spark w0011"),
]


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("snapshot-ops", cores=cores, shuffle_partitions=cores * 2)
    t = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=4)).cache()
    n_docs = t.count()
    tmp = tempfile.mkdtemp(prefix="snapshot_ops_")
    cfg = IndexConfig(path=tmp, num_buckets=32, nsalt=8, n_src_partitions=8)
    b = IndexBuilder(spark, cfg)
    b.build(t)
    snap = b.current_seq()
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")

    def med(fn) -> float:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return round(statistics.median(walls), 4)

    upd = t.where(F.col("doc_id") % 5 == 2).select(
        "doc_id", F.concat(F.col("text"), F.lit(" probe refreshed")).alias("text")
    )
    b.upsert(upd)
    b.delete_docs(t.where(F.col("doc_id") % 7 == 3).select("doc_id"))

    b.query_topk(qdf, k=10).count()  # warm the serving caches once
    live_s = med(lambda: b.query_topk(qdf, k=10).count())
    asof_s = med(lambda: b.query_topk(qdf, k=10, as_of=snap).count())
    diff_s = med(lambda: b.snapshot_diff(snap, b.current_seq()).count())

    t0 = time.perf_counter()
    b.restore(snap)
    restore_s = round(time.perf_counter() - t0, 4)
    b.query_topk(qdf, k=10).count()
    post_restore_live_s = med(lambda: b.query_topk(qdf, k=10).count())

    print(
        json.dumps(
            {
                "metric": "snapshot-history op cost",
                "n_docs": n_docs,
                "cores": cores,
                "reps": reps,
                "live_query_s": live_s,
                "asof_query_s": asof_s,
                "asof_overhead_x": round(asof_s / live_s, 2) if live_s > 0 else -1,
                "snapshot_diff_s": diff_s,
                "restore_s": restore_s,
                "post_restore_live_s": post_restore_live_s,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""WAND-vs-exhaustive at scale: does block-max pruning pay for itself?

Builds a synthetic corpus well past fixed-overhead territory, persists
the v2 segment index, then times BM25 top-10 through (a) the exhaustive
broadcast-join plan over cached postings and (b) the MaxScore segment
path reading the bucket-pruned parquet index. Reports per-query-set
walls and the ratio. Run:

    python bench/wand_scale.py [n_conv] [cores]

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

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.operators import bm25 as bm25_ops  # noqa: E402
from mwmbl_spark.operators import postings as post_ops  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.wand import wand_topk  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

# multi-term queries over the Zipf head (the MaxScore worst/best cases)
QUERIES = [
    (0, "the spark data query"),      # all hot: essential-set pruning
    (1, "the w0042"),                 # hot + rare: rare seeds theta
    (2, "spark w0313 w0777"),         # hot + 2 rare
    (3, "w0042 w0313 w0777 w1500"),   # all rare
    (4, "data w0005 the"),
    (5, "w0001 w0002 spark"),
]
N_BUCKETS = 32
NSALT = 8


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("wand-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="wand_scale_")
    try:
        docs = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8))
        # both contenders read their index from parquet — the deployment
        # shape (a query service reads a stored index, not a warm cache)
        post_ops.build_postings(docs).write.mode("overwrite").parquet(f"{tmp}/postings")
        post_ops.doc_lengths(docs).write.mode("overwrite").parquet(f"{tmp}/doc_lens")
        p = spark.read.parquet(f"{tmp}/postings")
        dl = spark.read.parquet(f"{tmp}/doc_lens")
        stats = post_ops.term_stats(p).persist()
        n_postings = p.count()
        stats.count()
        cs = post_ops.corpus_stats(dl)
        qdf = spark.createDataFrame(QUERIES, "query_id long, query string")

        t0 = time.perf_counter()
        segs_df = build_segments(p, dl, stats, cs.n_docs, cs.avg_doc_len, N_BUCKETS, NSALT)
        write_segments(
            segs_df.repartition(N_BUCKETS, "bucket").sortWithinPartitions("bucket", "term", "salt"),
            f"{tmp}/segments",
        )
        build_s = time.perf_counter() - t0
        segs = spark.read.parquet(f"{tmp}/segments")

        def run(fn, warm: int = 1, reps: int = 3) -> float:
            for _ in range(warm):
                fn()
            best = min(_timed(fn) for _ in range(reps))
            return best

        def _timed(fn) -> float:
            t = time.perf_counter()
            fn()
            return time.perf_counter() - t

        exhaustive = lambda: bm25_ops.bm25_topk(  # noqa: E731
            p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10
        ).count()
        pruned = lambda: wand_topk(  # noqa: E731
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=N_BUCKETS
        ).count()

        t_ex = run(exhaustive)
        t_wd = run(pruned)

        # per-query walls (separate jobs) — pruning pays on selective
        # queries; all-hot-term queries are the no-prune worst case
        per_q = {}
        for qid, q in QUERIES:
            one = spark.createDataFrame([(qid, q)], "query_id long, query string")
            te = run(lambda: bm25_ops.bm25_topk(p, dl, stats, one, cs.n_docs, cs.avg_doc_len, k=10).count(), warm=1, reps=2)
            tw = run(lambda: wand_topk(segs, stats, one, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=N_BUCKETS).count(), warm=1, reps=2)
            per_q[q] = {"exhaustive": round(te, 3), "wand": round(tw, 3)}

        # identity at this scale: scores must agree to 1e-9 rank by rank
        # (doc ids may swap on EXACT float ties: the exhaustive plan's
        # groupBy sums in arbitrary order, the kernel sums canonically)
        a = sorted((r["query_id"], r["rank"], round(r["score"], 9))
                   for r in bm25_ops.bm25_topk(p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10).collect())
        b = sorted((r["query_id"], r["rank"], round(r["score"], 9))
                   for r in wand_topk(segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=N_BUCKETS).collect())
        print(json.dumps({
            "metric": "wand_vs_exhaustive",
            "n_docs": cs.n_docs,
            "n_postings": n_postings,
            "cores": cores,
            "build_segments_sec": round(build_s, 3),
            "exhaustive_sec": round(t_ex, 3),
            "wand_sec": round(t_wd, 3),
            "speedup": round(t_ex / t_wd, 3) if t_wd > 0 else -1,
            "per_query": per_q,
            "scores_identical_1e9": a == b,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Conversation-grain retrieval at the 2M-doc corpus (round-6,
VERDICT r5 #10): conversation_topk was sf-scale benched only; this
measures the rollup ON TOP of the WAND serving path at wand_scale's
corpus size and verifies the two-level WindowGroupLimit survives in
the executed plan at that scale.

Reported walls: the WAND turn-grain top-k alone, and the same kernel
output rolled up to conversation grain (the delta is what the rollup
costs — one conv_id join + two map-side-limited windows). Run:

    python bench/conversation_scale.py [n_conv] [cores]

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
from mwmbl_spark.operators import postings as post_ops  # noqa: E402
from mwmbl_spark.operators.conversations import conversation_topk  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.wand import wand_topk  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

QUERIES = [
    (0, "the spark data query"),
    (1, "the w0042"),
    (2, "spark w0313 w0777"),
    (3, "w0042 w0313 w0777 w1500"),
]
N_BUCKETS = 32
NSALT = 8


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("conv-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="conv_scale_")
    try:
        docs = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8))
        p = post_ops.build_postings(docs)
        dl = post_ops.doc_lengths(docs)
        stats = post_ops.term_stats(p).persist()
        stats.count()
        cs = post_ops.corpus_stats(dl)
        write_segments(
            build_segments(
                p, dl, stats, cs.n_docs, cs.avg_doc_len, N_BUCKETS, NSALT
            ).repartition(N_BUCKETS, "bucket").sortWithinPartitions(
                "bucket", "term", "salt"
            ),
            f"{tmp}/segments",
        )
        segs = spark.read.parquet(f"{tmp}/segments")
        conv_map = docs.select("doc_id", "conv_id")
        conv_map.write.mode("overwrite").parquet(f"{tmp}/conv_map")
        conv_map = spark.read.parquet(f"{tmp}/conv_map")
        qdf = spark.createDataFrame(QUERIES, "query_id long, query string")

        # rollup consumes the kernel's PRE-TOPK scores (leg_k=200 keeps
        # enough turns per query that conversations actually contend)
        def turn_topk():
            return wand_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=200,
                num_buckets=N_BUCKETS,
            )

        def conv_rollup():
            return conversation_topk(
                turn_topk().select("query_id", "doc_id", "score"),
                conv_map, k=10,
            )

        # plan gate at THIS scale: both windows must plan as
        # WindowGroupLimit (map-side partial + final)
        plan = conv_rollup()._jdf.queryExecution().executedPlan().toString()
        n_wgl = plan.count("WindowGroupLimit")
        assert n_wgl >= 4, f"expected 2 partial+final WindowGroupLimits, plan has {n_wgl}"

        def timed(fn, warm: int = 1, reps: int = 3) -> float:
            for _ in range(warm):
                fn().count()
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn().count()
                best = min(best, time.perf_counter() - t)
            return best

        t_turn = timed(turn_topk)
        t_conv = timed(conv_rollup)
        rows = conv_rollup().collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["conv_id"])
        ok = all(len(v) == len(set(v)) and len(v) <= 10 for v in by_q.values())

        print(json.dumps({
            "metric": "conversation_scale",
            "n_docs": cs.n_docs,
            "n_conversations": n_conv,
            "cores": cores,
            "wand_turn_topk_sec": round(t_turn, 3),
            "conversation_topk_sec": round(t_conv, 3),
            "rollup_overhead_x": round(t_conv / t_turn, 3) if t_turn else -1,
            "window_group_limits_in_plan": n_wgl,
            "per_query_conv_grain_ok": ok,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

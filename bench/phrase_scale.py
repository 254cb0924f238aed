"""Positional index at the 2M-doc corpus — the scale envelope of the
round-6 phrase serving surface.

Measures, on the wand_scale corpus shape:
(a) positional vs plain SEGMENT BUILD (same postings relation, one
    extra int per token occurrence through the shuffle + the
    delta+varbyte position blobs in the write) — wall and bytes,
(b) phrase-batch serving (phrase_topk: bucket-pruned scan, candidate
    intersection, survivor-only position decode) vs the SAME terms as
    a WAND term-query batch — the price of the position verify,
(c) ordered-proximity serving (slop=2) over the same payload.

Run:  python bench/phrase_scale.py [n_conv] [cores]
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
from mwmbl_spark.operators.positional import phrase_topk  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.wand import wand_topk  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

PHRASES = [
    (0, "the spark"),
    (1, "data query"),
    (2, "w0000 w0001"),
    (3, "the spark data"),
]
N_BUCKETS = 32
NSALT = 8


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("phrase-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="phrase_scale_")
    try:
        docs = with_doc_id(
            synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8)
        ).persist()
        docs.count()

        def built(positions: bool, dest: str) -> float:
            t0 = time.perf_counter()
            p = post_ops.build_postings_with_len(docs, positions=positions)
            stats = post_ops.term_stats(p.select("term", "doc_id", "tf"))
            cs = post_ops.corpus_stats(p.select("doc_id", "doc_len").distinct())
            segs = build_segments(
                p, None, stats, cs.n_docs, cs.avg_doc_len, N_BUCKETS, NSALT,
                positions_col="positions" if positions else None,
            )
            write_segments(
                segs.repartition(N_BUCKETS, "bucket").sortWithinPartitions(
                    "bucket", "term", "salt"
                ),
                dest,
            )
            return time.perf_counter() - t0

        # one DISCARDED warmup build (codegen/JIT), then min of 2
        # per variant — without the discard, whichever variant runs
        # first absorbs all warmup and the overhead ratio even
        # inverts (a 0.72x "overhead" was measured with plain first)
        built(True, f"{tmp}/warmup")
        shutil.rmtree(f"{tmp}/warmup", ignore_errors=True)
        plain_s = min(built(False, f"{tmp}/plain") for _ in range(2))
        pos_s = min(built(True, f"{tmp}/positional") for _ in range(2))
        plain_b, pos_b = _du(f"{tmp}/plain"), _du(f"{tmp}/positional")

        segs = spark.read.parquet(f"{tmp}/positional")
        p = post_ops.build_postings(docs)
        stats = post_ops.term_stats(p).persist()
        stats.count()
        cs = post_ops.corpus_stats(post_ops.doc_lengths(docs))

        def timed(fn, warm: int = 1, reps: int = 3) -> float:
            for _ in range(warm):
                fn()
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            return best

        t_phrase = timed(
            lambda: phrase_topk(
                segs, stats, PHRASES, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS,
            ).count()
        )
        t_prox = timed(
            lambda: phrase_topk(
                segs, stats, PHRASES, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS, slop=2,
            ).count()
        )
        qdf = spark.createDataFrame(
            [(i, t) for i, t in PHRASES], "query_id long, query string"
        )
        t_wand = timed(
            lambda: wand_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10,
                num_buckets=N_BUCKETS,
            ).count()
        )

        rows = phrase_topk(
            segs, stats, PHRASES, cs.n_docs, cs.avg_doc_len, k=10,
            num_buckets=N_BUCKETS,
        ).collect()
        matched = sorted({r["phrase_id"] for r in rows})

        print(json.dumps({
            "metric": "phrase_scale",
            "n_docs": cs.n_docs,
            "cores": cores,
            "plain_build_sec": round(plain_s, 3),
            "positional_build_sec": round(pos_s, 3),
            "build_overhead_x": round(pos_s / plain_s, 3),
            "plain_bytes": plain_b,
            "positional_bytes": pos_b,
            "bytes_overhead_x": round(pos_b / plain_b, 3),
            "phrase_batch_sec": round(t_phrase, 3),
            "proximity_batch_sec": round(t_prox, 3),
            "wand_same_terms_sec": round(t_wand, 3),
            "phrase_vs_wand_x": round(t_phrase / t_wand, 3),
            "phrases_with_matches": matched,
            "result_rows": len(rows),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

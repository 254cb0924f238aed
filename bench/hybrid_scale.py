"""Composed hybrid serving at scale: ANN-leg vs exact-leg fusion.

Round-6 VERDICT #4: the engine's hybrid contract fuses BM25 with the
EXACT cosine scan (value-gatable, linear in the corpus); this bench
composes the at-scale form — block-max WAND lexical leg + pretrained
IVFADC vector leg -> RRF (operators/fusion.hybrid_topk) — and times it
against the exact-leg fusion on the same corpus. The equality of the
two fusions at probe-all/refine-all is pytest-gated
(tests/test_fusion.py::test_hybrid_ann_leg_probe_all_equals_exact_leg);
here the probes BIND, so the ANN leg touches only n_probe/n_centroids
of the encoded corpus and must win wall-clock.

Embeddings are synthesized JVM-side (xxhash64-derived floats, no
driver materialization); train/encode are corpus-epoch artifacts and
are NOT part of the per-batch serving walls (they are reported
separately, like the segment-index build). Run:

    python bench/hybrid_scale.py [n_conv] [cores]

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
from mwmbl_spark.operators.fusion import hybrid_topk  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.similarity import ivfpq_encode, ivfpq_train  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

N_BUCKETS = 32
NSALT = 8
DIM = 32
N_CENTROIDS = 64
N_PROBE = 8
M = 8
K_CODES = 16
REFINE = 50
LEG_K = 20


def synth_embeddings(docs, dim: int = DIM):
    """Deterministic per-doc embedding, fully JVM-side: component j is
    xxhash64(doc_id, j) mapped to [-1, 1)."""
    comps = F.array(
        *[
            (
                (F.xxhash64(F.col("doc_id"), F.lit(j)) % 100_000) / 50_000.0
            ).cast("float")
            for j in range(dim)
        ]
    )
    return docs.select(F.col("doc_id").alias("vec_id"), comps.alias("embedding"))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("hybrid-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="hybrid_scale_")
    try:
        docs = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8))
        p = post_ops.build_postings(docs)
        dl = post_ops.doc_lengths(docs)
        stats = post_ops.term_stats(p).persist()
        stats.count()
        cs = post_ops.corpus_stats(dl)
        t0 = time.perf_counter()
        segs_df = build_segments(
            p, dl, stats, cs.n_docs, cs.avg_doc_len, N_BUCKETS, NSALT
        )
        write_segments(
            segs_df.repartition(N_BUCKETS, "bucket").sortWithinPartitions(
                "bucket", "term", "salt"
            ),
            f"{tmp}/segments",
        )
        index_build_s = time.perf_counter() - t0
        segs = spark.read.parquet(f"{tmp}/segments")

        emb = synth_embeddings(docs)
        emb.write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")

        t0 = time.perf_counter()
        centroids, codebooks = ivfpq_train(emb, N_CENTROIDS, M, K_CODES)
        codes = ivfpq_encode(emb, centroids, codebooks)
        codes.write.mode("overwrite").parquet(f"{tmp}/codes")
        codes = spark.read.parquet(f"{tmp}/codes")
        ann_build_s = time.perf_counter() - t0

        exemplars = [r["doc_id"] for r in docs.select("doc_id").limit(4).collect()]
        qdf = (
            docs.where(F.col("doc_id").isin(exemplars))
            .select(F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
            .localCheckpoint()
        )

        def timed(fn, warm: int = 1, reps: int = 3) -> float:
            for _ in range(warm):
                fn()
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            return best

        t_exact = timed(
            lambda: hybrid_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
                k=10, leg_k=LEG_K, num_buckets=N_BUCKETS,
            ).count()
        )
        ann_kwargs = dict(
            centroids=centroids, codebooks=codebooks, codes=codes,
            n_centroids=N_CENTROIDS, n_probe=N_PROBE, m=M, k_codes=K_CODES,
            refine=REFINE,
        )
        t_ann = timed(
            lambda: hybrid_topk(
                segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
                k=10, leg_k=LEG_K, num_buckets=N_BUCKETS, ann=ann_kwargs,
            ).count()
        )

        # overlap sanity: binding probes should still mostly agree with
        # the exact fusion on the fused top-10 membership
        ex_rows = hybrid_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
            k=10, leg_k=LEG_K, num_buckets=N_BUCKETS,
        ).collect()
        ann_rows = hybrid_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
            k=10, leg_k=LEG_K, num_buckets=N_BUCKETS, ann=ann_kwargs,
        ).collect()
        ex_set = {(r["query_id"], r["doc_id"]) for r in ex_rows}
        ann_set = {(r["query_id"], r["doc_id"]) for r in ann_rows}
        overlap = len(ex_set & ann_set) / max(1, len(ex_set))

        print(json.dumps({
            "metric": "hybrid_scale",
            "n_docs": cs.n_docs,
            "cores": cores,
            "dim": DIM,
            "index_build_sec": round(index_build_s, 3),
            "ann_build_sec": round(ann_build_s, 3),
            "hybrid_exact_leg_sec": round(t_exact, 3),
            "hybrid_ann_leg_sec": round(t_ann, 3),
            "speedup_x": round(t_exact / t_ann, 3) if t_ann else -1,
            "fused_top10_overlap": round(overlap, 3),
            "n_probe": N_PROBE, "n_centroids": N_CENTROIDS, "refine": REFINE,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

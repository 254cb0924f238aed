"""Round-6 serving extras at corpus scale: snippets, facets, passages,
more-like-this.

What each number means:
- ``doc_bm25_s``: the baseline doc-grain BM25 top-10 serve (the page
  the extras decorate).
- ``snippet_attach_s``: attaching best-window snippets to an ALREADY
  MATERIALIZED page (localCheckpointed) — the incremental cost of the
  snippet stage alone. Candidate-grain: must stay near-constant in
  corpus size (it tokenizes only the served docs).
- ``facet_s``: facet counts over the FULL disjunctive candidate set —
  candidate-grain × n_facets, grows with matching docs, not corpus.
- ``mlt_s``: 4-seed more-like-this serve — reads the seeds' posting
  rows + the selected (rare) terms' posting lists.
- ``mlt_wand_s``: the same 4 seeds served FROM THE INDEX
  (more_like_this_wand: bucket-pruned segment scan + block-max
  pruning) — the 100x-scale form; rank-identical to ``mlt_s``.
- ``passage_pipeline_s``: the one-shot passage-grain query — shatter
  (32-token windows, stride 16, struct ids: the corpus uses hashed
  64-bit doc ids, the exact case packed ids cannot survive) → passage
  postings/stats → passage BM25 top-10. Corpus-grain by design; the
  per-token throughput is the number to watch at 100×.

Run:  python bench/serving_extras_scale.py [n_conv] [cores]
Writes one JSON line; BENCH/BASELINE.md records results per round.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.operators import bm25 as bm25_ops  # noqa: E402
from mwmbl_spark.operators import postings as post_ops  # noqa: E402
from mwmbl_spark.operators.bm25 import query_terms  # noqa: E402
from mwmbl_spark.operators.facets import facet_counts  # noqa: E402
from mwmbl_spark.operators.mlt import more_like_this, more_like_this_wand  # noqa: E402
from mwmbl_spark.operators.segments import build_segments, write_segments  # noqa: E402
from mwmbl_spark.operators.passages import build_passages  # noqa: E402
from mwmbl_spark.operators.snippets import best_window_snippets  # noqa: E402
from mwmbl_spark.synth import synth_transcripts, with_doc_id  # noqa: E402

QUERIES = [
    (0, "the spark data query"),
    (1, "w0001 w0002"),
    (2, "fast data"),
]


def _timed(fn) -> float:
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def run(fn, warm: int = 1, reps: int = 3) -> float:
    for _ in range(warm):
        fn()
    return min(_timed(fn) for _ in range(reps))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(
        "serving-extras-scale", cores=cores, shuffle_partitions=cores * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="sx_scale_")
    try:
        docs = with_doc_id(
            synth_transcripts(spark, n_conv=n_conv, turns_per_conv=8)
        )
        # doc store CLUSTERED by id — the deployment shape a snippet
        # fetch wants (id-range row-group skipping on the text scan)
        docs.sort("doc_id").write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        post_ops.build_postings(docs).write.mode("overwrite").parquet(
            f"{tmp}/postings"
        )
        p = spark.read.parquet(f"{tmp}/postings")
        post_ops.doc_lengths(docs).write.mode("overwrite").parquet(
            f"{tmp}/doc_lens"
        )
        dl = spark.read.parquet(f"{tmp}/doc_lens")
        stats = post_ops.term_stats(p).persist()
        n_postings = p.count()
        stats.count()
        n_docs = dl.count()
        cs = post_ops.corpus_stats(dl)
        qdf = spark.createDataFrame(QUERIES, "query_id long, query string")

        doc_bm25_s = run(
            lambda: bm25_ops.bm25_topk(
                p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10
            ).count()
        )

        # snippet attach over a MATERIALIZED page — the stage's own cost
        page = (
            bm25_ops.bm25_topk(p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10)
            .select("query_id", "doc_id", "score", "rank")
            .localCheckpoint()
        )
        snippet_attach_s = run(
            lambda: best_window_snippets(
                page, docs, qdf, window=12, push_ids_max=0
            ).count()
        )
        # flat store + pushed ids: documents the parquet IN->range trap
        # (hash-scattered ids over a flat store skip nothing)
        snippet_attach_pushed_s = run(
            lambda: best_window_snippets(page, docs, qdf, window=12).count()
        )
        # the DOC-STORE shape: directory-partitioned by id-hash bucket,
        # id-sorted within — the pushed literals prune to page-size dirs
        nb_store = 256
        (
            docs.withColumn(
                "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(nb_store)).cast("int")
            )
            .repartition("bucket")
            .sortWithinPartitions("bucket", "doc_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{tmp}/docstore")
        )
        bdocs = spark.read.parquet(f"{tmp}/docstore")
        snippet_attach_store_s = run(
            lambda: best_window_snippets(
                page, bdocs, qdf, window=12,
                bucket_col="bucket", n_buckets=nb_store,
            ).count()
        )

        # facets over the full disjunctive candidate set
        meta = docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("string").alias("source")
        )
        qt = query_terms(qdf).select("query_id", "term")
        cands = p.join(F.broadcast(qt), "term").select("query_id", "doc_id").distinct()
        n_cands = cands.count()
        facet_s = run(lambda: facet_counts(cands, meta, ["source"]).count())

        # more-like-this: 4 seeds off real doc ids
        seeds = [r["doc_id"] for r in dl.limit(4).collect()]
        src = spark.createDataFrame([(int(s),) for s in seeds], "src_doc_id long")
        mlt_s = run(
            lambda: more_like_this(
                src, p, dl, stats, cs.n_docs, cs.avg_doc_len, top_terms=5, k=10
            ).count()
        )

        # index-served MLT: the extracted terms ride the WAND segment
        # path (bucket-pruned scan + block-max pruning) instead of
        # joining the raw posting relation — the 100x-scale form
        nb_seg, nsalt = 32, 8
        write_segments(
            build_segments(
                p, dl, stats, cs.n_docs, cs.avg_doc_len, nb_seg, nsalt
            )
            .repartition(nb_seg, "bucket")
            .sortWithinPartitions("bucket", "term", "salt"),
            f"{tmp}/segments",
        )
        bsegs = spark.read.parquet(f"{tmp}/segments")
        mlt_wand_s = run(
            lambda: more_like_this_wand(
                src, bsegs, p, stats, cs.n_docs, cs.avg_doc_len,
                top_terms=5, k=10, num_buckets=nb_seg,
            ).count()
        )

        # passage-grain pipeline, one shot (shatter -> stats -> serve);
        # struct ids: synth doc ids are hashed 64-bit, packing overflows
        def passage_pipeline() -> int:
            pas = build_passages(docs, window=32, stride=16, packed=False)
            pp = post_ops.build_postings(pas)
            pdl = post_ops.doc_lengths(pas)
            pst = post_ops.term_stats(pp)
            pcs = post_ops.corpus_stats(pdl)
            return bm25_ops.bm25_topk(
                pp, pdl, pst, qdf, pcs.n_docs, pcs.avg_doc_len, k=10
            ).count()

        t0 = time.perf_counter()
        passage_pipeline()
        passage_pipeline_s = time.perf_counter() - t0
        n_passages = build_passages(
            docs, window=32, stride=16, packed=False
        ).count()

        print(
            json.dumps(
                {
                    "metric": "round-6 serving extras at corpus scale",
                    "unit": "sec",
                    "n_docs": n_docs,
                    "n_postings": n_postings,
                    "n_candidates": n_cands,
                    "n_passages": n_passages,
                    "doc_bm25_s": round(doc_bm25_s, 3),
                    "snippet_attach_s": round(snippet_attach_s, 3),
                    "snippet_attach_pushed_s": round(snippet_attach_pushed_s, 3),
                    "snippet_attach_store_s": round(snippet_attach_store_s, 3),
                    "facet_s": round(facet_s, 3),
                    "mlt_s": round(mlt_s, 3),
                    "mlt_wand_s": round(mlt_wand_s, 3),
                    "passage_pipeline_s": round(passage_pipeline_s, 3),
                    "cores": cores,
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

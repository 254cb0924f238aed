"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Headliners:
  q1_index_build      — full segment index build: tokenize -> postings ->
                        doc/term stats -> salted block-max segments
                        (delta+varbyte) -> manifest commit
  q2_wand_topk        — BM25 top-10 via the compressed segment path
                        (bucket pruning + MaxScore kernel)
  q3_bm25_exhaustive  — the exhaustive broadcast-join BM25 plan
  q4_dedup_minhash    — shingle -> minhash -> band join -> jaccard verify
  q5_embedding_topk   — brute-force cosine ANN top-10
  q6_text_features    — lang-ID + quality + token stats in one pass
  q7_events_daily     — windowed counters
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig  # noqa: E402
from mwmbl_spark.sources.transcripts import transcripts_from_documents  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark("mwmbl_spark-bench", cores=cpus, shuffle_partitions=max(8, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="mwmbl_bench_")
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        print(f"BENCH START {name} {time.strftime('%H:%M:%S')}", file=sys.stderr)
        try:
            fn()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # kill the whole benchmark record
            print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    # one source partition at this data size: the per-partition commit
    # loop is for resume granularity over big Iceberg partitions, not for
    # slicing a 5k-doc fixture (resume semantics are pytest-covered)
    cfg = IndexConfig(
        path=f"{tmp}/index", num_buckets=16, nsalt=8,
        n_src_partitions=1,
    )
    builder = IndexBuilder(spark, cfg)
    transcripts = transcripts_from_documents(spark, sf_dir)
    n_docs = transcripts.count()

    timed("q1_index_build", lambda: builder.build(transcripts))

    qdf = spark.createDataFrame(entrymod.QUERY_SET, "query_id long, query string")
    timed("q2_wand_topk", lambda: builder.query_topk(qdf, k=10).count())

    from mwmbl_spark.operators import bm25 as bm25_ops
    from mwmbl_spark.operators import postings as post_ops

    p = post_ops.build_postings(transcripts).cache()
    dl = post_ops.doc_lengths(transcripts).cache()
    stats = post_ops.term_stats(p).cache()
    p.count(), dl.count(), stats.count()
    cs = post_ops.corpus_stats(dl)
    timed(
        "q3_bm25_exhaustive",
        lambda: bm25_ops.bm25_topk(
            p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10
        ).count(),
    )
    timed("q4_dedup_minhash", lambda: entrymod.q_dedup_minhash(spark, sf_dir).count())
    timed("q5_embedding_topk", lambda: entrymod.q_embedding_topk(spark, sf_dir).count())
    timed("q6_text_features", lambda: entrymod.q_text_features(spark, sf_dir).count())
    timed("q7_events_daily", lambda: entrymod.q_events_daily(spark, sf_dir).count())
    # round-2 additions (new operators; q1-q7 keys stay comparable
    # across rounds)
    timed("q8_search_pipeline", lambda: entrymod.q_search_pipeline(spark, sf_dir).count())
    timed("q9_curation_apply", lambda: entrymod.q_curation_apply(spark, sf_dir).count())

    build_s = timings.get("q1_index_build", -1.0)
    total = round(sum(v for v in timings.values() if v > 0), 4)
    print(
        json.dumps(
            {
                "metric": "segment index build + BM25/WAND + curation-op suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "build_turns_per_sec": round(n_docs / build_s, 2) if build_s > 0 else -1.0,
                "cpus": cpus,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

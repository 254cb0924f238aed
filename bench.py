"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

q_index_build is the end-to-end index construction (tokenize ->
postings -> stats -> segment write to a temp dir); the rest are the
query-side operators over a cached posting build. Timings are
wall-clock per query with actions forced by a write/count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.operators import postings as post_ops  # noqa: E402
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
        fn()
        timings[name] = round(time.perf_counter() - t0, 4)

    # q1: end-to-end index build (postings + stats persisted)
    def build():
        t = transcripts_from_documents(spark, sf_dir)
        p = post_ops.build_postings(t)
        p.write.mode("overwrite").parquet(f"{tmp}/postings")
        post_ops.term_stats(spark.read.parquet(f"{tmp}/postings")).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/term_stats")
        post_ops.doc_lengths(t).write.mode("overwrite").parquet(f"{tmp}/doc_lengths")

    timed("q1_index_build", build)

    # reuse the persisted build for query-side benchmarks
    p = spark.read.parquet(f"{tmp}/postings").cache()
    dl = spark.read.parquet(f"{tmp}/doc_lengths").cache()
    stats = spark.read.parquet(f"{tmp}/term_stats").cache()
    p.count(), dl.count(), stats.count()
    cs = post_ops.corpus_stats(dl)

    from mwmbl_spark.operators import bm25 as bm25_ops

    qdf = spark.createDataFrame(entrymod.QUERY_SET, "query_id long, query string")

    timed(
        "q2_bm25_topk",
        lambda: bm25_ops.bm25_topk(
            p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10
        ).count(),
    )
    timed(
        "q3_bm25_conjunctive",
        lambda: bm25_ops.bm25_topk(
            p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, mode="conjunctive"
        ).count(),
    )
    timed(
        "q4_tfidf_reference",
        lambda: bm25_ops.tfidf_reference_scores(p, stats, qdf).count(),
    )
    timed(
        "q5_index_terms",
        lambda: entrymod.q_index_terms(spark, sf_dir).count(),
    )
    timed(
        "q6_events_daily",
        lambda: entrymod.q_events_daily(spark, sf_dir).count(),
    )

    # throughput: turns (docs) per second through the full build
    n_docs = cs.n_docs
    build_throughput = round(n_docs / timings["q1_index_build"], 2)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "build_turns_per_sec": build_throughput,
                "cpus": cpus,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Rankeval at scale: NDCG@10 over a large synthetic gold set.

The reference evaluates its ranker over a 136,903-row query set
(devdata/rankeval-2024-06/queries.csv) in a per-query Python loop
(rankeval/evaluation/evaluate.py). The Spark pipeline
(operators/rankeval.py) is joins + windows + aggregations, so the whole
evaluation is ONE job whose cost is a shuffle over (query_id) — this
bench proves the path scales as a join, not a loop, and records
queries/sec for BENCH/BASELINE.md.

Synthesis (deterministic, no external data): per query, predicted
top-10 doc_ids overlap the gold top-10 with a query-dependent shift, so
NDCG varies across queries and the join has real hit/miss structure.

    python bench/rankeval_scale.py [n_queries] [cores] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.operators.rankeval import ndcg_at_10, rankeval_summary  # noqa: E402


def synth_eval_set(spark, n_queries: int):
    q = spark.range(n_queries).select(F.col("id").alias("query_id"))
    ranks = q.select(
        "query_id", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("r")
    )
    # gold doc space: 37-strided per query. Predicted rank r maps to
    # gold position (3r + query_id) mod 13 + 1 — injective (3 and 13
    # coprime), NON-monotone (so DCG != IDCG and NDCG varies per
    # query), and positions 11..13 miss gold entirely (so
    # proportion_matched varies too).
    gold = ranks.select(
        "query_id",
        (F.col("query_id") * 37 + F.col("r")).alias("doc_id"),
        F.col("r").alias("gold_rank"),
    )
    pred = ranks.select(
        "query_id",
        (
            F.col("query_id") * 37
            + F.pmod(F.col("r") * 3 + F.col("query_id"), F.lit(13)) + 1
        ).alias("doc_id"),
        F.col("r").alias("rank"),
    )
    return pred, gold


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("rankeval-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pred, gold = synth_eval_set(spark, n_queries)
    pred = pred.persist()
    gold = gold.persist()
    pred.count(), gold.count()

    walls = []
    summary = None
    for _ in range(reps):
        t0 = time.perf_counter()
        summary = rankeval_summary(ndcg_at_10(pred, gold)).collect()[0]
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)
    print(
        json.dumps(
            {
                "metric": "rankeval NDCG@10 throughput",
                "value": round(n_queries / wall, 1),
                "unit": "queries/sec",
                "n_queries": n_queries,
                "cores": cores,
                "reps": reps,
                "wall_sec_median": round(wall, 4),
                "ndcg_mean": float(summary["ndcg_mean"]),
                "proportion_mean": float(summary["proportion_mean"]),
                "n_evaluated": int(summary["n_queries"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

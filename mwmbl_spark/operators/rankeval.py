"""Offline ranking evaluation: NDCG@10 vs gold rankings (reference
rankeval, /root/reference/mwmbl/rankeval/evaluation/evaluate.py:16-102).

Semantics mirrored exactly:
- gold relevance of the i-th gold URL = CLICK_PROPORTIONS[i]
  (Google first-page click-through rates, evaluate.py:16);
- the predicted top-10's relevance vector is looked up against gold
  (0.0 for misses), padded with zeros to 10;
- NDCG = DCG(rel in predicted order) / DCG(rel sorted desc) with linear
  gains rel/log2(pos+1) — sklearn.metrics.ndcg_score's default, which
  the reference calls (evaluate.py:81);
- proportion_matched = |pred top-10 ∩ gold| / 10 (evaluate.py:78).

Everything is a DataFrame plan (joins + windows + aggregations): the
136k-query evaluation set runs as ONE Spark job, not a per-query loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CLICK_PROPORTIONS = [0.285, 0.157, 0.110, 0.080, 0.072, 0.051, 0.040, 0.032, 0.028, 0.025]
NUM_RESULTS_FOR_EVAL = len(CLICK_PROPORTIONS)


def gold_relevance(gold: DataFrame, id_col: str = "query_id", rank_col: str = "gold_rank") -> DataFrame:
    """(query_id, doc_id, rel): click-proportion relevance by gold rank
    (1-based); gold beyond position 10 contributes nothing."""
    cp = F.array(*[F.lit(p) for p in CLICK_PROPORTIONS])
    return gold.where(F.col(rank_col) <= NUM_RESULTS_FOR_EVAL).select(
        id_col, "doc_id", F.element_at(cp, F.col(rank_col).cast("int")).alias("rel")
    )


def ndcg_at_10(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """predicted: (query_id, doc_id, rank); gold: (query_id, doc_id,
    gold_rank). -> (query_id, ndcg, proportion_matched)."""
    rels = gold_relevance(gold)
    pred = predicted.where(F.col("rank") <= NUM_RESULTS_FOR_EVAL)
    joined = pred.join(rels, ["query_id", "doc_id"], "left").select(
        "query_id", "rank", F.coalesce("rel", F.lit(0.0)).alias("rel")
    )
    # DCG in predicted order; IDCG re-sorts the same vector desc
    # (zero-padding adds nothing to either sum).
    w_ideal = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("rank"))
    with_ideal = joined.withColumn("ideal_pos", F.row_number().over(w_ideal))
    per_query = with_ideal.groupBy("query_id").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.sum(F.col("rel") / F.log2(F.col("ideal_pos") + 1)).alias("idcg"),
        (F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)) / NUM_RESULTS_FOR_EVAL).alias(
            "proportion_matched"
        ),
    )
    return per_query.select(
        "query_id",
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
        F.round("proportion_matched", 6).alias("proportion_matched"),
    )


def rankeval_summary(per_query: DataFrame) -> DataFrame:
    """Corpus-level rankeval report — mean and standard error of the
    per-query NDCG@10 and proportion-matched (the numbers the
    reference's harness prints: rankeval/evaluation/evaluate.py:87-91,
    sem = stddev_samp / sqrt(n))."""
    return per_query.agg(
        F.round(F.avg("ndcg"), 6).alias("ndcg_mean"),
        F.round(
            F.stddev_samp("ndcg") / F.sqrt(F.count(F.lit(1))), 6
        ).alias("ndcg_sem"),
        F.round(F.avg("proportion_matched"), 6).alias("proportion_mean"),
        F.round(
            F.stddev_samp("proportion_matched") / F.sqrt(F.count(F.lit(1))), 6
        ).alias("proportion_sem"),
        F.count(F.lit(1)).alias("n_queries"),
    )

"""Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankings.

The modern serving stack runs lexical (BM25/WAND) and vector (ANN)
retrieval side by side and FUSES the rankings; reciprocal-rank fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
score-free combiner:

    rrf(d) = sum over rankings r of 1 / (c + rank_r(d))

Rank-only fusion needs no score calibration between BM25 logs and
cosine similarities — exactly why it wins in practice — and it makes
the oracle trivial: ranks are integers, so the fused score is a sum of
exact rationals both engines evaluate identically (two-list fusion is
a single IEEE addition; ties break on doc id).

Plan shape: each input ranking is already top-k-ish (tiny); the fusion
is a UNION ALL of (query_id, doc_id, 1/(c+rank)) rows, one hash
aggregation, one per-query WindowGroupLimit cut. Nothing here scales
with the corpus — only with k * n_rankings.

The reference has nothing comparable (single heuristic ranker,
/root/reference/mwmbl/tinysearchengine/rank.py); this is part of the
engine's training-data/serving surface beyond reference parity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # the SIGIR'09 paper's constant; robust across collections


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = RRF_C,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse rankings [(query_id, id_col, rank), ...] ->
    (query_id, doc_id, rrf_score, n_lists, rank<=k). ``n_lists`` counts
    how many input rankings surfaced the doc (a useful confidence
    signal: 2-of-2 beats a lone high rank under the same score)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    contribs = [
        r.select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))).alias(
                "contrib"
            ),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    scored = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("contrib"), 9).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf_score", "n_lists", "rank")
    )


def hybrid_topk(
    segments: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avg_len: float,
    embeddings: DataFrame,
    exemplar_ids: list[int],
    k: int = 10,
    leg_k: int = 20,
    num_buckets: int | None = None,
    c: int = RRF_C,
    ann: dict | None = None,
    doc_filter=None,
) -> DataFrame:
    """The composed at-scale hybrid serving plan (round-6): WAND
    lexical leg + vector leg -> ``rrf_fuse``, as ONE DataFrame plan.

    Legs:
    - lexical: block-max WAND top-``leg_k`` over the segment index
      (bucket-pruned scan, per-salt kernel; ``doc_filter`` passes a
      scoped-serving allowlist through).
    - vector: ``ann=None`` runs the exact cosine scan (the value-gated
      contract shape, linear in the corpus); pass ``ann={...}`` with
      ``ivfpq_topk`` kwargs — pretrained ``centroids``/``codebooks``/
      ``codes`` plus ``n_centroids``/``n_probe``/``refine`` — for the
      production IVFADC leg, which touches only probed lists. With
      probe-all + corpus-covering refine the ANN leg reproduces the
      exact leg bit for bit, so the fusion is equality-testable
      (tests/test_fusion.py); at binding probes it's the wall-clock
      winner (bench/hybrid_scale.py).

    ``queries`` rows are (query_id, query) where query_id is the
    exemplar's doc id (more-like-this: text leg searches the exemplar's
    terms, vector leg its embedding). Fusion cost is O(leg_k x 2) rows
    per query — corpus-independent."""
    from mwmbl_spark.operators.similarity import cosine_topk, ivfpq_topk
    from mwmbl_spark.operators.wand import wand_topk

    text_rank = wand_topk(
        segments, stats, queries, n_docs, avg_len, k=leg_k,
        num_buckets=num_buckets, doc_filter=doc_filter,
    ).select("query_id", "doc_id", "rank")
    if ann is None:
        vec = cosine_topk(embeddings, exemplar_ids, k=leg_k)
    else:
        vec = ivfpq_topk(embeddings, exemplar_ids, k=leg_k, **ann)
    vec_rank = vec.select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([text_rank, vec_rank], k=k, c=c)

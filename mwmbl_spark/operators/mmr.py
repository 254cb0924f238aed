"""MMR diversity re-ranking (reference W5).

Faithful twin of the reference's greedy Maximal Marginal Relevance
(/root/reference/mwmbl/tinysearchengine/mmr_rank.py): rank-based
relevance (window - i)/window over a top-50 window, domain-dominant
similarity kernel 0.8*same_domain + 0.2*BoW-cosine, lambda = 0.7;
results are demoted, never dropped; the tail past the window keeps
relevance order.

Distribution model: MMR is inherently sequential WITHIN one query
(greedy argmax over <= 50 candidates) but embarrassingly parallel
ACROSS queries — so the Spark operator is an ``applyInPandas`` per
query_id group. One deliberate divergence: the reference's
``max(remaining_set, key=...)`` tie-break depends on Python set
iteration order (nondeterministic); we iterate candidates in rank
order, so ties go to the higher-ranked candidate, deterministically.
"""

from __future__ import annotations

import math
from collections import Counter
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_py

MMR_LAMBDA = 0.7
DOMAIN_SIMILARITY_WEIGHT = 0.8
MMR_WINDOW = 50


def _normalized_bow(title: str, extract: str) -> dict[str, float]:
    counts = Counter(tokenize_py(f"{title or ''} {extract or ''}"))
    if not counts:
        return {}
    norm = math.sqrt(sum(c * c for c in counts.values()))
    return {t: c / norm for t, c in counts.items()}


def _text_cosine(a: dict[str, float], b: dict[str, float]) -> float:
    if len(a) > len(b):
        a, b = b, a
    return sum(w * b[t] for t, w in a.items() if t in b)


def mmr_rerank_py(docs: list[dict]) -> list[dict]:
    """docs: rank-ordered list of {title, url, extract, ...}."""
    n = len(docs)
    if n <= 2:
        return list(docs)
    window = min(n, MMR_WINDOW)
    head, tail = docs[:window], docs[window:]
    relevance = [(window - i) / window for i in range(window)]
    bows = [_normalized_bow(d.get("title"), d.get("extract")) for d in head]
    netlocs = [urlparse(d["url"]).netloc for d in head]

    remaining = list(range(window))  # rank order -> deterministic ties
    max_sim = [0.0] * window
    selected: list[int] = []
    while remaining:
        best = max(remaining, key=lambda i: MMR_LAMBDA * relevance[i] - (1 - MMR_LAMBDA) * max_sim[i])
        selected.append(best)
        remaining.remove(best)
        b_bow, b_netloc = bows[best], netlocs[best]
        for j in remaining:
            dom = DOMAIN_SIMILARITY_WEIGHT if b_netloc and b_netloc == netlocs[j] else 0.0
            sim = dom + (1 - DOMAIN_SIMILARITY_WEIGHT) * _text_cosine(b_bow, bows[j])
            if sim > max_sim[j]:
                max_sim[j] = sim
    return [head[i] for i in selected] + tail


def mmr_rerank(results: DataFrame) -> DataFrame:
    """Per-query MMR over ranked results (query_id, rank, title, url,
    extract, ...) -> same columns with ``mmr_rank`` added. Each query's
    window re-ranks independently in one Arrow batch."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cols = results.columns
    out_schema = StructType(
        list(results.schema.fields) + [StructField("mmr_rank", IntegerType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        docs = pdf.to_dict("records")
        reranked = mmr_rerank_py(docs)
        out = pd.DataFrame(reranked)
        out["mmr_rank"] = range(1, len(out) + 1)
        return out[cols + ["mmr_rank"]]

    return results.groupBy("query_id").applyInPandas(kernel, schema=out_schema)


def diversify_topk(
    scored: DataFrame,
    keys: DataFrame,
    per_key: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    key_col: str = "group_key",
) -> DataFrame:
    """Source-capped top-k (round-5): at most ``per_key`` results per
    group key (domain, conversation, source site) in each query's
    final top-``k`` — the deterministic sibling of MMR when the
    diversity axis is categorical rather than embedding distance (the
    classic host-collapsing rule of web search serving).

    ``keys``: (id_col, key_col). Docs missing from it form the NULL
    group (capped together — unknown-source results shouldn't flood).
    Two row_number windows, both WindowGroupLimit-eligible; ties break
    (score desc, doc_id asc) everywhere, matching the oracle.
    """
    j = scored.join(
        keys.select(F.col(id_col).alias("doc_id"), F.col(key_col).alias("_key")),
        "doc_id",
        "left",
    )
    w_key = Window.partitionBy("query_id", "_key").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    capped = (
        j.withColumn("_kr", F.row_number().over(w_key))
        .where(F.col("_kr") <= per_key)
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        capped.withColumn("rank", F.row_number().over(w_q))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", F.col("_key").alias(key_col), "score", "rank"
        )
    )

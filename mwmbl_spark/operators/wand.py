"""Segment-reading top-k with dynamic pruning (block-max / MaxScore).

Query plan over the segment table (operators/segments.py):

    query_terms (tiny)
      -> broadcast-join segments on term (scan pruned to the terms'
         buckets by prune_segments)
      -> groupBy(query_id, salt).applyInPandas(kernel)   # local top-k
      -> window row_number global top-k                  # k*NSALT rows/query

Exactness: ``salt`` is a term-independent partition of the doc space,
so each doc's complete score is computed in exactly one (query, salt)
group; the global top-k of the union of local top-ks is the true top-k.

The kernel is vectorized MaxScore (Turtle & Flood '95 family) with the
segments' max_partial/block_maxes as the upper bounds:

  1. Sort the query's term lists by max_partial descending.
  2. Seed candidates from the highest-impact list(s); compute their FULL
     scores by vectorized gather (np.searchsorted) against every list.
  3. theta = k-th best full score. Lists whose ascending cumulative
     max_partial <= theta are non-essential: a doc appearing ONLY in
     them cannot enter the top-k, so their doc unions are never
     expanded (their postings are still gathered for candidate docs —
     scores stay exact).
  4. Expand candidates to the union of essential lists; final gather;
     top-k with doc_id tiebreak.

Per-row Python never touches postings: decode, gather, and scoring are
NumPy over the Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark import BM25_B, BM25_K1
from mwmbl_spark.functions.codec import delta_decode, vb_decode
from mwmbl_spark.operators.bm25 import query_terms
from mwmbl_spark.operators.segments import prune_segments

KERNEL_OUT_SCHEMA = "query_id long, doc_id long, score double, matched int"


def _gather(cand: np.ndarray, ids: np.ndarray, partial: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For candidate doc ids, return (score contribution, matched flag)."""
    idx = np.searchsorted(ids, cand)
    idx_c = np.minimum(idx, len(ids) - 1)
    hit = ids[idx_c] == cand
    contrib = np.where(hit, partial[idx_c], 0.0)
    return contrib, hit


def make_kernel(n_docs: int, avg_len: float, k: int, mode: str = "disjunctive"):
    n_docs_f, avg_len_f = float(n_docs), float(avg_len)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = int(pdf["query_id"].iloc[0])
        n_terms = int(pdf["n_terms"].iloc[0])
        # decode every list of this (query, salt) group
        lists = []
        for _, row in pdf.iterrows():
            ids = delta_decode(row["doc_ids"])
            if ids.size == 0:
                continue
            tf = vb_decode(row["tfs"]).astype(np.float64)
            dlen = vb_decode(row["doc_lens"]).astype(np.float64)
            df_val = float(row["df"])
            idf = np.log((n_docs_f - df_val + 0.5) / (df_val + 0.5) + 1.0)
            denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dlen / avg_len_f)
            partial = idf * tf * (BM25_K1 + 1.0) / denom
            # Upper bound recomputed from the decoded postings with the
            # QUERY-TIME idf: the stored max_partial/block_maxes were
            # computed with build-time df and go stale as the corpus
            # grows incrementally; exact bounds keep pruning safe.
            lists.append((float(partial.max()), ids, partial))
        if not lists:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                    "matched": pd.Series([], dtype="int64"),
                }
            )
        lists.sort(key=lambda t: -t[0])
        maxes = np.array([t[0] for t in lists])

        def full_scores(cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            scores = np.zeros(len(cand))
            matched = np.zeros(len(cand), dtype=np.int64)
            for _, ids, partial in lists:
                contrib, hit = _gather(cand, ids, partial)
                scores += contrib
                matched += hit
            return scores, matched

        # Phase 1: seed candidates from the top list, establish theta.
        seed = lists[0][1]
        s_scores, _ = full_scores(seed)
        if len(s_scores) >= k:
            theta = np.partition(s_scores, -k)[-k]
        else:
            theta = -np.inf
        # Phase 2: essential lists = those that could lift a doc past theta.
        # ascending cumulative bound: docs only in lists[j..] score at most
        # suffix_sum(maxes[j:]). Prune list j as a candidate SOURCE if that
        # bound <= theta (disjunctive exact). For conjunctive/majority,
        # pruning by score bound is unsafe for the filter, so expand all.
        if mode == "disjunctive" and np.isfinite(theta):
            # >= not >: a pruned doc could tie theta exactly and win the
            # doc_id tiebreak — keep lists whose bound reaches theta.
            suffix = np.cumsum(maxes[::-1])[::-1]
            essential = [lst for j, lst in enumerate(lists) if suffix[j] >= theta]
            if not essential:
                essential = lists[:1]
        else:
            essential = lists
        cand = np.unique(np.concatenate([ids for _, ids, _ in essential]))
        scores, matched = full_scores(cand)
        if mode == "conjunctive":
            keep = matched == n_terms
            cand, scores, matched = cand[keep], scores[keep], matched[keep]
        elif mode == "majority":
            keep = matched * 2 > n_terms
            cand, scores, matched = cand[keep], scores[keep], matched[keep]
        if len(cand) > k:
            # top-k with (score desc, doc_id asc) tiebreak
            order = np.lexsort((cand, -scores))[:k]
        else:
            order = np.lexsort((cand, -scores))
        return pd.DataFrame(
            {
                "query_id": query_id,
                "doc_id": cand[order].astype(np.int64),
                "score": scores[order],
                "matched": matched[order],
            }
        )

    return kernel


def wand_topk(
    segments: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avg_len: float,
    k: int = 10,
    mode: str = "disjunctive",
    num_buckets: int | None = None,
) -> DataFrame:
    """Top-k over the compressed segment table -> (query_id, doc_id,
    score, rank). Rank-identical to bm25.bm25_topk / the oracle.
    ``num_buckets`` must match the segment build's bucket count."""
    from mwmbl_spark import DEFAULT_NUM_BUCKETS

    qt = query_terms(queries)
    segs = prune_segments(segments, qt, num_buckets or DEFAULT_NUM_BUCKETS)
    joined = segs.join(F.broadcast(qt), "term").join(
        F.broadcast(stats.select("term", "df")), "term"
    )
    local = joined.groupBy("query_id", "salt").applyInPandas(
        make_kernel(n_docs, avg_len, k, mode), schema=KERNEL_OUT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )

"""Block-max pruning actually skips work: non-essential lists are never
fully decoded, and the gather touches only the blocks containing
candidates — while output stays rank-identical to the exhaustive plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mwmbl_spark.operators.bm25 import bm25_topk
from mwmbl_spark.operators.segments import BLOCK_SIZE, build_segments
from mwmbl_spark.operators.wand import make_kernel, wand_topk

N_HOT = 1200
RARE_IDS = [100, 500, 900]  # rare docs also contain the hot term


@pytest.fixture(scope="module")
def skew_corpus(spark):
    """One Zipf-head term in every doc (10 blocks), one rare term in 3."""
    rows = []
    for i in range(N_HOT):
        rows.append(("hot", i, 1 + (i % 3)))  # varying tf
    for i in RARE_IDS:
        rows.append(("rare", i, 1))
    p = spark.createDataFrame(rows, "term string, doc_id long, tf long")
    dl = spark.createDataFrame(
        [(i, 5 + (i % 7)) for i in range(N_HOT)], "doc_id long, doc_len long"
    )
    import pyspark.sql.functions as F

    stats = p.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    n_docs, avg_len = N_HOT, float(dl.agg(F.avg("doc_len")).collect()[0][0])
    segs = build_segments(p, dl, stats, n_docs, avg_len, num_buckets=8, nsalt=1)
    df_map = {r["term"]: r["df"] for r in stats.collect()}
    return p, dl, stats, segs, n_docs, avg_len, df_map


def _kernel_pdf(segs, df_map, query_terms, n_terms):
    rows = [r.asDict() for r in segs.collect() if r["term"] in query_terms]
    pdf = pd.DataFrame(rows)
    pdf["query_id"] = 0
    pdf["n_terms"] = n_terms
    pdf["df"] = pdf["term"].map(df_map)
    # shuffle row order: the kernel must not depend on arrival order
    return pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)


def test_non_essential_list_never_fully_decoded(skew_corpus):
    p, dl, stats, segs, n_docs, avg_len, df_map = skew_corpus
    sink: dict = {}
    kernel = make_kernel(n_docs, avg_len, k=3, stats_sink=sink)
    pdf = _kernel_pdf(segs, df_map, {"hot", "rare"}, n_terms=2)
    out = kernel(pdf).sort_values("score", ascending=False)

    # rare docs win (huge idf); exact scores, doc_id tiebreak
    assert list(out["doc_id"]) == RARE_IDS
    # the hot list (10 blocks) is NON-essential: theta from the rare
    # seed exceeds its idf-bound, so it is never fully decoded
    assert sink["rows_total"] == 2
    assert sink["rows_full"] == 1  # only the rare list
    # gather touched at most one hot block per candidate + the rare block
    n_blocks_hot = (N_HOT + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert sink["blocks_total"] == n_blocks_hot + 1
    assert sink["blocks_decoded"] <= 1 + len(RARE_IDS)
    assert sink["blocks_decoded"] < sink["blocks_total"]


def test_hot_only_query_stays_exact(skew_corpus):
    """Single hot term: every list essential, full decode, still exact."""
    p, dl, stats, segs, n_docs, avg_len, df_map = skew_corpus
    sink: dict = {}
    kernel = make_kernel(n_docs, avg_len, k=5, stats_sink=sink)
    pdf = _kernel_pdf(segs, df_map, {"hot"}, n_terms=1)
    out = kernel(pdf).sort_values(["score", "doc_id"], ascending=[False, True])
    assert len(out) == 5
    assert sink["rows_full"] == 1


def test_wand_topk_spark_matches_exhaustive_on_skew(skew_corpus, spark):
    p, dl, stats, segs, n_docs, avg_len, df_map = skew_corpus
    qdf = spark.createDataFrame(
        [(0, "rare hot"), (1, "hot"), (2, "rare")], "query_id long, query string"
    )
    a = wand_topk(segs, stats, qdf, n_docs, avg_len, k=10, num_buckets=8)
    b = bm25_topk(p, dl, stats, qdf, n_docs, avg_len, k=10)
    ra = [(r["query_id"], r["doc_id"], r["rank"], round(r["score"], 9))
          for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["doc_id"], r["rank"], round(r["score"], 9))
          for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb


def test_corpus_growth_bound_stays_conservative(skew_corpus):
    """Query-time avgdl != build avgdl: growth-corrected bounds must
    still contain every exact partial (pruning stays lossless)."""
    p, dl, stats, segs, n_docs, avg_len, df_map = skew_corpus
    for avg_q in (avg_len * 0.5, avg_len, avg_len * 2.5):
        sink: dict = {}
        kernel = make_kernel(n_docs, avg_q, k=3, stats_sink=sink)
        pdf = _kernel_pdf(segs, df_map, {"hot", "rare"}, n_terms=2)
        out = kernel(pdf)
        # exhaustive reference scores computed directly
        exact = {}
        from mwmbl_spark import BM25_B, BM25_K1

        post = {(r["term"], r["doc_id"]): r["tf"] for r in p.collect()}
        dlen = {r["doc_id"]: r["doc_len"] for r in dl.collect()}
        for (term, doc), tf in post.items():
            idf = np.log((n_docs - df_map[term] + 0.5) / (df_map[term] + 0.5) + 1.0)
            tfn = (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dlen[doc] / avg_q)
            )
            exact[doc] = exact.get(doc, 0.0) + idf * tfn
        want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = list(zip(out["doc_id"], out["score"]))
        got = sorted(got, key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in got] == [d for d, _ in want], avg_q
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

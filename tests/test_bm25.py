"""Rank-identity: Spark BM25 top-k vs the single-node oracle.

The oracle (oracle/engine.py) implements the same tokenization and BM25
with canonical summation order; the Spark plan must return identical
docIDs in identical order, scores equal to 1e-6, for every query
(SURVEY §5.2 protocol). Ties broken by doc_id on both sides.
"""

from __future__ import annotations

import pytest

from mwmbl_spark.operators.bm25 import bm25_topk, tfidf_reference_scores
from mwmbl_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id
from oracle.engine import build_oracle

QUERIES = [
    "w0001 w0002",
    "the spark",
    "w0000",
    "w0003 w0010 w0042",
    "data query the",
    "nonexistentterm",
    "w0001 w0001 w0002",  # duplicate query term counts once
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_doc_id(synth_transcripts(spark, n_conv=60, turns_per_conv=6, seed=7)).cache()
    rows = df.select("doc_id", "text").collect()
    oracle = build_oracle([(r["doc_id"], r["text"]) for r in rows])
    postings = build_postings(df).cache()
    dl = doc_lengths(df).cache()
    stats = term_stats(postings).cache()
    cs = corpus_stats(dl)
    return df, oracle, postings, dl, stats, cs


def _spark_topk(spark, corpus, mode, k=10):
    _, _, postings, dl, stats, cs = corpus
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(QUERIES)], "query_id long, query string"
    )
    out = bm25_topk(postings, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=k, mode=mode)
    res: dict[int, list[tuple[int, float]]] = {i: [] for i in range(len(QUERIES))}
    for r in out.orderBy("query_id", "rank").collect():
        res[r["query_id"]].append((r["doc_id"], r["score"]))
    return res


@pytest.mark.parametrize("mode", ["disjunctive", "conjunctive", "majority"])
def test_bm25_rank_identical_to_oracle(spark, corpus, mode):
    _, oracle, *_ = corpus
    got = _spark_topk(spark, corpus, mode)
    for i, q in enumerate(QUERIES):
        want = oracle.bm25_topk(q, k=10, mode=mode)
        got_ids = [d for d, _ in got[i]]
        want_ids = [d for d, _ in want]
        assert got_ids == want_ids, f"query {q!r} mode {mode}: {got_ids} != {want_ids}"
        for (gd, gs), (wd, ws) in zip(got[i], want):
            assert abs(gs - ws) < 1e-6, f"query {q!r} doc {gd}: {gs} vs {ws}"


def test_corpus_stats_match_oracle(corpus):
    _, oracle, postings, dl, stats, cs = corpus
    assert cs.n_docs == oracle.n_docs
    assert abs(cs.avg_doc_len - oracle.avg_len) < 1e-9
    sdf = {r["term"]: r["df"] for r in stats.collect()}
    assert sdf == {t: oracle.df(t) for t in oracle.postings}


def test_tfidf_reference_parity(spark, corpus):
    _, oracle, postings, dl, stats, cs = corpus
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(QUERIES)], "query_id long, query string"
    )
    out = tfidf_reference_scores(postings, stats, qdf, mode="majority")
    got: dict[int, dict[int, float]] = {i: {} for i in range(len(QUERIES))}
    for r in out.collect():
        got[r["query_id"]][r["doc_id"]] = r["tfidf_score"]
    for i, q in enumerate(QUERIES):
        want = oracle.tfidf_reference(q, mode="majority")
        assert set(got[i]) == set(want), f"query {q!r}"
        for d, s in want.items():
            assert abs(got[i][d] - s) < 1e-6


def test_synth_deterministic(spark):
    a = synth_transcripts(spark, n_conv=10, turns_per_conv=4, seed=3).orderBy("conv_id", "turn_idx").collect()
    b = synth_transcripts(spark, n_conv=10, turns_per_conv=4, seed=3).repartition(7).orderBy("conv_id", "turn_idx").collect()
    assert a == b

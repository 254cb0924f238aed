"""Corpus analytics: top n-grams, PMI pairs, token-length stats
(operators/corpus_analytics.py). The sf contracts pin cross-engine
values; these pin semantics the grid can't bind — caps, pruning,
tie-breaks — and the plan shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mwmbl_spark.operators.corpus_analytics import (
    pmi_pairs,
    token_length_stats,
    top_ngrams,
)


def _docs(spark, texts):
    rows = [(i, t.split()) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_top_ngrams_counts_and_tiebreak(spark):
    df = _docs(spark, ["a b a b", "a b c", "z"])
    rows = top_ngrams(df, n=2, k=3).collect()
    got = [(r.gram, r.n_occurrences, r.n_docs, r.rank) for r in rows]
    # "a b": 3 occurrences across 2 docs; then ties at 1 break on text
    assert got[0] == ("a b", 3, 2, 1)
    assert got[1] == ("b a", 1, 1, 2)
    assert got[2] == ("b c", 1, 1, 3)


def test_top_ngrams_short_docs_contribute_nothing(spark):
    df = _docs(spark, ["solo", ""])
    assert top_ngrams(df, n=2, k=5).count() == 0


def test_pmi_values_and_min_df(spark):
    # x,y always together (3 docs); q appears once (pruned at min_df=2)
    df = _docs(spark, ["x y", "x y", "x y q", "a b"])
    rows = pmi_pairs(df, min_df=2, k=10).collect()
    got = {(r.term_a, r.term_b): r for r in rows}
    # a,b have df=1 each -> pruned; q pruned; only (x, y) survives
    assert list(got) == [("x", "y")]
    r = got[("x", "y")]
    # N = docs with >=1 qualifying term = 3; pmi = ln(3*3/(3*3)) = 0
    assert (r.n_ab, r.df_a, r.df_b) == (3, 3, 3)
    assert r.pmi == 0.0


def test_pmi_positive_association(spark):
    # c,d co-occur twice, each df=2, population 4 -> pmi = ln(2*4/4) = ln 2
    df = _docs(spark, ["c d", "c d", "e f", "e g"])
    rows = pmi_pairs(df, min_df=2, k=10).collect()
    got = {(r.term_a, r.term_b): r.pmi for r in rows}
    assert got[("c", "d")] == round(math.log(2.0), 6)


def test_pmi_max_terms_per_doc_drops_doc(spark):
    # doc 0 has 4 qualifying terms -> dropped at cap 3; its pairs vanish
    df = _docs(spark, ["p q r s", "p q", "r s", "p q r s"])
    uncapped = pmi_pairs(df, min_df=2, k=100)
    capped = pmi_pairs(df, min_df=2, k=100, max_terms_per_doc=3)
    n_un = {(r.term_a, r.term_b): r.n_ab for r in uncapped.collect()}
    n_cap = {(r.term_a, r.term_b): r.n_ab for r in capped.collect()}
    assert n_un[("p", "q")] == 3
    assert n_cap[("p", "q")] == 1  # only the 2-term doc remains
    assert ("p", "s") in n_un and ("p", "s") not in n_cap


def test_token_length_stats_exact(spark):
    df = _docs(spark, ["a", "a b", "a b c", "a b c d"])
    r = token_length_stats(df).collect()[0]
    assert (r.n_docs, r.total_tokens) == (4, 10)
    assert r.mean_tokens == 2.5
    assert r.p50 == 2.5  # interpolated between 2 and 3
    assert r.p25 == 1.75
    assert r.p95 == 3.85


def test_top_ngrams_distributed_topk_plan(spark):
    """The global cut must be TakeOrderedAndProject (per-partition
    top-k + driver merge), never a single-partition global sort."""
    df = _docs(spark, ["a b c"])
    plan = (
        top_ngrams(df, n=2, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan

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


def test_doc_keywords_ranks_distinctive_terms(spark):
    from mwmbl_spark.operators.corpus_analytics import doc_keywords

    # "rare" appears only in doc 0; "common" in all docs
    rows = [
        (0, "rare", 2), (0, "common", 5),
        (1, "common", 3), (2, "common", 1),
    ]
    p = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    got = doc_keywords(p, k=1).collect()
    top0 = [r for r in got if r.doc_id == 0][0]
    assert top0.term == "rare"  # idf(common)=ln(1)=0 kills the high-tf term
    assert top0.tfidf == round(2 * math.log(3.0 / 1.0), 6)


def test_doc_keywords_plan_has_window_group_limit(spark):
    from mwmbl_spark.operators.corpus_analytics import doc_keywords

    p = spark.createDataFrame([(0, "t", 1)], "doc_id long, term string, tf long")
    plan = doc_keywords(p, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_domain_quality_flags(spark):
    from mwmbl_spark.operators.corpus_analytics import domain_quality

    long_text = "x" * 200
    rows = (
        # mirror.com: 3 docs, 2 share corpus-duplicated text
        [("mirror.com", "en", "dup page " + "y" * 200)] * 2
        + [("mirror.com", "en", long_text + "unique1")]
        # good.org: 2 long unique docs, 2 langs
        + [("good.org", "en", long_text + "a"), ("good.org", "fr", long_text + "b")]
        # stub.net: short unique docs
        + [("stub.net", "en", "tiny"), ("stub.net", "en", "small")]
    )
    docs = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r.domain: r for r in domain_quality(docs).collect()}
    assert got["mirror.com"].is_spam == 1  # dup_frac 2/3 > 0.5
    assert got["mirror.com"].dup_frac == round(2 / 3, 6)
    assert got["good.org"].is_spam == 0
    assert got["good.org"].n_langs == 2
    assert got["stub.net"].is_spam == 1  # mean_chars < 100


def test_domain_quality_dup_is_corpus_wide(spark):
    from mwmbl_spark.operators.corpus_analytics import domain_quality

    # identical text on two DIFFERENT domains: both count as duplicated
    t = "z" * 150
    docs = spark.createDataFrame(
        [("a.com", "en", t), ("b.com", "en", t)],
        "source string, lang string, text string",
    )
    got = {r.domain: r.dup_frac for r in domain_quality(docs).collect()}
    assert got == {"a.com": 1.0, "b.com": 1.0}

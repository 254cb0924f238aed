"""Unigram LM quality scoring — hand-computed fixture."""

from __future__ import annotations

import math

from mwmbl_spark.operators.lm_quality import (
    lm_quality_band,
    term_frequencies,
    unigram_logprob,
)
from mwmbl_spark.operators.postings import build_postings


def _docs(spark):
    return spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )


def test_unigram_logprob_hand_computed(spark):
    p = build_postings(_docs(spark))
    got = {r.doc_id: r for r in unigram_logprob(p).collect()}
    # cf: a=3 b=1 c=1, total=5
    lp0 = (2 * math.log(3 / 5) + math.log(1 / 5)) / 3
    lp1 = (math.log(3 / 5) + math.log(1 / 5)) / 2
    assert got[0].doc_len == 3 and got[1].doc_len == 2
    assert got[0].logprob_per_token == round(lp0, 6)
    assert got[1].logprob_per_token == round(lp1, 6)


def test_lm_quality_band_and_reused_model(spark):
    p = build_postings(_docs(spark))
    cf = term_frequencies(p)
    kept = {r.doc_id for r in lm_quality_band(p, -1.0, 0.0, term_freqs=cf).collect()}
    assert kept == {0}, "d1 (-1.06) is below the band floor"


def test_gibberish_lands_in_low_tail(spark):
    rows = [(i, "the spark data table join " * 4) for i in range(20)]
    rows.append((99, "zxqv wkjh qpzm vvxt yyqa"))
    p = build_postings(spark.createDataFrame(rows, "doc_id long, text string"))
    got = {r.doc_id: r.logprob_per_token for r in unigram_logprob(p).collect()}
    assert got[99] < min(v for k, v in got.items() if k != 99) - 1.0


def _tok_docs(spark, texts):
    rows = [(i, t.split()) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_bigram_logprob_hand_computed(spark):
    from mwmbl_spark.operators.lm_quality import bigram_logprob

    # bigrams: (a,b) x2, (a,c) x1; c1(a)=3; unigrams a3 b2 c1, T=6
    docs = _tok_docs(spark, ["a b", "a b", "a c"])
    got = {r.doc_id: r for r in bigram_logprob(docs, lam=0.8).collect()}
    lam, one_m = 0.8, 1.0 - 0.8
    p_ab = lam * (2 / 3) + one_m * (2 / 6)
    p_ac = lam * (1 / 3) + one_m * (1 / 6)
    assert got[0].n_bigrams == 1
    assert got[0].bigram_logprob == round(math.log(p_ab), 6)
    assert got[2].bigram_logprob == round(math.log(p_ac), 6)


def test_bigram_logprob_short_docs_drop_and_model_reuse(spark):
    from mwmbl_spark.operators.lm_quality import bigram_logprob, train_bigram_model

    docs = _tok_docs(spark, ["a b c", "solo", ""])
    m = train_bigram_model(docs)
    out = bigram_logprob(docs, model=m)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {0}, "docs with < 2 tokens have nothing to score"


def test_bigram_beats_unigram_on_word_salad(spark):
    """Same unigram distribution, scrambled order: the bigram LM (not
    the unigram one) must separate fluent from shuffled docs."""
    from mwmbl_spark.operators.lm_quality import bigram_logprob

    fluent = "the spark data query runs the spark data query fast"
    salad = "query the fast runs data the spark query spark data"
    docs = _tok_docs(spark, [fluent] * 10 + [salad])
    got = {r.doc_id: r.bigram_logprob for r in bigram_logprob(docs).collect()}
    assert got[10] < min(v for k, v in got.items() if k != 10)

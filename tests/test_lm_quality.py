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

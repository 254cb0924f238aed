"""Eval-set decontamination by shared n-grams."""

from __future__ import annotations

from mwmbl_spark.operators.decontam import contaminated_ids, decontaminate


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_contamination_by_shared_ngram(spark):
    train = _toks(spark, [
        (0, ["the", "quick", "brown", "fox", "jumps"]),      # contains eval 3-gram
        (1, ["totally", "unrelated", "training", "text"]),
        (2, ["quick", "brown", "fox", "elsewhere", "too"]),  # same 3-gram again
        (3, ["quick", "brown", "wolf", "nope", "x"]),        # only a 2-gram overlap
    ])
    ev = _toks(spark, [(100, ["watch", "the", "quick", "brown", "fox"])])
    bad = {r.doc_id for r in contaminated_ids(train, ev, n=3).collect()}
    assert bad == {0, 2}
    kept = {r.doc_id for r in decontaminate(train, ev, n=3).collect()}
    assert kept == {1, 3}


def test_short_docs_never_match(spark):
    train = _toks(spark, [(0, ["a", "b"]), (1, [])])
    ev = _toks(spark, [(9, ["a", "b", "c"])])
    assert contaminated_ids(train, ev, n=3).count() == 0

"""remove_duplicate_spans + select_canonical (round-5 curation ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import select_canonical
from mwmbl_spark.operators.repetition import remove_duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_span_removal_hand_checked(spark):
    # the trigram "a b c" appears in docs 1 and 2 -> its tokens are cut
    # from both; doc 3 shares no trigram and passes through
    docs = _docs(spark, [
        (1, ["x", "a", "b", "c", "y"]),
        (2, ["a", "b", "c", "z", "w"]),
        (3, ["p", "q", "r", "s"]),
    ])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=3).collect()}
    assert out[1]["text_clean"] == "x y" and out[1]["n_removed"] == 3
    assert out[2]["text_clean"] == "z w" and out[2]["n_removed"] == 3
    assert out[3]["text_clean"] == "p q r s" and out[3]["n_removed"] == 0
    assert out[1]["n_tokens"] == 5


def test_span_removal_within_doc_repeat_counts(spark):
    # "a b c" occurs twice INSIDE one doc: corpus-duplicated by
    # definition (Lee et al. semantics) -> both occurrences cut,
    # including the covered bridge tokens
    docs = _docs(spark, [(7, ["a", "b", "c", "k", "a", "b", "c"])])
    (r,) = remove_duplicate_spans(docs, n=3).collect()
    # windows: (a b c)x2 dup; (b c k),(c k a),(k a b) unique.
    # covered tokens: 1-3 and 5-7; token 4 ('k') survives
    assert r["text_clean"] == "k"
    assert r["n_removed"] == 6


def test_span_removal_short_and_empty_docs(spark):
    docs = _docs(spark, [(1, ["a", "b"]), (2, [])])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=3).collect()}
    assert out[1]["text_clean"] == "a b" and out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_tokens"] == 0


def test_span_removal_fully_removed_doc(spark):
    docs = _docs(spark, [(1, ["a", "b", "c"]), (2, ["a", "b", "c"])])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=3).collect()}
    for r in out.values():
        assert r["text_clean"] == "" and r["n_removed"] == 3


def test_select_canonical_argmax_quality(spark):
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, keep_id long",
    )
    quality = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (11, 1.0)],  # doc 10 unscored
        "doc_id long, score double",
    )
    got = {r["doc_id"]: r["keep_id"] for r in select_canonical(groups, quality).collect()}
    # group 1: max score 9.0 tie between 2 and 3 -> doc_id asc -> 2
    assert got == {1: 2, 2: 2, 3: 2, 10: 11, 11: 11}


def test_select_canonical_pipes_into_apply_dedup(spark):
    from mwmbl_spark.operators.dedup import apply_dedup

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the much longer better copy"), (9, "unrelated")],
        "doc_id long, text string",
    )
    groups = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, keep_id long")
    quality = docs.select("doc_id", F.length("text").alias("score"))
    kept = apply_dedup(docs, select_canonical(groups, quality))
    assert {r["doc_id"] for r in kept.collect()} == {2, 9}

"""Round-6 ADVICE regression pins: xgboost poisson-family base-score
link, empty-term deletion variants, learn_bpe stats_sink, and the
keep-first exemption in remove_duplicate_spans."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _toy_model_doc(objective: str, base_score: float) -> dict:
    return {
        "learner": {
            "objective": {"name": objective},
            "learner_model_param": {"base_score": str(base_score)},
            "gradient_booster": {
                "model": {
                    "trees": [
                        {
                            "split_indices": [0],
                            "split_conditions": [0.5],
                            "left_children": [-1],
                            "right_children": [-1],
                            "default_left": [0],
                        }
                    ]
                }
            },
            "feature_names": ["f0"],
        }
    }


@pytest.mark.parametrize(
    "objective,expected_link",
    [
        ("reg:gamma", "log"),
        ("reg:tweedie", "log"),
        ("count:poisson", "log"),
        ("reg:squarederror", "identity"),
        ("rank:pairwise", "identity"),
    ],
)
def test_xgb_base_score_link(objective, expected_link):
    from mwmbl_spark.functions.xgb_model import XgbTreesModel

    base = 0.7
    m = XgbTreesModel(_toy_model_doc(objective, base))
    if expected_link == "log":
        assert m.base_margin == pytest.approx(math.log(base))
    else:
        assert m.base_margin == pytest.approx(base)


def test_deletion_variants_empty_term(spark):
    from mwmbl_spark.operators.spell import deletion_variants

    df = spark.createDataFrame([("",), ("ab",)], "t string").select(
        "t", deletion_variants(F.col("t")).alias("v")
    )
    rows = {r["t"]: r["v"] for r in df.collect()}
    # empty term: just itself, no descending-sequence fabrications
    assert rows[""] == [""]
    assert sorted(rows["ab"]) == ["a", "ab", "b"]


def test_learn_bpe_stats_sink(spark):
    from mwmbl_spark.operators.bpe import LAST_LEARN_STATS, learn_bpe

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, n long",
    )
    sink: dict = {}
    merges = learn_bpe(words, n_merges=4, min_count=1, stats_sink=sink)
    assert len(merges) > 0
    assert sink["path"] == "driver"
    assert sink == LAST_LEARN_STATS  # global still mirrors for legacy readers


def test_remove_duplicate_spans_keep_first(spark):
    from mwmbl_spark.operators.repetition import remove_duplicate_spans

    # two docs share an identical 4-token span; d3 is unique filler
    span = "aa bb cc dd".split()
    docs = spark.createDataFrame(
        [
            ("d1", span + ["xx"]),
            ("d2", ["yy"] + span),
            ("d3", ["one", "two", "three", "four", "five"]),
        ],
        "doc_id string, toks array<string>",
    )
    strict = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=4).collect()
    }
    keep = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=4, keep_first=True).collect()
    }
    # default: every copy removed
    assert strict["d1"]["n_removed"] == 4 and strict["d2"]["n_removed"] == 4
    # keep_first: the lowest (doc_id, pos) occurrence (d1's) survives
    assert keep["d1"]["n_removed"] == 0
    assert keep["d1"]["text_clean"] == "aa bb cc dd xx"
    assert keep["d2"]["n_removed"] == 4
    assert keep["d2"]["text_clean"] == "yy"
    # untouched doc identical in both modes
    assert strict["d3"]["n_removed"] == 0 and keep["d3"]["n_removed"] == 0

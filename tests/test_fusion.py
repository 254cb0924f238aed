"""RRF hybrid fusion + filtered vector search (round-5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.fusion import rrf_fuse


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_hand_case(spark):
    a = _ranking(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    b = _ranking(spark, [(0, 11, 1), (0, 13, 2), (0, 10, 3)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 12: 1/63; doc 13: 1/62
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 9)
    assert out[10]["rrf_score"] == round(1 / 61 + 1 / 63, 9)
    order = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]
    assert out[11]["n_lists"] == 2 and out[12]["n_lists"] == 1
    # 13 (rank 2 in one list) beats 12 (rank 3 in one list)
    assert out[13]["rank"] < out[12]["rank"]


def test_rrf_tie_breaks_on_doc_id(spark):
    a = _ranking(spark, [(0, 5, 1), (0, 3, 2)])
    b = _ranking(spark, [(0, 3, 1), (0, 5, 2)])
    out = sorted(rrf_fuse([a, b], k=2).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [3, 5]  # equal scores -> id asc


def test_rrf_requires_input():
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_filtered_cosine_respects_allowed(spark):
    from mwmbl_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(i, [1.0, float(i % 5) / 10], i % 2) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    allowed = emb.where(F.col("label") == 1)
    out = cosine_topk(emb, [0], k=20, allowed=allowed).collect()
    assert out and all(r["vec_id"] % 2 == 1 for r in out)
    # the query itself (label 0) is OUTSIDE the filter yet still queries
    assert {r["query_id"] for r in out} == {0}
    # unfiltered returns strictly more candidates
    assert cosine_topk(emb, [0], k=20).count() > len(out)

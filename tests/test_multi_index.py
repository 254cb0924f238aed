"""Scatter-gather over independent index shards (plans/build_index.
query_topk_multi).

Gate: the multi-shard query is hash-identical — doc order AND scores —
to a single index built over the union corpus, including after one
shard takes a doc-level upsert (its delete vectors ride along). BM25's
global state is pure sums (df/N/total_len), so summing shard stats is
exact when doc_id spaces are disjoint.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig, query_topk_multi
from mwmbl_spark.synth import synth_transcripts, with_doc_id

QUERIES = [
    (0, "w0001 w0002"),
    (1, "the spark"),
    (2, "w0000 w0007 w0019"),
    (3, "refreshed corpus"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return with_doc_id(
        synth_transcripts(spark, n_conv=30, turns_per_conv=4, seed=23)
    ).cache()


def _build(spark, df, tmp, name, parts=2, nb=16, nsalt=4):
    cfg = IndexConfig(
        path=str(tmp / name), num_buckets=nb, nsalt=nsalt, n_src_partitions=parts
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return b


def _rows(spark, df):
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _q(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query string")


def test_two_shards_equal_union_build(spark, corpus, tmp_path):
    half_a = corpus.where(F.col("doc_id") % 2 == 0)
    half_b = corpus.where(F.col("doc_id") % 2 == 1)
    ba = _build(spark, half_a, tmp_path, "shard_a")
    bb = _build(spark, half_b, tmp_path, "shard_b")
    union_b = _build(spark, corpus, tmp_path, "union")
    got = _rows(spark, query_topk_multi([ba, bb], _q(spark), k=10))
    want = _rows(spark, union_b.query_topk(_q(spark), k=10))
    assert got == want


def test_shard_upsert_rides_along(spark, corpus, tmp_path):
    """An upsert (with delete vectors) on ONE shard must mask superseded
    postings in the merged query exactly as in a fresh union build."""
    half_a = corpus.where(F.col("doc_id") % 2 == 0)
    half_b = corpus.where(F.col("doc_id") % 2 == 1)
    ba = _build(spark, half_a, tmp_path, "u_shard_a")
    bb = _build(spark, half_b, tmp_path, "u_shard_b")
    upd = half_a.where(F.col("doc_id") % 6 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed corpus refreshed"))
    )
    ba.upsert(upd.select("doc_id", "text"))
    assert ba.delete_map()  # vectors really are in play
    final = (
        corpus.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(upd)
    )
    union_b = _build(spark, final, tmp_path, "u_union")
    got = _rows(spark, query_topk_multi([ba, bb], _q(spark), k=10))
    want = _rows(spark, union_b.query_topk(_q(spark), k=10))
    assert got == want


def test_single_shard_degenerates_to_query_topk(spark, corpus, tmp_path):
    b = _build(spark, corpus, tmp_path, "solo")
    got = _rows(spark, query_topk_multi([b], _q(spark), k=10))
    assert got == _rows(spark, b.query_topk(_q(spark), k=10))


def test_layout_mismatch_rejected(spark, corpus, tmp_path):
    ba = _build(spark, corpus.where(F.col("doc_id") % 2 == 0), tmp_path, "m_a", nb=16)
    bb = _build(spark, corpus.where(F.col("doc_id") % 2 == 1), tmp_path, "m_b", nb=32)
    with pytest.raises(ValueError, match="num_buckets"):
        query_topk_multi([ba, bb], _q(spark))
    with pytest.raises(ValueError, match="at least one"):
        query_topk_multi([], _q(spark))


def test_list_fast_path_parity(spark, corpus, tmp_path):
    """The one-job serving fast path (list-shaped query batch) works
    unchanged over the merged shards."""
    ba = _build(spark, corpus.where(F.col("doc_id") % 2 == 0), tmp_path, "f_a")
    bb = _build(spark, corpus.where(F.col("doc_id") % 2 == 1), tmp_path, "f_b")
    df_res = _rows(spark, query_topk_multi([ba, bb], _q(spark), k=5))
    lst_res = _rows(
        spark, query_topk_multi([ba, bb], [(q, s) for q, s in QUERIES], k=5)
    )
    assert lst_res == df_res

"""Distributed upsert planning (VERDICT r3 item 4): a re-crawl of 50%+
of the corpus must plan without funnelling batch-sized state through the
driver — superseded rows stay a DataFrame, the delete vector is written
as a Spark job, dead stats come from a shuffle join — while staying
hash-identical to a fresh build over the updated corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
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
        synth_transcripts(spark, n_conv=40, turns_per_conv=5, seed=51)
    ).cache()


def _query(spark, builder, k=10):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = builder.query_topk(qdf, k=k)
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in out.orderBy("query_id", "rank").collect()
    ]


def _build(spark, df, tmp_path, name):
    cfg = IndexConfig(
        path=str(tmp_path / name), num_buckets=16, nsalt=4, n_src_partitions=4
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return b


def _recrawl(corpus, frac_mod, tag):
    """Re-crawled versions of doc_id % 2 < frac_mod (50%+ of corpus)."""
    return corpus.where(F.col("doc_id") % 2 < frac_mod).withColumn(
        "text", F.concat(F.col("text"), F.lit(f" refreshed corpus {tag}"))
    )


def test_distributed_upsert_equals_fresh_build(spark, corpus, tmp_path):
    big = _recrawl(corpus, 1, "big")  # ~50% of all docs
    b = _build(spark, corpus, tmp_path, "d1")
    b.upsert(big, distributed=True)
    assert b._last_planning["mode"] == "distributed"
    assert b._last_planning["n_dead"] > 0
    # the driver collected only the tiny fragment-seq set, not the batch
    assert b._last_planning["rows_collected"] <= len(b._live())

    final = corpus.where(F.col("doc_id") % 2 >= 1).unionByName(big)
    fresh = _build(spark, final, tmp_path, "d1f")
    assert _query(spark, b) == _query(spark, fresh)


def test_distributed_matches_driver_path_exactly(spark, corpus, tmp_path):
    """Same batch through both planning paths: identical stats fragment,
    identical delete map, identical query results."""
    big = _recrawl(corpus, 1, "twin")
    b_drv = _build(spark, corpus, tmp_path, "d2a")
    b_dst = _build(spark, corpus, tmp_path, "d2b")
    b_drv.upsert(big, distributed=False)
    b_dst.upsert(big, distributed=True)
    assert b_drv._last_planning["mode"] == "driver"
    assert b_dst._last_planning["mode"] == "distributed"

    rows = lambda s: sorted(  # noqa: E731
        (r["term"], int(r["df"]), int(r["cf"])) for r in s.collect()
    )
    s_drv, n_drv, avg_drv = b_drv.global_stats()
    s_dst, n_dst, avg_dst = b_dst.global_stats()
    assert n_drv == n_dst and abs(avg_drv - avg_dst) < 1e-12
    assert rows(s_drv) == rows(s_dst)

    dm_a, dm_b = b_drv.delete_map(), b_dst.delete_map()
    assert set(dm_a) == set(dm_b)
    for s in dm_a:
        assert dm_a[s][0].tolist() == dm_b[s][0].tolist()
        assert dm_a[s][1].tolist() == dm_b[s][1].tolist()
    assert _query(spark, b_drv) == _query(spark, b_dst)


def test_auto_threshold_picks_paths(spark, corpus, tmp_path):
    b = _build(spark, corpus, tmp_path, "d3")
    small = corpus.where(F.col("doc_id") % 20 == 3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" tiny refresh"))
    )
    b.upsert(small)  # default threshold: small overlap -> driver path
    assert b._last_planning["mode"] == "driver"
    b.upsert(_recrawl(corpus, 1, "auto"), distributed_threshold=10)
    assert b._last_planning["mode"] == "distributed"


def test_distributed_chain_with_compaction(spark, corpus, tmp_path):
    """Distributed upserts compose with minor compaction and further
    (driver-path) upserts."""
    b = _build(spark, corpus, tmp_path, "d4")
    big = _recrawl(corpus, 1, "c1")
    u1 = b.upsert(big, distributed=True)
    b.compact(parts=[u1])
    small = corpus.where(F.col("doc_id") % 2 == 0).where(
        F.col("doc_id") % 10 == 4
    ).withColumn("text", F.concat(F.col("text"), F.lit(" refreshed corpus post")))
    b.upsert(small, distributed=False)

    final = (
        corpus.where(F.col("doc_id") % 2 >= 1)
        .unionByName(big.join(small.select("doc_id"), "doc_id", "left_anti"))
        .unionByName(small)
    )
    fresh = _build(spark, final, tmp_path, "d4f")
    assert _query(spark, b) == _query(spark, fresh)

"""Doc-level upsert / delete / compaction (SURVEY §2 J3/S5 extension).

Reference semantics: every incoming batch is MERGED into existing index
pages so a re-crawled URL replaces its old posting
(/root/reference/mwmbl/indexer/index_batches.py:78-90,150-173). The
Spark engine re-expresses that as merge-on-read delete vectors plus
compaction (operators/upsert.py); the gate here is the strongest one
available: after ANY chain of upserts/deletes/compactions, query
results must be identical — doc order and scores — to a fresh
single-shot build over the updated corpus.
"""

from __future__ import annotations

import os

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
        synth_transcripts(spark, n_conv=40, turns_per_conv=5, seed=31)
    ).cache()


@pytest.fixture(scope="module")
def added(spark):
    return with_doc_id(
        synth_transcripts(spark, n_conv=6, turns_per_conv=3, seed=77).withColumn(
            "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
        )
    ).cache()


def _updated(df):
    """Re-crawled versions of ~1/6 of docs: same doc_id, new text."""
    return df.where(F.col("doc_id") % 6 == 3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed corpus refreshed"))
    )


def _query(spark, builder, k=10):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = builder.query_topk(qdf, k=k)
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in out.orderBy("query_id", "rank").collect()
    ]


def _build(spark, df, tmp_path, name, parts=4):
    cfg = IndexConfig(
        path=str(tmp_path / name), num_buckets=16, nsalt=4, n_src_partitions=parts
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return b


def _modified_corpus(corpus, added):
    return (
        corpus.where(F.col("doc_id") % 6 != 3)
        .unionByName(_updated(corpus))
        .unionByName(added)
    )


def test_upsert_equals_fresh_build(spark, corpus, added, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base")
    live_b.upsert(_updated(corpus).unionByName(added))
    fresh_b = _build(spark, _modified_corpus(corpus, added), tmp_path, "fresh")
    got, want = _query(spark, live_b), _query(spark, fresh_b)
    assert got == want
    # stale versions really are masked: no doc appears twice per query
    per_q = {}
    for qid, d, _ in got:
        assert d not in per_q.setdefault(qid, set())
        per_q[qid].add(d)


def test_upsert_stats_exact(spark, corpus, added, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base_s")
    live_b.upsert(_updated(corpus).unionByName(added))
    fresh_b = _build(spark, _modified_corpus(corpus, added), tmp_path, "fresh_s")
    s_live, n_live, avg_live = live_b.global_stats()
    s_fresh, n_fresh, avg_fresh = fresh_b.global_stats()
    assert n_live == n_fresh
    assert abs(avg_live - avg_fresh) < 1e-12
    rows = lambda s: sorted(  # noqa: E731
        (r["term"], int(r["df"]), int(r["cf"])) for r in s.collect()
    )
    assert rows(s_live) == rows(s_fresh)


def test_chained_upserts(spark, corpus, added, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base_c")
    live_b.upsert(_updated(corpus))
    # second upsert re-modifies a SUBSET of the first (chained
    # supersession) and adds the new docs
    twice = corpus.where(F.col("doc_id") % 12 == 3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" twice refreshed corpus"))
    )
    live_b.upsert(twice.unionByName(added))
    final = (
        corpus.where(F.col("doc_id") % 6 != 3)
        .unionByName(_updated(corpus).where(F.col("doc_id") % 12 != 3))
        .unionByName(twice)
        .unionByName(added)
    )
    fresh_b = _build(spark, final, tmp_path, "fresh_c")
    assert _query(spark, live_b) == _query(spark, fresh_b)


def test_delete_docs(spark, corpus, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base_d")
    victims = corpus.where(F.col("doc_id") % 6 == 1).select("doc_id")
    assert live_b.delete_docs(victims) is not None
    fresh_b = _build(
        spark, corpus.where(F.col("doc_id") % 6 != 1), tmp_path, "fresh_d"
    )
    assert _query(spark, live_b) == _query(spark, fresh_b)
    # deleting only-unknown ids is a no-op (no commit)
    ghosts = spark.createDataFrame([(999999999999,)], "doc_id long")
    assert live_b.delete_docs(ghosts) is None


def test_pure_append_upsert_writes_no_delete_vector(spark, corpus, added, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base_a")
    part = live_b.upsert(added)
    assert not os.path.isdir(
        os.path.join(live_b.cfg.path, "deletes", f"src_part={part}")
    )
    fresh_b = _build(spark, corpus.unionByName(added), tmp_path, "fresh_a")
    assert _query(spark, live_b) == _query(spark, fresh_b)


def test_compaction(spark, corpus, added, tmp_path):
    live_b = _build(spark, corpus, tmp_path, "base_k")
    live_b.upsert(_updated(corpus).unionByName(added))
    live_b.delete_docs(corpus.where(F.col("doc_id") % 6 == 1).select("doc_id"))
    before = _query(spark, live_b)
    replaced = set(live_b._live())
    part = live_b.compact()
    assert part is not None
    # single live fragment, vectors retired, replaced dirs vacuumed
    assert set(live_b._live()) == {part}
    assert live_b.delete_map() == {}
    for old in replaced:
        assert not os.path.isdir(
            os.path.join(live_b.cfg.path, "segments", f"src_part={old}")
        )
    assert _query(spark, live_b) == before
    # and still identical to a fresh build of the final corpus
    final = (
        corpus.where((F.col("doc_id") % 6 != 3) & (F.col("doc_id") % 6 != 1))
        .unionByName(_updated(corpus))
        .unionByName(added)
    )
    fresh_b = _build(spark, final, tmp_path, "fresh_k")
    assert _query(spark, live_b) == _query(spark, fresh_b)
    # upserts keep working after compaction
    up2 = _updated(corpus).withColumn(
        "text", F.concat(F.col("text"), F.lit(" post compact"))
    )
    live_b.upsert(up2)
    post = final.join(up2.select("doc_id"), "doc_id", "left_anti").unionByName(up2)
    fresh2 = _build(spark, post, tmp_path, "fresh_k2")
    assert _query(spark, live_b) == _query(spark, fresh2)


def test_upsert_edge_probes(spark, corpus, added, tmp_path):
    """Robustness on a mutated index: empty query, unknown term, and a
    term whose ONLY holders were deleted all return 0 rows, no error."""
    live_b = _build(spark, corpus, tmp_path, "base_e", parts=2)
    live_b.upsert(_updated(corpus))
    # 'refreshed' exists only in the upserted versions; delete them all
    live_b.delete_docs(corpus.where(F.col("doc_id") % 6 == 3).select("doc_id"))
    qdf = spark.createDataFrame(
        [(0, ""), (1, "zzzznoterm"), (2, "refreshed corpus"), (3, "the spark")],
        "query_id long, query string",
    )
    rows = live_b.query_topk(qdf, k=5).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 0 not in by_q and 1 not in by_q and 2 not in by_q
    assert len(by_q.get(3, [])) > 0  # untouched docs still found

"""Resumable build: kill-and-resume must equal a one-shot build
(SURVEY §5.3 protocol): no duplicate postings, identical query results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.functions.codec import delta_decode_blocked
from mwmbl_spark.operators.segments import BLOCK_SIZE
from mwmbl_spark.manifest import committed_partitions, read_manifest
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.synth import synth_transcripts, with_doc_id
from oracle.engine import build_oracle

QUERIES = [(0, "w0001 w0002"), (1, "the spark"), (2, "w0000 w0007 w0019")]


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_doc_id(synth_transcripts(spark, n_conv=48, turns_per_conv=5, seed=23)).cache()
    oracle = build_oracle([(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()])
    return df, oracle


def _query(spark, builder, k=10):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = builder.query_topk(qdf, k=k)
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in out.orderBy("query_id", "rank").collect()
    ]


def test_resume_equals_oneshot(spark, corpus, tmp_path):
    df, oracle = corpus
    cfg_a = IndexConfig(path=str(tmp_path / "idx_resumed"), num_buckets=16, nsalt=4, n_src_partitions=4)
    cfg_b = IndexConfig(path=str(tmp_path / "idx_oneshot"), num_buckets=16, nsalt=4, n_src_partitions=4)
    a, b = IndexBuilder(spark, cfg_a), IndexBuilder(spark, cfg_b)

    # simulated kill: first run commits only 2 of 4 partitions
    done1 = a.build(df, max_partitions=2)
    assert len(done1) == 2
    assert committed_partitions(spark, cfg_a.path) == set(done1)

    # partial index serves a consistent (subset) view
    partial_res = _query(spark, a)
    assert len(partial_res) > 0

    # resume: only the remaining partitions are built
    done2 = a.build(df)
    assert len(done2) == 2 and set(done1).isdisjoint(done2)

    # idempotent re-run: nothing left to do
    assert a.build(df) == []

    b.build(df)
    assert _query(spark, a) == _query(spark, b)


def test_no_duplicate_postings_after_resume(spark, corpus, tmp_path):
    df, oracle = corpus
    cfg = IndexConfig(path=str(tmp_path / "idx2"), num_buckets=16, nsalt=4, n_src_partitions=4)
    bld = IndexBuilder(spark, cfg)
    bld.build(df, max_partitions=1)
    bld.build(df)
    seen = set()
    for row in bld.segments().collect():
        for d in delta_decode_blocked(row["doc_ids"], BLOCK_SIZE):
            key = (row["term"], int(d))
            assert key not in seen, f"duplicate posting {key}"
            seen.add(key)


def test_query_matches_oracle_after_resume(spark, corpus, tmp_path):
    df, oracle = corpus
    cfg = IndexConfig(path=str(tmp_path / "idx3"), num_buckets=16, nsalt=4, n_src_partitions=4)
    bld = IndexBuilder(spark, cfg)
    bld.build(df, max_partitions=3)
    bld.build(df)
    got = _query(spark, bld)
    for qid, q in QUERIES:
        want = oracle.bm25_topk(q, k=10)
        got_q = [(d, s) for (i, d, s) in got if i == qid]
        assert [d for d, _ in got_q] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got_q, want):
            assert abs(gs - ws) < 1e-6


def test_manifest_metrics_recorded(spark, corpus, tmp_path):
    df, oracle = corpus
    cfg = IndexConfig(path=str(tmp_path / "idx4"), num_buckets=16, nsalt=4, n_src_partitions=2)
    bld = IndexBuilder(spark, cfg)
    bld.build(df)
    m = read_manifest(spark, cfg.path)
    rows = m.collect()
    assert len(rows) == 2
    assert all(r["status"] == "INDEXED" for r in rows)
    assert sum(r["n_docs"] for r in rows) == df.count()
    assert all(r["wall_ms"] > 0 for r in rows)
    assert all(r["committed_at"] is not None for r in rows)

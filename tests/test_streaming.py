"""Structured Streaming incremental build: AvailableNow micro-batches
through the shared build path, exactly-once via manifest + checkpoint,
new data picked up on re-run."""

from __future__ import annotations

import pytest

from mwmbl_spark.manifest import committed_partitions, read_manifest
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.streaming.incremental import (
    hourly_role_counts_stream,
    incremental_index_stream,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id
from oracle.engine import build_oracle

QUERIES = [(0, "w0001 w0002"), (1, "the spark")]


def _write_chunk(spark, path, n_conv, seed, offset=0):
    from pyspark.sql import functions as F

    df = with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=4, seed=seed))
    if offset:
        df = df.withColumn(
            "conv_id", F.concat(F.lit(f"c{offset}-"), F.col("conv_id"))
        )
        # doc_id must stay unique across chunks: re-derive from new conv_id
        from mwmbl_spark.synth import with_doc_id as rid

        df = rid(df.drop("doc_id"))
    df.write.mode("append").parquet(path)


def test_streaming_incremental_build(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    cfg = IndexConfig(path=idx, num_buckets=16, nsalt=4)

    _write_chunk(spark, src, n_conv=20, seed=5)
    builder = incremental_index_stream(spark, src, cfg, ckpt)
    done1 = committed_partitions(spark, idx)
    assert len(done1) >= 1

    # append new data -> only the new files are processed on re-run
    _write_chunk(spark, src, n_conv=10, seed=6, offset=1)
    incremental_index_stream(spark, src, cfg, ckpt)
    done2 = committed_partitions(spark, idx)
    assert len(done2) > len(done1)

    # re-run with no new data: no new commits (checkpoint bookkeeping)
    incremental_index_stream(spark, src, cfg, ckpt)
    assert committed_partitions(spark, idx) == done2

    # the streamed index answers queries rank-identically to the oracle
    all_rows = spark.read.parquet(src).select("doc_id", "text").collect()
    oracle = build_oracle([(r["doc_id"], r["text"]) for r in all_rows])
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = builder.query_topk(qdf, k=10)
    got: dict[int, list[int]] = {i: [] for i, _ in QUERIES}
    for r in out.orderBy("query_id", "rank").collect():
        got[r["query_id"]].append(r["doc_id"])
    for qid, q in QUERIES:
        assert got[qid] == [d for d, _ in oracle.bm25_topk(q, k=10)], q


def test_streaming_hourly_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunk(spark, src, n_conv=12, seed=9)
    hourly_role_counts_stream(spark, src, out, ckpt)
    res = spark.read.parquet(out)
    assert set(res.columns) == {"window_start", "window_end", "role", "n_turns"}
    # counts over finalized windows must match the batch aggregation on
    # the same (closed) windows
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .count()
    )
    got = {(r["window_start"], r["role"]): r["n_turns"] for r in res.collect()}
    want = {
        (r["win"]["start"], r["role"]): r["count"]
        for r in batch.collect()
        if (r["win"]["start"], r["role"]) in got  # open windows withheld by watermark
    }
    assert got.items() >= want.items() or got == {}
    assert len(got) > 0


# --- streaming curation folds (views.py write path, decoupled) ---------------

def test_streaming_curation_folds_edits(spark, tmp_path):
    import hashlib

    from mwmbl_spark.streaming.curation_stream import (
        curation_stream,
        current_pages,
    )

    n_pages = 16
    term = "spark data"
    pg = int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_pages
    seed = str(tmp_path / "seed")
    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    ckpt = str(tmp_path / "ckpt_cur")
    spark.createDataFrame(
        [
            (pg, 0, "Old A", "https://a.com", "ex", 5.0, term, None),
            (pg, 1, "Old B", "https://b.com", "ex", 4.0, term, None),
        ],
        "page long, position int, title string, url string, extract string, "
        "score double, term string, state int",
    ).write.parquet(seed)

    # batch 1: approve a new doc
    spark.createDataFrame(
        [(term, 0, "New X", "https://x.com", "e", 7)],
        "query string, rank long, title string, url string, extract string, state int",
    ).write.mode("append").parquet(cur)
    curation_stream(spark, cur, seed, store, ckpt, n_pages)
    rows1 = {r["url"]: r for r in current_pages(spark, store, seed).collect()}
    assert rows1["https://x.com"]["position"] == 0 and rows1["https://x.com"]["state"] == 7
    assert len(rows1) == 3

    # re-run with no new files: no new version (exactly-once)
    from mwmbl_spark.manifest import committed_partitions

    v1 = set(committed_partitions(spark, store))
    curation_stream(spark, cur, seed, store, ckpt, n_pages)
    assert set(committed_partitions(spark, store)) == v1

    # batch 2 folds ON TOP of batch 1: un-approve x.com
    spark.createDataFrame(
        [(term, 0, "New X", "https://x.com", "e", None)],
        "query string, rank long, title string, url string, extract string, state int",
    ).write.mode("append").parquet(cur)
    curation_stream(spark, cur, seed, store, ckpt, n_pages)
    rows2 = {r["url"]: r for r in current_pages(spark, store, seed).collect()}
    assert rows2["https://x.com"]["state"] is None  # un-approved survivor
    assert len(rows2) == 3


def test_streaming_upsert_mode_replaces_recrawled_docs(spark, tmp_path):
    """mode='upsert': a stream batch containing re-crawled docs REPLACES
    their stored postings (reference RMW semantics in the streaming
    path); auto_compact_fragments bounds the live fragment count."""
    from pyspark.sql import functions as F

    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig

    src = str(tmp_path / "u_src")
    idx = str(tmp_path / "u_idx")
    ckpt = str(tmp_path / "u_ckpt")
    cfg = IndexConfig(path=idx, num_buckets=16, nsalt=4)

    base = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=4, seed=5))
    base.write.mode("append").parquet(src)
    builder = incremental_index_stream(spark, src, cfg, ckpt, mode="upsert")

    # re-crawl a third of the docs with changed text + add fresh docs
    updated = base.where(F.col("doc_id") % 3 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" streamed recrawl spark"))
    )
    fresh = with_doc_id(
        synth_transcripts(spark, n_conv=5, turns_per_conv=4, seed=9).withColumn(
            "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
        )
    )
    updated.unionByName(fresh).write.mode("append").parquet(src)
    builder = incremental_index_stream(
        spark, src, cfg, ckpt, mode="upsert", auto_compact_fragments=1
    )
    # auto-compaction collapsed the fragment chain
    assert len(builder._live()) == 1

    # identical to a fresh single-shot build over the updated corpus
    final = (
        base.where(F.col("doc_id") % 3 != 1)
        .unionByName(updated)
        .unionByName(fresh)
    )
    fcfg = IndexConfig(
        path=str(tmp_path / "u_fresh"), num_buckets=16, nsalt=4, n_src_partitions=2
    )
    fb = IndexBuilder(spark, fcfg)
    fb.build(final)
    qdf = spark.createDataFrame(
        QUERIES + [(2, "streamed recrawl spark")], "query_id long, query string"
    )

    def res(b):
        return [
            (r["query_id"], r["doc_id"], round(r["score"], 9))
            for r in b.query_topk(qdf, k=10).orderBy("query_id", "rank").collect()
        ]

    assert res(builder) == res(fb)

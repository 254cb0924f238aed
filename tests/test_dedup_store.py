"""Disk-backed dedup staging (round-6): delta-only epochs, pruned
scans, equality with the in-memory staging path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import (
    build_dedup_staging,
    incremental_near_duplicates,
    update_dedup_staging,
)
from mwmbl_spark.operators.dedup_store import (
    DedupStagingStore,
    _bucket_py,
    build_dedup_staging_store,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id

THRESH = 0.35


@pytest.fixture(scope="module")
def corpus_v0(spark):
    return (
        with_doc_id(synth_transcripts(spark, n_conv=80, turns_per_conv=3, seed=29))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def _epoch(spark, corpus, n_changed=20):
    changed = corpus.select("doc_id").orderBy("doc_id").limit(n_changed)
    neighbor = corpus.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" tiny epoch edit")).alias("new_text"),
    )
    updated = (
        corpus.join(changed, "doc_id", "left_semi")
        .join(neighbor, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "new_text", F.concat("text", F.lit(" refreshed"))
            ).alias("text"),
        )
    )
    v1 = corpus.join(changed, "doc_id", "left_anti").unionByName(updated)
    return v1.localCheckpoint(eager=True), changed.localCheckpoint(eager=True)


def test_bucket_py_matches_spark(spark):
    """Driver bucket twin must be bit-identical to pmod(xxhash64(v), n)
    for longs AND strings — the pushdown prunes the WRONG directories
    otherwise (silent empty results)."""
    longs = [0, 1, -5, 123456789012345, -987654321098765]
    strs = ["", "a", "band|00ff", "7|deadbeef01234567"]
    got_l = {
        r["v"]: r["b"]
        for r in spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", F.pmod(F.xxhash64("v"), F.lit(32)).cast("int").alias("b"))
        .collect()
    }
    for v in longs:
        assert _bucket_py(v, 32) == got_l[v], v
    got_s = {
        r["v"]: r["b"]
        for r in spark.createDataFrame([(v,) for v in strs], "v string")
        .select("v", F.pmod(F.xxhash64("v"), F.lit(32)).cast("int").alias("b"))
        .collect()
    }
    for v in strs:
        assert _bucket_py(v, 32) == got_s[v], v


def test_store_equals_memory_staging_across_epochs(spark, corpus_v0, tmp_path):
    """Two chained epochs: the store's near_duplicates must be
    row-identical to incremental_near_duplicates on the in-memory
    staging at every epoch."""
    store = build_dedup_staging_store(
        spark, corpus_v0, str(tmp_path / "store"), band_cap=500
    )
    mem = build_dedup_staging(corpus_v0, band_cap=500)

    v1, ch1 = _epoch(spark, corpus_v0, n_changed=20)
    store.update(v1, ch1)
    mem = update_dedup_staging(mem, v1, ch1)
    got = sorted(map(tuple, store.near_duplicates(ch1, THRESH).collect()))
    want = sorted(map(tuple, incremental_near_duplicates(
        v1, ch1, threshold=THRESH, band_cap=500, staging=mem
    ).collect()))
    assert got == want and got  # binding epoch: real pairs

    v2, ch2 = _epoch(spark, v1, n_changed=12)
    store.update(v2, ch2)
    mem = update_dedup_staging(mem, v2, ch2)
    got2 = sorted(map(tuple, store.near_duplicates(ch2, THRESH).collect()))
    want2 = sorted(map(tuple, incremental_near_duplicates(
        v2, ch2, threshold=THRESH, band_cap=500, staging=mem
    ).collect()))
    assert got2 == want2 and got2


def test_epoch_writes_are_delta_sized(spark, corpus_v0, tmp_path):
    """An epoch must write ONLY delta files: the base epoch=0 parquet
    files are byte-identical after an update (no corpus rewrite)."""
    path = str(tmp_path / "store")
    store = build_dedup_staging_store(spark, corpus_v0, path, band_cap=500)

    def snapshot(table):
        out = {}
        for root, _, files in os.walk(f"{path}/{table}/epoch=0"):
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    base_sh, base_bd = snapshot("shingles"), snapshot("bands")
    assert base_sh and base_bd
    v1, ch1 = _epoch(spark, corpus_v0, n_changed=10)
    store.update(v1, ch1)
    assert snapshot("shingles") == base_sh
    assert snapshot("bands") == base_bd
    # the delta holds ONLY the changed docs' rows
    delta = spark.read.parquet(f"{path}/shingles/epoch=1")
    ch_ids = {r["doc_id"] for r in ch1.collect()}
    assert {r["doc_id"] for r in delta.select("doc_id").distinct().collect()} <= ch_ids


def test_pruned_scan_carries_literal_filters(spark, corpus_v0, tmp_path):
    """live_shingles(ids) must push BOTH the bucket partition filter
    and the id row-group filter into the parquet scan."""
    path = str(tmp_path / "store")
    store = build_dedup_staging_store(spark, corpus_v0, path, band_cap=None)
    ids = [r["doc_id"] for r in corpus_v0.select("doc_id").limit(3).collect()]
    plan = store.live_shingles(ids)._jdf.queryExecution().executedPlan().toString()
    assert "doc_bucket" in plan and "PartitionFilters" in plan
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:400]
    got = {r["doc_id"] for r in store.live_shingles(ids).collect()}
    assert got == set(ids)


def test_attach_recovers_state(spark, corpus_v0, tmp_path):
    """A fresh DedupStagingStore over an existing directory sees the
    latest epoch and serves identical results."""
    path = str(tmp_path / "store")
    store = build_dedup_staging_store(spark, corpus_v0, path, band_cap=500)
    v1, ch1 = _epoch(spark, corpus_v0, n_changed=8)
    store.update(v1, ch1)
    re = DedupStagingStore(spark, path, band_cap=500)
    assert re.epoch == 1
    a = sorted(map(tuple, store.near_duplicates(ch1, THRESH).collect()))
    b = sorted(map(tuple, re.near_duplicates(ch1, THRESH).collect()))
    assert a == b

"""Snapshot (time-travel) reads over the seq-versioned index.

The reference keeps exactly one mutable index state (mmap'd page store,
/root/reference/mwmbl/tinysearchengine/indexer.py) — a past state is
unrecoverable once a batch merges. The lakehouse layout this engine
already uses (monotonic commit seqs, immutable fragment directories,
per-row-seq delete vectors, manifest ``replaces``) gives history for
free: ``partition_seqs(as_of=)`` reconstructs any past live set and
``IndexBuilder.query_topk(as_of=)`` serves BM25 over it — Delta/Iceberg
``VERSION AS OF`` semantics, including the vacuum-breaks-time-travel
contract.

The gate is the strongest available: a snapshot query must be
hash-identical (doc order AND scores) to a fresh build over the corpus
as it stood at that commit.
"""

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
        synth_transcripts(spark, n_conv=30, turns_per_conv=4, seed=41)
    ).cache()


def _updated(df):
    return df.where(F.col("doc_id") % 5 == 2).withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed corpus refreshed"))
    )


def _query(spark, builder, as_of=None, k=10):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = builder.query_topk(qdf, k=k, as_of=as_of)
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in out.orderBy("query_id", "rank").collect()
    ]


def _build(spark, df, tmp_path, name, parts=3):
    cfg = IndexConfig(
        path=str(tmp_path / name), num_buckets=16, nsalt=4, n_src_partitions=parts
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return b


@pytest.fixture(scope="module")
def added(spark):
    return with_doc_id(
        synth_transcripts(spark, n_conv=4, turns_per_conv=3, seed=99).withColumn(
            "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
        )
    ).cache()


@pytest.fixture(scope="module")
def history(spark, corpus, added, tmp_path_factory):
    """One index driven through build -> upsert(+new docs) -> delete,
    with the snapshot seq and the live query results captured at each
    stage."""
    tmp = tmp_path_factory.mktemp("tt")
    b = _build(spark, corpus, tmp, "idx")
    stages = [(b.current_seq(), _query(spark, b))]
    b.upsert(_updated(corpus).unionByName(added))
    stages.append((b.current_seq(), _query(spark, b)))
    b.delete_docs(corpus.where(F.col("doc_id") % 5 == 1).select("doc_id"))
    stages.append((b.current_seq(), _query(spark, b)))
    return b, stages, tmp


def test_seqs_strictly_increase(history):
    _, stages, _ = history
    seqs = [s for s, _ in stages]
    assert seqs == sorted(set(seqs)) and seqs[0] >= 1


def test_snapshot_reads_reproduce_each_stage(spark, history):
    b, stages, _ = history
    for as_of, want in stages:
        assert _query(spark, b, as_of=as_of) == want
    # the newest snapshot IS the live view
    assert _query(spark, b, as_of=stages[-1][0]) == _query(spark, b)


def test_snapshot_equals_fresh_build_of_past_corpus(spark, corpus, history, tmp_path):
    """as_of the pre-mutation seq == a from-scratch index of the
    ORIGINAL corpus: same docs, same scores (exact df/cf/N/avgdl)."""
    b, stages, _ = history
    fresh = _build(spark, corpus, tmp_path, "fresh_orig")
    assert _query(spark, b, as_of=stages[0][0]) == _query(spark, fresh)
    s_tt, n_tt, avg_tt = b.global_stats(as_of=stages[0][0])
    s_fr, n_fr, avg_fr = fresh.global_stats()
    assert n_tt == n_fr and abs(avg_tt - avg_fr) < 1e-12
    rows = lambda s: sorted(  # noqa: E731
        (r["term"], int(r["df"]), int(r["cf"])) for r in s.collect()
    )
    assert rows(s_tt) == rows(s_fr)


def test_time_travel_across_compaction_without_vacuum(spark, history):
    """compact(vacuum=False) keeps replaced fragment files on disk, so
    every earlier snapshot stays readable and identical — and the live
    view is unchanged by the compaction itself."""
    b, stages, _ = history
    live_before = _query(spark, b)
    assert b.compact(vacuum=False) is not None
    assert _query(spark, b) == live_before
    for as_of, want in stages:
        assert _query(spark, b, as_of=as_of) == want


def test_vacuum_breaks_old_snapshots_loudly(spark, corpus, tmp_path):
    """After compact(vacuum=True) the pre-compaction snapshot's files
    are gone: the read must FAIL with an actionable error, never return
    silently partial results."""
    b = _build(spark, corpus, tmp_path, "idx_vac", parts=2)
    s0 = b.current_seq()
    b.upsert(_updated(corpus))
    assert b.compact(vacuum=True) is not None
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        _query(spark, b, as_of=s0)
    # ...and so must doc-grain reads (a silent basePath read would
    # drop the vacuumed fragments' docs and mislabel a snapshot_diff)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        b.snapshot_diff(s0, b.current_seq()).collect()
    # the post-compaction snapshot (== live) still reads fine
    assert _query(spark, b, as_of=b.current_seq()) == _query(spark, b)


def test_as_of_zero_is_empty_index(spark, history):
    b, _, _ = history
    assert b._live(as_of=0) == {}


def test_streaming_epochs_are_snapshots(spark, corpus, tmp_path):
    """History integrates with the streaming path for free: each
    micro-batch epoch of an upsert-mode stream commits at its own seq,
    so snapshot_diff between epoch seqs is the stream's change feed and
    as-of queries reproduce any epoch's serving state."""
    from mwmbl_spark.plans.build_index import IndexConfig
    from mwmbl_spark.streaming.incremental import incremental_index_stream

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    cfg = IndexConfig(path=str(tmp_path / "cdc_idx"), num_buckets=16, nsalt=4)
    corpus.write.mode("append").parquet(src)
    b = incremental_index_stream(spark, src, cfg, ckpt, mode="upsert")
    s1 = b.current_seq()
    epoch1 = _query(spark, b)

    recrawl = corpus.where(F.col("doc_id") % 4 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" cdc recrawl"))
    )
    recrawl.write.mode("append").parquet(src)
    b = incremental_index_stream(spark, src, cfg, ckpt, mode="upsert")
    s2 = b.current_seq()
    assert s2 > s1

    # the epoch diff is exactly the re-crawled set, all 'updated'
    diff = {
        (int(r["doc_id"]), r["change"])
        for r in b.snapshot_diff(s1, s2).collect()
    }
    want = {int(r["doc_id"]) for r in recrawl.select("doc_id").collect()}
    assert diff == {(d, "updated") for d in want}
    # and epoch 1's serving state is reproducible after epoch 2 landed
    assert _query(spark, b, as_of=s1) == epoch1


def _ids(df):
    return {int(r["doc_id"]) for r in df.collect()}


def test_snapshot_diff(spark, corpus, added, history):
    b, stages, _ = history
    s1, s2, s3 = (s for s, _ in stages)
    upd_ids = _ids(_updated(corpus).select("doc_id"))
    new_ids = _ids(added.select("doc_id"))
    del_ids = _ids(corpus.where(F.col("doc_id") % 5 == 1).select("doc_id"))

    d12 = {(int(r["doc_id"]), r["change"]) for r in b.snapshot_diff(s1, s2).collect()}
    assert d12 == {(d, "updated") for d in upd_ids} | {(d, "added") for d in new_ids}

    d23 = {(int(r["doc_id"]), r["change"]) for r in b.snapshot_diff(s2, s3).collect()}
    assert d23 == {(d, "deleted") for d in del_ids}

    # transitive: s1 -> s3 composes the two (no doc is both updated and
    # deleted here — the mod-5 classes are disjoint)
    d13 = {(int(r["doc_id"]), r["change"]) for r in b.snapshot_diff(s1, s3).collect()}
    assert d13 == d12 | d23
    # a snapshot diffed against itself is empty
    assert b.snapshot_diff(s2, s2).count() == 0


def test_alive_docs_counts(spark, corpus, added, history):
    b, stages, _ = history
    n0 = corpus.count()
    assert b.alive_docs(as_of=stages[0][0]).count() == n0
    assert b.alive_docs(as_of=stages[1][0]).count() == n0 + added.count()
    n_del = corpus.where(F.col("doc_id") % 5 == 1).count()
    assert b.alive_docs(as_of=stages[2][0]).count() == n0 + added.count() - n_del
    assert b.alive_docs().count() == n0 + added.count() - n_del
    # alive version identity at the post-upsert snapshot: updated docs
    # sit at the upsert's commit seq (the LIVE view can't be pinned
    # here — an earlier test compacts this module-scoped index, which
    # legitimately re-tags every doc at the compacted fragment's seq)
    upd = b.alive_docs(as_of=stages[1][0]).join(
        _updated(corpus).select("doc_id"), "doc_id", "left_semi"
    )
    assert {int(r["seq"]) for r in upd.select("seq").distinct().collect()} == {
        stages[1][0]
    }


def test_expire_snapshots_retention(spark, corpus, tmp_path):
    """expire_snapshots(keep_as_of=S) removes exactly the fragments no
    snapshot >= S references: newer snapshots stay readable and
    identical, older ones fail loudly."""
    b = _build(spark, corpus, tmp_path, "idx_gc", parts=2)
    s1 = b.current_seq()
    b.upsert(_updated(corpus))
    s2 = b.current_seq()
    r2 = _query(spark, b)
    part = b.compact(vacuum=False)
    s3 = b.current_seq()
    # everything still present: nothing is removable at keep_as_of=s1
    assert b.expire_snapshots(keep_as_of=s1) == []
    assert _query(spark, b, as_of=s1) is not None
    # retain from s3 on: the pre-compaction fragments (replaced at s3)
    # are exactly the removable set
    removed = b.expire_snapshots(keep_as_of=s3)
    assert removed and part not in removed
    assert set(removed) == {p for p in removed}  # names unique
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        _query(spark, b, as_of=s1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        _query(spark, b, as_of=s2)
    # the retained snapshot and the live view are untouched
    assert _query(spark, b, as_of=s3) == r2
    assert _query(spark, b) == r2
    # idempotent
    assert b.expire_snapshots(keep_as_of=s3) == []


def test_index_health(spark, corpus, tmp_path):
    b = _build(spark, corpus, tmp_path, "idx_health", parts=2)
    h0 = b.index_health()
    n0 = corpus.count()
    assert h0["live_fragments"] == 2 == h0["read_amplification"]
    assert h0["n_docs"] == n0 and h0["deleted_docs"] == 0
    assert h0["replaced_fragments"] == 0 == h0["vacuumable_fragments"]
    b.upsert(_updated(corpus))
    n_upd = _updated(corpus).count()
    h1 = b.index_health()
    assert h1["live_fragments"] == 3
    assert h1["deleted_docs"] == n_upd  # superseded versions
    assert h1["n_docs"] == n0  # upsert replaces, never double-counts
    assert h1["current_seq"] > h0["current_seq"]
    b.compact(vacuum=False)
    h2 = b.index_health()
    assert h2["live_fragments"] == 1 and h2["deleted_docs"] == 0
    assert h2["n_docs"] == n0
    assert h2["replaced_fragments"] == 3 == h2["vacuumable_fragments"]
    # expire reclaims exactly the vacuumable set
    removed = b.expire_snapshots(keep_as_of=b.current_seq())
    assert len(removed) == 3
    assert b.index_health()["vacuumable_fragments"] == 0


def test_restore_rolls_back_to_snapshot(spark, corpus, added, tmp_path):
    """restore(as_of) == querying the snapshot == a fresh build of the
    original corpus; pre-restore history stays readable (vacuum=False
    default); the restored index accepts further mutations."""
    b = _build(spark, corpus, tmp_path, "idx_restore", parts=2)
    s1 = b.current_seq()
    want = _query(spark, b)
    b.upsert(_updated(corpus).unionByName(added))
    b.delete_docs(corpus.where(F.col("doc_id") % 5 == 1).select("doc_id"))
    s_bad = b.current_seq()
    bad = _query(spark, b)
    part = b.restore(s1)
    assert set(b._live()) == {part}
    assert b.delete_map() == {}
    assert _query(spark, b) == want
    # exact stats rollback, not just ranking
    fresh = _build(spark, corpus, tmp_path, "fresh_restore", parts=2)
    s_r, n_r, avg_r = b.global_stats()
    s_f, n_f, avg_f = fresh.global_stats()
    assert n_r == n_f and abs(avg_r - avg_f) < 1e-12
    rows = lambda s: sorted(  # noqa: E731
        (r["term"], int(r["df"]), int(r["cf"])) for r in s.collect()
    )
    assert rows(s_r) == rows(s_f)
    # the bad epoch is still auditable after the restore
    assert _query(spark, b, as_of=s_bad) == bad
    # and the restored index keeps working as a normal index
    b.upsert(_updated(corpus))
    fresh2 = _build(
        spark,
        corpus.where(F.col("doc_id") % 5 != 2).unionByName(_updated(corpus)),
        tmp_path,
        "fresh_restore2",
        parts=2,
    )
    assert _query(spark, b) == _query(spark, fresh2)

"""Fragment-scoped (minor) compaction: maintenance cost proportional to
update volume, not corpus size (VERDICT r3 top item).

The gate mirrors tests/test_upsert.py's strongest available check —
after any chain of upserts/deletes/minor compactions, query results
must equal a fresh single-shot build over the updated corpus — plus the
scale assertions the policy exists for: untouched fragments' files are
physically untouched, and the binpack policy merges only the smallest
fragments."""

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
        synth_transcripts(spark, n_conv=40, turns_per_conv=5, seed=41)
    ).cache()


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


def _upd(corpus, mod, rem, tag):
    return corpus.where(F.col("doc_id") % mod == rem).withColumn(
        "text", F.concat(F.col("text"), F.lit(f" refreshed corpus {tag}"))
    )


def _seg_files(path, part):
    out = {}
    base = os.path.join(path, "segments", f"src_part={part}")
    for root, _, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_minor_compact_equals_fresh_and_leaves_base_alone(spark, corpus, tmp_path):
    b = _build(spark, corpus, tmp_path, "m1")
    base_parts = sorted(b._live())
    u1 = b.upsert(_upd(corpus, 6, 3, "a"))
    u2 = b.upsert(_upd(corpus, 10, 1, "b"))
    base_files = {p: _seg_files(b.cfg.path, p) for p in base_parts}

    c = b.compact(parts=[u1, u2])
    assert c is not None
    live = set(b._live())
    assert set(base_parts) <= live and u1 not in live and u2 not in live
    # untouched fragments: identical files (size + mtime — never rewritten)
    for p in base_parts:
        assert _seg_files(b.cfg.path, p) == base_files[p]
    # carried vector: base versions of the re-crawled docs stay masked
    assert os.path.isdir(os.path.join(b.cfg.path, "deletes", f"src_part={c}"))
    assert b.delete_map() != {}

    final = (
        corpus.where((F.col("doc_id") % 6 != 3) & (F.col("doc_id") % 10 != 1))
        .unionByName(_upd(corpus, 6, 3, "a").where(F.col("doc_id") % 10 != 1))
        .unionByName(_upd(corpus, 10, 1, "b"))
    )
    fresh = _build(spark, final, tmp_path, "m1f")
    assert _query(spark, b) == _query(spark, fresh)

    # upserts keep working against the minor-compacted fragment (the
    # dead-stats gather must find the merged postings at c's seq)
    again = _upd(corpus, 6, 3, "c")
    b.upsert(again)
    final2 = final.join(again.select("doc_id"), "doc_id", "left_anti").unionByName(again)
    fresh2 = _build(spark, final2, tmp_path, "m1f2")
    assert _query(spark, b) == _query(spark, fresh2)


def test_minor_compact_does_not_resurrect_newer_versions(spark, corpus, tmp_path):
    """Merging an OLDER upsert while a NEWER one stays live: the carried
    vector keeps its original seq, so it must keep killing the base
    version without touching the newer fragment's postings; the merged
    fragment must not re-export its (dead) intermediate version."""
    b = _build(spark, corpus, tmp_path, "m2")
    u1 = b.upsert(_upd(corpus, 6, 3, "v1"))
    b.upsert(_upd(corpus, 6, 3, "v2"))  # newer version of the SAME docs
    b.compact(parts=[u1])
    final = corpus.where(F.col("doc_id") % 6 != 3).unionByName(
        _upd(corpus, 6, 3, "v2")
    )
    fresh = _build(spark, final, tmp_path, "m2f")
    assert _query(spark, b) == _query(spark, fresh)


def test_maybe_compact_binpack_policy(spark, corpus, tmp_path):
    """16-commit chain under the steady-state policy: live count returns
    to the bound, each compaction merges exactly the SMALLEST fragments
    (cost tracks update volume), fragments that survive a compaction are
    physically untouched, and results stay identical to a fresh build of
    the final corpus."""
    from mwmbl_spark.manifest import live_fragment_sizes

    b = _build(spark, corpus, tmp_path, "m3")

    current = corpus
    touched_fracs = []
    for i in range(8):
        upd = _upd(corpus, 16, i, f"r{i}")
        b.upsert(upd)
        current = current.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(upd)
        b.delete_docs(corpus.where(F.col("doc_id") % 96 == 90 + i).select("doc_id"))
        current = current.where(F.col("doc_id") % 96 != 90 + i)
        pre_live = dict(b._live())
        pre_sizes = live_fragment_sizes(spark, b.cfg.path)
        pre_files = {p: _seg_files(b.cfg.path, p) for p in pre_live}
        got = b.maybe_compact(max_fragments=6)
        if got is not None:
            post_live = set(b._live())
            merged = set(pre_live) - post_live
            survivors = set(pre_live) & post_live
            # exactly the smallest fragments were merged
            assert max(pre_sizes[p] for p in merged) <= min(
                pre_sizes[p] for p in survivors
            )
            # survivors' files never touched by the compaction
            for p in survivors:
                assert _seg_files(b.cfg.path, p) == pre_files[p]
            touched_fracs.append(
                sum(pre_sizes[p] for p in merged) / max(1, sum(pre_sizes.values()))
            )
        assert len(b._live()) <= 6
    # incremental: every compaction read a strict minority of the index,
    # and the first one (small-update tail vs big base) well under 30%
    assert touched_fracs, "policy never triggered"
    assert all(f < 0.5 for f in touched_fracs)
    assert touched_fracs[0] < 0.3
    # sizes metadata covers every live fragment
    assert set(live_fragment_sizes(spark, b.cfg.path)) == set(b._live())

    fresh = _build(spark, current, tmp_path, "m3f")
    assert _query(spark, b) == _query(spark, fresh)

    # a FULL compact afterwards retires everything and preserves results
    before = _query(spark, b)
    b.compact()
    assert len(b._live()) == 1 and b.delete_map() == {}
    assert _query(spark, b) == before


def test_minor_compact_merges_delete_only_fragments(spark, corpus, tmp_path):
    b = _build(spark, corpus, tmp_path, "m4")
    d1 = b.delete_docs(corpus.where(F.col("doc_id") % 6 == 1).select("doc_id"))
    u1 = b.upsert(_upd(corpus, 6, 3, "x"))
    c = b.compact(parts=[d1, u1])
    assert c is not None and d1 not in b._live() and u1 not in b._live()
    final = (
        corpus.where((F.col("doc_id") % 6 != 1) & (F.col("doc_id") % 6 != 3))
        .unionByName(_upd(corpus, 6, 3, "x"))
    )
    fresh = _build(spark, final, tmp_path, "m4f")
    assert _query(spark, b) == _query(spark, fresh)


def test_minor_compact_prunes_dead_carried_vector_rows(spark, corpus, tmp_path):
    """Docs INSERTED by one merged fragment and re-upserted by another
    leave delete rows that can kill nothing outside the merged set;
    the carry-forward must prune them against the untouched fragments'
    doc_index instead of accumulating them forever. Rows that mask
    base-fragment versions must survive the same prune."""
    import numpy as np

    b = _build(spark, corpus, tmp_path, "m5")
    added = with_doc_id(
        synth_transcripts(spark, n_conv=5, turns_per_conv=3, seed=99).withColumn(
            "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
        )
    ).cache()
    u1 = b.upsert(added)  # pure insert: no vector of its own
    base_upd = _upd(corpus, 6, 3, "y")
    added_upd = added.withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed corpus z"))
    )
    u2 = b.upsert(added_upd.unionByName(base_upd))

    c = b.compact(parts=[u1, u2])
    assert c is not None

    added_ids = {r["doc_id"] for r in added.select("doc_id").collect()}
    base_upd_ids = {r["doc_id"] for r in base_upd.select("doc_id").collect()}
    masked = {
        int(d)
        for ids, _seqs in b.delete_map().values()
        for d in np.asarray(ids, dtype=np.int64).tolist()
    }
    assert masked & added_ids == set()        # pruned: nothing to kill outside
    assert base_upd_ids <= masked             # kept: base versions still masked

    final = (
        corpus.where(F.col("doc_id") % 6 != 3)
        .unionByName(base_upd)
        .unionByName(added_upd)
    )
    fresh = _build(spark, final, tmp_path, "m5f")
    assert _query(spark, b) == _query(spark, fresh)

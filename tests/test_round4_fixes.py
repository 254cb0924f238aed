"""Round-4 robustness fixes: per-table normalization memo (heuristic
prior tables), dedup convergence warning + pointer-jump variant,
head-limited pagerank collection, memoized delete-map broadcast, and
the streaming replay guard after auto-compaction."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import resolve_duplicate_groups
from mwmbl_spark.operators.heuristic import (
    _DOMAIN_NORM,
    _domain_score,
    get_wiki_score_py,
)
from mwmbl_spark.operators.pagerank import domain_pagerank, normalized_domain_scores


# ---------------------------------------------------------------------------
# _TableNorm: no per-row table scans, no stale-id aliasing
# ---------------------------------------------------------------------------

def test_domain_score_memoized_correct():
    table = {"a.com": 10.0, "b.com": 20.0, "c.com": 40.0}
    assert _domain_score("a.com", table) == 0.0
    assert _domain_score("c.com", table) == 1.0
    assert abs(_domain_score("b.com", table) - 10.0 / 30.0) < 1e-12
    assert _domain_score("unknown.com", table) == 0.0
    assert _domain_score("a.com", None) == 0.0
    # a DIFFERENT table must not reuse the first table's (lo, hi)
    other = {"a.com": 0.0, "b.com": 1.0}
    assert _domain_score("b.com", other) == 1.0


def test_table_norm_pins_table_against_id_reuse():
    # the memo holds a strong reference: while cached, the table cannot
    # be GC'd, so a recycled id() can never alias a different dict
    t = {"x.com": 1.0, "y.com": 3.0}
    _domain_score("x.com", t)
    entry = _DOMAIN_NORM._data.get(id(t))
    assert entry is not None and entry[0] is t
    # bounded: the LRU never grows past maxsize
    for i in range(20):
        _domain_score("x.com", {"x.com": float(i), "y.com": float(i + 1)})
    assert len(_DOMAIN_NORM._data) <= _DOMAIN_NORM._maxsize


def test_wiki_score_memoized():
    wiki = {"Spark": 50.0, "Hadoop": 25.0}
    assert get_wiki_score_py("https://en.wikipedia.org/wiki/Spark", wiki) == 1.0
    assert get_wiki_score_py("https://en.wikipedia.org/wiki/Hadoop", wiki) == 0.5
    assert get_wiki_score_py("https://example.com/Nothing", wiki) == 0.0


# ---------------------------------------------------------------------------
# resolve_duplicate_groups: unconverged warning + shortcut variant
# ---------------------------------------------------------------------------

def _chain_pairs(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


def test_unconverged_warning_fires(spark, caplog):
    # diameter-10 chain at max_iter=3: labels still moving at exit
    with caplog.at_level(logging.WARNING, logger="mwmbl_spark.dedup"):
        out = resolve_duplicate_groups(_chain_pairs(spark, 10), max_iter=3)
        out.collect()
    assert any("max_iter" in r.message for r in caplog.records)
    assert any("still" in r.message for r in caplog.records)


def test_shortcut_converges_log_rounds(spark, caplog):
    # diameter-40 chain: 1-hop needs 40 rounds; hook+shortcut needs
    # O(log d) — must converge inside 8 rounds with NO warning
    with caplog.at_level(logging.WARNING, logger="mwmbl_spark.dedup"):
        out = resolve_duplicate_groups(
            _chain_pairs(spark, 40), max_iter=8, shortcut=True
        )
        rows = {r["doc_id"]: r["keep_id"] for r in out.collect()}
    assert not any("max_iter" in r.message for r in caplog.records)
    assert all(k == 0 for k in rows.values())
    assert len(rows) == 41


def test_shortcut_matches_hook_on_small_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    hook = {r["doc_id"]: r["keep_id"] for r in resolve_duplicate_groups(pairs).collect()}
    jump = {
        r["doc_id"]: r["keep_id"]
        for r in resolve_duplicate_groups(pairs, shortcut=True).collect()
    }
    assert hook == jump
    assert hook[3] == 1 and hook[11] == 10 and hook[22] == 20


# ---------------------------------------------------------------------------
# normalized_domain_scores head limit
# ---------------------------------------------------------------------------

def test_normalized_domain_scores_top_n(spark):
    edges = spark.createDataFrame(
        [("a.com", "hub.com", 5), ("b.com", "hub.com", 5), ("hub.com", "a.com", 1),
         ("c.com", "d.com", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    ranks = domain_pagerank(edges, n_iter=2)
    full = normalized_domain_scores(ranks)
    head = normalized_domain_scores(ranks, top_n=2)
    assert len(head) == 2
    # the head keeps the 2 highest-ranked domains, re-normalized 0..1
    top2 = sorted(full, key=lambda d: (-full[d], d))[:2]
    assert set(head) == set(top2)
    assert max(head.values()) == 1.0 and min(head.values()) == 0.0


# ---------------------------------------------------------------------------
# delete-map broadcast memo (IndexBuilder)
# ---------------------------------------------------------------------------

def test_delete_broadcast_memoized(spark, tmp_path):
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=31))
    cfg = IndexConfig(path=str(tmp_path / "idx"), num_buckets=8, nsalt=2,
                      n_src_partitions=2)
    b = IndexBuilder(spark, cfg)
    b.build(t)
    assert b.delete_broadcast() is None  # fresh build: no deletes
    upd = t.limit(5).select("doc_id", F.concat("text", F.lit(" v2")).alias("text"))
    b.upsert(upd)
    b1 = b.delete_broadcast()
    assert b1 is not None and b1 is b.delete_broadcast()  # memoized
    b.upsert(t.limit(3).select("doc_id", F.concat("text", F.lit(" v3")).alias("text")))
    b2 = b.delete_broadcast()
    assert b2 is not b1  # invalidated by the new commit
    b.compact()
    assert b.delete_broadcast() is None  # vectors retired


# ---------------------------------------------------------------------------
# streaming replay guard uses EVER-committed (post-compaction replays)
# ---------------------------------------------------------------------------

def test_streaming_replay_after_compaction_is_noop(spark, tmp_path):
    import shutil

    from mwmbl_spark.manifest import ever_committed_partitions, partition_seqs
    from mwmbl_spark.plans.build_index import IndexConfig
    from mwmbl_spark.streaming.incremental import incremental_index_stream
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    with_doc_id(synth_transcripts(spark, n_conv=15, turns_per_conv=3, seed=7)) \
        .write.mode("append").parquet(src)
    cfg = IndexConfig(path=idx, num_buckets=8, nsalt=2)
    b = incremental_index_stream(spark, src, cfg, ckpt, auto_compact_fragments=0)
    live_before = partition_seqs(spark, idx)
    assert any(p.startswith("c") for p in live_before)  # compacted
    # wipe the checkpoint: Structured Streaming replays epoch 0 — the
    # manifest guard (EVER-committed) must turn it into a no-op even
    # though stream-0 was replaced by the compaction
    shutil.rmtree(ckpt)
    incremental_index_stream(spark, src, cfg, str(tmp_path / "ckpt2"))
    assert partition_seqs(spark, idx) == live_before
    assert "stream-0" in ever_committed_partitions(spark, idx)

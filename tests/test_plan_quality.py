"""Physical-plan assertions — guard the scale properties, not just the
results: bucket partition pruning must reach the segment scan, query
terms must broadcast, per-query top-k must use the map-side window
limit. A plan regression here is a 100TB performance bug even when
row-level results stay correct."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.bm25 import bm25_topk
from mwmbl_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.synth import synth_transcripts, with_doc_id


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    df = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=4, seed=3))
    cfg = IndexConfig(
        path=str(tmp_path_factory.mktemp("idx")), num_buckets=32, nsalt=4,
        n_src_partitions=1,
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return df, b


def test_segment_scan_prunes_buckets(spark, built):
    df, b = built
    q = spark.createDataFrame([(0, "w0001 w0002")], "query_id long, query string")
    plan = _explain(b.query_topk(q, k=10))
    # the terms' buckets must appear as a PARTITION filter on the scan
    assert "PartitionFilters" in plan
    seg_scan = [blk for blk in plan.split("\n\n") if "segments" in blk and "PartitionFilters" in blk]
    assert seg_scan, plan
    assert any("bucket" in blk and " IN " in blk for blk in seg_scan), seg_scan[0]
    # committed-partition (manifest) pruning also at partition level
    assert any("src_part" in blk for blk in seg_scan)


def test_bm25_broadcasts_query_side(spark, built):
    df, b = built
    p = build_postings(df)
    dl = doc_lengths(df)
    stats = term_stats(p)
    cs = corpus_stats(dl)
    q = spark.createDataFrame([(0, "w0001 w0002")], "query_id long, query string")
    plan = _explain(bm25_topk(p, dl, stats, q, cs.n_docs, cs.avg_doc_len, k=10))
    assert "BroadcastHashJoin" in plan
    # per-query top-k pushes a group limit below the final window sort
    assert "WindowGroupLimit" in plan


def test_postings_scan_prunes_columns(spark, built):
    df, b = built
    df.write.mode("overwrite").parquet(f"{b.cfg.path}/_plan_probe")
    scan = spark.read.parquet(f"{b.cfg.path}/_plan_probe")
    plan = _explain(build_postings(scan))
    probe = [blk for blk in plan.split("\n\n") if "_plan_probe" in blk]
    assert probe
    # only doc_id + text read, not role/tool/ts/conv_id
    assert "ReadSchema: struct<text:string,doc_id:bigint>" in probe[0] or (
        "text" in probe[0] and "role" not in probe[0].split("ReadSchema")[1]
    ), probe[0]


def test_upsert_path_plan_quality(spark, tmp_path_factory):
    """The merge-on-read machinery must not cost the query plan its
    scale properties: (a) bucket partition pruning survives the seq
    column + delete-map broadcast on an upserted index; (b) the
    dead-stats gather prunes its segment scan to the fragments that
    hold superseded versions (src_part partition filter)."""
    df = with_doc_id(synth_transcripts(spark, n_conv=12, turns_per_conv=3, seed=4))
    cfg = IndexConfig(
        path=str(tmp_path_factory.mktemp("upidx")), num_buckets=32, nsalt=4,
        n_src_partitions=1,
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    up = df.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" upd the spark")).alias("text")
    )
    b.upsert(up)
    assert b.delete_map(), "fixture must exercise the delete path"
    q = spark.createDataFrame([(0, "w0001 the")], "query_id long, query string")
    plan = _explain(b.query_topk(q, k=5))
    seg_scan = [
        blk for blk in plan.split("\n\n")
        if "segments" in blk and "PartitionFilters" in blk
    ]
    assert seg_scan and any("bucket" in blk and " IN " in blk for blk in seg_scan)
    # (b): dead-stats gather scan is fragment-pruned
    rows = b._superseded(df.select("doc_id"))
    assert rows
    dplan = _explain(b._dead_deltas(rows))
    dscan = [blk for blk in dplan.split("\n\n") if "segments" in blk]
    assert dscan and any("src_part" in blk for blk in dscan), dplan


def test_ivf_assign_is_shuffle_free(spark):
    """IVF cluster assignment must keep every corpus row in its scan
    partition: no Exchange, no Window — the round-2 implementation
    ranked the N×C crossJoin through row_number() partitioned by the
    near-unique vec_id, a full shuffle+sort per Lloyd iteration."""
    from mwmbl_spark.operators.similarity import _ivf_assign, _to64

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    corpus = emb.select("vec_id", _to64(F.col("embedding")).alias("v"))
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.5]), (2, [0.3, 0.3, 0.3])],
        "cid int, c array<double>",
    )
    plan = _explain(_ivf_assign(corpus, cents))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    # determinism + tie-break: argmax fold equals the windowed reference
    from pyspark.sql import Window as W

    from mwmbl_spark.operators.similarity import cosine_sim

    sims = corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cosine_sim(F.col("v"), F.col("c")).alias("sim")
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    want = {
        (r["vec_id"], r["cid"])
        for r in sims.withColumn("rnk", F.row_number().over(wv))
        .where(F.col("rnk") == 1)
        .collect()
    }
    got = {(r["vec_id"], r["cid"]) for r in _ivf_assign(corpus, cents).collect()}
    assert got == want


def test_curation_apply_broadcasts_and_skips_untouched_pages(spark):
    """The 100TB property of the curation write: the page store never
    shuffles for the curation side (curations broadcast into every
    join) and untouched pages bypass the window rewrite entirely."""
    from mwmbl_spark.operators.curation import apply_curation

    pages = spark.createDataFrame(
        [(0, 0, "t", "https://a.com", "e", 1.0, "spark data", None)],
        "page long, position int, title string, url string, extract string, "
        "score double, term string, state int",
    )
    curations = spark.createDataFrame(
        [("spark data", 0, "N", "https://x.com", "e", 7)],
        "query string, rank long, title string, url string, extract string, state int",
    )
    plan = _explain(apply_curation(pages, curations, 16))
    # every join against the page store builds on the (small) curation side
    assert "BroadcastHashJoin" in plan
    # untouched pages union in ABOVE the window: exactly one Window op,
    # and a LeftAnti branch that never reaches it
    assert plan.count("Window") >= 1
    assert "LeftAnti" in plan
    # the big side is never exchanged by a non-broadcast (hash) shuffle
    # except the window's own partitioning of TOUCHED pages
    assert "SortMergeJoin" not in plan


def test_term_index_cap_uses_window_group_limit(spark):
    """A7 cap: the per-term row_number filter must plan as a map-side
    WindowGroupLimit — each shuffle partition forwards at most k rows
    per term, so the cap costs O(k·terms) post-shuffle regardless of
    posting-list skew."""
    from mwmbl_spark.plans.search import build_term_index, cap_term_index

    docs = spark.createDataFrame(
        [(i, f"t {i}", f"https://d{i}.example.com/p", "body text", float(i), None)
         for i in range(8)],
        "doc_id long, title string, url string, extract string, score double, state int",
    )
    plan = _explain(cap_term_index(build_term_index(docs), docs, 4))
    assert "WindowGroupLimit" in plan


def test_rerank_stage1_uses_window_group_limit(spark):
    """Two-stage serving mode: the stage-1 per-query candidate cut must
    plan as a map-side WindowGroupLimit so at most rerank_n rows per
    query survive each shuffle partition before the final rank — the
    bound that keeps the Python re-rank kernel O(rerank_n) per query."""
    from mwmbl_spark.plans.search import search

    docs = spark.createDataFrame(
        [(i, f"t {i}", f"https://d{i}.example.com/p", "body text", float(i), None)
         for i in range(8)],
        "doc_id long, title string, url string, extract string, score double, state int",
    )
    queries = spark.createDataFrame([(0, "body text")], "query_id long, query string")
    plan = _explain(search(spark, docs, queries, k=3, rerank_n=2))
    assert "WindowGroupLimit" in plan


def test_pq_encode_is_shuffle_free(spark):
    """PQ encoding must stay a per-row projection (static slices +
    literal codebooks): no Exchange, no Window — the codes column is
    computed in the scan stage at any corpus size."""
    import numpy as np

    from mwmbl_spark.operators.similarity import pq_encode, pq_train

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_train(emb, m=2, k_codes=4, n_iters=1)
    plan = _explain(pq_encode(emb, cb))
    assert "Exchange" not in plan and "Window" not in plan


def test_repetition_features_shuffle_free(spark):
    """r7: every repetition signal is per-row math over the doc's own
    gram multiset (sorted-run aggregate), so the plan must carry NO
    Exchange, no Window, and no join — at 100 TB the former
    explode+double-aggregate shape shuffled every gram occurrence for
    arithmetic each row could do locally."""
    from mwmbl_spark.functions.tokenize import tokenize_pd
    from mwmbl_spark.operators.repetition import repetition_features

    docs = with_doc_id(
        synth_transcripts(spark, n_conv=10, turns_per_conv=4, seed=5)
    ).select("doc_id", tokenize_pd(F.col("text")).alias("toks"))
    plan = _explain(repetition_features(docs))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_training_pairs_single_shuffle(spark):
    """training_pairs is one Exchange on conv_id feeding a ROWS-bounded
    running window — a second shuffle or an unbounded frame is a plan
    regression."""
    from mwmbl_spark.operators.conversations import training_pairs
    from mwmbl_spark.synth import synth_transcripts as synth

    t = with_doc_id(synth(spark, n_conv=10, turns_per_conv=6, seed=6))
    plan = _explain(training_pairs(t, context_window=3))
    import re

    assert len(re.findall(r"^\(\d+\) \w*Exchange", plan, re.M)) == 1, plan
    assert "specifiedwindowframe(RowFrame, -3, -1)" in plan, plan


def test_quota_sample_uses_window_group_limit(spark):
    """The per-group cap must lower to a map-side WindowGroupLimit so
    each input partition forwards at most `cap` rows per group."""
    from mwmbl_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(60)], "doc_id long, grp string"
    )
    plan = _explain(quota_sample(df, "grp", cap=5))
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_cluster_assign_is_shuffle_free(spark):
    """Exemplar clustering keeps every row in its scan partition: the
    centroids are plan literals, the argmax is an expression fold —
    no Exchange, no Window anywhere."""
    from mwmbl_spark.operators.similarity import cluster_assign_exact

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    plan = _explain(cluster_assign_exact(emb, [0, 1, 2]))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan


def test_bpe_encode_is_shuffle_free(spark):
    """Encoding is embarrassingly parallel: broadcast rank map inside
    the Arrow UDF, no Exchange in the plan."""
    from mwmbl_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(i, "the spark engine") for i in range(20)], "doc_id long, text string"
    )
    plan = _explain(bpe_encode(docs, [("t", "h"), ("e", "</w>")]))
    assert "Exchange" not in plan, plan


def test_refresh_priority_aggs_are_partial(spark):
    """The URL-grain aggregation must map-side combine (partial_count /
    partial_sum / partial_min / partial_max before the Exchange); the
    only Window is the final global rank."""
    import re

    from datetime import datetime

    from mwmbl_spark.operators.urls import refresh_priority

    log = spark.createDataFrame(
        [(f"u{i % 7}", datetime(2024, 1, 1, 0, 0, i % 50), i % 3 == 0)
         for i in range(100)],
        "url string, crawl_ts timestamp, changed boolean",
    )
    plan = _explain(refresh_priority(log))
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert re.search(r"partial_min|partial_max", plan), plan


def test_conversation_topk_window_group_limits(spark):
    """Both cuts (best turn per conv, top-k convs) must get map-side
    WindowGroupLimits — only ~1 row per (partition, group) shuffles."""
    from mwmbl_spark.operators.conversations import conversation_topk

    scored = spark.createDataFrame(
        [(0, i, float(i % 7)) for i in range(40)],
        "query_id long, doc_id long, score double",
    )
    conv = spark.createDataFrame(
        [(i, f"c{i % 5}") for i in range(40)], "doc_id long, conv_id string"
    )
    plan = _explain(conversation_topk(scored, conv, k=3))
    assert plan.count("WindowGroupLimit") >= 2


def test_diversify_topk_window_group_limits(spark):
    from mwmbl_spark.operators.mmr import diversify_topk

    scored = spark.createDataFrame(
        [(0, i, float(i)) for i in range(40)],
        "query_id long, doc_id long, score double",
    )
    keys = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(40)], "doc_id long, group_key string"
    )
    plan = _explain(diversify_topk(scored, keys, per_key=2, k=5))
    assert plan.count("WindowGroupLimit") >= 2


def test_spell_corrections_no_cartesian(spark):
    """The variant join must stay an equi-join (hash/broadcast) — a
    Cartesian over the vocabulary would be the classic fuzzy-match
    scale bug; the query side is tiny and broadcast."""
    from mwmbl_spark.operators.spell import spell_corrections

    stats = spark.createDataFrame(
        [(f"term{i:03d}", i + 1, i + 1) for i in range(50)],
        "term string, df long, cf long",
    )
    q = spark.createDataFrame([(0, "term01")], "query_id long, query string")
    plan = _explain(spell_corrections(q, stats, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_phrase_match_no_python_no_explode(spark):
    """The phrase scan is pure JVM HOFs over the tokens array: no Arrow
    UDF, no generator explosion — one projection + a broadcast of the
    tiny phrase table."""
    from mwmbl_spark.operators.phrase import phrase_match

    docs = spark.createDataFrame(
        [(1, ["a", "b", "c"])], "doc_id long, toks array<string>"
    )
    plan = _explain(phrase_match(docs, [(0, "a b")]))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" not in plan  # no explode: HOF filter, not fan-out


def test_phrase_topk_prunes_to_phrase_buckets(spark, tmp_path_factory):
    """Index-side phrase serving (round-6): the positional segment scan
    must carry a bucket PARTITION filter — only the phrase terms'
    buckets are read, the wand_topk pruning contract."""
    from mwmbl_spark.functions.xxhash import bucket_of_py
    from mwmbl_spark.operators.positional import phrase_topk, positional_postings
    from mwmbl_spark.operators.postings import corpus_stats, doc_lengths, term_stats
    from mwmbl_spark.operators.segments import build_segments
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    tmp = tmp_path_factory.mktemp("phrase_plan")
    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=77))
    pp = positional_postings(t)
    dl = doc_lengths(t)
    stats = term_stats(pp.select("term", "doc_id", "tf"))
    cs = corpus_stats(dl)
    build_segments(
        pp, None, stats, cs.n_docs, cs.avg_doc_len,
        num_buckets=16, nsalt=2, positions_col="positions",
    ).write.mode("overwrite").partitionBy("bucket").parquet(str(tmp / "segs"))
    segs = spark.read.parquet(str(tmp / "segs"))
    out = phrase_topk(
        segs, stats, [(0, "the spark")], cs.n_docs, cs.avg_doc_len,
        k=5, num_buckets=16,
    )
    plan = _explain(out)
    seg_scan = [
        blk for blk in plan.split("\n\n")
        if "segs" in blk and "PartitionFilters" in blk
    ]
    assert seg_scan, plan
    want = sorted({bucket_of_py(w, 16) for w in ["the", "spark"]})
    blk = seg_scan[0]
    assert "bucket" in blk and " IN " in blk, blk
    for b in want:
        assert str(b) in blk.split("PartitionFilters")[1].split("]")[0], blk

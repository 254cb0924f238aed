"""Positional index × index lifecycle (round 6).

The positional payload is part of the index files, so it must survive
the whole lifecycle — upsert fragments, delete vectors, compaction
rewrites, resharding — and phrase serving must compose with the same
delete-map / scoped-allowlist machinery as ranked retrieval. Gate:
after ANY chain of upserts/deletes/compactions, ``phrase_query_topk``
must equal both (a) a fresh positional build over the updated corpus
and (b) the corpus-scan verifier (phrase_match ∩ exhaustive BM25).

Reference parity: the reference merges re-crawled pages in place
(/root/reference/mwmbl/indexer/index_batches.py:150-173) and its terms
are position-blind bigrams (/root/reference/mwmbl/tokenizer.py:10-13);
positions-through-upserts is the Spark engine's strictly stronger form.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mwmbl_spark.operators import bm25 as bm25_ops
from mwmbl_spark.operators import postings as post_ops
from mwmbl_spark.operators.phrase import phrase_match
from mwmbl_spark.operators.positional import positional_postings
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.synth import synth_transcripts, with_doc_id

PHRASES = [
    (0, "w0000 w0001"),
    (1, "w0001 w0000"),
    (2, "omega phrase"),          # only in upserted text
    (3, "omega phrase omega"),    # spans the injected repeat
    (4, "w0000 w0000"),           # duplicate-term phrase
]


@pytest.fixture(scope="module")
def corpus(spark):
    return with_doc_id(
        synth_transcripts(spark, n_conv=30, turns_per_conv=4, seed=41)
    ).cache()


@pytest.fixture(scope="module")
def added(spark):
    return with_doc_id(
        synth_transcripts(spark, n_conv=5, turns_per_conv=3, seed=99).withColumn(
            "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
        )
    ).cache()


def _updated(df):
    return df.where(F.col("doc_id") % 5 == 2).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" omega phrase omega phrase")),
    )


def _final_corpus(corpus, added, deleted):
    mod = (
        corpus.where(F.col("doc_id") % 5 != 2)
        .unionByName(_updated(corpus))
        .unionByName(added)
    )
    return mod.join(deleted, "doc_id", "left_anti")


def _build(spark, df, tmp_path, name, positions=True, **kw):
    cfg = IndexConfig(
        path=str(tmp_path / name),
        num_buckets=16,
        nsalt=4,
        n_src_partitions=4,
        positions=positions,
        **kw,
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    return b


def _rows(df):
    return sorted(
        (r["phrase_id"], r["rank"], r["doc_id"], round(r["score"], 9),
         r["n_matches"], r["first_pos"])
        for r in df.collect()
    )


def _scan_reference(spark, docs, phrases, k=10):
    """phrase_match over the corpus tokens ∩ exhaustive BM25 — the
    index-free twin (same shape as tests/test_positional.py)."""
    pp = positional_postings(docs)
    p = pp.select("term", "doc_id", "tf")
    dl = post_ops.doc_lengths(docs)
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    toks = post_ops.tokenized(docs).select("doc_id", F.col("tokens").alias("toks"))
    pm = phrase_match(toks, phrases)
    qdf = spark.createDataFrame(phrases, "query_id long, query string")
    full = bm25_ops.bm25_topk(p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10**6)
    ref = full.join(
        pm.withColumnRenamed("phrase_id", "query_id"), ["query_id", "doc_id"]
    ).select("query_id", "doc_id", "score", "n_matches", "first_pos")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9),
         r["n_matches"], r["first_pos"])
        for r in ref.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k).collect()
    )


# ---------------------------------------------------------------------------
# unit parity of the shared pieces
# ---------------------------------------------------------------------------


def test_positional_postings_is_the_build_path(spark, corpus):
    """positional_postings delegates to build_postings_with_len(
    positions=True): one definition, byte-equal relations."""
    a = sorted(
        (r["term"], r["doc_id"], r["tf"], r["doc_len"], tuple(r["positions"]))
        for r in positional_postings(corpus).collect()
    )
    b = sorted(
        (r["term"], r["doc_id"], r["tf"], r["doc_len"], tuple(r["positions"]))
        for r in post_ops.build_postings_with_len(corpus, positions=True).collect()
    )
    assert a == b and a
    # tf really is the position count
    assert all(t[2] == len(t[4]) for t in a)


def test_decode_all_positions_matches_per_posting_decode(spark, corpus):
    from mwmbl_spark.operators.segments import (
        build_segments,
        decode_all_positions,
        decode_positions,
    )

    pp = positional_postings(corpus.limit(40))
    p = pp.select("term", "doc_id", "tf")
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(post_ops.doc_lengths(corpus.limit(40)))
    segs = build_segments(
        pp, None, stats, cs.n_docs, cs.avg_doc_len,
        num_buckets=8, nsalt=2, positions_col="positions",
    )
    checked = 0
    for r in segs.collect():
        offs = np.asarray(r["pos_offs"], dtype=np.int64)
        allp = decode_all_positions(r["positions"], offs)
        assert len(allp) == r["n_postings"]
        for i in range(r["n_postings"]):
            one = decode_positions(r["positions"], offs, i)
            assert allp[i].tolist() == one.astype(np.int64).tolist()
            checked += 1
    assert checked > 100


# ---------------------------------------------------------------------------
# the lifecycle gate
# ---------------------------------------------------------------------------


def test_phrase_through_upsert_delete_compact(spark, corpus, added, tmp_path):
    # delete a mix of arbitrary docs AND docs that MATCH "the spark", so
    # the delete mask provably changes a phrase result
    toks = post_ops.tokenized(corpus).select(
        "doc_id", F.col("tokens").alias("toks")
    )
    match_ids = sorted(
        r["doc_id"]
        for r in phrase_match(toks, [(0, "w0000 w0001")]).select("doc_id").collect()
    )[:3]
    assert match_ids  # the corpus must exercise the phrase at all
    deleted = (
        corpus.where(
            (F.col("doc_id") % 7 == 3) | F.col("doc_id").isin(match_ids)
        )
        .select("doc_id")
        .cache()
    )
    final = _final_corpus(corpus, added, deleted).cache()

    b = _build(spark, corpus, tmp_path, "live")
    b.upsert(_updated(corpus).unionByName(added))
    b.delete_docs(deleted)

    fresh = _build(spark, final, tmp_path, "fresh")
    want_scan = _scan_reference(spark, final, PHRASES)
    want_fresh = _rows(fresh.phrase_query_topk(PHRASES, k=10))
    assert want_fresh == want_scan and want_scan  # fresh build == verifier

    got = _rows(b.phrase_query_topk(PHRASES, k=10))
    assert got == want_scan  # upserted+deleted index == verifier

    # the injected phrase must actually exercise the upsert fragments,
    # and the deleted matchers must be masked out of the live results
    assert any(t[0] == 2 for t in got)
    assert not any(t[0] == 0 and t[2] in set(match_ids) for t in got)

    # compaction rewrites the fragments; positions must survive
    assert b.compact() is not None
    assert b.delete_map() == {}
    got_c = _rows(b.phrase_query_topk(PHRASES, k=10))
    assert got_c == want_scan

    # slop serving over the compacted index: "omega omega" only at slop>=1
    s0 = _rows(b.phrase_query_topk([(0, "omega omega")], k=10**6, slop=0))
    s1 = _rows(b.phrase_query_topk([(0, "omega omega")], k=10**6, slop=1))
    assert not s0 and s1
    # " omega phrase omega phrase": omega@n, omega@n+2 -> span 2 = slop 1


def test_phrase_time_travel(spark, corpus, added, tmp_path):
    b = _build(spark, corpus, tmp_path, "tt")
    seq0 = b.current_seq()
    want0 = _rows(b.phrase_query_topk(PHRASES, k=10))
    b.upsert(_updated(corpus).unionByName(added))
    assert _rows(b.phrase_query_topk(PHRASES, k=10, as_of=seq0)) == want0
    assert _rows(b.phrase_query_topk(PHRASES, k=10)) != want0


def test_scoped_phrase_serving(spark, corpus, tmp_path):
    """doc_filter restricts candidates; scores keep GLOBAL stats — the
    expected rows are the unscoped run filtered to the scope, re-ranked."""
    b = _build(spark, corpus, tmp_path, "scoped")
    allowed = corpus.where(F.col("doc_id") % 3 == 0).select("doc_id")
    full = b.phrase_query_topk([(0, "w0000 w0001")], k=10**6)
    allow = {r["doc_id"] for r in allowed.collect()}
    kept = sorted(
        (r["phrase_id"], r["doc_id"], round(r["score"], 9),
         r["n_matches"], r["first_pos"])
        for r in full.collect() if r["doc_id"] in allow
    )
    want = [
        (p, i + 1, d, s, n, fp)
        for (p, d, s, n, fp), i in zip(
            sorted(kept, key=lambda t: (t[0], -t[2], t[1])),
            range(len(kept)),
        )
    ]
    got = sorted(
        (r["phrase_id"], r["rank"], r["doc_id"], round(r["score"], 9),
         r["n_matches"], r["first_pos"])
        for r in b.phrase_query_topk(
            [(0, "w0000 w0001")], k=10**6, doc_filter=allowed
        ).collect()
    )
    assert got == sorted(want) and got
    assert {t[2] for t in got} <= allow


# ---------------------------------------------------------------------------
# reshard + layout guard
# ---------------------------------------------------------------------------


def test_reshard_carries_positions(spark, corpus, added, tmp_path):
    from mwmbl_spark.operators.reshard import reshard

    b = _build(spark, corpus, tmp_path, "rs-old")
    b.upsert(_updated(corpus).unionByName(added))
    want = _rows(b.phrase_query_topk(PHRASES, k=10))

    new_cfg = IndexConfig(
        path=str(tmp_path / "rs-new"), num_buckets=8, nsalt=2,
        n_src_partitions=4, positions=True,
    )
    nb = reshard(spark, b, new_cfg)
    assert _rows(nb.phrase_query_topk(PHRASES, k=10)) == want
    # ranked serving agrees too (alive-only decode: no resurrection)
    qdf = spark.createDataFrame([(0, "the spark")], "query_id long, query string")
    a = sorted(map(tuple, b.query_topk(qdf, k=10).collect()))
    c = sorted(map(tuple, nb.query_topk(qdf, k=10).collect()))
    assert [(x[0], x[1], round(x[3], 9)) for x in a] == [
        (x[0], x[1], round(x[3], 9)) for x in c
    ]


def test_reshard_cannot_invent_positions(spark, corpus, tmp_path):
    from mwmbl_spark.operators.reshard import reshard

    plain = _build(spark, corpus.limit(20), tmp_path, "plain", positions=False)
    with pytest.raises(ValueError, match="positional"):
        reshard(
            spark, plain,
            IndexConfig(path=str(tmp_path / "plain-up"), positions=True),
        )


def test_positional_to_plain_drops_payload(spark, corpus, tmp_path):
    from mwmbl_spark.operators.reshard import reshard

    b = _build(spark, corpus.limit(30), tmp_path, "p2p-old")
    nb = reshard(
        spark, b,
        IndexConfig(
            path=str(tmp_path / "p2p-new"), num_buckets=8, nsalt=2,
            positions=False,
        ),
    )
    assert "positions" not in nb.segments().columns
    with pytest.raises(ValueError, match="positional"):
        nb.phrase_query_topk(PHRASES)


def test_phrase_requires_positional_index(spark, corpus, tmp_path):
    plain = _build(spark, corpus.limit(20), tmp_path, "noidx", positions=False)
    with pytest.raises(ValueError, match="positions=True"):
        plain.phrase_query_topk([(0, "w0000 w0001")])


def test_layout_meta_guard(spark, corpus, tmp_path):
    """Opening an index with a config that contradicts the on-disk
    layout must raise, not silently mis-prune."""
    path = str(tmp_path / "meta")
    b = IndexBuilder(
        spark, IndexConfig(path=path, num_buckets=16, nsalt=4, positions=True)
    )
    b.build(corpus.limit(20))
    # matching config: fine
    IndexBuilder(
        spark, IndexConfig(path=path, num_buckets=16, nsalt=4, positions=True)
    ).segments()
    for bad in (
        IndexConfig(path=path, num_buckets=8, nsalt=4, positions=True),
        IndexConfig(path=path, num_buckets=16, nsalt=2, positions=True),
        IndexConfig(path=path, num_buckets=16, nsalt=4, positions=False),
    ):
        with pytest.raises(ValueError, match="does not match"):
            IndexBuilder(spark, bad).segments()

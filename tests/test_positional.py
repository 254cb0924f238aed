"""Positional posting payload + index-side phrase top-k (round 6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mwmbl_spark.operators import bm25 as bm25_ops
from mwmbl_spark.operators import postings as post_ops
from mwmbl_spark.operators.phrase import phrase_match
from mwmbl_spark.operators.positional import phrase_topk, positional_postings
from mwmbl_spark.operators.segments import build_segments, decode_positions


DOCS = [
    (1, "alpha beta gamma alpha beta"),          # "alpha beta" twice
    (2, "beta alpha beta gamma"),                # once, at pos 2
    (3, "alpha gamma beta"),                     # never contiguous
    (4, "alpha beta"),                           # exactly the phrase
    (5, "the the the"),                          # duplicate-term phrase fodder
    (6, "the the"),
    (7, "zeta eta theta iota"),
    (8, "alpha"),                                # shorter than the phrase
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pp = positional_postings(docs).localCheckpoint()
    p = pp.select("term", "doc_id", "tf")
    dl = post_ops.doc_lengths(docs)
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    segs = build_segments(
        pp, None, stats, cs.n_docs, cs.avg_doc_len,
        num_buckets=8, nsalt=4, positions_col="positions",
    ).localCheckpoint()
    return docs, pp, p, dl, stats, cs, segs


def test_positional_postings_shape(spark, corpus):
    _, pp, *_ = corpus
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]), r["doc_len"])
        for r in pp.collect()
    }
    assert rows[("alpha", 1)] == (2, [1, 4], 5)
    assert rows[("beta", 1)] == (2, [2, 5], 5)
    assert rows[("the", 5)] == (3, [1, 2, 3], 3)


def test_positions_payload_roundtrip(spark, corpus):
    *_, segs = corpus
    for r in segs.collect():
        offs = np.asarray(r["pos_offs"], dtype=np.int64)
        assert len(offs) == r["n_postings"] + 1
        total = 0
        for i in range(r["n_postings"]):
            pos = decode_positions(r["positions"], offs, i)
            assert pos.size >= 1
            assert (np.diff(pos.astype(np.int64)) > 0).all()
            total += int(offs[i + 1] - offs[i])
        assert total == len(r["positions"])


def _reference_phrase_topk(spark, corpus, phrases, k=10):
    docs, _pp, p, dl, stats, cs, _segs = corpus
    docs_toks = post_ops.tokenized(docs).select(
        "doc_id", F.col("tokens").alias("toks")
    )
    pm = phrase_match(docs_toks, phrases)
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


def test_phrase_topk_matches_scan_verifier(spark, corpus):
    """Index-served phrase top-k == (corpus-scan phrase_match ∩ BM25)
    for every shape: repeats, duplicate-term phrases, no-match."""
    _, _, _, _, stats, cs, segs = corpus
    phrases = [
        (0, "alpha beta"),
        (1, "the the"),
        (2, "alpha gamma beta zeta"),   # no doc
        (3, "gamma"),                    # single-term phrase
    ]
    got = sorted(
        (r["phrase_id"], r["rank"], r["doc_id"], round(r["score"], 9),
         r["n_matches"], r["first_pos"])
        for r in phrase_topk(
            segs, stats, phrases, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=8
        ).collect()
    )
    want = _reference_phrase_topk(spark, corpus, phrases)
    assert got == want and got


def test_phrase_topk_counts_and_positions(spark, corpus):
    _, _, _, _, stats, cs, segs = corpus
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_topk(
            segs, stats, [(0, "alpha beta")], cs.n_docs, cs.avg_doc_len,
            k=10, num_buckets=8,
        ).collect()
    }
    assert out[1] == (2, 1)   # two occurrences, first at pos 1
    assert out[2] == (1, 2)
    assert out[4] == (1, 1)
    assert 3 not in out and 8 not in out
    # duplicate-term phrase: "the the" in "the the the" overlaps twice
    out2 = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_topk(
            segs, stats, [(1, "the the")], cs.n_docs, cs.avg_doc_len,
            k=10, num_buckets=8,
        ).collect()
    }
    assert out2[5] == (2, 1) and out2[6] == (1, 1)


def test_phrase_topk_k_truncation(spark, corpus):
    _, _, _, _, stats, cs, segs = corpus
    out = phrase_topk(
        segs, stats, [(0, "alpha beta")], cs.n_docs, cs.avg_doc_len,
        k=2, num_buckets=8,
    ).collect()
    assert len(out) == 2
    assert {r["rank"] for r in out} == {1, 2}


def test_wand_ignores_positional_payload(spark, corpus):
    """The SAME positional segment table serves the WAND kernel
    unchanged (one index, two query modes)."""
    from mwmbl_spark.operators.wand import wand_topk

    _, _, p, dl, stats, cs, segs = corpus
    qdf = spark.createDataFrame([(0, "alpha beta")], "query_id long, query string")
    a = sorted(
        map(tuple, wand_topk(
            segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=5, num_buckets=8
        ).collect())
    )
    b = sorted(
        map(tuple, bm25_ops.bm25_topk(
            p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=5
        ).collect())
    )
    assert [(x[0], x[1], x[3]) for x in a] == [(x[0], x[1], x[3]) for x in b]

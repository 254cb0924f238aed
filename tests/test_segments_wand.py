"""Segment build + pruned top-k: rank-identity vs oracle and vs the
exhaustive DataFrame plan, plus compression roundtrip through Spark."""

from __future__ import annotations

import numpy as np
import pytest

from mwmbl_spark.functions.codec import delta_decode_blocked, vb_decode
from mwmbl_spark.operators.segments import BLOCK_SIZE
from mwmbl_spark.operators.bm25 import bm25_topk
from mwmbl_spark.operators.postings import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)
from mwmbl_spark.operators.segments import build_segments, prune_segments
from mwmbl_spark.operators.wand import wand_topk
from mwmbl_spark.synth import synth_transcripts, with_doc_id
from oracle.engine import build_oracle

QUERIES = [
    (0, "w0001 w0002"),
    (1, "the spark data"),
    (2, "w0000"),  # hottest term — exercises salting
    (3, "w0042 w0313 w0777"),
    (4, "missingterm w0005"),
]


@pytest.fixture(scope="module")
def built(spark):
    df = with_doc_id(synth_transcripts(spark, n_conv=80, turns_per_conv=6, seed=11)).cache()
    p = build_postings(df).cache()
    dl = doc_lengths(df).cache()
    stats = term_stats(p).cache()
    cs = corpus_stats(dl)
    segs = build_segments(p, dl, stats, cs.n_docs, cs.avg_doc_len, num_buckets=32, nsalt=4).cache()
    rows = df.select("doc_id", "text").collect()
    oracle = build_oracle([(r["doc_id"], r["text"]) for r in rows])
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    return p, dl, stats, cs, segs, oracle, qdf


def test_segment_roundtrip_postings(built):
    """Decoding every segment must reproduce the posting table exactly."""
    p, dl, stats, cs, segs, oracle, qdf = built
    want = {(r["term"], r["doc_id"]): r["tf"] for r in p.collect()}
    got = {}
    for row in segs.collect():
        ids = delta_decode_blocked(row["doc_ids"], BLOCK_SIZE)
        tfs = vb_decode(row["tfs"])
        lens = vb_decode(row["doc_lens"])
        assert len(ids) == len(tfs) == len(lens) == row["n_postings"]
        assert np.all(np.diff(ids.astype(np.int64)) > 0)  # strictly sorted
        n_blocks = (len(ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
        assert len(row["block_maxes"]) == n_blocks
        assert len(row["block_last"]) == n_blocks
        assert len(row["boffs_ids"]) == len(row["boffs_tfs"]) == n_blocks
        # block_last mirrors the decoded block boundaries
        assert row["block_last"][-1] == int(ids[-1])
        for d, t in zip(ids, tfs):
            got[(row["term"], int(d))] = int(t)
    assert got == want


def test_salt_partitions_doc_space(built):
    """All postings of one doc share its salt (term-independent)."""
    p, dl, stats, cs, segs, oracle, qdf = built
    seen: dict[int, int] = {}
    for row in segs.collect():
        for d in delta_decode_blocked(row["doc_ids"], BLOCK_SIZE):
            d = int(d)
            assert seen.setdefault(d, row["salt"]) == row["salt"]


@pytest.mark.parametrize("mode", ["disjunctive", "conjunctive", "majority"])
def test_wand_rank_identical_to_oracle(built, mode):
    p, dl, stats, cs, segs, oracle, qdf = built
    out = wand_topk(segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, mode=mode, num_buckets=32)
    got: dict[int, list[tuple[int, float]]] = {i: [] for i, _ in QUERIES}
    for r in out.orderBy("query_id", "rank").collect():
        got[r["query_id"]].append((r["doc_id"], r["score"]))
    for qid, q in QUERIES:
        want = oracle.bm25_topk(q, k=10, mode=mode)
        assert [d for d, _ in got[qid]] == [d for d, _ in want], f"{q!r} ({mode})"
        for (gd, gs), (_, ws) in zip(got[qid], want):
            assert abs(gs - ws) < 1e-6


def test_wand_matches_exhaustive_plan(built, spark):
    p, dl, stats, cs, segs, oracle, qdf = built
    a = wand_topk(segs, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=32)
    b = bm25_topk(p, dl, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10)
    ra = [(r["query_id"], r["doc_id"], r["rank"]) for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["doc_id"], r["rank"]) for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb


def test_prune_segments_restricts_terms(built, spark):
    p, dl, stats, cs, segs, oracle, qdf = built
    terms_df = spark.createDataFrame([("w0001",), ("w0002",)], "term string")
    pruned = prune_segments(segs, terms_df, num_buckets=32)
    assert {r["term"] for r in pruned.select("term").distinct().collect()} <= {"w0001", "w0002"}


def test_segments_parquet_roundtrip(built, spark, tmp_path):
    from mwmbl_spark.operators.segments import write_segments

    p, dl, stats, cs, segs, oracle, qdf = built
    path = str(tmp_path / "segs")
    write_segments(segs, path)
    back = spark.read.parquet(path)
    out = wand_topk(back, stats, qdf, cs.n_docs, cs.avg_doc_len, k=10, num_buckets=32)
    want = oracle.bm25_topk("w0001 w0002", k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in out.where("query_id = 0").orderBy("rank").collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_query_list_fast_path_matches_dataframe(spark, tmp_path):
    """wand_topk(list) — driver-side tokenize + xxhash bucket pruning —
    must return exactly the DataFrame path's rows (the serving shape:
    one Spark job per batch)."""
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    df = with_doc_id(synth_transcripts(spark, n_conv=15, turns_per_conv=4, seed=8))
    cfg = IndexConfig(
        path=str(tmp_path / "fastq"), num_buckets=16, nsalt=4, n_src_partitions=1
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    qlist = [(0, "the spark"), (1, "w0001 w0002"), (2, ""), (3, "zzznoterm")]
    qdf = spark.createDataFrame(qlist, "query_id long, query string")

    def rows(out):
        return [
            (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
            for r in out.orderBy("query_id", "rank").collect()
        ]

    assert rows(b.query_topk(qlist, k=5)) == rows(b.query_topk(qdf, k=5))


def test_curated_list_fast_path_matches_dataframe(spark, tmp_path):
    """wand_topk_curated(list) — driver-side curation probe + the
    organic one-job list path — must return exactly the DataFrame
    path's rows, with curations passed as a DataFrame or a plain
    list."""
    from mwmbl_spark.operators.wand import wand_topk_curated
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    df = with_doc_id(synth_transcripts(spark, n_conv=15, turns_per_conv=4, seed=8))
    cfg = IndexConfig(
        path=str(tmp_path / "fastc"), num_buckets=16, nsalt=4, n_src_partitions=1
    )
    b = IndexBuilder(spark, cfg)
    b.build(df)
    some_ids = [r["doc_id"] for r in df.limit(4).collect()]
    curs = [
        ("the spark", 0, some_ids[0], 8),
        ("the spark", 1, some_ids[1], 7),
        ("the spark", 2, some_ids[2], None),  # NULL state: not curated
        ("w0001 w0002", 0, some_ids[3], 9),
        ("zzz qqq", 0, some_ids[0], 7),  # matches no query
    ]
    cur_df = spark.createDataFrame(
        curs, "term string, position int, doc_id long, state int"
    )
    qlist = [(0, "the spark"), (1, "w0001 w0002"), (2, "w0003")]
    qdf = spark.createDataFrame(qlist, "query_id long, query string")
    stats, n_docs, avg_len = b.cached_global_stats()

    def rows(out):
        return sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"],
             r["curated"])
            for r in out.collect()
        )

    want = rows(wand_topk_curated(
        b.segments(), stats, qdf, cur_df, n_docs, avg_len, k=5, num_buckets=16
    ))
    got_df_dim = rows(wand_topk_curated(
        b.segments(), stats, qlist, cur_df, n_docs, avg_len, k=5, num_buckets=16
    ))
    got_list_dim = rows(wand_topk_curated(
        b.segments(), stats, qlist, curs, n_docs, avg_len, k=5, num_buckets=16
    ))
    assert got_df_dim == want
    assert got_list_dim == want
    # pinned docs really are first, in curation order
    by_q = {}
    for qid, doc, _, rank, curated in want:
        by_q.setdefault(qid, []).append((rank, doc, curated))
    assert sorted(by_q[0])[0] == (1, some_ids[0], 1)
    assert sorted(by_q[0])[1] == (2, some_ids[1], 1)
    assert sorted(by_q[1])[0] == (1, some_ids[3], 1)

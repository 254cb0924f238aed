"""Medium-scale rank-identity stress: 10k docs, multi-partition
resumable build, Zipf hot terms — the full compressed path (salted
segments + MaxScore kernel + manifest-scoped global stats) must stay
rank-identical to the single-node oracle."""

from __future__ import annotations

import pytest

from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.synth import synth_transcripts, with_doc_id
from oracle.engine import build_oracle

QUERIES = [
    (0, "the"),                 # hottest injected term
    (1, "the spark data query"),  # all hot terms
    (2, "w0000 w0001"),         # Zipf head
    (3, "w0490 w1763"),         # tail terms
    (4, "w0002 the w0313"),     # mixed
    (5, "absentterm"),
]


@pytest.mark.parametrize("mode", ["disjunctive", "majority"])
def test_rank_identity_10k_docs(spark, tmp_path, mode):
    df = with_doc_id(
        synth_transcripts(spark, n_conv=2000, turns_per_conv=5, seed=99)
    ).cache()
    try:
        oracle = build_oracle(
            [(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()]
        )
        cfg = IndexConfig(
            path=str(tmp_path / f"idx_{mode}"), num_buckets=64, nsalt=8,
            n_src_partitions=3,
        )
        b = IndexBuilder(spark, cfg)
        b.build(df)
        qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
        out = b.query_topk(qdf, k=20, mode=mode)
        got: dict[int, list[tuple[int, float]]] = {i: [] for i, _ in QUERIES}
        for r in out.orderBy("query_id", "rank").collect():
            got[r["query_id"]].append((r["doc_id"], r["score"]))
        for qid, q in QUERIES:
            want = oracle.bm25_topk(q, k=20, mode=mode)
            assert [d for d, _ in got[qid]] == [d for d, _ in want], f"{q!r} ({mode})"
            for (gd, gs), (_, ws) in zip(got[qid], want):
                assert abs(gs - ws) < 1e-6, f"{q!r} doc {gd}"
    finally:
        df.unpersist()


def test_rank_identity_10k_docs_after_upsert(spark, tmp_path):
    """The merge-on-read path at medium scale: 10k docs, re-crawl a
    third of them, query through delete-vector masking — doc order must
    match the single-node oracle over the UPDATED corpus exactly (the
    masked gather preserves the canonical summation order; this is the
    scale where a float-association slip breaks ties, per round-2)."""
    from pyspark.sql import functions as F

    df = with_doc_id(
        synth_transcripts(spark, n_conv=2000, turns_per_conv=5, seed=99)
    ).cache()
    try:
        updated = df.where(F.col("doc_id") % 3 == 2).withColumn(
            "text", F.concat(F.col("text"), F.lit(" the spark recrawled"))
        )
        final = df.where(F.col("doc_id") % 3 != 2).unionByName(updated)
        oracle = build_oracle(
            [(r["doc_id"], r["text"]) for r in final.select("doc_id", "text").collect()]
        )
        cfg = IndexConfig(
            path=str(tmp_path / "idx_up"), num_buckets=64, nsalt=8,
            n_src_partitions=3,
        )
        b = IndexBuilder(spark, cfg)
        b.build(df)
        b.upsert(updated.select("doc_id", "text"))
        out = b.query_topk([(i, q) for i, q in QUERIES], k=20)
        got: dict[int, list[tuple[int, float]]] = {i: [] for i, _ in QUERIES}
        for r in out.orderBy("query_id", "rank").collect():
            got[r["query_id"]].append((r["doc_id"], r["score"]))
        for qid, q in QUERIES:
            want = oracle.bm25_topk(q, k=20)
            assert [d for d, _ in got[qid]] == [d for d, _ in want], f"{q!r}"
            for (gd, gs), (_, ws) in zip(got[qid], want):
                assert abs(gs - ws) < 1e-6, f"{q!r} doc {gd}"
    finally:
        df.unpersist()

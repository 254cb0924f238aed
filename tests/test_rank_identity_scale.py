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

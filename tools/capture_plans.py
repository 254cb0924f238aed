"""Regenerate docs/QUERY_PLANS.md — formatted physical plans of the
flagship paths, captured from a real sf0.01 run. The load-bearing plan
properties (bucket PartitionFilters, broadcast query side,
WindowGroupLimit, pruned ReadSchema) are ALSO asserted in CI
(tests/test_plan_quality.py); this file is the human-readable record.

Usage: python tools/capture_plans.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from mwmbl_spark import get_spark  # noqa: E402
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig  # noqa: E402
from mwmbl_spark.sources.transcripts import transcripts_from_documents  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    spark = get_spark("capture-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="plans_")
    cfg = IndexConfig(path=f"{tmp}/index", num_buckets=16, nsalt=4, n_src_partitions=1)
    b = IndexBuilder(spark, cfg)
    b.build(transcripts_from_documents(spark, SF_DIR))
    qdf = spark.createDataFrame(entrymod.QUERY_SET, "query_id long, query string")

    # upserted twin of the index: the round-3 merge-on-read plan shape
    from pyspark.sql import functions as F

    cfg_u = IndexConfig(
        path=f"{tmp}/index_up", num_buckets=16, nsalt=4, n_src_partitions=1
    )
    bu = IndexBuilder(spark, cfg_u)
    t = transcripts_from_documents(spark, SF_DIR)
    bu.build(t)
    bu.upsert(
        t.where(F.col("doc_id") % 5 == 0).select(
            "doc_id", F.concat(F.col("text"), F.lit(" upd")).alias("text")
        )
    )

    from mwmbl_spark.operators.similarity import _ivf_assign, _to64

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id"), _to64(F.col("embedding")).alias("v"))
    cents = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(4)], "cid int, c array<double>"
    )

    sections = [
        ("Segment/WAND top-k (builder.query_topk)", b.query_topk(qdf, k=10)),
        (
            "Segment/WAND top-k on an UPSERTED index (delete-vector masking; "
            "bucket pruning must survive the seq column)",
            bu.query_topk(qdf, k=10),
        ),
        ("Search pipeline (q_search_pipeline)", entrymod.q_search_pipeline(spark, SF_DIR)),
        ("MinHash near-dup (q_dedup_minhash)", entrymod.q_dedup_minhash(spark, SF_DIR)),
        ("Curation apply (q_curation_apply)", entrymod.q_curation_apply(spark, SF_DIR)),
        ("ANN cosine top-k (q_embedding_topk)", entrymod.q_embedding_topk(spark, SF_DIR)),
        (
            "IVF assignment (round 3: argmax fold, no Exchange/Window)",
            _ivf_assign(corpus, cents),
        ),
    ]

    from mwmbl_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
        pq_encode,
        pq_train,
    )

    cb = pq_train(emb, m=8, k_codes=16, n_iters=1)
    a_cents, a_cb = ivfpq_train(emb, n_centroids=8, m=8, k_codes=16, n_iters=1)
    a_codes = ivfpq_encode(emb, a_cents, a_cb)
    sections += [
        (
            "PQ encode (static-slice codes — single scan, no shuffle)",
            pq_encode(emb, cb),
        ),
        (
            "IVF-PQ ADC serving (broadcast probe frame joined on cid, "
            "codes scan + refine; prebuilt artifacts)",
            ivfpq_topk(
                emb, entrymod.ANN_QUERY_IDS, k=10, n_probe=4,
                centroids=a_cents, codebooks=a_cb, codes=a_codes, refine=50,
            ),
        ),
    ]
    from mwmbl_spark.operators.bpe import bpe_encode
    from mwmbl_spark.operators.similarity import cluster_assign_exact
    from mwmbl_spark.operators.urls import refresh_priority

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    log = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("crawl_ts"),
        (F.col("event_type") == "click").cast("int").alias("changed"),
    )
    sections += [
        (
            "Time-travel query (as_of pre-mutation snapshot — same kernel "
            "plan as live, different fragment set + vector filter)",
            bu.query_topk(qdf, k=10, as_of=1),
        ),
        (
            "Snapshot diff (two doc_index scans + full-outer join; "
            "postings never read)",
            bu.snapshot_diff(1, bu.current_seq()),
        ),
        (
            "Exemplar clustering (centroid literals, per-row argmax — "
            "no Exchange, no Window)",
            cluster_assign_exact(emb, [3, 71, 148]),
        ),
        (
            "BPE encode (broadcast ranks inside the Arrow UDF — no Exchange)",
            bpe_encode(docs, [("t", "h"), ("e", "</w>")]),
        ),
        (
            "Refresh priority (map-side-combined URL-grain agg + global rank)",
            refresh_priority(log),
        ),
    ]
    out = [
        "# Captured physical plans (flagship paths)",
        "",
        "Regenerated by `python tools/capture_plans.py` (sf0.01). The",
        "properties asserted in CI are: bucket `PartitionFilters` on the",
        "segment scan, broadcast query side, map-side `WindowGroupLimit`,",
        "pruned `ReadSchema` (tests/test_plan_quality.py).",
        "",
    ]
    for title, df in sections:
        out += [f"## {title}", "", "```", fmt(df).rstrip(), "```", ""]
    with open("docs/QUERY_PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/QUERY_PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()

"""Change-feed dedup epoch cost vs corpus size (round-5, VERDICT r4
item 8 'Done' evidence): with persisted staging tables, an epoch of
|changed|=60 docs must cost roughly the SAME against a 10x larger
corpus — the work is |changed|-proportional, not corpus-proportional.

Usage: python bench/incremental_dedup_scale.py
Prints one JSON line; copy results into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mwmbl_spark import get_spark
from mwmbl_spark.operators.dedup import (
    build_dedup_staging,
    incremental_near_duplicates,
    update_dedup_staging,
)
from mwmbl_spark.synth import synth_transcripts, with_doc_id

N_CHANGED = 60
REPS = 3


def epoch(spark, corpus, staging):
    """One change-feed epoch of N_CHANGED updated docs; returns
    (update_wall, query_wall, n_pairs)."""
    changed = corpus.select("doc_id").orderBy("doc_id").limit(N_CHANGED)
    # each changed doc becomes a NEAR-COPY of its neighbor, so the
    # epoch's verify join has real pairs to score (non-binding epochs
    # would leave the jaccard stage untested)
    neighbor = corpus.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" tiny epoch edit")).alias("new_text"),
    )
    updated = (
        corpus.join(changed, "doc_id", "left_semi")
        .join(neighbor, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("new_text", F.concat("text", F.lit(" refreshed"))).alias("text"),
        )
    )
    v1 = corpus.join(changed, "doc_id", "left_anti").unionByName(updated)
    t0 = time.perf_counter()
    st1 = update_dedup_staging(staging, v1, changed)
    t1 = time.perf_counter()
    n = incremental_near_duplicates(
        v1, changed, threshold=0.35, staging=st1
    ).count()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1, n


def run(spark, n_conv: int) -> dict:
    corpus = (
        with_doc_id(synth_transcripts(spark, n_conv=n_conv, turns_per_conv=4, seed=13))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()
    t0 = time.perf_counter()
    staging = build_dedup_staging(corpus)
    build_wall = time.perf_counter() - t0
    upds, qrys = [], []
    n_pairs = 0
    for _ in range(REPS):
        u, q, n_pairs = epoch(spark, corpus, staging)
        upds.append(u)
        qrys.append(q)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return {
        "n_docs": n_docs,
        "staging_build_sec": round(build_wall, 2),
        "epoch_update_sec": round(med(upds), 2),
        "epoch_query_sec": round(med(qrys), 2),
        "epoch_pairs": n_pairs,
    }


def main() -> None:
    spark = get_spark("incdedup-scale", cores=32, shuffle_partitions=32)
    small = run(spark, 500)    # ~2k docs
    large = run(spark, 5000)   # ~20k docs (10x)
    ratio = round(
        (large["epoch_update_sec"] + large["epoch_query_sec"])
        / max(0.01, small["epoch_update_sec"] + small["epoch_query_sec"]),
        2,
    )
    print(json.dumps({
        "metric": "staged incremental dedup epoch cost vs corpus size",
        "n_changed": N_CHANGED,
        "small": small,
        "large_10x": large,
        "epoch_cost_ratio_10x": ratio,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

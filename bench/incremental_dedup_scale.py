"""Change-feed dedup epoch cost vs corpus size (round-5, VERDICT r4
item 8 'Done' evidence): with persisted staging tables, an epoch of
|changed|=60 docs must cost roughly the SAME against a 10x larger
corpus — the work is |changed|-proportional, not corpus-proportional.

Round-6 adds the DISK-BACKED store (operators/dedup_store.py): each
run reports the in-memory staging ratio (the r5 form, whose epoch
re-checkpoints the corpus tables — the 1.47x residual) AND the store
ratio (delta-only writes, pruned scans — the VERDICT #8 target <=1.2).

Usage: python bench/incremental_dedup_scale.py
Prints one JSON line; copy results into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mwmbl_spark import get_spark
from mwmbl_spark.operators.dedup import (
    build_dedup_staging,
    incremental_near_duplicates,
    update_dedup_staging,
)
from mwmbl_spark.operators.dedup_store import build_dedup_staging_store
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


def store_epoch(spark, corpus, store):
    """The same epoch through the disk-backed store."""
    changed = corpus.select("doc_id").orderBy("doc_id").limit(N_CHANGED)
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
    store.update(v1, changed)
    t1 = time.perf_counter()
    n = store.near_duplicates(changed, threshold=0.35).count()
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

    tmp = tempfile.mkdtemp(prefix="dedup_store_bench_")
    try:
        t0 = time.perf_counter()
        store = build_dedup_staging_store(spark, corpus, f"{tmp}/store")
        store_build = time.perf_counter() - t0
        s_upds, s_qrys = [], []
        s_pairs = 0
        for _ in range(REPS):
            # NB chained epochs: each rep layers another delta — the
            # realistic accumulation shape, unlike the memory form's
            # from-base reps
            u, q, s_pairs = store_epoch(spark, corpus, store)
            s_upds.append(u)
            s_qrys.append(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return {
        "n_docs": n_docs,
        "staging_build_sec": round(build_wall, 2),
        "epoch_update_sec": round(med(upds), 2),
        "epoch_query_sec": round(med(qrys), 2),
        "epoch_pairs": n_pairs,
        "store_build_sec": round(store_build, 2),
        "store_epoch_update_sec": round(med(s_upds), 2),
        "store_epoch_query_sec": round(med(s_qrys), 2),
        "store_epoch_pairs": s_pairs,
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
    store_ratio = round(
        (large["store_epoch_update_sec"] + large["store_epoch_query_sec"])
        / max(
            0.01,
            small["store_epoch_update_sec"] + small["store_epoch_query_sec"],
        ),
        2,
    )
    print(json.dumps({
        "metric": "staged incremental dedup epoch cost vs corpus size",
        "n_changed": N_CHANGED,
        "small": small,
        "large_10x": large,
        "epoch_cost_ratio_10x": ratio,
        "store_epoch_cost_ratio_10x": store_ratio,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

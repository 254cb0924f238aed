"""Batched-BPE scale probe (round-5, VERDICT r4 item 2).

Criterion: learn_bpe(n_merges=1024) over a word table ABOVE the driver
fast-path gate (>200k distinct words -> the distributed loop is forced)
must finish in fewer than n_merges/8 = 128 Spark jobs, parity-gated
against the pure single-node twin on the same table.

The word table is synthesized deterministically (md5-derived "words"
over a 16-symbol alphabet, Zipf counts) — at this grain only the
pair-statistics shape matters, and hex words maximize pair collisions
(hard case for the symbol-disjoint batch selector).

Usage: python bench/bpe_scale.py [n_words] [n_merges] [batch]
Appends nothing; prints a JSON line — copy results into
BENCH/BASELINE.md by hand (tooling never writes that file).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mwmbl_spark import get_spark
from mwmbl_spark.operators.bpe import (
    LAST_LEARN_STATS,
    _pure_bpe_batched,
    learn_bpe,
)


def main(n_words: int = 300_000, n_merges: int = 1024, batch: int = 32) -> None:
    spark = get_spark("bpe-scale", cores=32, shuffle_partitions=32)
    words = (
        spark.range(n_words)
        .select(
            F.substring(F.md5(F.col("id").cast("string")), 1, 8).alias("word"),
            (F.lit(1_000_000) / (F.col("id") + 1)).cast("long").alias("n"),
        )
        .withColumn("n", F.greatest(F.col("n"), F.lit(1)))
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
        .repartition(32)  # full thread occupancy for the merge passes
        .localCheckpoint()
    )
    n_distinct = words.count()
    assert n_distinct > 200_000, n_distinct  # distributed path is forced

    t0 = time.perf_counter()
    merges = learn_bpe(
        words, n_merges=n_merges, min_count=2, batch=batch, checkpoint_every=4
    )
    wall = time.perf_counter() - t0
    stats = dict(LAST_LEARN_STATS)
    assert stats["path"] == "distributed", stats

    # parity: the distributed batched loop == the pure twin on the SAME
    # table (integer counts + shared _select_batch make this exact)
    rows = [(r["word"], int(r["n"])) for r in words.collect()]
    t1 = time.perf_counter()
    want = _pure_bpe_batched(
        rows, n_merges, 2, batch, max(64, 8 * batch)
    )
    pure_wall = time.perf_counter() - t1
    assert merges == want, "distributed batched path diverged from pure twin"

    print(json.dumps({
        "metric": "batched BPE distributed learning",
        "n_distinct_words": n_distinct,
        "n_merges": len(merges),
        "batch": batch,
        "rounds": stats["rounds"],
        "spark_jobs": stats["jobs"],
        "jobs_budget": n_merges // 8,
        "jobs_ok": stats["jobs"] < n_merges // 8,
        "wall_sec": round(wall, 2),
        "pure_twin_wall_sec": round(pure_wall, 2),
        "parity": "exact",
    }))
    spark.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 300_000,
        int(a[1]) if len(a) > 1 else 1024,
        int(a[2]) if len(a) > 2 else 32,
    )

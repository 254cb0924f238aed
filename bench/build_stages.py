"""Stage-level build scaling diagnostic: times the build's two macro
stages (postings+stats vs segments+write) at a given core count, so
N-vs-4N regressions can be attributed instead of guessed.

Usage: python bench/build_stages.py <cores> [corpus_parquet]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mwmbl_scaling_corpus_160000x8_s42"
    os.makedirs("/dev/shm/mwmbl_spark_local", exist_ok=True)

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from mwmbl_spark import get_spark
    from mwmbl_spark.operators.postings import build_postings_with_len, term_stats
    from mwmbl_spark.operators.segments import build_segments

    spark = get_spark(
        f"build-stages-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.local.dir": "/dev/shm/mwmbl_spark_local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(corpus)

    @pandas_udf("long")
    def _warm(s):  # pragma: no cover
        return s

    spark.range(cores * 4, numPartitions=cores).select(_warm("id")).count()

    out = {"cores": cores}
    t0 = time.perf_counter()
    p = build_postings_with_len(t).persist()
    agg = p.agg(F.count(F.lit(1)).alias("np"), F.sum("tf").alias("s")).collect()[0]
    n_docs = t.count()
    out["postings_stats_sec"] = round(time.perf_counter() - t0, 2)
    out["n_postings"] = int(agg["np"])

    stats = term_stats(p)
    avg = int(agg["s"]) / max(1, n_docs)
    idx = tempfile.mkdtemp(prefix=f"bstages_{cores}_", dir="/dev/shm")
    t1 = time.perf_counter()
    segs = build_segments(p, None, stats, n_docs, avg, 64, 32)
    n_write = min(64, max(4, spark.sparkContext.defaultParallelism * 4))
    (
        segs.repartition(n_write, F.col("bucket"))
        .sortWithinPartitions("bucket", "term", "salt")
        .write.mode("overwrite").partitionBy("bucket").parquet(f"{idx}/segments")
    )
    out["segments_write_sec"] = round(time.perf_counter() - t1, 2)
    p.unpersist(blocking=True)
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

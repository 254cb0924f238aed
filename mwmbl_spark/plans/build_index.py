"""End-to-end resumable index build (reference §3.2 pipeline, Spark-first).

Layout of an index directory:

    {path}/segments/src_part=P/bucket=B/*.parquet   — block-max segments
    {path}/stats/src_part=P/*.parquet               — per-partition (term, df, cf)
    {path}/doc_stats/src_part=P/*.parquet           — (n_docs, sum_len)
    {path}/_manifest/                               — commit log (manifest.py)

The build loops over SOURCE partitions (the analogue of the reference's
status-driven batch chunks): each partition independently builds its
segments/stats, then commits a manifest row. Global term statistics are
an aggregation over per-partition partials, so a killed build resumes
without touching completed partitions and query-time df/N/avgdl are
always consistent with exactly the committed set.

Query-time exactness across partitions: a doc lives in exactly one
source partition and one salt, so per-(term,salt,src_part) segments are
disjoint doc sets; the WAND kernel gathers across all of a term's
segment rows, which sums disjoint contributions — identical scores to a
single-shot build (asserted in tests/test_build_resume.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mwmbl_spark import DEFAULT_NUM_BUCKETS
from mwmbl_spark.manifest import commit_partition, pending_partitions
from mwmbl_spark.operators.postings import (
    build_postings_with_len,
    term_stats,
)
from mwmbl_spark.operators.segments import DEFAULT_NSALT, build_segments
from mwmbl_spark.operators.wand import wand_topk


def _write_doc_stats(path: str, n_docs: int, sum_len: int) -> None:
    """Driver-side single-row parquet write (a Spark job for one row of
    driver-known values costs ~4 s of pure overhead)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "sum_len": pa.array([sum_len], pa.int64()),
            }
        ),
        os.path.join(path, "part-0.parquet"),
    )


@dataclass
class IndexConfig:
    path: str
    num_buckets: int = DEFAULT_NUM_BUCKETS
    nsalt: int = DEFAULT_NSALT
    n_src_partitions: int = 8


class IndexBuilder:
    def __init__(self, spark: SparkSession, cfg: IndexConfig):
        self.spark = spark
        self.cfg = cfg
        # (committed-set key) -> (stats_df, n_docs, avg_len); a query
        # BATCH shares one consistent stats snapshot, and repeated
        # batches against an unchanged index skip the stats jobs
        self._stats_cache: tuple[tuple[str, ...], DataFrame, int, float] | None = None

    # -- source partitioning ------------------------------------------------
    def src_partition_col(self):
        """Deterministic source partition from conv_id: all turns of a
        conversation land in one partition (matches Iceberg partitioning
        by bucket(conv_id) on a real table)."""
        return F.pmod(F.xxhash64("conv_id"), F.lit(self.cfg.n_src_partitions)).cast("string")

    # -- build ---------------------------------------------------------------
    def build(self, transcripts: DataFrame, max_partitions: int | None = None) -> list[str]:
        """Index all pending source partitions (resume-aware). Returns the
        list of partitions committed in this run. ``max_partitions``
        bounds the run (used by tests to simulate a killed build)."""
        df = transcripts.withColumn("src_part", self.src_partition_col())
        all_parts = [str(i) for i in range(self.cfg.n_src_partitions)]
        todo = pending_partitions(self.spark, self.cfg.path, all_parts)
        if max_partitions is not None:
            todo = todo[:max_partitions]
        done = []
        for part in todo:
            t0 = time.perf_counter()
            # no cache of raw text: re-scanning columnar parquet is
            # cheaper than materializing deserialized rows, and the
            # build touches the source exactly twice (postings pass +
            # row count)
            sub = df.where(F.col("src_part") == part)
            n_docs, n_postings = self._build_partition(sub, part)
            wall_ms = int((time.perf_counter() - t0) * 1000)
            commit_partition(self.spark, self.cfg.path, part, n_docs, n_postings, wall_ms)
            done.append(part)
        return done

    def _build_partition(self, sub: DataFrame, part: str) -> tuple[int, int]:
        # single tokenize pass: postings carry doc_len, so the segment
        # build needs no doc_id join and no second traversal; persist
        # because stats/doc-stats/segments all read the posting relation
        p = build_postings_with_len(sub).persist()
        try:
            agg = p.agg(
                F.count(F.lit(1)).alias("np"), F.sum("tf").alias("s")
            ).collect()[0]
            n_postings, sum_len = int(agg["np"]), int(agg["s"] or 0)
            # n_docs counts EVERY source row (incl. zero-token docs the
            # posting relation can't see) — a plain row count, no tokenize
            n_docs = sub.count()
            avg = sum_len / max(1, n_docs)
            stats = term_stats(p)
            segs = build_segments(
                p, None, stats, n_docs, avg, self.cfg.num_buckets, self.cfg.nsalt
            )
            base = self.cfg.path
            # cluster rows by bucket BEFORE the dynamic-partition write:
            # otherwise every task holds a writer per bucket directory
            # (tasks x buckets small files + writer memory), which
            # measured 10x slower at high parallelism; clustered, each
            # task streams a few whole buckets. Write-task count adapts
            # to the session's parallelism: on a small executor count,
            # num_buckets tiny tasks in many waves cost pure scheduling
            # (64 tasks at 4 cores measured 17% slower than 16), while a
            # big cluster takes one task per bucket.
            n_write = min(
                self.cfg.num_buckets,
                max(4, self.spark.sparkContext.defaultParallelism * 4),
            )
            (
                segs.repartition(n_write, F.col("bucket"))
                .sortWithinPartitions("bucket", "term", "salt")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{base}/segments/src_part={part}")
            )
            stats.write.mode("overwrite").parquet(f"{base}/stats/src_part={part}")
            _write_doc_stats(f"{base}/doc_stats/src_part={part}", n_docs, sum_len)
        finally:
            # blocking: async unpersist races the final task's accumulator
            # updates and spams a benign-but-ugly DAGScheduler ERROR
            p.unpersist(blocking=True)
        return n_docs, n_postings

    # -- read side ------------------------------------------------------------
    def segments(self) -> DataFrame:
        from mwmbl_spark.manifest import committed_partitions

        done = committed_partitions(self.spark, self.cfg.path)
        segs = self.spark.read.option("basePath", f"{self.cfg.path}/segments").parquet(
            f"{self.cfg.path}/segments"
        )
        # only committed partitions are visible (crash-orphans filtered)
        return segs.where(F.col("src_part").cast("string").isin([str(d) for d in done]))

    def doc_totals(self) -> tuple[int, int]:
        """(n_docs, sum_len) over committed partitions — includes
        zero-token docs the posting relation can't see. Local doc_stats
        are single-row files written driver-side; read them back
        driver-side too (a Spark job costs ~0.3-0.5 s of scheduling for
        a handful of rows). Non-local paths use the Spark reader."""
        from mwmbl_spark.manifest import committed_partitions

        done = {str(d) for d in committed_partitions(self.spark, self.cfg.path)}
        base = f"{self.cfg.path}/doc_stats"
        if "://" not in base or base.startswith("file://"):
            import glob
            import os

            import pyarrow.parquet as pq

            local = base.removeprefix("file://")
            n = s = 0
            for part_dir in glob.glob(os.path.join(local, "src_part=*")):
                if os.path.basename(part_dir).split("=", 1)[1] not in done:
                    continue
                for f in glob.glob(os.path.join(part_dir, "*.parquet")):
                    t = pq.read_table(f, columns=["n_docs", "sum_len"])
                    n += sum(t.column("n_docs").to_pylist())
                    s += sum(t.column("sum_len").to_pylist())
            return n, s
        ds = (
            self.spark.read.option("basePath", base)
            .parquet(base)
            .where(F.col("src_part").cast("string").isin(list(done)))
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_len").alias("s"))
            .collect()[0]
        )
        return int(ds["n"] or 0), int(ds["s"] or 0)

    def global_stats(self) -> tuple[DataFrame, int, float]:
        from mwmbl_spark.manifest import committed_partitions

        done = [str(d) for d in committed_partitions(self.spark, self.cfg.path)]
        stats = (
            self.spark.read.option("basePath", f"{self.cfg.path}/stats")
            .parquet(f"{self.cfg.path}/stats")
            .where(F.col("src_part").cast("string").isin(done))
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        n_docs, sum_len = self.doc_totals()
        avg_len = sum_len / max(1, n_docs)
        return stats, n_docs, avg_len

    def cached_global_stats(self) -> tuple[DataFrame, int, float]:
        """global_stats memoized on the committed-partition set (the
        manifest is the tiny invalidation key; stats persist in memory
        across query batches until a new partition commits)."""
        from mwmbl_spark.manifest import committed_partitions

        key = tuple(sorted(str(d) for d in committed_partitions(self.spark, self.cfg.path)))
        if self._stats_cache is not None and self._stats_cache[0] == key:
            return self._stats_cache[1], self._stats_cache[2], self._stats_cache[3]
        stats, n_docs, avg_len = self.global_stats()
        stats = stats.persist()
        stats.count()
        if self._stats_cache is not None:
            self._stats_cache[1].unpersist()
        self._stats_cache = (key, stats, n_docs, avg_len)
        return stats, n_docs, avg_len

    def query_topk(
        self, queries: DataFrame, k: int = 10, mode: str = "disjunctive"
    ) -> DataFrame:
        stats, n_docs, avg_len = self.cached_global_stats()
        return wand_topk(
            self.segments(),
            stats,
            queries,
            n_docs,
            avg_len,
            k=k,
            mode=mode,
            num_buckets=self.cfg.num_buckets,
        )

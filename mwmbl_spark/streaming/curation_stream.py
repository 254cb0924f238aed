"""Streaming curation ingestion — user edits applied to the page store
as they arrive (SURVEY §2.8 + the views.py curation write path).

The reference applies each curation synchronously inside the HTTP
request (views.py:385-418). Decoupled, Spark-native shape: curation
edits land as parquet files (the analogue of the reference's Curation
rows); an ``AvailableNow`` stream folds each micro-batch into the page
store via ``operators/curation.apply_curation``:

- the store is VERSIONED: ``{store}/pages/epoch={N}`` is the page table
  after folding epoch N; the manifest records committed epochs, and
  readers resolve the latest committed version (an Iceberg snapshot on
  a real cluster);
- the foreachBatch body is idempotent per epoch (same manifest check as
  the incremental index build): a replayed epoch after a crash is a
  no-op — exactly-once effect on the store;
- apply_curation broadcasts the (human-scale) batch and rewrites only
  touched pages, but each version is a full snapshot write here; on a
  real lakehouse this becomes MERGE INTO / copy-on-write of touched
  files only.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from mwmbl_spark.manifest import commit_partition, committed_partitions
from mwmbl_spark.operators.curation import apply_curation

CURATION_DDL = (
    "query string, rank long, title string, url string, extract string, state int"
)

PAGE_DDL = (
    "page long, position int, title string, url string, extract string, "
    "score double, term string, state int"
)


def _latest_epoch(spark: SparkSession, store_path: str) -> int | None:
    done = [
        int(p.split("-", 1)[1])
        for p in committed_partitions(spark, store_path)
        if str(p).startswith("curation-")
    ]
    return max(done) if done else None


def current_pages(
    spark: SparkSession, store_path: str, seed_path: str
) -> DataFrame:
    """The latest committed page-store snapshot (seed table if no
    curation has ever been folded)."""
    latest = _latest_epoch(spark, store_path)
    if latest is None:
        return spark.read.parquet(seed_path)
    return spark.read.parquet(f"{store_path}/pages/epoch={latest}")


def curation_stream(
    spark: SparkSession,
    curations_path: str,
    seed_pages_path: str,
    store_path: str,
    checkpoint_path: str,
    n_pages: int,
    page_cap: int | None = None,
) -> None:
    """Fold all available curation-edit files into the page store
    (Trigger.AvailableNow; returns when caught up)."""
    stream = spark.readStream.schema(CURATION_DDL).parquet(curations_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        part = f"curation-{epoch_id}"
        if part in committed_partitions(spark, store_path):
            return  # replayed epoch after restart: already committed
        if batch_df.isEmpty():
            return
        t0 = time.perf_counter()
        base = current_pages(spark, store_path, seed_pages_path)
        out = apply_curation(base, batch_df, n_pages, page_cap)
        out.write.mode("overwrite").parquet(f"{store_path}/pages/epoch={epoch_id}")
        n_rows = spark.read.parquet(f"{store_path}/pages/epoch={epoch_id}").count()
        commit_partition(
            spark, store_path, part, n_rows, batch_df.count(),
            int((time.perf_counter() - t0) * 1000),
        )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

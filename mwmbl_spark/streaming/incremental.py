"""Streaming incremental index build + streaming stats (SURVEY §2.8).

The reference's "streaming" is a 10-second polling loop over a batch
status table (/root/reference/mwmbl/background.py:38-47,
indexer/process_batch.py:12-33). The Spark-native mapping is Structured
Streaming over the transcripts table with ``Trigger.AvailableNow`` —
each micro-batch flows through the SAME per-partition build path as the
batch builder (plans/build_index.py), committed to the SAME manifest:

- micro-batch N -> segments/src_part=stream-{epoch}/..., manifest row;
- the foreachBatch body is idempotent per epoch: Structured Streaming
  replays an epoch after a crash, and the manifest check turns the
  replay into a no-op (exactly-once effect on the index);
- the checkpointLocation tracks which source files were consumed, so
  new parquet files appended to the source dir are picked up by the
  next AvailableNow run — the analogue of the reference's
  REMOTE->LOCAL->INDEXED progression, with Spark owning the bookkeeping.

``hourly_role_counts_stream`` is the event-time stats analogue of the
reference's Redis daily/hourly counters (crawler/stats.py:85-143):
tumbling windows + watermark for late data (capability the reference
lacks — its counters use batch timestamps only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mwmbl_spark.manifest import commit_partition, ever_committed_partitions
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, doc_id long"
)


def incremental_index_stream(
    spark: SparkSession,
    source_path: str,
    index_cfg: IndexConfig,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    schema_ddl: str = TRANSCRIPT_DDL,
    mode: str = "append",
    auto_compact_fragments: int | None = None,
):
    """Run an AvailableNow incremental build over a parquet source dir.
    Returns after all available data is indexed and committed.

    ``mode="append"``: every micro-batch is new docs (fastest; a
    re-crawled doc would duplicate). ``mode="upsert"``: micro-batches
    flow through IndexBuilder.upsert — re-crawled docs REPLACE their
    stored postings via delete vectors + exact stats deltas (the
    reference's RMW-merge semantics, index_batches.py:78-90, now in the
    streaming path too; pure-append batches degrade to one doc_index
    anti-probe). ``auto_compact_fragments``: compact when the live
    fragment count exceeds this bound — the steady-state policy that
    keeps read amplification O(1) under a continuous stream."""
    builder = IndexBuilder(spark, index_cfg)
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        part = f"stream-{epoch_id}"
        # EVER-committed, not live: after auto-compaction replaces a
        # stream-N fragment, a checkpoint replay of epoch N must still
        # be a no-op — its docs live on in the compacted fragment
        # (re-indexing under a permanently-replaced name would waste the
        # rebuild and orphan segment/stats dirs vacuum never removes)
        if part in ever_committed_partitions(spark, index_cfg.path):
            return  # replayed epoch after restart: already committed
        if batch_df.isEmpty():
            return
        import time

        if mode == "upsert":
            builder.upsert(batch_df, name=part)
        else:
            t0 = time.perf_counter()
            n_docs, n_postings = builder._build_partition(batch_df, part)
            from mwmbl_spark.manifest import next_seq

            commit_partition(
                spark,
                index_cfg.path,
                part,
                n_docs,
                n_postings,
                int((time.perf_counter() - t0) * 1000),
                seq=next_seq(spark, index_cfg.path),
            )
        if auto_compact_fragments is not None:
            builder.maybe_compact(auto_compact_fragments)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return builder


def hourly_role_counts_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    schema_ddl: str = TRANSCRIPT_DDL,
):
    """A11 streaming analogue: tumbling 1h counts per role with a
    watermark; append-mode sink (finalized windows only)."""
    stream = spark.readStream.schema(schema_ddl).parquet(source_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

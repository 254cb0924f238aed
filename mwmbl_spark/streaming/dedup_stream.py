"""Streaming exact deduplication (first-seen wins, across epochs).

The batch dedup family (operators/dedup.py) assumes the corpus is at
rest; an ingest pipeline wants duplicates suppressed AS THEY ARRIVE,
including re-sends in later crawl epochs — the reference re-checks
every batch against its URL store instead
(/root/reference/mwmbl/indexer/update_urls.py), a driver-side analogue.
Spark-native mapping: Structured Streaming ``dropDuplicates`` on the
md5 text hash. The hash set is streaming state, persisted in the
checkpoint, so suppression is exact across AvailableNow runs and
restarts — epoch N+1 re-sending an epoch-0 text emits nothing.

Scale notes:
- State is one 16-byte-key entry per DISTINCT text ever seen —
  unbounded by design (exact dedup needs exact memory of the past).
  At billions of docs that is tens of GB spread across the state
  store's shuffle partitions; use the RocksDB state store provider on
  a real cluster. When the product tolerates a re-admission horizon,
  ``watermark_delay`` bounds state instead
  (dropDuplicatesWithinWatermark): entries older than the delay are
  evicted, trading exactness for O(window) state.
- Only the hash column shuffles into state bookkeeping; the payload
  rides alongside to the sink once per first sight.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DOCUMENT_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def exact_dedup_stream(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_path: str,
    schema_ddl: str = DOCUMENT_DDL,
    text_col: str = "text",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
) -> None:
    """Run one AvailableNow pass: every parquet file under
    ``source_path`` not yet consumed by this checkpoint is read, texts
    never seen before (across ALL prior passes) append to ``out_path``.

    ``watermark_delay`` (e.g. ``"1 hour"``): bound state via
    dropDuplicatesWithinWatermark on ``ts_col`` — duplicates arriving
    within the delay are still suppressed, older re-sends re-admit.
    """
    stream = spark.readStream.schema(schema_ddl).parquet(source_path)
    hashed = stream.withColumn("__text_hash", F.md5(F.col(text_col)))
    if watermark_delay is not None:
        deduped = hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__text_hash"]
        )
    else:
        deduped = hashed.dropDuplicates(["__text_hash"])
    q = (
        deduped.drop("__text_hash")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

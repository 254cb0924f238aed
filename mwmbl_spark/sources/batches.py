"""Crawl-batch ingest (reference S1-S3 for the mwmbl payload model).

The reference stores crawl batches as gzip JSON blobs
(HashedBatch{user_id_hash, timestamp, items:[Item{url, status,
timestamp, content:{title, extract, links_only}}]},
/root/reference/mwmbl/crawler/batch.py:27-154, batch_cache.py:32-47)
and iterates them into Documents, skipping link-only items and
converting the item timestamp from millis to seconds
(index_batches.py:39-46).

Spark-natively: ``spark.read.json`` over the landing directory (gzip
transparent), explode items, project Documents. The schema is explicit
— no inference pass over 100 TB of JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_SCHEMA = (
    "user_id_hash string, timestamp double, items array<struct<"
    "url string, resolved_url string, status int, timestamp double, "
    "content struct<title string, extract string, links_only boolean>, "
    "error struct<name string, message string>"
    ">>"
)


def read_batches(spark: SparkSession, path: str) -> DataFrame:
    """Raw batch scan (gzip JSON, explicit schema)."""
    return spark.read.schema(BATCH_SCHEMA).json(path)


def documents_from_batches(batches: DataFrame) -> DataFrame:
    """S3 [index_batches.py:39-46]: items -> Documents; skip items with
    no content or links_only; last_crawled = item ms timestamp // 1000."""
    items = batches.select(
        "user_id_hash", F.explode("items").alias("item")
    )
    kept = items.where(
        F.col("item.content").isNotNull()
        & ~F.coalesce(F.col("item.content.links_only"), F.lit(False))
    )
    return kept.select(
        F.col("item.content.title").alias("title"),
        F.col("item.url").alias("url"),
        F.col("item.content.extract").alias("extract"),
        (F.col("item.timestamp") / 1000).cast("long").alias("last_crawled"),
    )

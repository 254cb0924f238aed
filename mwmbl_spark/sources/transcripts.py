"""Transcript-table sources (S2/S3 analogues).

The reference ingests crawl batches (gzip JSON blobs ->
``HashedBatch{items}``, /root/reference/mwmbl/crawler/batch.py:141-154,
batch_cache.py:32-47); our input is the BASELINE input_hint table
``(conv_id, turn_idx, role, text, tool, ts)`` stored columnar
(Parquet here; Iceberg on a real cluster — the reader below is
format-agnostic via ``spark.read``).

``transcripts_from_documents`` derives a transcripts-shaped table
deterministically from the driver's ``documents.parquet`` fixture so the
DuckDB oracle can reproduce the identical derivation in SQL (same
arithmetic, no hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_PER_CONV = 4


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """S2: columnar scan of the transcripts table.

    Catalyst pushes filters/column pruning into the Parquet scan; on a
    real cluster this is ``spark.read.table("transcripts")`` over Iceberg
    with partition pruning on the table's partition spec.
    """
    return spark.read.parquet(path)


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape ``documents.parquet`` into the
    input_hint transcript schema. Every derived column is plain integer
    arithmetic on ``doc_id`` so the DuckDB oracle states the same thing
    in ANSI SQL (see __spark_entry__.TRANSCRIPTS_SQL).

    doc_id is preserved: it equals ``conv_serial * TURNS_PER_CONV +
    turn_idx``, i.e. it derives deterministically from (conv_id,
    turn_idx) as the north rule requires.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    turn = (F.col("doc_id") % TURNS_PER_CONV).cast("int")
    return docs.select(
        F.concat(F.lit("conv-"), (F.col("doc_id") / TURNS_PER_CONV).cast("long").cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(turn == 3, F.lit("tool"))
        .when(turn % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.col("text"),
        F.when(turn == 3, F.lit("search")).otherwise(F.lit(None).cast("string")).alias("tool"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("ts"),
        F.col("doc_id"),
    )

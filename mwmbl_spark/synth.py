"""Deterministic synthetic transcripts corpus (BASELINE.json input_hint).

Generates the exact input-table shape
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` with a Zipf-distributed vocabulary plus injected hot
terms, so the skew-handling paths (salting, AQE skew join) have
something real to chew on. Seed-fixed: same (seed, n_conv) -> byte-equal
table, everywhere, with no external data.

Generation is distributed: ``spark.range(n_conv)`` -> per-conversation
rows derived from counter-mode hashing of (seed, conv, turn, slot).
No driver-side materialization, scales linearly with executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 5000
ZIPF_A = 1.3
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "browse", "code", "calc"]
HOT_TERMS = ["the", "spark", "data", "query"]  # injected skew head
TS0 = pd.Timestamp("2026-01-01T00:00:00")


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def synth_transcripts(
    spark: SparkSession,
    n_conv: int = 1000,
    turns_per_conv: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generator.

    Each conversation derives its own ``numpy.default_rng`` stream from
    ``(seed, conv_id)`` so generation is order- and partition-independent
    (rank-identical output at any parallelism level).
    """
    vocab = np.array(_vocab())
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv in pdf["id"].to_numpy():
                rng = np.random.default_rng([seed, int(conv)])
                n_turns = turns_per_conv
                for turn in range(n_turns):
                    role = ROLES[turn % len(ROLES) if turn % 3 != 2 else 2]
                    n_words = int(rng.integers(5, 60))
                    # Zipf over the vocab, clipped; plus hot-term injection
                    idx = np.minimum(
                        rng.zipf(ZIPF_A, size=n_words) - 1, VOCAB_SIZE - 1
                    )
                    words = list(vocab[idx])
                    n_hot = int(rng.integers(0, 4))
                    for _ in range(n_hot):
                        pos = int(rng.integers(0, len(words) + 1))
                        words.insert(pos, HOT_TERMS[int(rng.integers(0, len(HOT_TERMS)))])
                    rows.append(
                        (
                            f"conv-{int(conv):08d}",
                            turn,
                            role,
                            " ".join(words),
                            TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None,
                            TS0 + pd.Timedelta(minutes=int(conv) * 60 + turn),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )

    base = spark.range(n_conv)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=schema)


def write_synth(
    spark: SparkSession, path: str, n_conv: int = 1000, turns_per_conv: int = 8, seed: int = 42
) -> None:
    (
        synth_transcripts(spark, n_conv, turns_per_conv, seed)
        .write.mode("overwrite")
        .parquet(path)
    )


def with_doc_id(df: DataFrame, turns_per_conv_cap: int = 1 << 20) -> DataFrame:
    """Deterministic 64-bit docID from (conv_id, turn_idx).

    ``xxhash64(conv_id) << 20 | turn_idx`` per SURVEY §1.3 — stable under
    any partitioning/order, collision-free for < 2^20 turns per
    conversation. The sign bit is cleared so docIDs sort as positives.
    """
    conv_hash = F.xxhash64(F.col("conv_id")).bitwiseAND(F.lit((1 << 43) - 1))
    return df.withColumn(
        "doc_id", F.shiftleft(conv_hash, 20) + F.col("turn_idx").cast("long")
    )

"""Exact phrase matching over the tokens column.

The reference approximates phrase support by indexing the first-n
BIGRAMS (P3, /root/reference/mwmbl/tokenizer.py get_bigrams +
indexer-side bigram terms) — a candidate GENERATOR that cannot verify
"A B C" as a contiguous run. This operator is the missing VERIFIER:
exact contiguous-subsequence matching, expressed entirely as JVM
higher-order functions (no UDF, no explode — the scan is one pass over
each doc's tokens array).

Serving shape: candidates come cheap from the existing bigram/term
index (plans/search.py); the phrase verify then runs over the
candidate docs only. Standalone over a whole corpus it is one
projection — embarrassingly parallel, no shuffle until the caller's
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr


def phrase_positions(toks: Column, ptoks: Column) -> Column:
    """1-based start positions where the token sequence ``ptoks``
    occurs contiguously in ``toks`` (empty array when the doc is
    shorter than the phrase — guarded: Spark's sequence() DESCENDS for
    start > stop and would fabricate positions)."""
    m = F.size(ptoks)
    starts = F.sequence(F.lit(1), F.size(toks) - m + 1)
    hit = lambda i: F.forall(  # noqa: E731
        F.sequence(F.lit(1), m),
        lambda j: F.element_at(toks, i + j - 1) == F.element_at(ptoks, j),
    )
    return F.when(
        (F.size(toks) >= m) & (m > 0), F.filter(starts, hit)
    ).otherwise(F.array().cast("array<int>"))


def phrase_match(
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    toks_col: str = "toks",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs containing each phrase as an EXACT contiguous token run ->
    (phrase_id, doc_id, n_matches, first_pos). Phrases are tokenized
    with the corpus tokenizer (P1) so matching is case/punctuation
    consistent with the index. The tiny phrase table is broadcast; the
    corpus is scanned once for all phrases."""
    spark = docs.sparkSession
    pdf = spark.createDataFrame(phrases, "phrase_id long, phrase string").select(
        "phrase_id", tokenize_expr(F.col("phrase")).alias("ptoks")
    )
    pos = phrase_positions(F.col(toks_col), F.col("ptoks"))
    return (
        docs.crossJoin(F.broadcast(pdf))
        .select(
            "phrase_id",
            F.col(id_col).alias("doc_id"),
            pos.alias("_pos"),
        )
        .where(F.size("_pos") > 0)
        .select(
            "phrase_id",
            "doc_id",
            F.size("_pos").cast("long").alias("n_matches"),
            F.element_at("_pos", 1).cast("int").alias("first_pos"),
        )
    )

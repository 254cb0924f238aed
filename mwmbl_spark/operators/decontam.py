"""Benchmark decontamination: purge training documents that overlap an
evaluation set by any shared n-gram.

The GPT-3 appendix-C lineage (Brown et al. 2020, arXiv:2005.14165;
PaLM §C) removes train documents sharing 8-to-13-gram collisions with
eval benchmarks — without this, corpus-scale training silently
memorizes its own test sets. The reference has no analogue (it serves
search, it doesn't train).

Plan shape (the 100 TB lens): the train side explodes to DISTINCT
(doc_id, gram_hash) pairs — 16-byte hashes, never gram text — and the
eval side reduces to a distinct hash set that is broadcast (eval
benchmarks are tiny against a training corpus), so contamination
detection is a broadcast left-semi probe over the train scan: no
corpus shuffle beyond the per-doc distinct. If the eval side ever
outgrows broadcast range, drop the ``broadcast()`` hint and the same
plan degrades to a shuffle semi-join on the hash key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import hash60
from mwmbl_spark.operators.repetition import ngrams_expr


def ngram_hashes(
    df: DataFrame, n: int = 8, id_col: str = "doc_id", toks_col: str = "toks"
) -> DataFrame:
    """(doc_id, gram_hash): distinct hash60 of every order-``n`` token
    gram. Hashes only — gram text never shuffles."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(ngrams_expr(F.col(toks_col), n)).alias("gram"),
        )
        .select("doc_id", hash60(F.col("gram")).alias("gram_hash"))
        .distinct()
    )


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """doc_ids of train documents sharing at least one n-gram with the
    eval set."""
    t = ngram_hashes(train, n, id_col, toks_col)
    e = ngram_hashes(eval_df, n, id_col, toks_col).select("gram_hash").distinct()
    return t.join(F.broadcast(e), "gram_hash", "left_semi").select("doc_id").distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """Train rows with every contaminated document removed."""
    bad = contaminated_ids(train, eval_df, n, id_col, toks_col)
    return train.join(bad, train[id_col] == bad["doc_id"], "left_anti")

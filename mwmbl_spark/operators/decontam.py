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


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """ONE-ROW corpus lineage / contamination report between two
    corpora — the measurement behind the C4/Pile overlap analyses
    (Dodge et al. 2021 "Documenting Large Webtext Corpora" §5; Lee et
    al. 2022 dedup appendix): distinct n-gram set sizes, intersection,
    union, Jaccard, and DIRECTIONAL containment (how much of A's gram
    set lives in B and vice versa — the number that actually decides
    "is corpus B a superset/derivative of A").

    -> (n_grams_a, n_grams_b, n_common, n_union, jaccard,
        containment_a, containment_b)

    Scale shape: gram hashes only (text never shuffles), two distinct
    aggregations + one semi-join at gram grain, map-side combined;
    output is one row, so every count is a partial-agg'd scalar. At
    100 TB swap exact distinct for HLL sketches (approx_count_distinct
    + a sketch intersection) — exact is the cross-engine-pinnable form
    the contract gates."""
    ga = ngram_hashes(a, n, id_col, toks_col).select("gram_hash").distinct()
    gb = ngram_hashes(b, n, id_col, toks_col).select("gram_hash").distinct()
    ca = ga.agg(F.count(F.lit(1)).alias("n_grams_a"))
    cb = gb.agg(F.count(F.lit(1)).alias("n_grams_b"))
    cc = ga.join(gb, "gram_hash", "left_semi").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    rep = ca.crossJoin(cb).crossJoin(cc)
    n_union = (F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_common"))
    return rep.select(
        "n_grams_a", "n_grams_b", "n_common",
        n_union.alias("n_union"),
        F.round(
            F.col("n_common").cast("double") / n_union.cast("double"), 6
        ).alias("jaccard"),
        F.round(
            F.col("n_common").cast("double") / F.col("n_grams_a").cast("double"), 6
        ).alias("containment_a"),
        F.round(
            F.col("n_common").cast("double") / F.col("n_grams_b").cast("double"), 6
        ).alias("containment_b"),
    )


def corpus_overlap_approx(
    a: DataFrame,
    b: DataFrame,
    n: int = 8,
    rsd: float = 0.01,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """The 100 TB form of ``corpus_overlap``: HLL++ sketches instead of
    exact distincts, intersection by inclusion-exclusion
    (|A ∩ B| = |A| + |B| - |A ∪ B|, the standard HLL-intersection
    estimator). Same report schema; every count is an
    approx_count_distinct aggregate, so the whole job is three
    partial-agg'd scans with NO distinct shuffle materializing the gram
    sets — the exact twin shuffles two full distinct gram tables, which
    at web scale is itself a multi-TB shuffle.

    ``rsd``: per-sketch relative standard deviation (default 1%);
    the intersection inherits roughly the union's absolute error, so
    Jaccard estimates degrade for very small overlaps — use the exact
    twin when |A ∩ B| ≪ rsd * |A ∪ B| matters (tests pin the error
    envelope on a known-overlap corpus)."""
    ga = ngram_hashes(a, n, id_col, toks_col).select("gram_hash")
    gb = ngram_hashes(b, n, id_col, toks_col).select("gram_hash")
    ca = ga.agg(F.approx_count_distinct("gram_hash", rsd).alias("n_grams_a"))
    cb = gb.agg(F.approx_count_distinct("gram_hash", rsd).alias("n_grams_b"))
    cu = ga.unionByName(gb).agg(
        F.approx_count_distinct("gram_hash", rsd).alias("n_union")
    )
    rep = ca.crossJoin(cb).crossJoin(cu)
    common = F.greatest(
        F.lit(0).cast("long"),
        (F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_union")),
    )
    return rep.select(
        "n_grams_a", "n_grams_b",
        common.alias("n_common"), "n_union",
        F.round(common.cast("double") / F.col("n_union").cast("double"), 6).alias(
            "jaccard"
        ),
        F.round(common.cast("double") / F.col("n_grams_a").cast("double"), 6).alias(
            "containment_a"
        ),
        F.round(common.cast("double") / F.col("n_grams_b").cast("double"), 6).alias(
            "containment_b"
        ),
    )

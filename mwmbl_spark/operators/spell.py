"""Query spell correction via deletion-variant indexing (SymSpell
family, Garbe 2012 — public algorithm).

The reference's only typo tolerance is prefix completion
(/root/reference/mwmbl/tinysearchengine/completer.py:24-35); real
fulltext serving also wants "did you mean" for out-of-vocabulary query
terms. The SymSpell idea distributes perfectly: index every vocabulary
term under its 1-character-deletion variants (plus itself), do the
same to the query term, and join on the variant key — every pair
within edit distance 1 (and most within 2) collides on >= 1 variant.
Candidates are then verified with an exact ``levenshtein`` <= max_edit
filter (both Spark and DuckDB ship the same function, so the contract
is value-gated end-to-end) and ranked by document frequency.

Scale shape: the variant index is ~(1 + avg_term_len) rows per
vocabulary term — vocabulary grain times a small constant, ONE shuffle
on the variant key (in production: a persisted table rebuilt with the
term stats). Query-side variants are tiny and broadcast. No pairwise
vocabulary comparison ever happens; the edit-distance UDF-free verify
runs only on colliding pairs. ``max_term_len`` guards the pathological
mega-token (a 10k-char blob would emit 10k variants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.bm25 import query_terms

MAX_TERM_LEN = 32


def deletion_variants(col: Column) -> Column:
    """The term plus every string formed by deleting ONE character —
    the SymSpell max_edit=1 key set, distinct. Guarded for the empty
    string: sequence(1, 0) DESCENDS in Spark and would fabricate bogus
    variants (same trap ngrams_expr / phrase_positions guard against)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1), col.substr(i + 1, F.length(col))
        ),
    )
    return F.when(
        F.length(col) > 0, F.array_distinct(F.concat(F.array(col), dels))
    ).otherwise(F.array(col))


def spell_index(stats: DataFrame, max_term_len: int = MAX_TERM_LEN) -> DataFrame:
    """(variant, term, df) — the persisted deletion-variant index over
    the vocabulary (term_stats). Terms longer than ``max_term_len``
    are skipped whole (they're junk tokens, and their variant fan-out
    is O(len))."""
    vocab = stats.select("term", "df").where(
        F.length("term") <= max_term_len
    )
    return vocab.select(
        F.explode(deletion_variants(F.col("term"))).alias("variant"),
        "term",
        "df",
    )


def spell_corrections(
    queries: DataFrame,
    stats: DataFrame,
    n: int = 3,
    max_edit: int = 1,
    index: DataFrame | None = None,
    max_term_len: int = MAX_TERM_LEN,
) -> DataFrame:
    """Top-``n`` correction candidates per query term:
    (query_id, qterm, suggestion, df, distance, rank).

    Only OOV-ish suggestions: the identical term is excluded (an
    in-vocabulary term 'corrects' to itself — nothing to suggest), and
    a term's suggestions are ranked (df desc, suggestion asc), the
    standard most-common-wins rule. ``index`` accepts a pre-built
    ``spell_index`` table (rebuild it when term stats refresh)."""
    idx = index if index is not None else spell_index(stats, max_term_len)
    qt = query_terms(queries).select("query_id", F.col("term").alias("qterm")).distinct()
    qvars = qt.select(
        "query_id",
        "qterm",
        F.explode(deletion_variants(F.col("qterm"))).alias("variant"),
    )
    cand = (
        idx.join(F.broadcast(qvars), "variant")
        .select("query_id", "qterm", F.col("term").alias("suggestion"), "df")
        .distinct()
        .where(F.col("suggestion") != F.col("qterm"))
        .withColumn("distance", F.levenshtein("qterm", "suggestion"))
        .where(F.col("distance") <= max_edit)
    )
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.desc("df"), F.asc("suggestion")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("query_id", "qterm", "suggestion", "df", "distance", "rank")
    )


def segment_compound(
    queries: DataFrame,
    stats: DataFrame,
    n: int = 1,
    max_term_len: int = MAX_TERM_LEN,
) -> DataFrame:
    """Compound-word segmentation for OOV query terms (the SymSpell
    WordSegmentation idea, two-word case): "sparkdata" -> "spark
    data". Every interior split position of an out-of-vocabulary
    query term is tried; a split survives if BOTH halves are
    vocabulary terms, ranked by joint document frequency
    (df_left * df_right desc, then split_pos asc — the
    most-common-decomposition-wins rule). Returns (query_id, qterm,
    split_pos, left_term, right_term, df_left, df_right, rank).

    Scale shape: OOV terms x (len-1) split rows are query-grain and
    broadcast into TWO vocabulary-grain joins (left half, then right
    half against the colliding subset) — no vocabulary self-join, no
    pairwise compare, same envelope as spell_corrections. In-vocab
    terms are excluded up front (left_anti against the vocabulary):
    a dictionary word needs no segmentation."""
    # OOV-ness is judged against the UNFILTERED vocabulary (ADVICE r6:
    # an in-vocabulary term longer than max_term_len must not count as
    # OOV and get split); the length filter applies only to the
    # split-half joins — matching segmented_query_meta's definition
    vocab = stats.select("term", "df").where(F.length("term") <= max_term_len)
    qt = (
        query_terms(queries)
        .select("query_id", F.col("term").alias("qterm"))
        .distinct()
    )
    oov = qt.join(
        stats.select(F.col("term").alias("qterm")), "qterm", "left_anti"
    )
    return segment_terms(oov, vocab, n)


def segment_terms(oov_terms: DataFrame, vocab: DataFrame, n: int = 1) -> DataFrame:
    """Segmentation core over pre-filtered OOV terms: ``oov_terms``
    (query_id, qterm) x ``vocab`` (term, df) -> ranked valid splits
    (query_id, qterm, split_pos, left_term, right_term, df_left,
    df_right, rank). Shared by ``segment_compound`` (the standalone
    operator) and the search plan's segment_oov rewriting."""
    splits = (
        oov_terms.where(F.length("qterm") >= 2)
        .select(
            "query_id",
            "qterm",
            F.explode(
                F.sequence(F.lit(1), F.length("qterm") - 1)
            ).alias("split_pos"),
        )
        .select(
            "query_id",
            "qterm",
            "split_pos",
            F.expr("substr(qterm, 1, split_pos)").alias("left_term"),
            F.expr("substr(qterm, split_pos + 1)").alias("right_term"),
        )
    )
    half1 = vocab.select(
        F.col("term").alias("left_term"), F.col("df").alias("df_left")
    ).join(F.broadcast(splits), "left_term")
    cand = vocab.select(
        F.col("term").alias("right_term"), F.col("df").alias("df_right")
    ).join(F.broadcast(half1), "right_term")
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.desc(F.col("df_left") * F.col("df_right")), F.asc("split_pos")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select(
            "query_id", "qterm", "split_pos", "left_term", "right_term",
            "df_left", "df_right", "rank",
        )
    )

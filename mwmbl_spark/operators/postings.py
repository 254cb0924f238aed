"""Posting-list construction (the index build's logical core).

Reference behavior being reproduced: documents are tokenized and every
index term emits a posting under page ``hash(term) % N``
(/root/reference/mwmbl/indexer/index_batches.py:204-222,
tinysearchengine/indexer.py:219-221). Here the posting relation is the
explicit table

    postings(term, doc_id, tf)          -- one row per (term, doc)
    doc_lengths(doc_id, doc_len)
    term_stats(term, df, cf)            -- document/collection frequency

built declaratively: tokenize (JVM expressions) -> explode -> two-level
aggregate. Catalyst gives map-side partial aggregation for the
``groupBy`` (no shuffle of raw token rows beyond the hash partition),
and the scan only reads (id, text) columns.

Skew note (100 TB): ``groupBy(term, doc_id)`` keys are near-unique, so
the hot-term Zipf head does NOT skew this shuffle. Skew appears in
``term_stats`` and in segment grouping (groupBy(term)); those use
two-phase salted aggregation — see ``term_stats`` below and
segments.build_segments.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr

SALT_BUCKETS = 64  # salt fan-out for hot-key aggregations


def tokenized(transcripts: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens, doc_len) — pure column expressions, codegen'd."""
    return transcripts.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(F.col(text_col)).alias("tokens"),
    ).withColumn("doc_len", F.size("tokens"))


def build_postings(transcripts: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """postings(term, doc_id, tf): explode tokens -> count per (term, doc).

    The explode happens map-side; partial aggregation combines duplicate
    (term, doc_id) pairs before the shuffle, so shuffle volume is bounded
    by distinct (term, doc) pairs, not raw token count.
    """
    toks = tokenized(transcripts, text_col, id_col)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_postings_with_len(
    transcripts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_empty_docs: bool = False,
    positions: bool = False,
) -> DataFrame:
    """postings carrying doc_len: (term, doc_id, tf, doc_len) in ONE
    tokenize pass. The build path uses this shape — it removes both the
    second tokenize traversal (doc_lengths) and the postings⋈doc_lengths
    shuffle join from the segment build.

    ``include_empty_docs=False`` (default): zero-token docs are absent
    (they can match nothing); corpus stats must count them separately.
    ``True``: ``explode_outer`` keeps one ``term IS NULL`` marker row
    per zero-token/null-text doc (doc_len clamped to 0), so the ONE
    relation also yields the exact doc_index sidecar
    (``select(doc_id, doc_len).distinct()``) with no second source scan
    and no anti-join — posting consumers must filter
    ``term IS NOT NULL``.

    ``positions=True`` (round-6, the positional index build): adds each
    (term, doc)'s sorted 1-based occurrence positions as ``positions
    array<int>`` in the same single pass (posexplode instead of explode;
    ``tf`` is derived as size(positions), identical to the count
    aggregate by construction — marker rows get tf=0/[], filtered out
    before any posting consumer sees them). Shuffle volume grows by one
    int per token occurrence; everything else is unchanged.
    """
    toks = tokenized(transcripts, text_col, id_col)
    if positions:
        pexplode = F.posexplode_outer if include_empty_docs else F.posexplode
        sel = toks.select(
            "doc_id",
            F.greatest(F.col("doc_len"), F.lit(0)).alias("doc_len"),
            pexplode("tokens").alias("p", "term"),
        )
        return (
            sel.groupBy("term", "doc_id", "doc_len")
            .agg(
                F.sort_array(F.collect_list(F.col("p") + 1)).alias("positions")
            )
            .select(
                "term",
                "doc_id",
                "doc_len",
                F.size("positions").cast("long").alias("tf"),
                "positions",
            )
        )
    explode = F.explode_outer if include_empty_docs else F.explode
    sel = toks.select(
        "doc_id",
        F.greatest(F.col("doc_len"), F.lit(0)).alias("doc_len"),
        explode("tokens").alias("term"),
    )
    return sel.groupBy("term", "doc_id", "doc_len").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doc_lengths(transcripts: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return tokenized(transcripts, text_col, id_col).select("doc_id", "doc_len")


def term_stats(postings: DataFrame) -> DataFrame:
    """term_stats(term, df, cf) — two-phase (salted) aggregation.

    A single ``groupBy(term).count()`` over a Zipf corpus concentrates
    the head terms' rows onto single reducers. Because count/sum are
    algebraic we pre-aggregate on (term, salt) then combine — the classic
    partial-agg salting pattern; AQE's skew handling is the backstop.
    The reference's analogue is the full-index DF scan in
    /root/reference/analyse/tfidf.py:18-34.
    """
    salted = postings.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("term", "_salt").agg(
        F.count(F.lit(1)).alias("pdf"), F.sum("tf").alias("pcf")
    )
    return partial.groupBy("term").agg(
        F.sum("pdf").alias("df"), F.sum("pcf").alias("cf")
    )


@dataclass
class CorpusStats:
    n_docs: int
    avg_doc_len: float


def corpus_stats(doc_lens: DataFrame) -> CorpusStats:
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avg")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avg_doc_len=float(row["avg"] or 0.0))

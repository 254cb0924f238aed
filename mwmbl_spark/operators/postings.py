"""Posting-list construction (the index build's logical core).

Reference behavior being reproduced: documents are tokenized and every
index term emits a posting under page ``hash(term) % N``
(/root/reference/mwmbl/indexer/index_batches.py:204-222,
tinysearchengine/indexer.py:219-221). Here the posting relation is the
explicit table

    postings(term, doc_id, tf)          -- one row per (term, doc)
    doc_lengths(doc_id, doc_len)
    term_stats(term, df, cf)            -- document/collection frequency

built SHUFFLE-FREE (r7): tokenize (JVM expressions) -> per-row
sorted-run counting (each equal run of the sorted token array is one
posting; its length is the tf, its member indices are the positions)
-> narrow explode. Per-(term, doc) statistics are functions of the
document's own token array, so no corpus-wide exchange exists in this
module at all; the scan only reads (id, text) columns.

Skew note (100 TB): with no shuffle here, the hot-term Zipf head first
meets an exchange in ``term_stats`` and in segment clustering; those
use two-phase salted aggregation / salt-split grouping — see
``term_stats`` below and segments.build_segments.
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
    """postings(term, doc_id, tf) — SHUFFLE-FREE (r7).

    Per-(term, doc) counts are a function of the document's own token
    array, so the former explode -> groupBy(term, doc_id) — a full
    corpus-wide exchange of distinct (term, doc) pairs — is replaced by
    a per-row sorted-run expression (sort the tokens, each equal run is
    one posting with tf = run length) followed by a narrow explode.
    Zero exchanges at any corpus size; identical rows by construction.
    Assumes one row per doc_id (the same precondition doc_lengths
    already carries — a duplicated doc_id would previously have merged
    counts across rows here while doc_lengths double-counted it).
    """
    toks = tokenized(transcripts, text_col, id_col)
    pairs = _bind(
        F.array_sort(F.col("tokens")),
        lambda s: _run_slices(
            s,
            lambda st, en: F.struct(
                F.element_at(s, st).alias("term"),
                (en - st).cast("long").alias("tf"),
            ),
        ),
    )
    return toks.select("doc_id", F.explode(pairs).alias("pr")).select(
        F.col("pr.term").alias("term"), "doc_id", F.col("pr.tf").alias("tf")
    )


def _bind(value, fn):
    """Evaluate ``value`` ONCE and hand it to ``fn`` as a higher-order
    lambda variable (the transform-over-singleton idiom): interpreted
    HOF expressions re-evaluate every textual occurrence of a subtree,
    so naming it is the expression-level equivalent of CSE."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def _run_slices(sorted_arr, make):
    """One struct per EQUAL-RUN of a sorted array: ``make(start, end)``
    is called with the run's 1-based start and exclusive end. Empty
    arrays yield an empty result (guarded — ``sequence(1, 0)`` would
    otherwise DESCEND, the ngrams_expr trap)."""
    return _bind(
        sorted_arr,
        lambda s: _bind(
            F.when(
                F.size(s) > 0,
                F.filter(
                    F.sequence(F.lit(1), F.size(s)),
                    lambda i: (i == F.lit(1))
                    | (F.element_at(s, i) != F.element_at(s, i - 1)),
                ),
            ).otherwise(F.array().cast("array<int>")),
            lambda starts: F.zip_with(
                starts,
                # guarded: zip_with PADS a shorter side with nulls, so
                # the ends array must be [] (not [size+1]) when there
                # are no runs at all
                F.when(
                    F.size(starts) > 0,
                    F.concat(
                        F.slice(starts, 2, F.size(starts)),
                        F.array(F.size(s) + 1),
                    ),
                ).otherwise(F.array().cast("array<int>")),
                make,
            ),
        ),
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
    explode = F.explode_outer if include_empty_docs else F.explode
    if positions:
        # the POSITIONAL mode keeps the posexplode+groupBy aggregation
        # form (r7, measured both ways at sf0.1 AND 10x sf): a per-row
        # sorted-run fold is value-identical but pays its interpreted
        # position-payload cost for EVERY term before any downstream
        # term/bucket restriction can apply, while a filter pushes
        # BELOW this aggregation into the explode — the composed
        # phrase-serving plans that restrict to the phrase terms'
        # buckets measured 2.3x faster with the aggregation form at
        # 10x sf (full-relation evaluation is a wash between the two).
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
    pairs = _bind(
        F.array_sort(F.col("tokens")),
        lambda s: _run_slices(
            s,
            lambda st, en: F.struct(
                F.element_at(s, st).alias("term"),
                (en - st).cast("long").alias("tf"),
            ),
        ),
    )
    sel = toks.select(
        "doc_id",
        F.greatest(F.col("doc_len"), F.lit(0)).alias("doc_len"),
        explode(pairs).alias("pr"),
    )
    return sel.select(
        F.col("pr.term").alias("term"),
        "doc_id",
        "doc_len",
        F.coalesce(F.col("pr.tf"), F.lit(1)).cast("long").alias("tf"),
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

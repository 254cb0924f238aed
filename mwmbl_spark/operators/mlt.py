"""More-like-this: document-seeded retrieval.

Lucene's MoreLikeThis (the find-similar-documents query every search
UI grows): a source document's most characteristic terms — top
``top_terms`` by tf·idf, idf = ln(N/df), ties by term asc — become a
disjunctive BM25 query over the corpus, the source doc itself excluded.
The reference has no document-seeded retrieval (its query path starts
from user text, /root/reference/mwmbl/tinysearchengine/search.py);
this composes the engine's existing postings/stats/BM25 algebra — the
only new piece is the term-extraction join.

Scale shape: term extraction is a semi-join of the (small, broadcast)
source-id set against the posting relation — it reads only the source
docs' posting rows, never re-tokenizes — followed by one
WindowGroupLimit-eligible top-N window at source grain. Scoring is the
same broadcast-join + partial-agg plan as ``bm25_scores``: the
extracted (src, term) table is tiny (sources × top_terms) and
broadcasts; cost tracks the selected terms' posting lists. tf·idf
selection naturally favors RARE terms (high idf), so the selected
posting lists are short — MLT is cheaper than a user query of equal
term count, not dearer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark import BM25_B, BM25_K1
from mwmbl_spark.operators.bm25 import bm25_partial

__all__ = ["mlt_terms", "more_like_this", "more_like_this_wand"]


def mlt_terms(
    sources: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    n_docs: int,
    top_terms: int = 5,
) -> DataFrame:
    """(src_doc_id, term): each source doc's ``top_terms`` terms by
    tf·idf (idf = ln(N/df); ties tfidf desc, term asc — the
    deterministic order the SQL oracle restates)."""
    src_posts = postings.join(
        F.broadcast(sources.select(F.col("src_doc_id").alias("doc_id"))),
        "doc_id",
    ).select(F.col("doc_id").alias("src_doc_id"), "term", "tf")
    scored = src_posts.join(
        F.broadcast(stats.select("term", "df")), "term"
    ).withColumn(
        "tfidf",
        F.col("tf").cast("double")
        * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
    )
    w = Window.partitionBy("src_doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_terms)
        .select("src_doc_id", "term")
    )


def more_like_this(
    sources: DataFrame,
    postings: DataFrame,
    doc_lens: DataFrame,
    stats: DataFrame,
    n_docs: int,
    avg_len: float,
    top_terms: int = 5,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k similar docs per source -> (src_doc_id, doc_id, score,
    rank). Disjunctive BM25 over the extracted terms; the source doc
    never appears in its own results; ties break by doc_id asc."""
    qt = mlt_terms(sources, postings, stats, n_docs, top_terms)
    cand = (
        postings.join(F.broadcast(qt), "term")
        .where(F.col("doc_id") != F.col("src_doc_id"))
        .join(F.broadcast(stats.select("term", "df")), "term")
        .join(doc_lens, "doc_id")
        .withColumn(
            "partial",
            bm25_partial(
                F.col("tf"), F.col("df"), F.col("doc_len"),
                n_docs, avg_len, k1, b,
            ),
        )
    )
    scored = cand.groupBy("src_doc_id", "doc_id").agg(
        F.sum("partial").alias("score")
    )
    w = Window.partitionBy("src_doc_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src_doc_id", "doc_id", "score", "rank")
    )


def more_like_this_wand(
    sources: DataFrame,
    segments: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    n_docs: int,
    avg_len: float,
    top_terms: int = 5,
    k: int = 10,
    num_buckets: int | None = None,
    deletes=None,
    doc_filter=None,
) -> DataFrame:
    """More-like-this served FROM THE INDEX: the extracted terms ride
    the WAND segment path (bucket-pruned scan, block-max pruning) —
    the 100×-scale serving form of ``more_like_this``, which reads the
    raw posting relation. Same output contract (src_doc_id, doc_id,
    score, rank), rank-identical modulo exact-float-tie doc swaps (the
    kernel sums canonically, the exhaustive plan hash-aggregates).

    The extracted terms re-encode as one query string per source
    (space-joined sorted terms — each term is a tokenizer atom, so
    tokenization round-trips exactly). The kernel retrieves k+1 and
    the source doc is dropped before the final re-rank, since a source
    doc contains every one of its own top terms and would rank first.
    ``postings`` is only read at source grain (term extraction);
    serving touches just the selected terms' buckets.
    """
    from mwmbl_spark.operators.wand import wand_topk

    qt = mlt_terms(sources, postings, stats, n_docs, top_terms)
    qdf = qt.groupBy(F.col("src_doc_id").alias("query_id")).agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("term"))).alias("query")
    )
    raw = wand_topk(
        segments, stats, qdf, n_docs, avg_len, k=k + 1,
        num_buckets=num_buckets, deletes=deletes, doc_filter=doc_filter,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        raw.where(F.col("doc_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("src_doc_id"), "doc_id", "score", "rank"
        )
    )

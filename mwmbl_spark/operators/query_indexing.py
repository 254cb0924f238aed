"""Query-driven indexing (reference index_results_against_query,
/root/reference/mwmbl/indexer/index_batches.py:96-148).

Index documents against exactly the query terms they match: a query
expands to its unigrams plus bigrams; a term matches a document when
ALL of the term's words appear in the document's unigram token set
(title + prepared-url + extract — no bigrams in the doc-side set,
_document_token_set, index_batches.py:95-103). Matching (term, doc)
pairs flow into the normal page-merge path; the return value counts
distinct URLs that are NEW for their term (computed pre-merge, so it is
a slight upper bound — the reference documents the same quirk).

Spark shape: the query-term table is tiny (broadcast); the doc side is
one tokenize pass; "all words present" is a subset test
``size(array_except(words, doc_tokens)) == 0``; newness is a left_anti
join against the existing (term, url) postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import (
    get_bigrams_py,
    prepare_url_expr,
    tokenize_expr,
    tokenize_py,
)


def query_term_words(query: str) -> list[tuple[str, list[str]]]:
    """term -> words that must all be present (unigrams + all bigrams)
    [index_batches.py:118-123]."""
    tokens = tokenize_py(query)
    out: list[tuple[str, list[str]]] = [(t, [t]) for t in tokens]
    for bg in get_bigrams_py(len(tokens), tokens):
        out.append((bg, bg.split()))
    return out


def doc_token_set_expr(title, url, extract):
    """Unigram token set over title/url/extract (no bigrams)
    [index_batches.py:95-103]."""
    return F.array_union(
        tokenize_expr(title),
        F.array_union(
            tokenize_expr(prepare_url_expr(url)), tokenize_expr(extract)
        ),
    )


def match_documents_against_query(
    spark: SparkSession, docs: DataFrame, query: str
) -> DataFrame:
    """(term, url, title, extract, last_crawled) for every query term
    whose words are all present in the doc's token set. Docs without
    url or title are skipped [index_batches.py:126-128]."""
    terms = query_term_words(query)
    if not terms:
        return spark.createDataFrame(
            [], "term string, url string, title string, extract string, last_crawled long"
        )
    terms_df = spark.createDataFrame(terms, "term string, words array<string>")
    tokened = docs.where(
        F.col("url").isNotNull() & F.col("title").isNotNull()
    ).withColumn(
        "_doc_tokens",
        doc_token_set_expr(F.col("title"), F.col("url"), F.col("extract")),
    )
    matched = tokened.join(
        F.broadcast(terms_df),
        F.size(F.array_except(F.col("words"), F.col("_doc_tokens"))) == 0,
    )
    return matched.select("term", "url", "title", "extract", "last_crawled")


def count_new_urls(matched: DataFrame, existing_postings: DataFrame) -> int:
    """Distinct URLs whose (term, url) pair is not already indexed
    [index_batches.py:135-143] — left_anti join."""
    new = matched.select("term", "url").join(
        existing_postings.select("term", "url").distinct(),
        ["term", "url"],
        "left_anti",
    )
    return new.select("url").distinct().count()


def index_against_query(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    existing_page_docs: DataFrame,
    num_pages: int = 64,
) -> tuple[DataFrame, int]:
    """Full flow: match -> count new -> merge into pages via the normal
    combine path (index_merge.merge_pages). Returns (merged pages DF,
    n_new_urls)."""
    from mwmbl_spark.operators.index_merge import DOC_COLS, merge_pages

    matched = match_documents_against_query(spark, docs, query)
    existing_postings = existing_page_docs.select("term", "url")
    n_new = count_new_urls(matched, existing_postings)
    new_docs = matched.select(
        F.pmod(F.xxhash64("term"), F.lit(num_pages)).alias("page"),
        "title",
        "url",
        "extract",
        F.lit(None).cast("double").alias("score"),
        "term",
        F.lit(None).cast("int").alias("state"),
        F.lit(None).cast("array<int>").alias("user_ids"),
        "last_crawled",
    )
    existing = existing_page_docs
    for c, t in [("page", "long"), ("score", "double"), ("state", "int"),
                 ("user_ids", "array<int>"), ("last_crawled", "long"),
                 ("extract", "string")]:
        if c not in existing.columns:
            if c == "page":
                existing = existing.withColumn(
                    "page", F.pmod(F.xxhash64("term"), F.lit(num_pages))
                )
            else:
                existing = existing.withColumn(c, F.lit(None).cast(t))
    merged = merge_pages(new_docs, existing.select("page", *DOC_COLS))
    return merged, n_new

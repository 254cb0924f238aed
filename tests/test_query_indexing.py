"""Query-driven indexing — assertions ported from the reference's
test_index_batches.py:96-148 (bigram needs both words; idempotent
re-index adds 0 new; title-only docs kept)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.query_indexing import (
    count_new_urls,
    index_against_query,
    match_documents_against_query,
    query_term_words,
)

DOC_SCHEMA = "title string, url string, extract string, last_crawled long"

DOCS = [
    ("Rust async runtime", "http://a.example/page", "an async runtime", None),
    ("Rust systems guide", "http://b.example", "low level", None),
    ("Async patterns", "http://c.example", "concurrency primitives", None),
]


def test_query_term_words():
    assert query_term_words("rust async") == [
        ("rust", ["rust"]),
        ("async", ["async"]),
        ("rust async", ["rust", "async"]),
    ]
    assert query_term_words("") == []


def test_match_semantics(spark):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    m = match_documents_against_query(spark, docs, "rust async")
    got = {(r["term"], r["url"]) for r in m.collect()}
    # unigram "rust" matches A and B; "async" matches A and C;
    # the bigram needs BOTH words -> only A
    assert got == {
        ("rust", "http://a.example/page"),
        ("rust", "http://b.example"),
        ("async", "http://a.example/page"),
        ("async", "http://c.example"),
        ("rust async", "http://a.example/page"),
    }


def test_index_against_query_idempotent(spark):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    empty = spark.createDataFrame(
        [], "page long, title string, url string, extract string, score double, "
            "term string, state int, user_ids array<int>, last_crawled long"
    )
    merged, n_new = index_against_query(spark, docs, "rust async", empty)
    assert n_new == 3  # every doc matches at least one term
    stored = merged.collect()
    urls_by_term = {}
    for r in stored:
        urls_by_term.setdefault(r["term"], set()).add(r["url"])
    assert urls_by_term["rust"] == {"http://a.example/page", "http://b.example"}
    assert urls_by_term["rust async"] == {"http://a.example/page"}

    # re-index the same docs against the now-populated index: 0 new
    merged2, n_new2 = index_against_query(spark, docs, "rust async", merged)
    assert n_new2 == 0


def test_title_only_documents_kept(spark):
    docs = spark.createDataFrame(
        [("Kitsas dictionary", "https://en.wiktionary.org/wiki/kitsas", "", None)],
        DOC_SCHEMA,
    )
    m = match_documents_against_query(spark, docs, "kitsas")
    assert {r["url"] for r in m.collect()} == {"https://en.wiktionary.org/wiki/kitsas"}

"""Sampled distinct-count estimation (count_urls.py analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def page_corpus(spark):
    """4000 pages x 8 docs; 20000 distinct urls, reused url-per-page
    assignment is deterministic."""
    return (
        spark.range(4000).withColumnRenamed("id", "page")
        .select("page", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("slot"))
        .select(
            "page",
            F.concat(
                F.lit("https://d"),
                (F.abs(F.xxhash64("page", "slot")) % 20000).cast("string"),
                F.lit(".example.com/x"),
            ).alias("url"),
        )
    )


def test_sample_is_deterministic_and_proportional(page_corpus):
    from mwmbl_spark.operators.index_stats import sample_pages

    a = sample_pages(page_corpus, 0.25, seed=1).count()
    b = sample_pages(page_corpus, 0.25, seed=1).count()
    assert a == b  # hash sampling, not RNG
    assert 0.15 * 32000 < a < 0.35 * 32000


def test_estimates_within_tolerance(page_corpus):
    from mwmbl_spark.operators.index_stats import sampled_index_stats

    row = sampled_index_stats(page_corpus, proportion=0.25).collect()[0]
    # population: 32000 docs, ~17.6k realized distinct urls
    truth_docs = 32000
    truth_distinct = page_corpus.select("url").distinct().count()
    assert abs(row["n_results_estimate"] - truth_docs) / truth_docs < 0.25
    # Chao1 is a lower-bound-style estimator; require the estimate to
    # recover well past the raw sample distinct count toward the truth
    assert row["sample_distinct"] < row["distinct_urls_estimate"]
    assert abs(row["distinct_urls_estimate"] - truth_distinct) / truth_distinct < 0.35
    assert row["f1"] > 0 and row["sample_docs"] > 0

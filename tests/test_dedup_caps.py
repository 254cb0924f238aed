"""LSH band-bucket frequency cap: a degenerate band key (boilerplate
corpus) must not make the candidate self-join quadratic, and dropping
it must not hide genuine near-dup pairs that collide on healthy bands."""

from __future__ import annotations

import pytest

from mwmbl_spark.operators.dedup import (
    band_skew_report,
    minhash_candidates,
    minhash_near_duplicates,
    simhash_near_duplicates,
)

BOILER = "this exact cookie banner boilerplate text appears on every page of the site"
NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [(i, BOILER) for i in range(50)]
    rows += [(100, NEAR_A), (101, NEAR_B), (200, "completely unrelated content xyz")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_cap_bounds_candidates_on_degenerate_corpus(boiler_docs):
    # uncapped: the 50 identical docs explode into 50*49/2 = 1225 pairs
    uncapped = minhash_candidates(boiler_docs, band_cap=None).count()
    assert uncapped >= 1225
    # capped: the boilerplate band keys (50 members > 10) are dropped
    # whole; the near-dup pair rides a 2-member bucket and survives
    capped = minhash_candidates(boiler_docs, band_cap=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert all(not (a < 50 and b < 50) for a, b in pairs)


def test_full_minhash_pipeline_with_cap(boiler_docs):
    out = minhash_near_duplicates(boiler_docs, threshold=0.5, band_cap=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert pairs == {(100, 101)}


def test_band_skew_report_shows_dropped_buckets(boiler_docs):
    from mwmbl_spark.operators.dedup import (
        minhash_signatures,
        shingle_rows,
    )
    from pyspark.sql import functions as F

    sigs = minhash_signatures(shingle_rows(boiler_docs))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[F.concat_ws("|", F.lit(str(b)), F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")) for b in range(4)])
        ).alias("band_key"),
    )
    report = band_skew_report(bands, band_cap=10).collect()
    assert len(report) == 4  # all 4 boilerplate bands are over cap
    assert all(r["n_docs"] == 50 for r in report)


def test_simhash_band_cap(boiler_docs):
    out = simhash_near_duplicates(boiler_docs, max_hamming=20, band_cap=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert all(not (a < 50 and b < 50) for a, b in pairs)
    uncapped = simhash_near_duplicates(boiler_docs, max_hamming=20, band_cap=None)
    assert uncapped.where("doc_a < 50 and doc_b < 50").count() == 1225


def test_resolve_duplicate_groups_transitive(spark):
    """a-b-c chain collapses to one component with keep_id = min; two
    disjoint components stay separate; apply_dedup keeps only canonicals."""
    from mwmbl_spark.operators.dedup import apply_dedup, resolve_duplicate_groups

    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (20, 30)], "doc_a long, doc_b long"
    )
    groups = {
        r["doc_id"]: r["keep_id"]
        for r in resolve_duplicate_groups(pairs, max_iter=8).collect()
    }
    assert groups == {2: 2, 5: 2, 9: 2, 20: 20, 30: 20}
    # exact max_iter (no early stop) gives the same fixpoint
    groups2 = {
        r["doc_id"]: r["keep_id"]
        for r in resolve_duplicate_groups(pairs, max_iter=8, converge=False).collect()
    }
    assert groups2 == groups
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 5, 9, 20, 30)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in apply_dedup(docs, resolve_duplicate_groups(pairs)).collect()
    )
    assert kept == [1, 2, 20]

"""Heuristic scorer + page-merge semantics — assertions ported from the
reference's test/test_rank.py and test/test_index_batches.py, plus
Spark-vs-Python-twin parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.heuristic import (
    get_match_features_py,
    get_query_regex_py,
    order_results_py,
    score_result_py,
)
from mwmbl_spark.operators.index_merge import (
    combine_documents_py,
    merge_pages,
    merge_user_ids_py,
    sort_documents_py,
)


def doc(title, url, extract, score=None, term=None, state=None, user_ids=None, last_crawled=None):
    return {
        "title": title, "url": url, "extract": extract, "score": score,
        "term": term, "state": state, "user_ids": user_ids, "last_crawled": last_crawled,
    }


def url_ranker(terms, docs, is_complete):
    """Reference test/test_index_batches.py UrlRanker twin."""
    return sorted(docs, key=lambda d: d["url"])


# --- reference test_rank.py:5-17 -------------------------------------------

def test_order_result_term_match_outranks_score():
    d1 = doc("title2", "https://something.com", "extract2", score=2.0)
    d2 = doc("title3", "https://something.com", "extract3", score=3.0)
    d3 = doc("Bananas and apples", "https://something.com", "extract1", score=1.0)
    ordered = order_results_py(["bananas"], [d1, d2, d3], True)
    assert ordered[0]["title"] == "Bananas and apples"


# --- query regex (format.py:59-70) ------------------------------------------

def test_query_regex_complete_vs_incomplete():
    assert get_query_regex_py(["foo", "bar"], True, True) == r"\bfoo\b|\bbar\b"
    assert get_query_regex_py(["foo", "bar"], False, True) == r"\bfoo\b|\bbar"
    assert get_query_regex_py([], True, True) == ""


def test_match_features_distinct_counting():
    # "x x y": distinct matches counted once; last_match_char is end of
    # last NEW distinct match
    lmc, ml, tp, mt, counts = get_match_features_py(
        ["x", "y"], "x x y", True, False
    )
    assert mt == 2
    assert ml == 2  # 'x' once + 'y' once
    assert lmc == 5  # end offset of 'y'
    assert counts == {"x": 2, "y": 1}


def test_split_kernel_equals_finditer_twin():
    """The re.split fast kernel must be feature-identical to the literal
    finditer port of rank.py:182-201 — fuzzed over case variants,
    unicode (incl. Greek final sigma and the tokenizer's ellipsis),
    adjacent/overlapping-ish matches and both completeness/url modes."""
    import random

    from mwmbl_spark.operators.heuristic import get_match_features_finditer_py

    rng = random.Random(7)
    alphabet = [
        "spark", "Spark", "SPARK", "data", "sp", "ark", "σπα", "Σπα", "ς",
        "…", "a-b", "x", " ", ".", "/", "dataspark", "sparkdata",
    ]
    term_pool = ["spark", "data", "sp", "σπα", "a-b", "query", "x"]
    for _ in range(400):
        terms = rng.sample(term_pool, rng.randint(1, 4))
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        for is_complete in (True, False):
            for is_url in (True, False):
                a = get_match_features_py(terms, s, is_complete, is_url)
                b = get_match_features_finditer_py(terms, s, is_complete, is_url)
                assert (a[0], a[1], a[2], a[3], dict(a[4])) == (
                    b[0], b[1], b[2], b[3], dict(b[4]),
                ), (terms, s, is_complete, is_url)


def test_score_zero_when_minority_terms_match():
    s = score_result_py(["alpha", "beta", "gamma"], "alpha only", "https://x.com", "", None, None, True)
    assert s == 0.0  # 1 of 3 matched <= 3/2


def test_curated_state_bypasses_majority_filter():
    s = score_result_py(
        ["alpha", "beta", "gamma"], "alpha only", "https://x.com", "", None, 7, True
    )
    assert s > 0.0


# --- reference test_index_batches.py ----------------------------------------

def test_sort_documents():
    existing = [
        doc("title1", "1", "extract1", term="term1"),
        doc("title2", "4", "extract2", term="term2"),
        doc("title3", "6", "extract3", term="term3"),
        doc("title4", "5", "extract4", term="term3"),
    ]
    new = [
        doc("title5", "2", "extract5", term="term1"),
        doc("title6", "3", "extract6", term="term2"),
    ]
    out = sort_documents_py(new, existing, url_ranker)
    assert [d["url"] for d in out] == ["1", "3", "6", "2", "4", "5"]


def test_sort_documents_curated_items_first():
    existing = [
        doc("title1", "1", "extract1", term="term1"),
        doc("title2", "4", "extract2", term="term2"),
        doc("title3", "6", "extract3", term="term1", state=7),
        doc("title4", "5", "extract4", term="term2", state=7),
    ]
    new = [
        doc("title5", "2", "extract5", term="term1"),
        doc("title6", "3", "extract6", term="term2"),
    ]
    out = sort_documents_py(new, existing, url_ranker)
    assert [d["url"] for d in out] == ["6", "5", "1", "3", "2", "4"]


def test_combine_documents_duplicates_keep_synced_state():
    # ported with the reference test's (swapped) argument order:
    # the SYNCED twin arrives as the "new" docs side
    existing = [doc("title1", "1", "extract1", term="term1")]
    new = [doc("title1", "1", "extract1", term="term1", state=-2)]
    out = combine_documents_py(existing, new, mark_synced=False, ranker=url_ranker)
    assert len(out) == 1 and out[0]["state"] == -2


def test_merge_user_ids():
    assert merge_user_ids_py(None, [1]) == [1]
    assert merge_user_ids_py([1], [2]) == [1, 2]
    assert merge_user_ids_py([1, 2], [1]) == [2, 1]  # move-to-end
    assert merge_user_ids_py([1, 2], [3]) == [2, 3]  # capped at 2
    assert merge_user_ids_py(None, None) is None


def test_combine_documents_merges_user_ids_for_same_url():
    existing = [doc("t", "http://a.com", "e", term="q", user_ids=[1])]
    new = [doc("t", "http://a.com", "e", term="q", user_ids=[2])]
    out = combine_documents_py(existing, new, ranker=url_ranker)
    assert len(out) == 1 and set(out[0]["user_ids"]) == {1, 2}


def test_combine_documents_uses_max_last_crawled():
    existing = [doc("t", "http://a.com", "e", term="q", last_crawled=1000)]
    new = [doc("t", "http://a.com", "e", term="q", last_crawled=2000)]
    out = combine_documents_py(existing, new, ranker=url_ranker)
    assert out[0]["last_crawled"] == 2000


def test_combine_documents_propagates_user_ids_to_winner():
    existing = [doc("old", "http://a.com", "e1", term="q", user_ids=[1])]
    new = [doc("new", "http://a.com", "e2", term="q", user_ids=[2])]
    out = combine_documents_py(existing, new, ranker=url_ranker)
    assert len(out) == 1
    assert 1 in out[0]["user_ids"] and 2 in out[0]["user_ids"]


# --- Spark merge_pages parity ------------------------------------------------

@pytest.fixture()
def page_dfs(spark):
    schema = (
        "page long, title string, url string, extract string, score double, "
        "term string, state int, user_ids array<int>, last_crawled long"
    )
    existing = spark.createDataFrame(
        [
            (0, "title1", "https://one.com/banana", "bananas here", None, "banana", None, [1], 1000),
            (0, "curated", "https://cur.com", "bananas galore", None, "banana", 7, None, None),
            (1, "other", "https://two.com", "apples", None, "apple", None, None, None),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (0, "title1", "https://one.com/banana", "bananas here", None, "banana", None, [2], 2000),
            (0, "fresh", "https://three.com/bananas", "all about bananas", None, "banana", None, None, None),
        ],
        schema,
    )
    return existing, new


def test_merge_pages_matches_python_twin(spark, page_dfs):
    existing, new = page_dfs
    out = merge_pages(new, existing).orderBy("page", "position").collect()

    def rows_to_docs(df, page):
        return [
            {k: r[k] for k in ["title", "url", "extract", "score", "term", "state", "user_ids", "last_crawled"]}
            for r in df.collect()
            if r["page"] == page
        ]

    for page in [0, 1]:
        want = combine_documents_py(rows_to_docs(existing, page), rows_to_docs(new, page))
        got = [r for r in out if r["page"] == page]
        assert [r["url"] for r in got] == [d["url"] for d in want], f"page {page}"
        assert [r["position"] for r in got] == list(range(len(want)))
        for g, w in zip(got, want):
            assert (g["user_ids"] or None) == (w["user_ids"] or None)
            assert g["last_crawled"] == w["last_crawled"]
    # curated doc pinned first on page 0
    page0 = [r for r in out if r["page"] == 0]
    assert page0[0]["title"] == "curated"


def test_score_heuristic_spark_matches_python(spark):
    from mwmbl_spark.operators.heuristic import score_heuristic

    rows = [
        (["bananas"], "Bananas and apples", "https://something.com/fruit", "extract1", 1.0, None),
        (["bananas"], "title2", "https://something.com", "extract2", 2.0, None),
        (["alpha", "beta"], "alpha beta gamma", "https://x.com/alpha", "beta text", None, 7),
        (["alpha", "beta"], "nothing here", "https://y.com", "", None, None),
    ]
    schema = "terms array<string>, title string, url string, extract string, score double, state int"
    df = spark.createDataFrame(rows, schema)
    dscores = {"something.com": 5.0, "x.com": 1.0}
    got = score_heuristic(df, domain_scores=dscores).collect()
    for r in got:
        want = score_result_py(
            list(r["terms"]), r["title"], r["url"], r["extract"], r["score"],
            r["state"], True, dscores,
        )
        assert abs(r["heuristic_score"] - want) < 1e-12, r


def test_merge_pages_remerge_is_order_deterministic(spark, page_dfs):
    """Re-merging a previously merged page consumes existing docs in
    stored ``position`` order (reference pages are read back in stored
    order), so merge -> re-merge is reproducible under any shuffle."""
    existing, new = page_dfs
    first = merge_pages(new, existing)
    empty_new = spark.createDataFrame(
        [],
        "page long, title string, url string, extract string, score double, "
        "term string, state int, user_ids array<int>, last_crawled long",
    )
    # shuffle the merged rows' order; position must drive consumption
    shuffled = first.orderBy(F.rand(42))
    got = sorted(
        (r["page"], r["position"], r["url"])
        for r in merge_pages(empty_new, shuffled).collect()
    )
    # re-merge keeps exactly the same docs per page (re-rank may reorder)
    def by_page(rows):
        out: dict[int, set[str]] = {}
        for page, _, url in rows:
            out.setdefault(page, set()).add(url)
        return out

    want = sorted((r["page"], r["position"], r["url"]) for r in first.collect())
    assert by_page(got) == by_page(want)
    # and the re-merge is exactly reproducible under a different shuffle
    reshuffled = first.orderBy(F.rand(7))
    got2 = sorted(
        (r["page"], r["position"], r["url"])
        for r in merge_pages(empty_new, reshuffled).collect()
    )
    assert got2 == got


def test_merge_pages_page_cap(spark, page_dfs):
    existing, new = page_dfs
    capped = merge_pages(new, existing, page_cap=2).collect()
    by_page = {}
    for r in capped:
        by_page.setdefault(r["page"], []).append(r["position"])
    for page, positions in by_page.items():
        assert len(positions) <= 2
        assert sorted(positions) == list(range(len(positions)))
    # the cap keeps the best-first prefix: curated doc survives on page 0
    page0 = [r for r in capped if r["page"] == 0]
    assert any(r["title"] == "curated" for r in page0)


def test_score_result_whole_no_majority_filter():
    """rank.py:56-74: whole-field promotion score has NO majority-terms
    zero filter — a 1-of-3-terms match still scores > 0."""
    from mwmbl_spark.operators.heuristic import score_result_whole_py

    s = score_result_whole_py(
        ["alpha", "beta", "gamma"], "alpha only", "https://x.com", "", None, True
    )
    assert s > 0.0
    assert score_result_whole_py(["a"], "t", "", "e", None, True) == 0.0  # no url

"""Curation write path (views.py:227-418 semantics): state toggle,
approved-doc insertion, and the distributed page rewrite."""

from __future__ import annotations

import hashlib

import pytest

from mwmbl_spark.operators.curation import (
    MAX_CURATED_SCORE,
    apply_curation,
    insert_approved_py,
    switch_state_py,
)

N_PAGES = 16


def page_of(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % N_PAGES


# --- sequential twins ---------------------------------------------------------

def test_switch_state_toggle_table():
    # views.py:227-244
    assert switch_state_py(None) == 7
    assert switch_state_py(3) == 9   # FROM_GOOGLE -> FROM_GOOGLE_APPROVED
    assert switch_state_py(2) == 8   # FROM_USER -> FROM_USER_APPROVED
    assert switch_state_py(4) == 10  # FROM_WIKI -> FROM_WIKI_APPROVED
    assert switch_state_py(9) == 3
    assert switch_state_py(8) == 2
    assert switch_state_py(7) is None
    assert switch_state_py(10) == 4
    with pytest.raises(ValueError):
        switch_state_py(99)


def test_insert_approved_above_first_organic():
    docs = [
        {"url": "a", "state": 7},
        {"url": "b", "state": None},
        {"url": "c", "state": None},
    ]
    approved = {"url": "c", "state": 7}
    out = insert_approved_py(docs, approved)
    assert [d["url"] for d in out] == ["a", "c", "b"]


def test_insert_approved_appends_when_all_curated():
    docs = [{"url": "a", "state": 7}]
    out = insert_approved_py(docs, {"url": "b", "state": 7})
    assert [d["url"] for d in out] == ["a", "b"]


# --- distributed page rewrite --------------------------------------------------

@pytest.fixture(scope="module")
def store(spark):
    term = "spark data"  # = curation_term_expr("spark data")
    pg = page_of(term)
    other_pg = (pg + 1) % N_PAGES
    pages = spark.createDataFrame(
        [
            # the page the curation lands on
            (pg, 0, "Old A", "https://a.com", "ex a", 5.0, term, None),
            (pg, 1, "Old B", "https://b.com", "ex b", 4.0, term, 7),
            (pg, 2, "Old C", "https://c.com", "ex c", 3.0, "other term", 2),
            # an untouched page
            (other_pg, 0, "Other", "https://z.com", "ex z", 9.0, "zzz", None),
        ],
        "page long, position int, title string, url string, extract string, "
        "score double, term string, state int",
    )
    curations = spark.createDataFrame(
        [
            # edited list for query "spark data": rank order matters
            ("spark data", 0, "New X", "https://x.com", "ex x", 7),
            ("spark data", 1, "A approved", "https://a.com", "ex a2", 8),
            ("spark data", 2, "B unapproved", "https://b.com", "ex b", None),
            ("spark data", 3, "C demoted", "https://c.com", "ex c", 3),
        ],
        "query string, rank long, title string, url string, extract string, state int",
    )
    out = apply_curation(pages, curations, N_PAGES)
    rows = {
        (r["page"], r["position"]): r for r in out.collect()
    }
    return pg, other_pg, rows


def test_curated_docs_pinned_first_in_edit_order(store):
    pg, other_pg, rows = store
    # curated = ranks 0 (x.com, state 7) and 1 (a.com, state 8)
    assert rows[(pg, 0)]["url"] == "https://x.com"
    assert rows[(pg, 0)]["score"] == MAX_CURATED_SCORE - 0
    assert rows[(pg, 1)]["url"] == "https://a.com"
    assert rows[(pg, 1)]["score"] == MAX_CURATED_SCORE - 1
    assert rows[(pg, 1)]["title"] == "A approved"  # edited metadata wins


def test_survivors_keep_order_and_take_edited_states(store):
    pg, other_pg, rows = store
    # a.com's OLD row was removed (url among curated); b.com and c.com
    # survive in stored order with updated states
    assert rows[(pg, 2)]["url"] == "https://b.com"
    assert rows[(pg, 2)]["state"] is None  # un-approve applied (null wins)
    assert rows[(pg, 3)]["url"] == "https://c.com"
    assert rows[(pg, 3)]["state"] == 3  # demoted even under another term
    assert rows[(pg, 3)]["term"] == "other term"  # survivor keeps its term
    assert (pg, 4) not in rows


def test_untouched_pages_pass_through(store):
    pg, other_pg, rows = store
    r = rows[(other_pg, 0)]
    assert (r["url"], r["score"], r["state"], r["position"]) == ("https://z.com", 9.0, None, 0)


def test_page_cap_truncates(spark, store):
    pg, other_pg, _ = store
    pages = spark.createDataFrame(
        [(pg, i, f"T{i}", f"https://u{i}.com", "e", 1.0, "spark data", None) for i in range(5)],
        "page long, position int, title string, url string, extract string, "
        "score double, term string, state int",
    )
    curations = spark.createDataFrame(
        [("spark data", 0, "New", "https://new.com", "e", 7)],
        "query string, rank long, title string, url string, extract string, state int",
    )
    out = apply_curation(pages, curations, N_PAGES, page_cap=3).collect()
    assert len(out) == 3
    assert sorted(r["position"] for r in out) == [0, 1, 2]
    assert [r["url"] for r in sorted(out, key=lambda r: r["position"])][0] == "https://new.com"


def test_conflicting_same_batch_edits_last_write_wins(spark):
    """Two edits of the same (page, url) in one batch: with an
    ``edit_order`` column the LATER edit's state wins — including a
    null un-approve (the reference applies curations sequentially,
    views.py:409-411). Without edit_order the documented deterministic
    tie rule max(state) applies."""
    from mwmbl_spark.operators.curation import apply_curation, curation_term_expr  # noqa: F401

    pages = spark.createDataFrame(
        [(0, 0, "T", "https://x.com", "e", 1.0, "spark data", 3)],
        "page long, position int, title string, url string, extract string, "
        "score double, term string, state int",
    )
    # n_pages=1 -> every term hashes to page 0 (forced collision)
    base = [
        ("spark data", 0, "T", "https://x.com", "e", 3, 1),
        ("other term", 0, "T", "https://x.com", "e", None, 2),  # later un-approve
    ]
    cur_ordered = spark.createDataFrame(
        base,
        "query string, rank long, title string, url string, extract string, "
        "state int, edit_order int",
    )
    out = {r["url"]: r for r in apply_curation(pages, cur_ordered, 1).collect()}
    assert out["https://x.com"]["state"] is None  # later edit (un-approve) wins

    cur_orderless = spark.createDataFrame(
        [r[:6] for r in base],
        "query string, rank long, title string, url string, extract string, state int",
    )
    out2 = {r["url"]: r for r in apply_curation(pages, cur_orderless, 1).collect()}
    assert out2["https://x.com"]["state"] == 3  # documented max(state) tie rule

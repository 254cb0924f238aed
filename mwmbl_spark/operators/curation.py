"""Curation write path — user result edits merged into the index
(reference: views.py approve/_save_to_index, the main human-in-the-loop
mutation; semantics at /root/reference/mwmbl/views.py:227-244 (state
toggle), :350-364 (_insert_document), :385-418 (_save_to_index)).

A curation is a query plus its full edited result list (``rank`` =
position in the edited list). Applying it to the page store:

1. term key = the tokenized query joined with spaces; the page is the
   hash of that term (the reference's get_key_page_index).
2. Curated docs (state >= ORGANIC_APPROVED) are rewritten onto the page
   FIRST, in edited order, with score = MAX_CURATED_SCORE - rank — the
   pinning that read-side ranking (plans/search.py, index_merge.py)
   preserves.
3. Existing docs on that page whose URL is NOT among the curated URLs
   stay, in stored order, but take the state of any same-URL row in the
   edited list (even a null state — an un-approve; views.py:409-411).
4. Pages no curation touches pass through byte-identical.

Everything is a DataFrame plan (two broadcast joins + one window):
curations are human-scale (thousands/day) while the page store is the
100 TB side, so the curation side is always the broadcast build side
and the page store is never shuffled — only the touched pages get new
positions from a per-page window.

``switch_state_py`` / ``insert_approved_py`` are the sequential twins
of the approve-button flow feeding this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr
from mwmbl_spark.operators.heuristic import (
    FROM_GOOGLE,
    FROM_GOOGLE_APPROVED,
    FROM_USER,
    FROM_USER_APPROVED,
    FROM_WIKI,
    FROM_WIKI_APPROVED,
    ORGANIC_APPROVED,
)

MAX_CURATED_SCORE = 1_111_111.0  # views.py:36

_SWITCH = {
    None: ORGANIC_APPROVED,
    FROM_GOOGLE: FROM_GOOGLE_APPROVED,
    FROM_USER: FROM_USER_APPROVED,
    FROM_WIKI: FROM_WIKI_APPROVED,
    FROM_GOOGLE_APPROVED: FROM_GOOGLE,
    FROM_USER_APPROVED: FROM_USER,
    ORGANIC_APPROVED: None,
    FROM_WIKI_APPROVED: FROM_WIKI,
}


def switch_state_py(state: int | None) -> int | None:
    """Approve/un-approve toggle [views.py:227-244]."""
    if state not in _SWITCH:
        raise ValueError(f"Unexpected state {state!r}")
    return _SWITCH[state]


def insert_approved_py(documents: list[dict], approved: dict) -> list[dict]:
    """[views.py:350-364]: re-insert the approved doc just above the
    first non-curated doc (i.e. below the last curated one), dropping
    its previous occurrence."""
    out, inserted = [], False
    for d in documents:
        if d["url"] == approved["url"]:
            continue
        if (d.get("state") is None or d["state"] < ORGANIC_APPROVED) and not inserted:
            out.append(approved)
            inserted = True
        out.append(d)
    if not inserted:
        out.append(approved)
    return out


def curation_term_expr(query: Column) -> Column:
    """term key = ' '.join(tokenize(query)) [views.py:253]."""
    return F.concat_ws(" ", tokenize_expr(query))


def default_page_expr(term: Column, n_pages: int) -> Column:
    """md5-derived page hash (engine-portable; the DuckDB oracle states
    the identical computation — xxhash64 exists only in Spark)."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long"),
        F.lit(n_pages),
    ).cast("long")


def apply_curation(
    pages: DataFrame,
    curations: DataFrame,
    n_pages: int,
    page_cap: int | None = None,
) -> DataFrame:
    """pages: (page, position, title, url, extract, score, term, state);
    curations: (query, rank, title, url, extract, state) — the edited
    result list per query, rank = 0-based position.

    Returns the updated page table (same schema), positions rewritten on
    touched pages: curated docs first in edited order, then surviving
    existing docs in stored order; ``page_cap`` re-applies the page-size
    truncation (indexer.store_in_page drops what doesn't fit)."""
    sel = [
        curation_term_expr(F.col("query")).alias("term"),
        "rank", "title", "url", "extract", "state",
    ]
    if "edit_order" in curations.columns:
        sel.append(F.col("edit_order"))
    cur = curations.select(*sel).withColumn(
        "page", default_page_expr(F.col("term"), n_pages)
    )

    curated = cur.where(
        F.col("state").isNotNull() & (F.col("state") >= ORGANIC_APPROVED)
    ).select(
        "page",
        F.col("rank").alias("_cur_rank"),
        "title", "url", "extract",
        (F.lit(MAX_CURATED_SCORE) - F.col("rank")).alias("score"),
        "term", "state",
    )

    # every edited row updates the state of a same-URL survivor on the
    # page — INCLUDING null states (un-approve), hence the marker column.
    # Conflicting edits of the same (page, url) in one batch: the
    # reference applies curations sequentially, last write wins
    # (views.py:409-411) — when the input carries an ``edit_order``
    # column we honor exactly that (max_by keeps the null state of a
    # later un-approve). Orderless batches fall back to the documented
    # deterministic tie rule max(state), which ignores nulls — i.e. an
    # approve beats a same-batch un-approve when no order is given.
    if "edit_order" in cur.columns:
        new_state = F.max_by("state", "edit_order")
    else:
        new_state = F.max("state")
    state_updates = (
        cur.groupBy("page", "url")
        .agg(new_state.alias("_new_state"))
        .withColumn("_touched", F.lit(True))
    )

    # only the touched pages are rewritten; everything else passes
    # through untouched (no shuffle of the big side — the window below
    # runs on the touched slice only)
    touched_pages = cur.select("page").distinct()
    untouched = pages.join(F.broadcast(touched_pages), "page", "left_anti")

    survivors = (
        pages.join(F.broadcast(touched_pages), "page", "left_semi")
        .join(
            F.broadcast(curated.select("page", "url").distinct()),
            ["page", "url"],
            "left_anti",
        )
        .join(F.broadcast(state_updates), ["page", "url"], "left")
        .withColumn(
            "state",
            F.when(F.col("_touched"), F.col("_new_state")).otherwise(F.col("state")),
        )
        .drop("_new_state", "_touched")
    )

    # position: curated (edited order, then term/url for cross-query
    # determinism) before survivors (stored order)
    merged = curated.select(
        "page", "title", "url", "extract", "score", "term", "state",
        F.lit(0).alias("_is_new"),
        F.col("_cur_rank").cast("long").alias("_ord1"),
        F.lit(None).cast("long").alias("_ord2"),
    ).unionByName(
        survivors.select(
            "page", "title", "url", "extract", "score", "term", "state",
            F.lit(1).alias("_is_new"),
            F.lit(None).cast("long").alias("_ord1"),
            F.col("position").cast("long").alias("_ord2"),
        )
    )
    w = Window.partitionBy("page").orderBy(
        F.asc("_is_new"),
        F.asc_nulls_last("_ord1"),   # curated: edited rank
        F.asc_nulls_last("_ord2"),   # survivors: stored position
        F.asc("term"),               # cross-query determinism on rank ties
        F.asc("url"),
    )
    rewritten = merged.withColumn(
        "position", (F.row_number().over(w) - 1).cast("int")
    ).select("page", "position", "title", "url", "extract", "score", "term", "state")
    if page_cap is not None:
        rewritten = rewritten.where(F.col("position") < page_cap)
    return untouched.select(
        "page", "position", "title", "url", "extract", "score", "term", "state"
    ).unionByName(rewritten)

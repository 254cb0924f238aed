"""Incremental page-merge semantics (reference build ops A2-A6, J3, J8).

The reference's page write path merges incoming docs with a page's
existing docs: per-term re-rank with the heuristic ranker (term as the
query, is_complete=True), round-robin interleave across terms by rank
position, curated docs pinned first, first-occurrence dedup by URL and
title, LRU-merge of user_ids capped at 2, max-merge of last_crawled
[/root/reference/mwmbl/indexer/index_batches.py:25-36,150-201].

Python twins implement the sequential semantics exactly (they are
order-sensitive list algorithms over ≤page-sized groups); the Spark
operator distributes them per page group via ``applyInPandas`` — the
groups are bounded (a page holds what fits in 4 KiB in the reference),
so per-group Python is bounded work, and groups scale out across
executors. Where the semantics are order-free we use DataFrame ops
instead (see ``merge_user_ids_expr`` notes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.operators.heuristic import CURATED_STATES, order_results_py

MAX_USER_IDS = 2

DOC_COLS = ["title", "url", "extract", "score", "term", "state", "user_ids", "last_crawled"]

PAGE_DOC_SCHEMA = (
    "page long, position int, title string, url string, extract string, "
    "score double, term string, state int, user_ids array<int>, "
    "last_crawled long"
)


def merge_user_ids_py(existing, incoming):
    """LRU-merge capped at MAX_USER_IDS [index_batches.py:28-36]."""
    combined = list(existing or [])
    for uid in incoming or []:
        if uid in combined:
            combined.remove(uid)
        combined.append(uid)
    return combined[-MAX_USER_IDS:] or None


def default_ranker(domain_scores=None):
    """The reference build uses HeuristicRanker with threshold -inf so
    zero-scoring docs survive [index_batches.py:80-84]."""

    def rank(terms: list[str], docs: list[dict], is_complete: bool) -> list[dict]:
        return order_results_py(
            terms, docs, is_complete,
            score_threshold=float("-inf"), domain_scores=domain_scores,
        )

    return rank


def sort_documents_py(documents: list[dict], existing: list[dict], ranker=None) -> list[dict]:
    """[index_batches.py:176-201]: curated pinned first; per-term re-rank
    (term as the query, is_complete=True); round-robin interleave across
    terms by rank position (stable sort on enumerate index). ``ranker``
    is pluggable like the reference's Ranker.order_results."""
    ranker = ranker or default_ranker()
    curated = [d for d in existing if d.get("state") in CURATED_STATES]
    existing_docs = [d for d in existing if d.get("state") not in CURATED_STATES]

    term_documents: dict[str, list[dict]] = {}
    for d in documents:
        if d.get("term") is not None:
            term_documents.setdefault(d["term"], []).append(d)

    ordered_term_docs: dict[str, list[dict]] = {}
    for term, docs in term_documents.items():
        docs = docs + [d for d in existing_docs if d.get("term") == term]
        ordered_term_docs[term] = ranker(term.split(), docs, True)

    other_terms = {d.get("term") for d in existing_docs if d.get("term") not in ordered_term_docs}
    for d in existing_docs:
        if d.get("term") in other_terms:
            ordered_term_docs.setdefault(d["term"], []).append(d)

    numbered = [list(enumerate(docs)) for docs in ordered_term_docs.values()]
    combined = [pair for docs in numbered for pair in docs]
    if not combined:
        return list(curated)
    combined.sort(key=lambda x: x[0])  # stable: round-robin interleave
    return curated + [d for _, d in combined]


def combine_documents_py(
    existing: list[dict], documents: list[dict], mark_synced: bool = False, ranker=None
) -> list[dict]:
    """[index_batches.py:150-173]: sort, merge user_ids/last_crawled per
    URL, then first-wins dedup by title and URL."""
    sorted_docs = sort_documents_py(documents, existing, ranker)

    url_user_ids: dict[str, list | None] = {}
    url_last_crawled: dict[str, int] = {}
    for d in sorted_docs:
        url_user_ids[d["url"]] = merge_user_ids_py(url_user_ids.get(d["url"]), d.get("user_ids"))
        if d.get("last_crawled") is not None:
            url_last_crawled[d["url"]] = max(url_last_crawled.get(d["url"], 0), d["last_crawled"])

    seen_urls: set = set()
    seen_titles: set = set()
    out = []
    for d in sorted_docs:
        if d.get("title") in seen_titles or d["url"] in seen_urls:
            continue
        d = dict(d)
        if mark_synced:
            d["state"] = -2  # SYNCED_WITH_MAIN_INDEX
        d["user_ids"] = url_user_ids.get(d["url"])
        d["last_crawled"] = url_last_crawled.get(d["url"])
        out.append(d)
        seen_urls.add(d["url"])
        seen_titles.add(d.get("title"))
    return out


def merge_pages(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    mark_synced: bool = False,
    domain_scores: dict[str, float] | None = None,
    page_cap: int | None = None,
) -> DataFrame:
    """Distributed page merge: union new+existing postings keyed by
    ``page``, apply the exact combine semantics per page group.

    Input schemas: (page long, title, url, extract, score, term, state,
    user_ids, last_crawled) with an ``is_existing`` flag added here.
    Output adds ``position`` — the final storage order within the page
    (the reference's implicit rank-truncation order).

    Order determinism: the reference's combine semantics are
    order-sensitive (stable tie-order in sort_documents, round-robin of
    "already ordered" existing docs, first-wins dedup), but group rows
    arrive in arbitrary post-shuffle order. Existing docs are therefore
    consumed in ``position`` order (the output of a previous merge —
    the reference reads pages back in stored order), and new docs in
    ``position`` order when the caller provides one, else a
    deterministic (url, title, term) order. Re-merging a merged page is
    reproducible and matches the sequential twin.
    """

    def _with_pos(df: DataFrame, is_existing: bool) -> DataFrame:
        pos = (
            F.col("position").cast("int")
            if "position" in df.columns
            else F.lit(None).cast("int")
        )
        return df.select("page", *DOC_COLS, pos.alias("position")).withColumn(
            "is_existing", F.lit(is_existing)
        )

    tagged_new = _with_pos(new_docs, False)
    tagged_old = _with_pos(existing_docs, True)
    both = tagged_new.unionByName(tagged_old)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        page = int(pdf["page"].iloc[0])

        def row_to_doc(r) -> dict:
            return {
                "title": r.title,
                "url": r.url,
                "extract": r.extract,
                "score": r.score,
                "term": r.term,
                "state": int(r.state) if r.state is not None and not pd.isna(r.state) else None,
                "user_ids": list(r.user_ids) if r.user_ids is not None else None,
                "last_crawled": int(r.last_crawled) if r.last_crawled is not None and not pd.isna(r.last_crawled) else None,
            }

        def sort_key(r):
            pos_missing = r.position is None or pd.isna(r.position)
            return (
                0 if not pos_missing else 1,
                int(r.position) if not pos_missing else 0,
                r.url or "",
                r.title or "",
                r.term or "",
            )

        new = [
            row_to_doc(r)
            for r in sorted(pdf[~pdf["is_existing"]].itertuples(), key=sort_key)
        ]
        old = [
            row_to_doc(r)
            for r in sorted(pdf[pdf["is_existing"]].itertuples(), key=sort_key)
        ]
        combined = combine_documents_py(
            old, new, mark_synced, default_ranker(domain_scores)
        )
        return pd.DataFrame(
            [
                {
                    "page": page,
                    "position": i,
                    **{k: d.get(k) for k in DOC_COLS},
                }
                for i, d in enumerate(combined)
            ],
            columns=["page", "position", *DOC_COLS],
        )

    merged = both.groupBy("page").applyInPandas(kernel, schema=PAGE_DOC_SCHEMA)
    if page_cap is not None:
        # A7 analogue: the reference binary-searches the largest prefix
        # that zstd-compresses into the 4096-byte page and silently
        # drops the rest (indexer.py:128-158) — because pages are stored
        # best-first, that trim IS a top-K per page. Here the cap is an
        # explicit row limit on the already best-first `position`.
        merged = merged.where(F.col("position") < page_cap)
    return merged

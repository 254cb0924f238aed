"""Faceted result-set counts.

Every production search engine serves facet counts next to the result
page (Solr facets, Elasticsearch terms aggregations): for each query,
how many matching documents carry each value of each facet column.
The reference has no faceting (its result page is rank-only,
/root/reference/mwmbl/tinysearchengine/rank.py); this is one of the
beyond-reference serving operators the engine adds.

Shape: facets describe the FULL candidate set, not the served top-k —
callers pass the (query_id, doc_id) candidate relation (disjunctive
match, a WAND shortlist, a filtered scope — anything). The facet melt
is an ``explode`` of a literal struct array (pure JVM, no UDF, width =
number of facet columns, a handful), so the plan is: semi-join-shaped
candidates ⋈ docs (doc metadata broadcast-able when small, shuffled on
doc_id otherwise — Catalyst/AQE picks), one explode, one partial-agg
``groupBy``. Cost is O(candidates × n_facets) rows into a map-side
combine — no skew beyond the candidate distribution itself, no
driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["facet_counts"]


def facet_counts(
    candidates: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    id_col: str = "doc_id",
    top_n: int | None = None,
) -> DataFrame:
    """Per-query facet-value document counts over a candidate set.

    ``candidates``: (query_id, id_col) — one row per matching doc
    (callers dedupe; a multi-hit doc must count once).
    ``docs``: the metadata table carrying ``facet_cols``.
    ``top_n``: keep only the N most frequent values per (query, facet)
    (ties: value asc) — the served-UI truncation; None keeps all.

    Returns (query_id, facet, value, n_docs). NULL facet values count
    under value NULL (they are real documents the UI must account for).
    """
    melted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("facet"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in facet_cols
            ]
        )
    )
    out = (
        candidates.select("query_id", id_col)
        .join(docs.select(id_col, *facet_cols), id_col)
        .select("query_id", melted.alias("fv"))
        .groupBy("query_id", F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    if top_n is not None:
        w = Window.partitionBy("query_id", "facet").orderBy(
            F.desc("n_docs"), F.asc("value")
        )
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= top_n)
            .drop("_rn")
        )
    return out

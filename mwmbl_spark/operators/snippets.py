"""Best-window snippet generation for served results.

The reference formats results by highlighting query-term spans in the
stored title/extract (/root/reference/mwmbl/format.py:33-77 — operators
P7/P10, already ported in operators/format.py). What it never had is
PASSAGE SELECTION: choosing WHICH span of a long document to show. This
module adds the Lucene-UnifiedHighlighter-shaped best-passage step:
for each served (query, doc) pair, the window of ``window`` tokens that
covers the most DISTINCT query terms (ties: most total hits, then the
earliest start) becomes the snippet.

Semantics (the SQL oracle restates them 1:1):

* a *hit* is a token position whose token equals a (deduplicated)
  query term;
* candidate window starts are exactly the hit positions — a classic
  exchange argument: shifting a window right until its first covered
  hit becomes its start loses no hits, so some optimal window starts
  at a hit;
* window ``[s, s + window - 1]`` scores
  ``(n_distinct DESC, n_hits DESC, s ASC)`` and the arg-max per
  (query, doc) is the snippet start;
* the snippet text is the ``window`` tokens from ``s`` joined by a
  single space (token grain, not char grain — the engine's tokens are
  whitespace atoms, reference tokenizer.py:16-33).

Scale shape: everything is JVM column algebra — one tokenize pass over
the SERVED docs only (callers pass the top-k page, so the scan is
candidate-grain, not corpus-grain), a broadcast hash join against the
query terms, and a per-(query, doc) self-join of hit positions whose
cost is O(hits-in-doc × hits-in-window); the final arg-max is one
window function. No Python UDF, no driver materialization, and the
expensive corpus never re-enters the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr

__all__ = ["best_window_snippets"]


def best_window_snippets(
    candidates: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    window: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    push_ids_max: int = 8192,
    bucket_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Attach a best-window snippet to each served (query, doc) pair.

    ``candidates``: (query_id, doc_id, ...) — the served page (e.g. a
    BM25/WAND top-k); every candidate row comes back with snippet
    columns appended. ``docs``: (id_col, text_col) — the corpus the
    candidates point into; only candidate docs are tokenized.
    ``queries``: (query_id, query).

    ``push_ids_max``: when the candidate id set is at most this many
    ids (a served page is queries × k — hundreds, not millions), the
    ids are collected and pushed into the doc scan as LITERAL
    predicates. This collect is page-grain by construction — never
    corpus-grain; candidate sets larger than the cap fall back to the
    plain join. 0 disables the probe. NB: a bare IN list longer than
    ``spark.sql.parquet.pushdown.inFilterThreshold`` (default 10)
    reaches parquet as a min/max RANGE filter, which skips nothing for
    hash-scattered ids over a flat store — the literal push only pays
    together with ``bucket_col``.

    ``bucket_col``/``n_buckets``: the DOC-STORE deployment shape (the
    dedup-store pruned-scan pattern): the store is directory-
    partitioned by ``pmod(xxhash64(id), n_buckets)`` and id-sorted
    within buckets, so the pushed bucket list prunes directories
    (page-size dirs read, not corpus-size) and the id list row-group-
    skips inside them. The bucket twin is the parity-gated
    ``dedup_store._bucket_py``.

    Returns ``candidates`` columns + (start, n_distinct, n_hits,
    snippet). A candidate of a disjunctive/majority retrieval always
    has >= 1 hit, so the join keeps every candidate row.
    """
    pairs = candidates.select("query_id", F.col(id_col)).distinct()

    ids = None
    if push_ids_max:
        # materialize the (page-grain) pair set ONCE before probing:
        # the probe collect below otherwise runs the candidate
        # retrieval eagerly at plan-construction time AND the returned
        # plan re-runs it at execution (ADVICE r6) — with the
        # checkpoint the retrieval job runs exactly once per call
        pairs = pairs.localCheckpoint(eager=True)
        probe = [
            r[0]
            for r in pairs.select(id_col)
            .distinct()
            .limit(push_ids_max + 1)
            .collect()
        ]
        if len(probe) <= push_ids_max:
            ids = probe
    if ids is not None:
        pred = F.col(id_col).isin(ids)
        if bucket_col is not None and n_buckets:
            from mwmbl_spark.operators.dedup_store import _bucket_py

            buckets = sorted({_bucket_py(i, n_buckets) for i in ids})
            pred = F.col(bucket_col).isin(buckets) & pred
        fetched = docs.where(pred)
    else:
        fetched = docs.join(pairs.select(id_col).distinct(), id_col)
    toks = fetched.select(
        id_col, tokenize_expr(F.col(text_col)).alias("toks")
    )

    qterm = queries.select(
        "query_id",
        F.explode(F.array_distinct(tokenize_expr(F.col("query")))).alias("term"),
    )

    hits = (
        toks.select(
            id_col, F.posexplode("toks").alias("pos0", "term")
        )
        .withColumn("pos", F.col("pos0") + 1)
        .join(F.broadcast(qterm), "term")
        .join(pairs, ["query_id", id_col])
        .select("query_id", id_col, "pos", "term")
    )

    h1 = hits.alias("h1")
    h2 = hits.alias("h2")
    win = (
        h1.join(
            h2,
            (F.col("h1.query_id") == F.col("h2.query_id"))
            & (F.col(f"h1.{id_col}") == F.col(f"h2.{id_col}"))
            & (F.col("h2.pos") >= F.col("h1.pos"))
            & (F.col("h2.pos") < F.col("h1.pos") + window),
        )
        .groupBy(
            F.col("h1.query_id").alias("query_id"),
            F.col(f"h1.{id_col}").alias(id_col),
            F.col("h1.pos").alias("start"),
        )
        .agg(
            F.countDistinct("h2.term").alias("n_distinct"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )

    best_w = Window.partitionBy("query_id", id_col).orderBy(
        F.desc("n_distinct"), F.desc("n_hits"), F.asc("start")
    )
    best = (
        win.withColumn("_rn", F.row_number().over(best_w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    return (
        candidates.join(best, ["query_id", id_col])
        .join(toks, id_col)
        .withColumn(
            "snippet",
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("start"), F.lit(window))),
        )
        .drop("toks")
    )

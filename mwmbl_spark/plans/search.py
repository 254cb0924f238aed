"""Full search-query lifecycle (reference §3.1: Ranker.search,
/root/reference/mwmbl/tinysearchengine/rank.py:247-320) as one Spark plan.

Stages, mirroring get_results step by step — but the whole QUERY BATCH
runs as one job (single-query latency is not the target; the reference
processes one query per HTTP request, we process the batch as a join):

1. tokenize; is_complete = query ends with a space (rank.py:280-281)
2. expansion: last-term prefix completions (top-3 by term count,
   completer.py:24-35) when incomplete + all query bigrams
   (rank.py:282-295)
3. retrieval: expanded terms -> P5-term posting table (unigrams +
   bigram index terms, indexer/index.py:48-66) -> candidate docs
4. scoring: the heuristic scorer over the ORIGINAL query terms
   (rank.py:336-351) — expansion only widens retrieval, scoring is
   against the real query
5. curated docs pinned first (J8, rank.py:289-293,318)
6. query-side dedup: first occurrence by url, then title, in rank
   order (rank.py:209-215, 252-257)
7. optional MMR diversity re-rank (mmr_rank.py) + v2 formatting with
   highlights (format.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import (
    bigrams_expr,
    document_terms_expr,
    tokenize_expr,
)
from mwmbl_spark.operators.format import format_results
from mwmbl_spark.operators.heuristic import CURATED_STATES, score_heuristic
from mwmbl_spark.operators.mmr import mmr_rerank

DOC_COLS = ["doc_id", "title", "url", "extract", "score", "state"]


def build_term_index(docs: DataFrame) -> DataFrame:
    """P5 posting table: (term, doc_id) over title/url/extract index
    terms — the mwmbl-equivalent retrieval index (bigrams are index
    terms, not query-side intersections).

    Per-field tokens are materialized behind the Arrow-UDF barrier:
    index_terms_expr references its token array many times (slice +
    bigram element_ats) and Catalyst re-inlines raw expressions into
    HOF lambdas with no CSE — the same 5x trap fixed in dedup.py."""
    from mwmbl_spark.functions.tokenize import (
        index_terms_expr,
        prepare_url_expr,
        tokenize_pd,
    )

    toks = docs.select(
        "doc_id",
        tokenize_pd(F.col("title")).alias("t_title"),
        tokenize_pd(prepare_url_expr(F.col("url"))).alias("t_url"),
        tokenize_pd(F.col("extract")).alias("t_extract"),
    )
    terms = F.array_union(
        index_terms_expr(F.col("t_title")),
        F.array_union(
            index_terms_expr(F.col("t_url")), index_terms_expr(F.col("t_extract"))
        ),
    )
    return toks.select("doc_id", F.explode(terms).alias("term"))


def cap_term_index(index: DataFrame, doc_scores: DataFrame, k: int) -> DataFrame:
    """A7: explicit per-term posting cap, rank-ordered by crawl-time
    score. The reference's page store implicitly truncates each term's
    postings to one 4 KiB page, docs stored best-first
    (indexer.py:128-158, index_batches.py:176-201) — so a term's
    retrieval set is its top items BY SCORE, not every holder. Without
    this, candidate volume (and the scoring kernel fed by it) grows
    linearly with the corpus: a stopword-adjacent term retrieves
    millions of candidates per query at web scale (VERDICT r3 #2).

    Apply at INDEX BUILD time, once per corpus epoch — the window
    shuffles by term, which is build cost, not query cost; serving
    passes the capped index into ``search(index=...)``. Spark plans the
    rank filter as a map-side WindowGroupLimit (plan-asserted in
    tests/test_plan_quality.py), so each shuffle partition carries at
    most k rows per term into the final rank.

    ``doc_scores``: (doc_id, score) — the crawl-time quality score, the
    same rank key the reference stores pages by. Ties break by doc_id
    for determinism."""
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        index.join(doc_scores.select("doc_id", "score"), "doc_id")
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("term", "doc_id")
    )


def term_counts(index: DataFrame) -> DataFrame:
    """Completion source: term -> doc count (the crawl-terms CSV
    analogue, completer.py:10-23). Derive from the UNCAPPED index:
    completion ranking needs true document frequencies (the reference's
    terms CSV counts every crawl occurrence), while the retrieval cap
    only bounds the per-term candidate fan-out."""
    return index.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))


def query_meta(queries: DataFrame) -> DataFrame:
    return queries.select(
        "query_id",
        "query",
        tokenize_expr(F.col("query")).alias("terms"),
        F.col("query").endswith(" ").alias("is_complete"),
    ).where(F.size("terms") > 0)


def expanded_terms(
    qmeta: DataFrame,
    counts: DataFrame,
    n_completions: int = 3,
) -> DataFrame:
    """(query_id, term) retrieval set: terms ∪ bigrams ∪ completions."""
    base = qmeta.select(
        "query_id", F.explode(F.array_union(F.col("terms"), bigrams_expr(F.col("terms"), 10**6))).alias("term")
    )
    last = qmeta.where(~F.col("is_complete")).select(
        "query_id", F.element_at("terms", -1).alias("prefix")
    )
    # tiebreak term DESC: the reference sorts (count, term) tuples with
    # reverse=True, so equal counts break by the LATER term
    # (completer.py:29-30)
    w = Window.partitionBy("query_id").orderBy(F.desc("cnt"), F.desc("term"))
    compl = (
        counts.join(F.broadcast(last), F.col("term").startswith(F.col("prefix")))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= n_completions)
        .select("query_id", "term")
    )
    return base.unionByName(compl).distinct()


def oov_corrections(qmeta: DataFrame, counts: DataFrame) -> DataFrame:
    """(query_id, qterm, corrected): the top-1 SymSpell correction for
    every OUT-OF-VOCABULARY query term (round-6; the reference's only
    typo tolerance is prefix completion, completer.py:24-35 — a
    mid-query typo retrieves nothing there).

    OOV = the term holds no posting in the index (count absent) —
    in-vocabulary terms are never second-guessed. Candidates come from
    the deletion-variant join (operators/spell.spell_index over the
    index's OWN term counts: vocabulary grain x (1+len) rows, one
    shuffle, no pairwise vocabulary compare; query-side variants are
    tiny and broadcast), verified by exact levenshtein <= 1 and ranked
    (count desc, term asc) — spell_corrections' most-common-wins rule."""
    from mwmbl_spark.operators.spell import deletion_variants, spell_index

    qterms = qmeta.select("query_id", F.explode("terms").alias("qterm")).distinct()
    oov = qterms.join(
        counts.select(F.col("term").alias("qterm")), "qterm", "left_anti"
    )
    idx = spell_index(counts.select("term", F.col("cnt").alias("df")))
    qvars = oov.select(
        "query_id",
        "qterm",
        F.explode(deletion_variants(F.col("qterm"))).alias("variant"),
    )
    cand = (
        idx.join(F.broadcast(qvars), "variant")
        .select("query_id", "qterm", "term", "df")
        .distinct()
        .where(F.levenshtein("qterm", "term") <= 1)
    )
    w = Window.partitionBy("query_id", "qterm").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("query_id", "qterm", F.col("term").alias("corrected"))
    )


def corrected_query_meta(qmeta: DataFrame, counts: DataFrame) -> DataFrame:
    """query_meta with every OOV term REPLACED in place by its top-1
    correction (oov_corrections) — auto-correct, THEN run the reference
    pipeline verbatim: expansion (bigrams/completions), retrieval, and
    the heuristic scorer all see the corrected query.

    Replacement (not retrieval-side union) is deliberate: the scorer's
    majority-match filter (rank.py:50-51 — match_terms <= len(terms)/2
    scores 0) zeroes every doc that matches only the query's OTHER
    terms, so for a two-term query with one typo a retrieval-only
    correction changes nothing end-to-end; rewriting the term is what
    actually serves the user. Terms that are OOV with no distance-1
    correction stay as typed (retrieving nothing, exactly the reference
    behavior). One extra vocabulary-grain join per query batch; the
    correction table itself is query-batch-grain and broadcast."""
    corr = oov_corrections(qmeta, counts)
    pos = qmeta.select(
        "query_id", "query", "is_complete",
        F.posexplode("terms").alias("pos", "qterm"),
    )
    return (
        pos.join(F.broadcast(corr), ["query_id", "qterm"], "left")
        .select(
            "query_id", "query", "is_complete", "pos",
            F.coalesce("corrected", "qterm").alias("term"),
        )
        .groupBy("query_id", "query", "is_complete")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ).alias("terms")
        )
        .select("query_id", "query", "terms", "is_complete")
    )


def segmented_query_meta(qmeta: DataFrame, counts: DataFrame) -> DataFrame:
    """query_meta with every OOV term that has a valid two-word
    segmentation REPLACED by its top-1 split ("keyvalue" -> "key",
    "value") — the SymSpell compound mode of ``correct_oov``'s
    rewrite. Replacement (not union) for the same reason as
    corrected_query_meta: the scorer's majority-match filter zeroes
    docs matching only the other terms, so only a real rewrite of the
    term list changes what the user gets. Terms that neither exist in
    the vocabulary nor split stay as typed. Order is preserved: the
    split occupies the original term's position (terms after it shift
    right). Composes with ``corrected_query_meta`` — run that first,
    then segment whatever is STILL out of vocabulary (a typo'd word
    wants correction, a missing space wants a split).

    Scale shape: one left_anti at query-batch grain + segment_terms'
    two vocabulary-grain broadcast joins (operators/spell.py) — no
    vocabulary self-join, same envelope as the correction path."""
    from mwmbl_spark.operators.spell import segment_terms

    qterms = qmeta.select("query_id", F.explode("terms").alias("qterm")).distinct()
    oov = qterms.join(
        counts.select(F.col("term").alias("qterm")), "qterm", "left_anti"
    )
    from mwmbl_spark.operators.spell import MAX_TERM_LEN

    # split-half candidates obey the same max_term_len bound as the
    # Python twin segment_oov_py and segment_compound (ADVICE r6: an
    # unfiltered vocabulary here diverged from the twin for halves
    # longer than MAX_TERM_LEN); OOV-ness itself was already judged
    # against the unfiltered counts above
    seg = segment_terms(
        oov,
        counts.select("term", F.col("cnt").alias("df")).where(
            F.length("term") <= MAX_TERM_LEN
        ),
        n=1,
    ).select("query_id", "qterm", "left_term", "right_term")
    pos = qmeta.select(
        "query_id", "query", "is_complete",
        F.posexplode("terms").alias("pos", "qterm"),
    )
    return (
        pos.join(F.broadcast(seg), ["query_id", "qterm"], "left")
        .select(
            "query_id", "query", "is_complete", "pos",
            F.when(
                F.col("left_term").isNotNull(),
                F.array("left_term", "right_term"),
            ).otherwise(F.array("qterm")).alias("part"),
        )
        .groupBy("query_id", "query", "is_complete")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "part"))),
                    lambda s: s["part"],
                )
            ).alias("terms")
        )
        .select("query_id", "query", "terms", "is_complete")
    )


def search(
    spark: SparkSession,
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    score_threshold: float = 0.0,
    domain_scores: dict[str, float] | None = None,
    use_mmr: bool = False,
    formatted: bool = False,
    index: DataFrame | None = None,
    counts: DataFrame | None = None,
    term_doc_cap: int | None = 512,
    rerank_n: int | None = None,
    correct_oov: bool = False,
    segment_oov: bool = False,
) -> DataFrame:
    """docs: (doc_id, title, url, extract, score, state); queries:
    (query_id, query). Returns ranked results per query.

    ``index``/``counts``: pass a prebuilt (persisted) P5 term index and
    its term counts — the SERVING shape, where the index is built once
    per corpus epoch and every query batch pays only expansion +
    retrieval + scoring. Left None, both derive from ``docs`` (the
    cold end-to-end shape the bench's q8 measures).

    ``term_doc_cap``: per-term retrieval cap (``cap_term_index``) —
    each expanded term contributes at most this many candidates, ranked
    by crawl-time score, mirroring the reference's one-4KiB-page-per-
    term truncation (a page holds on the order of 10^2 items; 512 is a
    generous parity default). None disables (exhaustive retrieval).
    Pre-capped serving indexes should pass the cap they were built
    with (the cap re-applies idempotently but costs a join).

    ``rerank_n``: two-stage serving mode. The heuristic scorer is a
    CPython kernel (the stateful distinct-match bookkeeping of
    rank.py:182-201 does not vectorize, which is why the reference
    ported it to Rust); with the A7 cap it still scores
    cap x |expanded terms| candidates per query. Set ``rerank_n`` to
    first cut each query's candidates to its top-N JVM-side — ranked by
    (curated-first, matched expanded-term count desc, crawl-time score
    desc, doc_id) — and run the kernel only as a RE-RANKER over those.
    The first stage is pure built-in expressions (count_distinct + one
    WindowGroupLimit rank filter, plan-asserted), so the Python-kernel
    cost per query becomes O(rerank_n) regardless of corpus or term
    fan-out. Curated docs sort first in the stage-1 window (they are
    pinned ahead of every organic result in the final ranking anyway,
    rank.py:289-293), so they are never cut unless a single query
    carries more than ``rerank_n`` curated docs. None (default) scores
    every candidate — the exact reference pipeline.

    ``correct_oov`` (round-6): auto-correct — each out-of-vocabulary
    query term is replaced in place by its top-1 SymSpell correction
    (``corrected_query_meta``) before expansion, retrieval, AND
    scoring; in-vocabulary terms are never second-guessed.

    ``segment_oov`` (round-6): compound splitting — an OOV term with a
    valid two-word segmentation is replaced by its top-1 split
    (``segmented_query_meta``). Runs AFTER correction when both are
    on: a typo'd word wants the correction, a missing space wants the
    split, and only terms the corrector could not place try to
    segment."""
    # cold end-to-end shape note (r7, measured): materializing the P5
    # index here with an eager localCheckpoint — it feeds the counts,
    # cap, and retrieval branches — benched 0.3 s SLOWER at sf0.1: the
    # serialization behind the materialization job costs more than the
    # duplicate tokenize+explode derivation it saves. The serving shape
    # (q8b) passes a persisted index and makes its own choice.
    index = index if index is not None else build_term_index(docs)
    counts = counts if counts is not None else term_counts(index)
    if term_doc_cap is not None:
        index = cap_term_index(index, docs.select("doc_id", "score"), term_doc_cap)
    qmeta = query_meta(queries)
    if correct_oov:
        qmeta = corrected_query_meta(qmeta, counts)
    if segment_oov:
        qmeta = segmented_query_meta(qmeta, counts)
    retrieval = expanded_terms(qmeta, counts)

    matched = index.join(F.broadcast(retrieval), "term")
    if rerank_n is None:
        pairs = matched.select("query_id", "doc_id").distinct()
    else:
        # stage 1: per-(query, doc) matched-term count is the same
        # shuffle .distinct() would pay; the rank filter then keeps the
        # window map-side-limited (WindowGroupLimit)
        stage1 = (
            matched.groupBy("query_id", "doc_id")
            .agg(F.count_distinct("term").alias("_n_match"))
            .join(
                docs.select(
                    "doc_id",
                    F.col("score").alias("_cscore"),
                    F.col("state").alias("_cstate"),
                ),
                "doc_id",
            )
        )
        # coalesce: isin() is NULL (not false) for NULL states, and
        # desc_nulls_last would order the NULL-state group after every
        # 0-flag doc regardless of match count
        curated_first = F.coalesce(
            F.col("_cstate").isin(list(CURATED_STATES)).cast("int"), F.lit(0)
        )
        w1 = Window.partitionBy("query_id").orderBy(
            F.desc(curated_first),
            F.desc("_n_match"),
            F.desc_nulls_last("_cscore"),
            F.asc("doc_id"),
        )
        pairs = (
            stage1.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= rerank_n)
            .select("query_id", "doc_id")
        )
    # attach doc payloads. NOTE (r7, measured): forcing
    # F.broadcast(pairs) here when a retrieval bound is in force looks
    # right on paper (the docs side then never shuffles by doc_id) but
    # benched 0.8 s SLOWER at sf0.1 — the eager broadcast build
    # serializes retrieval against the docs scan, while AQE already
    # rewrites this join to broadcast at runtime when the built pair
    # set is small, without the stall. Left to the planner.
    candidates = pairs.join(docs.select(*DOC_COLS), "doc_id").join(
        qmeta.select("query_id", "terms", "is_complete"), "query_id"
    )
    # scoring with the original query terms and the QUERY'S OWN
    # is_complete flag (rank.py:280-283 passes q.endswith(' ') into
    # order_results): an incomplete query's last term is prefix-matched
    # (no trailing \b), so a partially typed term still earns match credit
    scored = score_heuristic(candidates, domain_scores, is_complete=None)
    kept = scored.where(
        (F.col("heuristic_score") > score_threshold)
        | F.col("state").isin(list(CURATED_STATES))
    )
    is_curated = F.col("state").isin(list(CURATED_STATES)).cast("int")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(is_curated), F.desc("heuristic_score"), F.asc("doc_id")
    )
    ranked = kept.withColumn("prelim_rank", F.row_number().over(w))

    # query-side dedup, SEQUENTIAL like the reference: title dedup first
    # (deduplicate() inside get_results, rank.py:209-215) over ALL ranked
    # rows, THEN url dedup (search(), rank.py:252-257) over the title
    # survivors — a row dropped by title dedup must not consume a URL slot
    w_title = Window.partitionBy("query_id", "title").orderBy("prelim_rank")
    w_url = Window.partitionBy("query_id", "url").orderBy("prelim_rank")
    deduped = (
        ranked.withColumn("_rt", F.row_number().over(w_title))
        .where(F.col("_rt") == 1)
        .withColumn("_ru", F.row_number().over(w_url))
        .where(F.col("_ru") == 1)
    )
    w_final = Window.partitionBy("query_id").orderBy("prelim_rank")
    topk = (
        deduped.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", "title", "url", "extract",
            "state", F.col("heuristic_score").alias("result_score"),
        )
    )
    if use_mmr:
        topk = mmr_rerank(topk)
    if formatted:
        qmap = {r["query_id"]: r["query"] for r in queries.collect()}
        return format_results(topk, qmap)
    return topk

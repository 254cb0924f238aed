"""Corpus-level descriptive analytics: top n-grams, PMI co-occurrence,
token-length distribution.

The reference's only corpus-wide statistic is the term document
frequency used by its tf-idf scorer
(/root/reference/mwmbl/tinysearchengine/rank.py:81-122, TERM_FREQUENCIES);
a training-data pipeline reports more before committing 100 TB to a
tokenizer run: what the dominant n-grams are (boilerplate detection),
which term pairs are anomalously associated (PMI — template/spam
signatures score high), and the token-length distribution that sizes
sequence packing.

Plan shapes (the 100 TB lens):

- ``top_ngrams``: one explode -> hash aggregation with map-side
  partials -> distributed partial top-k (Catalyst's
  TakeOrderedAndProject: each partition keeps k, the driver merges k
  per partition — never a global sort shuffle).
- ``pmi_pairs``: the classic co-occurrence self-join, made tractable
  the standard way — the document-frequency filter (``min_df``) runs
  BEFORE pairing, so the join fans out only over terms that can
  possibly matter, and ``max_terms_per_doc`` drops degenerate
  boilerplate documents whose distinct-term count would explode the
  per-doc pair cross product. Pair volume is sum over docs of
  C(qualifying_terms, 2); both knobs bound it explicitly rather than
  hoping the data is friendly.
- ``token_length_stats``: one aggregation; ``percentile`` is Spark's
  exact linear-interpolation percentile (identical formula to DuckDB's
  ``quantile_cont``), acceptable because it reduces per-group state to
  a sorted digest only at the driver-bound final row. At true 100 TB
  use ``percentile_approx`` (t-digest) — the exact form here is what
  the cross-engine contract can pin.

Float determinism: PMI is ln of an int ratio rounded to 6 decimals
after the final arithmetic (the repo-wide BM25 convention); ordering
never uses the float (count desc + lexicographic pair, a total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.repetition import ngrams_expr

# pmi_pairs' per-document distinct-term cap, ON by default: a doc at
# the cap contributes C(1000, 2) ~ 5e5 pairs — bounded; an uncapped
# boilerplate mega-doc is quadratic in its own length and at corpus
# scale that one doc IS the job.
DEFAULT_PMI_DOC_CAP = 1000


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    toks_col: str = "toks",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global top-``k`` order-``n`` token grams by occurrence count:
    (gram, n_occurrences, n_docs, rank). Ties broken by gram text —
    a total order, so the cut is deterministic."""
    grams = docs.select(
        F.col(id_col), F.explode(ngrams_expr(F.col(toks_col), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-k, driver merge — no global sort shuffle.
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("gram")).limit(k)
    # rank is assigned AFTER the cut: the window runs over k rows, not
    # the gram table
    return top.select(
        "gram",
        "n_occurrences",
        "n_docs",
        F.row_number()
        .over(Window.orderBy(F.desc("n_occurrences"), F.asc("gram")))
        .alias("rank"),
    )


def doc_term_sets(
    docs: DataFrame, toks_col: str = "toks", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (doc_id, term) membership pairs — the set representation
    PMI and Jaccard-style co-occurrence build on. One explode + one
    map-side-combined distinct."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.col(toks_col)).alias("term"),
    ).distinct()


def pmi_pairs(
    docs: DataFrame,
    min_df: int = 2,
    k: int = 50,
    toks_col: str = "toks",
    id_col: str = "doc_id",
    max_terms_per_doc: int | None = DEFAULT_PMI_DOC_CAP,
) -> DataFrame:
    """Top-``k`` co-occurring term pairs by document co-occurrence
    count, with pointwise mutual information:

        pmi(a, b) = ln( n_ab * N / (df_a * df_b) )

    over document-level term SETS (presence, not frequency — the
    standard collocation-table form). Returns
    (term_a, term_b, n_ab, df_a, df_b, pmi, rank), term_a < term_b.

    ``min_df`` prunes the vocabulary tail before the self-join;
    ``max_terms_per_doc`` drops whole documents whose qualifying
    distinct-term count exceeds the cap — each surviving doc
    contributes O(cap^2) pairs at most, so total pair volume is
    explicitly bounded. The cap DEFAULTS ON (DEFAULT_PMI_DOC_CAP): one
    pathological mega-document is O(|terms|^2) pairs otherwise, and at
    corpus scale that single doc is the job. N counts documents that
    survive both filters with >= 1 qualifying term, so PMI stays a
    proper estimate over the population actually paired. Pass
    ``max_terms_per_doc=None`` only when the doc-length profile is
    known bounded.

    The df-side joins carry NO broadcast hint: the min_df-filtered
    vocabulary is corpus-sized (1e7+ rows at 100 TB) and force-
    broadcasting it is an executor-OOM; AQE broadcasts it at runtime
    when it actually fits. Only the 1-row N scalar keeps a hint.
    """
    terms = doc_term_sets(docs, toks_col, id_col)
    # r7 plan shape: ONE (doc_id) aggregation to per-doc sorted
    # (term, df) struct arrays replaces the former qual-self-join — the
    # old plan shuffled the qualifying membership table TWICE (both
    # join inputs), paid a separate sizes-groupBy + keep-join for the
    # doc cap, and re-attached df with two vocabulary-grain joins.
    # Here df rides INSIDE the struct (functionally dependent on the
    # term, so carrying it through the pair aggregation changes no
    # group), the cap is a size() filter on the aggregated row, and
    # pair generation is a JVM higher-order combination expansion over
    # the sorted array (term_a < term_b holds by construction —
    # sort_array orders by the struct's leading term field with the
    # same UTF8 binary ordering as the former `<` predicate), with
    # map-side partial aggregation combining duplicate pairs before
    # the n_ab shuffle. The per-doc relation feeds two branches (the N
    # scalar and pair generation), so it is materialized once — the
    # staging-table pattern of minhash_near_duplicates; without it each
    # branch re-runs the tokenize+distinct subtree (measured: no
    # exchange reuse fires across them). Identical output by
    # construction; the df aggregation stays the skew-safe
    # groupBy-then-join form (a window over partitionBy(term) would
    # put a Zipf-head term's whole posting set in one task).
    df_t = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    qual = terms.join(df_t, "term")
    docsets = qual.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("term"), F.col("df")))
        ).alias("ts")
    )
    if max_terms_per_doc is not None:
        docsets = docsets.where(F.size("ts") <= max_terms_per_doc)
    # pin the staged relation's partition count: AQE coalesces the tiny
    # doc-grain aggregate to ONE partition, which would serialize the
    # O(sum C(|d|,2)) pair expansion below onto a single task (measured
    # 1.0 s single-threaded at sf0.1 vs 0.2 s spread); the repartition
    # moves only capped doc arrays
    try:
        par = docs.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001
        par = 8
    docsets = docsets.repartition(par).localCheckpoint(eager=True)
    n_docs = docsets.agg(
        F.count(F.lit(1)).cast("double").alias("n_population")
    )
    # pair expansion as a chained double-Generate (codegen'd, streaming
    # within one stage) rather than a nested transform/slice HOF: the
    # interpreted lambda form re-sliced the array per element — O(|d|^2)
    # COPIES per doc — and benched 1.6x SLOWER than round-start at the
    # 10x scale factor where |d| grows; the explode form emits the same
    # pairs (x.term < y.term over the distinct sorted set) with no
    # interpreted evaluation and no array re-slicing
    pairs = (
        docsets.select(F.explode("ts").alias("x"), "ts")
        .select("x", F.explode("ts").alias("y"))
        .where(F.col("x.term") < F.col("y.term"))
        .select(
            F.col("x.term").alias("term_a"),
            F.col("y.term").alias("term_b"),
            F.col("x.df").alias("df_a"),
            F.col("y.df").alias("df_b"),
        )
    )
    n_ab = pairs.groupBy("term_a", "term_b", "df_a", "df_b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    scored = (
        n_ab.crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "df_a",
            "df_b",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_population")
                    / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.desc("n_ab"), "term_a", "term_b").limit(k)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n_ab"), "term_a", "term_b")),
    )


def doc_keywords(
    postings: DataFrame, k: int = 3, min_df: int = 1
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf
    (idf = ln(N/df)): the document-tagging cut over the A12 feature
    table. (doc_id, term, tf, df, tfidf, rank); ties break on term
    text. The per-doc cut is a rank window partitioned by doc_id —
    Catalyst inserts a map-side WindowGroupLimit before the shuffle,
    so only k-ish rows per (partition, doc) travel."""
    n_docs = postings.select(F.countDistinct("doc_id").cast("double").alias("n"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_t = df_t.where(F.col("df") >= min_df)
    scored = (
        postings.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double") * F.log(F.col("n") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.desc("tf"), F.asc("term")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def domain_quality(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    dup_frac_max: float = 0.5,
    mean_chars_min: float = 100.0,
) -> DataFrame:
    """Per-domain quality rollup + spam flag — the domain-level gate a
    crawl pipeline applies before per-document filters (a domain whose
    pages are mostly corpus-duplicates or near-empty is mirror/spam;
    cf. the reference's hand-curated domain blacklist,
    /root/reference/mwmbl/url_queue.py DOMAIN_BLACKLIST — this derives
    the signal from the data instead).

    (domain, n_docs, n_langs, mean_chars, dup_frac, is_spam) where
    dup_frac is the fraction of the domain's docs whose exact text
    (md5 of the raw string — 16 bytes shuffle per doc, never the text)
    occurs more than once CORPUS-wide. Two aggregations: (text_hash)
    then (domain), both map-side combined.
    """
    hashed = docs.select(
        F.col(domain_col).alias("domain"),
        F.col("lang"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )
    freq = hashed.groupBy("text_hash").agg(F.count(F.lit(1)).alias("n_copies"))
    agg = (
        hashed.join(freq, "text_hash")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.round(
                F.sum((F.col("n_copies") > 1).cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )
    return agg.withColumn(
        "is_spam",
        (
            (F.col("dup_frac") > dup_frac_max)
            | (F.col("mean_chars") < mean_chars_min)
        ).cast("int"),
    )


def token_length_stats(
    docs: DataFrame, toks_col: str = "toks", id_col: str = "doc_id"
) -> DataFrame:
    """One-row corpus report over per-document token counts:
    (n_docs, total_tokens, mean_tokens, p25, p50, p75, p95). Exact
    interpolated percentiles (see module docstring for the
    percentile_approx swap at true scale)."""
    lens = docs.select(F.size(F.col(toks_col)).alias("n_toks"))
    pct = F.percentile("n_toks", F.lit([0.25, 0.5, 0.75, 0.95]))
    agg = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.round(F.avg("n_toks"), 6).alias("mean_tokens"),
        pct.alias("pcts"),
    )
    return agg.select(
        "n_docs",
        "total_tokens",
        "mean_tokens",
        F.round(F.element_at("pcts", 1), 6).alias("p25"),
        F.round(F.element_at("pcts", 2), 6).alias("p50"),
        F.round(F.element_at("pcts", 3), 6).alias("p75"),
        F.round(F.element_at("pcts", 4), 6).alias("p95"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness gate).

Both sides tokenize identically (lower → whitespace split → drop
empties → ellipsis-drop-2), compute identical BM25
(idf = ln((N-df+.5)/(df+.5)+1), tf·(k1+1)/(tf+k1·(1-b+b·len/avg)),
k1=1.2 b=0.75), and break ties by doc_id. Scores are rounded to 6
decimals on both sides so the driver's value-hash compare is robust to
summation-order float noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from mwmbl_spark import BM25_B, BM25_K1
from mwmbl_spark.functions.tokenize import (
    bigrams_expr,
    index_terms_expr,
    tokenize_expr,
)
from mwmbl_spark.operators import bm25 as bm25_ops
from mwmbl_spark.operators import postings as post_ops
from mwmbl_spark.sources.transcripts import transcripts_from_documents

# Fixed benchmark query set (terms drawn from the synthetic documents
# vocabulary; includes multi-term, stopword-ish, and missing-term cases).
QUERY_SET: list[tuple[int, str]] = [
    (0, "spark query"),
    (1, "fast join"),
    (2, "window agg batch"),
    (3, "the slow scan"),
    (4, "key value store"),
    (5, "merge sort row table"),
]

COMPLETION_PREFIXES = ["sp", "fa", "w"]

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect) — MUST mirror the Spark semantics
# ---------------------------------------------------------------------------

_TOK_SQL = r"""
tok AS (
  SELECT doc_id,
         CASE WHEN text LIKE '%…'
              THEN toks0[1:greatest(0, len(toks0)-2)]
              ELSE toks0 END AS toks
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       x -> x <> '') AS toks0,
           text
    FROM documents
  )
)"""

_POST_SQL = _TOK_SQL + """,
post AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM tok, unnest(toks) AS t(term)
  GROUP BY doc_id, t.term
)"""

_QUERY_VALUES = ", ".join(f"({i}, '{q}')" for i, q in QUERY_SET)


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(QUERY_SET, "query_id long, query string")


def _docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet reshaped to the input_hint transcript schema
    (text and doc_id preserved — the oracle tokenizes documents.text)."""
    return transcripts_from_documents(spark, sf_dir)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs_as_transcripts(spark, sf_dir)
    return post_ops.build_postings(t).select("term", "doc_id", "tf")


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs_as_transcripts(spark, sf_dir)
    return post_ops.doc_lengths(t).select("doc_id", "doc_len")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs_as_transcripts(spark, sf_dir)
    return post_ops.term_stats(post_ops.build_postings(t)).select("term", "df", "cf")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs_as_transcripts(spark, sf_dir)
    p = post_ops.build_postings(t)
    dl = post_ops.doc_lengths(t)
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    out = bm25_ops.bm25_topk(
        p, dl, stats, _queries_df(spark), cs.n_docs, cs.avg_doc_len, k=10
    )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def q_bm25_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _docs_as_transcripts(spark, sf_dir)
    p = post_ops.build_postings(t)
    dl = post_ops.doc_lengths(t)
    stats = post_ops.term_stats(p)
    cs = post_ops.corpus_stats(dl)
    out = bm25_ops.bm25_topk(
        p, dl, stats, _queries_df(spark), cs.n_docs, cs.avg_doc_len, k=10,
        mode="conjunctive",
    )
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def q_tfidf_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity tf-idf scorer (idf = ln(N/df), N = max(df) quirk,
    majority term filter — rank.py:36-48 semantics)."""
    t = _docs_as_transcripts(spark, sf_dir)
    p = post_ops.build_postings(t)
    stats = post_ops.term_stats(p)
    out = bm25_ops.tfidf_reference_scores(p, stats, _queries_df(spark), mode="majority")
    return out.select(
        "query_id",
        "doc_id",
        F.round("tfidf_score", 6).alias("tfidf_score"),
        "matched",
    )


def q_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: distinct(first-10 tokens ∪ first-10 bigrams) per document."""
    t = _docs_as_transcripts(spark, sf_dir)
    toks = t.select("doc_id", tokenize_expr(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id", F.explode(index_terms_expr(F.col("toks"))).alias("term")
    ).distinct()


def q_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: first min(10, len-1) positional bigrams, with position."""
    t = _docs_as_transcripts(spark, sf_dir)
    toks = t.select("doc_id", tokenize_expr(F.col("text")).alias("toks"))
    return toks.select(
        "doc_id",
        F.posexplode(bigrams_expr(F.col("toks"))).alias("pos", "bigram"),
    )


def q_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: top-3 completions per prefix by document frequency
    (completer.py:24-35 semantics over a term-count table)."""
    t = _docs_as_transcripts(spark, sf_dir)
    stats = post_ops.term_stats(post_ops.build_postings(t))
    prefixes = spark.createDataFrame(
        [(p,) for p in COMPLETION_PREFIXES], "prefix string"
    )
    joined = stats.join(
        F.broadcast(prefixes), F.col("term").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("prefix", "term", "df", "rnk")
    )


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: daily counters per event_type (crawler/stats.py analogue)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: exact distinct users per day (estimation capability;
    exact count used here so the oracle can gate it — the HLL++
    `approx_count_distinct` variant is in bench only)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_QTERM_SQL = f"""
dl AS (SELECT doc_id, len(toks) AS doc_len FROM tok),
stats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
corpus AS (SELECT count(*)::DOUBLE AS n_docs, avg(doc_len)::DOUBLE AS avg_len FROM dl),
queries(query_id, query) AS (VALUES {_QUERY_VALUES}),
qterm AS (
  SELECT query_id, term,
         count(*) OVER (PARTITION BY query_id) AS n_terms
  FROM (
    SELECT DISTINCT query_id, t.term
    FROM queries,
         unnest(list_filter(string_split_regex(lower(trim(query)), '\\s+'),
                            x -> x <> '')) AS t(term)
  )
)"""

_BM25_CAND = f"""
WITH {_POST_SQL},
{_QTERM_SQL},
cand AS (
  SELECT q.query_id, p.doc_id, q.n_terms,
         ln((c.n_docs - s.df + 0.5) / (s.df + 0.5) + 1.0)
           * p.tf * ({BM25_K1} + 1.0)
           / (p.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.doc_len / c.avg_len))
           AS partial
  FROM qterm q
  JOIN post p USING (term)
  JOIN stats s ON p.term = s.term
  JOIN dl ON p.doc_id = dl.doc_id
  CROSS JOIN corpus c
),
scored AS (
  SELECT query_id, doc_id, sum(partial) AS score,
         count(*) AS matched, max(n_terms) AS n_terms
  FROM cand GROUP BY query_id, doc_id
)"""


def _bm25_sql(mode_filter: str) -> str:
    return (
        _BM25_CAND
        + f""",
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored {mode_filter}
)
SELECT query_id, doc_id, round(score, 6) AS score, rank
FROM ranked WHERE rank <= 10"""
    )


ORACLE: dict[str, str] = {
    "postings": f"WITH {_POST_SQL} SELECT term, doc_id, tf FROM post",
    "doc_lengths": f"WITH {_TOK_SQL} SELECT doc_id, len(toks) AS doc_len FROM tok",
    "term_stats": f"""WITH {_POST_SQL}
SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM post GROUP BY term""",
    "bm25_topk": _bm25_sql(""),
    "bm25_conjunctive": _bm25_sql("WHERE matched = n_terms"),
    "tfidf_reference": f"""
WITH {_POST_SQL},
{_QTERM_SQL},
nquirk AS (SELECT max(df)::DOUBLE AS n FROM stats),
cand AS (
  SELECT q.query_id, p.doc_id, q.n_terms,
         p.tf * ln(nq.n / s.df) AS partial
  FROM qterm q
  JOIN post p USING (term)
  JOIN stats s ON p.term = s.term
  CROSS JOIN nquirk nq
),
scored AS (
  SELECT query_id, doc_id, sum(partial) AS tfidf_score,
         count(*) AS matched, max(n_terms) AS n_terms
  FROM cand GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, round(tfidf_score, 6) AS tfidf_score, matched
FROM scored WHERE matched * 2 > n_terms""",
    "index_terms": f"""WITH {_TOK_SQL},
terms AS (
  SELECT doc_id,
         list_distinct(list_concat(
           toks[1:10],
           list_transform(range(1, greatest(0, least(10, len(toks)-1)) + 1),
                          i -> toks[i] || ' ' || toks[i+1])
         )) AS terms
  FROM tok
)
SELECT DISTINCT doc_id, t.term FROM terms, unnest(terms) AS t(term)""",
    "bigrams": f"""WITH {_TOK_SQL},
bg AS (
  SELECT doc_id,
         list_transform(range(1, greatest(0, least(10, len(toks)-1)) + 1),
                        i -> struct_pack(pos := i - 1,
                                         bigram := toks[i] || ' ' || toks[i+1])) AS bgs
  FROM tok
)
SELECT doc_id, s.pos AS pos, s.bigram AS bigram
FROM bg, unnest(bgs) AS u(s)""",
    "completions": f"""WITH {_POST_SQL},
stats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
prefixes(prefix) AS (VALUES {", ".join(f"('{p}')" for p in COMPLETION_PREFIXES)}),
ranked AS (
  SELECT pr.prefix, s.term, s.df,
         row_number() OVER (PARTITION BY pr.prefix
                            ORDER BY s.df DESC, s.term) AS rnk
  FROM stats s JOIN prefixes pr ON starts_with(s.term, pr.prefix)
)
SELECT prefix, term, df, rnk FROM ranked WHERE rnk <= 3""",
    "events_daily": """
SELECT date_trunc('day', ts) AS day, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""",
    "distinct_users_daily": """
SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1""",
}


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for the fixed query set on sf0.001."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings": q_postings,
        "doc_lengths": q_doc_lengths,
        "term_stats": q_term_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_conjunctive": q_bm25_conjunctive,
        "tfidf_reference": q_tfidf_reference,
        "index_terms": q_index_terms,
        "bigrams": q_bigrams,
        "completions": q_completions,
        "events_daily": q_events_daily,
        "distinct_users_daily": q_distinct_users_daily,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)

"""URL dataflow operators (reference frontier / URL store, SURVEY §1.4).

Capabilities reproduced Spark-first:

- P4  URL canonicalize + tokenize (indexer/index.py:37-45)
- P8  URL parse (utils.py:64-74) -> built-in parse_url
- P9  blacklist filter (indexer/blacklist.py) -> broadcast left_anti
- P11 crawl-error classification (index_batches.py:225-233) -> CASE expr
- J6  seen-URL set (monthly Blooms, crawler/urls.py:55-118) ->
      left_anti join; Spark's runtime Bloom-filter join optimization
      covers the probabilistic fast path at scale
- J7  domain link graph (update_urls.py:78-80, crawler/domains.py:51-66)
- W8  frontier: per-domain capped priority queues with recency-discounted
      scores (redis_url_queue.py:60-99: score = 1/len(url) *
      (1 - exp(-age_seconds / T)), skip crawled < 30 days, per-domain
      caps) -> window row_number per domain

The frontier's Redis sorted-set-per-domain becomes a single windowed
plan: at 10^12 URLs the per-domain window is the skew risk (giant
domains), which the cap itself bounds: rank > cap rows are filtered
before any downstream join, and AQE skew-split handles the window
shuffle's hot partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import prepare_url_expr, tokenize_expr

SCORE_TIME_CONSTANT = 60 * 60 * 24 * 30 * 10  # 10 months (redis_url_queue.py:41)
RECENT_CRAWL_DAYS = 30
MAX_URLS_PER_OTHER_DOMAIN = 5

# URLStatus enum mirror (crawler/urls.py:29-41)
STATUS_ERROR_TIMEOUT = 20
STATUS_ERROR_404 = 30
STATUS_ERROR_OTHER = 40
STATUS_ERROR_ROBOTS_DENIED = 50


def domain_expr(url: Column) -> Column:
    """P8: netloc via the built-in parse_url (JVM-side)."""
    return F.parse_url(url, F.lit("HOST"))


def url_tokens(urls: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """P4: canonicalize + tokenize a URL column -> (doc_id, term)."""
    return urls.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(prepare_url_expr(F.col(url_col)))).alias("term"),
    )


def classify_errors(items: DataFrame) -> Column:
    """P11 [index_batches.py:225-233]: item -> URLStatus code."""
    return (
        F.when(F.col("status") == 404, F.lit(STATUS_ERROR_404))
        .when(F.col("error_name") == "AbortError", F.lit(STATUS_ERROR_TIMEOUT))
        .when(F.col("error_name") == "RobotsDenied", F.lit(STATUS_ERROR_ROBOTS_DENIED))
        .otherwise(F.lit(STATUS_ERROR_OTHER))
    )


def filter_blacklisted(urls: DataFrame, blacklist: DataFrame, url_col: str = "url") -> DataFrame:
    """P9: drop rows whose domain is blacklisted (broadcast anti join)."""
    dom = urls.withColumn("_domain", domain_expr(F.col(url_col)))
    return dom.join(
        F.broadcast(blacklist.select(F.col("domain").alias("_domain"))),
        "_domain",
        "left_anti",
    ).drop("_domain")


def new_urls_only(urls: DataFrame, seen: DataFrame, url_col: str = "url") -> DataFrame:
    """J6: left_anti vs the seen-URL set. On a real cluster, enable
    spark.sql.optimizer.runtime.bloomFilter.enabled so the big-probe
    side is pre-filtered by a Bloom filter before the shuffle — the
    direct analogue of the reference's monthly Bloom files."""
    return urls.join(seen.select(url_col), url_col, "left_anti")


def domain_link_graph(links: DataFrame) -> DataFrame:
    """J7: (src_url, dst_url) -> distinct (src_domain, dst_domain,
    n_links) edges."""
    edges = links.select(
        domain_expr(F.col("src_url")).alias("src_domain"),
        domain_expr(F.col("dst_url")).alias("dst_domain"),
    )
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def frontier_scores(
    found: DataFrame,
    now_ts: Column | None = None,
    url_col: str = "url",
) -> DataFrame:
    """W8 scoring [redis_url_queue.py:60-80]: score = 1/len(url) *
    (1 - exp(-age_seconds / T)); URLs crawled within 30 days skipped.
    ``found`` columns: url, last_crawled (timestamp, null = never)."""
    now = now_ts if now_ts is not None else F.current_timestamp()
    age_sec = F.unix_timestamp(now) - F.unix_timestamp(F.col("last_crawled"))
    base = 1.0 / F.length(F.col(url_col)).cast("double")
    multiplier = F.when(
        F.col("last_crawled").isNull(), F.lit(1.0)
    ).otherwise(1.0 - F.exp(-age_sec.cast("double") / F.lit(float(SCORE_TIME_CONSTANT))))
    recent = F.col("last_crawled").isNotNull() & (
        age_sec < RECENT_CRAWL_DAYS * 86400
    )
    return found.where(~recent).select(
        F.col(url_col),
        domain_expr(F.col(url_col)).alias("domain"),
        (base * multiplier).alias("url_score"),
    )


def frontier_topk(
    scored: DataFrame, max_per_domain: int = MAX_URLS_PER_OTHER_DOMAIN
) -> DataFrame:
    """W8 cap: keep the top-N URLs per domain by score (the Redis
    zremrangebyrank analogue), deterministic tiebreak by url."""
    w = Window.partitionBy("domain").orderBy(F.desc("url_score"), F.asc("url"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= max_per_domain)
        .select("domain", "url", F.round("url_score", 9).alias("url_score"), "rnk")
    )

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
    """P9 (StaticBlacklistProvider): drop rows whose domain is in a
    static blacklist (broadcast anti join)."""
    dom = urls.withColumn("_domain", domain_expr(F.col(url_col)))
    return dom.join(
        F.broadcast(blacklist.select(F.col("domain").alias("_domain"))),
        "_domain",
        "left_anti",
    ).drop("_domain")


# BuiltInRulesBlacklistProvider constants (reference settings.py:34-35)
EXCLUDED_DOMAINS = {
    "web.archive.org", "forums.giantitp.com", "www.crutchfield.com",
    "plus.google.com", "www.lukas-renggli.ch",
}
DOMAIN_BLACKLIST_PATTERN = (
    r"porn|xxx|adult|jksu\.org|lwhyl\.org$|rgcd\.cn$|hzqwyou\.cn$"
    r"|omgoat\.org$|pussyboy\.net$"
)


def is_domain_blacklisted_py(domain: str, trusted: set[str] | None = None) -> bool:
    """BuiltInRulesBlacklistProvider twin
    [indexer/blacklist_providers.py:35-75]: excluded set -> regex ->
    trusted whitelist -> SEO-spam heuristics (8-or-6-char random
    subdomain of .com; all-numeric first label)."""
    import re as _re

    if domain in EXCLUDED_DOMAINS:
        return True
    if _re.search(DOMAIN_BLACKLIST_PATTERN, domain):
        return True
    if trusted and domain in trusted:
        return False
    parts = domain.split(".")
    if len(parts) == 3 and parts[2] == "com" and len(parts[0]) in {6, 8}:
        return True
    if parts and set(parts[0]) <= set("1234567890"):
        return True
    return False


def is_domain_blacklisted_expr(domain: Column, is_trusted: Column) -> Column:
    """Spark expression twin of ``is_domain_blacklisted_py`` — rule
    order preserved (excluded/regex fire even for trusted domains).
    ``is_trusted`` is a boolean column (join flag against the
    domain-prior table, the reference's DOMAINS whitelist)."""
    parts = F.split(domain, r"\.")
    first = F.element_at(parts, 1)
    hard = domain.isin(list(EXCLUDED_DOMAINS)) | domain.rlike(DOMAIN_BLACKLIST_PATTERN)
    seo = (
        (F.size(parts) == 3)
        & (F.element_at(parts, 3) == "com")
        & F.length(first).isin(6, 8)
    )
    # Python checks set(first) <= digits, which is True for an EMPTY
    # first label too -> [0-9]* not [0-9]+
    numeric = first.rlike("^[0-9]*$")
    return F.when(hard, F.lit(True)).when(is_trusted, F.lit(False)).otherwise(seo | numeric)


def filter_blacklisted_rules(
    urls: DataFrame, trusted_domains: DataFrame | None = None, url_col: str = "url"
) -> DataFrame:
    """P9 (BuiltInRulesBlacklistProvider): drop rows failing the
    built-in spam rules. ``trusted_domains``: (domain) whitelist table,
    broadcast (the ~8k-row HN-domains prior in the reference)."""
    dom = urls.withColumn("_domain", domain_expr(F.col(url_col)))
    if trusted_domains is not None:
        dom = dom.join(
            F.broadcast(
                trusted_domains.select(F.col("domain").alias("_domain"))
                .distinct()
                .withColumn("_trusted", F.lit(True))
            ),
            "_domain",
            "left",
        )
        trusted_flag = F.coalesce(F.col("_trusted"), F.lit(False))
    else:
        trusted_flag = F.lit(False)
    return (
        dom.where(~is_domain_blacklisted_expr(F.col("_domain"), trusted_flag))
        .drop("_domain", "_trusted")
    )


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


def refresh_priority(
    crawl_log: DataFrame,
    alpha: float = 0.5,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    changed_col: str = "changed",
    k: int | None = None,
) -> DataFrame:
    """Change-rate-driven RECRAWL scheduling — the policy upgrade the
    reference's frontier never makes: its queue orders by static domain
    priors + URL length + age (score_urls above, redis_url_queue.py),
    so a never-changing page and a news page recrawl at the same
    cadence. The classic fix (Cho & Garcia-Molina, "Effective Page
    Refresh Policies for Web Crawlers", ACM TODS 2003) models per-page
    change as a Poisson process estimated from the crawl history and
    prioritizes by expected staleness:

        lambda_hat = (n_changes + alpha) / (span_s + 1.0)   smoothed
        priority   = lambda_hat * age_s                     staleness

    Input: (url, crawl_ts, changed 0/1) observation rows — exactly what
    chained ``IndexBuilder.snapshot_diff`` epochs emit ('updated' = a
    change observation). "now" is the log's max timestamp (in-plan
    scalar, no driver round-trip).

    Scale shape: ONE map-side-combined aggregation at URL grain + one
    global rank window (at web scale rank within frontier partitions or
    take a top-k head, like frontier_topk). Arithmetic: exact integer
    microsecond diffs (timestampdiff, NTZ-safe), then double division
    in a pinned expression order — bitwise-replayable in ANSI SQL
    (contract refresh_priority)."""
    per_url = crawl_log.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).alias("n_crawls"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
        F.expr(
            f"timestampdiff(MICROSECOND, min({ts_col}), max({ts_col}))"
        ).alias("span_us"),
        F.max(ts_col).alias("last_ts"),
    )
    now_t = crawl_log.agg(F.max(ts_col).alias("now_ts"))
    j = per_url.crossJoin(F.broadcast(now_t))
    age_s = (
        F.expr("timestampdiff(MICROSECOND, last_ts, now_ts)").cast("double")
        / F.lit(1000000.0)
    )
    lam = (F.col("n_changes") + F.lit(float(alpha))) / (
        (F.col("span_us").cast("double") / F.lit(1000000.0)) + F.lit(1.0)
    )
    scored = j.select(
        "url", "n_crawls", "n_changes",
        lam.alias("_lam"), (lam * age_s).alias("_prio"),
    )
    w = Window.orderBy(F.desc("_prio"), F.asc("url"))
    out = scored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select(
        "url", "n_crawls", "n_changes",
        F.round("_lam", 6).alias("lambda_hat"),
        F.round("_prio", 6).alias("priority"),
        "rank",
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

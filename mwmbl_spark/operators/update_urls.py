"""Crawl-result -> URL-store dataflow (reference
indexer/update_urls.py:42-133 record_urls_in_database + process_link).

One batch of crawled items yields:
- every ITEM url with its terminal status — CRAWLED when content came
  back, else the error classification (P11);
- every extracted LINK url AND its root url ('scheme://host/') as
  status NEW, unless the link's domain fails the built-in blacklist
  rules (blacklist_providers.py);
- the (crawled-page domain -> link domain) edge set feeding the domain
  link graph (J7).

Per-URL resolution: the reference folds batches through dicts, so the
last writer in file order wins. Distributed, file order is undefined;
the deterministic analogue implemented here matches the reference's
"state only progresses forwards" invariant (crawler/urls.py:29-31):
status = MAX(status) over the url's rows (CRAWLED=100 > errors > NEW=0)
and (user_id, ts) from the row with the latest timestamp (tiebreak:
max user_id) — a documented divergence of tie order only.

Scale shape: link explosion happens map-side; the only exchange is the
per-url resolve (groupBy url — near-unique keys, no skew); the
blacklist is pure expressions plus an optional broadcast whitelist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.urls import (
    classify_errors,
    domain_expr,
    is_domain_blacklisted_expr,
)

STATUS_NEW = 0
STATUS_CRAWLED = 100


def record_urls(
    items: DataFrame,
    trusted_domains: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """items: (url, user_id, ts, status int, error_name string,
    has_content boolean, links array<string>). Returns
    (found_urls(url, user_id, status, ts), domain_links(src_domain,
    dst_domain))."""
    item_rows = items.select(
        "url",
        "user_id",
        "ts",
        F.when(F.col("has_content"), F.lit(STATUS_CRAWLED))
        .otherwise(classify_errors(items))
        .alias("status"),
    )

    raw_links = (
        items.where(F.col("has_content"))
        .select(
            "user_id",
            "ts",
            domain_expr(F.col("url")).alias("src_domain"),
            F.explode("links").alias("link"),
        )
        .withColumn("link_domain", domain_expr(F.col("link")))
        .where(F.col("link_domain").isNotNull() & (F.col("link_domain") != ""))
    )
    if trusted_domains is not None:
        raw_links = raw_links.join(
            F.broadcast(
                trusted_domains.select(F.col("domain").alias("link_domain"))
                .distinct()
                .withColumn("_trusted", F.lit(True))
            ),
            "link_domain",
            "left",
        )
        trusted_flag = F.coalesce(F.col("_trusted"), F.lit(False))
    else:
        trusted_flag = F.lit(False)
    ok_links = raw_links.where(
        ~is_domain_blacklisted_expr(F.col("link_domain"), trusted_flag)
    )

    root_url = F.concat(
        F.parse_url(F.col("link"), F.lit("PROTOCOL")), F.lit("://"),
        F.col("link_domain"), F.lit("/"),
    )
    link_rows = (
        ok_links.select("user_id", "ts", F.col("link").alias("url"))
        .unionByName(ok_links.select("user_id", "ts", root_url.alias("url")))
        .withColumn("status", F.lit(STATUS_NEW))
    )

    all_rows = item_rows.unionByName(link_rows.select("url", "user_id", "ts", "status"))
    w = Window.partitionBy("url").orderBy(F.desc("ts"), F.desc("user_id"))
    found = (
        all_rows.withColumn("_max_status", F.max("status").over(Window.partitionBy("url")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "user_id", F.col("_max_status").alias("status"), "ts")
    )

    domain_links = ok_links.select(
        "src_domain", F.col("link_domain").alias("dst_domain")
    ).distinct()
    return found, domain_links

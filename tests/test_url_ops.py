"""URL operators: P9 blacklist filter (indexer/blacklist.py analogue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwmbl_spark.operators.urls import filter_blacklisted


def test_filter_blacklisted_drops_only_listed_domains(spark):
    urls = spark.createDataFrame(
        [
            (0, "https://spam.example.com/page"),
            (1, "https://good.example.org/a"),
            (2, "https://spam.example.com/other"),
            (3, "https://also-fine.net/x"),
        ],
        "doc_id long, url string",
    )
    blacklist = spark.createDataFrame(
        [("spam.example.com",), ("unused.example.com",)], "domain string"
    )
    out = filter_blacklisted(urls, blacklist)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3]
    # schema untouched: the helper column is dropped
    assert out.columns == ["doc_id", "url"]


def test_filter_blacklisted_empty_blacklist_is_identity(spark):
    urls = spark.createDataFrame([(0, "https://a.com/x")], "doc_id long, url string")
    blacklist = spark.createDataFrame([], "domain string")
    assert filter_blacklisted(urls, blacklist).count() == 1


def test_filter_blacklisted_plan_is_broadcast_anti_join(spark):
    urls = spark.createDataFrame([(0, "https://a.com/x")], "doc_id long, url string")
    blacklist = spark.createDataFrame([("a.com",)], "domain string")
    plan = filter_blacklisted(urls, blacklist)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

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


# --- BuiltInRulesBlacklistProvider (reference test/test_blacklist.py) --------

BAD_DOMAINS = [
    "brofqpxj.uelinc.com",
    "gzsmjc.fba01.com",
    "59648.etnomurcia.com",
    "something.hzqwyou.cn",
]


def test_builtin_rules_twin_matches_reference_cases():
    from mwmbl_spark.operators.urls import is_domain_blacklisted_py

    for d in BAD_DOMAINS:
        assert is_domain_blacklisted_py(d), d
    assert not is_domain_blacklisted_py(
        "teamblog.supportbee.com", trusted={"teamblog.supportbee.com"}
    )
    assert not is_domain_blacklisted_py("something.com")
    # excluded set fires even when trusted
    assert is_domain_blacklisted_py("web.archive.org", trusted={"web.archive.org"})


def test_builtin_rules_spark_matches_twin(spark):
    from mwmbl_spark.operators.urls import (
        filter_blacklisted_rules,
        is_domain_blacklisted_py,
    )

    domains = BAD_DOMAINS + [
        "teamblog.supportbee.com", "something.com", "web.archive.org",
        "ok.example.org", "123456.numeric.net", "porn.example.com",
    ]
    urls = spark.createDataFrame(
        [(i, f"https://{d}/x") for i, d in enumerate(domains)],
        "doc_id long, url string",
    )
    trusted = spark.createDataFrame(
        [("teamblog.supportbee.com",)], "domain string"
    )
    kept = {r["url"] for r in filter_blacklisted_rules(urls, trusted).collect()}
    want = {
        f"https://{d}/x"
        for d in domains
        if not is_domain_blacklisted_py(d, trusted={"teamblog.supportbee.com"})
    }
    assert kept == want


# --- record_urls (update_urls.py:42-133 composed flow) ------------------------

def test_record_urls_flow(spark):
    from mwmbl_spark.operators.update_urls import record_urls

    items = spark.createDataFrame(
        [
            ("https://site.a.com/page1", "u1", 100, 0, None, True,
             ["https://good.example.org/x", "https://abcdef.spam01.com/bad"]),
            ("https://good.example.org/x", "u2", 200, 404, None, False, None),
            ("https://site.a.com/page1", "u3", 50, 0, None, True, []),
        ],
        "url string, user_id string, ts long, status int, error_name string, "
        "has_content boolean, links array<string>",
    )
    found, links = record_urls(items)
    rows = {r["url"]: r for r in found.collect()}

    # crawled item: CRAWLED wins; latest-ts writer provides (user, ts)
    assert rows["https://site.a.com/page1"]["status"] == 100
    assert rows["https://site.a.com/page1"]["user_id"] == "u1"
    # url that is BOTH a link and a failed crawl: error status beats NEW
    assert rows["https://good.example.org/x"]["status"] == 30  # 404
    assert rows["https://good.example.org/x"]["user_id"] == "u2"
    # the link's root url is recorded as NEW
    assert rows["https://good.example.org/"]["status"] == 0
    # blacklisted link (6-char .com subdomain) and its root are excluded
    assert "https://abcdef.spam01.com/bad" not in rows
    assert "https://abcdef.spam01.com/" not in rows

    edges = {(r["src_domain"], r["dst_domain"]) for r in links.collect()}
    assert edges == {("site.a.com", "good.example.org")}

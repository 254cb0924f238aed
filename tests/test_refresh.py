"""Change-rate recrawl scheduling (operators/urls.refresh_priority)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.urls import refresh_priority


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def log(spark):
    rows = [
        ("a", _ts(0), 0),
        ("a", _ts(10), 1),
        ("b", _ts(5), 0),
    ]
    return spark.createDataFrame(
        rows, "url string, crawl_ts timestamp, changed int"
    )


def test_hand_computed(spark, log):
    """now = t+10 (log max). a: lambda=(1+0.5)/(10+1), age 0 -> prio 0.
    b: lambda=0.5/1, age 5 -> prio 2.5. b outranks a."""
    got = {
        r["url"]: (
            int(r["n_crawls"]), int(r["n_changes"]),
            float(r["lambda_hat"]), float(r["priority"]), int(r["rank"]),
        )
        for r in refresh_priority(log).collect()
    }
    assert got["a"] == (2, 1, round(1.5 / 11, 6), 0.0, 2)
    assert got["b"] == (1, 0, 0.5, 2.5, 1)


def test_k_cap_and_tiebreak(spark):
    # two never-changing single-crawl pages at the same instant: equal
    # priority, rank ties break on url asc
    rows = [("x", _ts(0), 0), ("w", _ts(0), 0), ("hot", _ts(0), 1)]
    df = spark.createDataFrame(rows, "url string, crawl_ts timestamp, changed int")
    got = [(r["url"], int(r["rank"])) for r in
           refresh_priority(df).orderBy("rank").collect()]
    # now == t0 for all -> every age is 0 -> all priorities 0 -> pure
    # url-asc ordering
    assert got == [("hot", 1), ("w", 2), ("x", 3)]
    capped = refresh_priority(df, k=2)
    assert capped.count() == 2


def test_changed_column_accepts_booleans(spark):
    rows = [("a", _ts(0), True), ("a", _ts(4), False)]
    df = spark.createDataFrame(rows, "url string, crawl_ts timestamp, changed boolean")
    r = refresh_priority(df).collect()[0]
    assert int(r["n_changes"]) == 1 and int(r["n_crawls"]) == 2

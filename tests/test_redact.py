"""PII scrubbing — rule order, boundaries, and counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwmbl_spark.functions.redact import pii_counts, redact_pii_expr


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    cols = [redact_pii_expr(F.col("text")).alias("red")]
    cols += [v.alias(k) for k, v in pii_counts(F.col("text")).items()]
    return [r.asDict() for r in df.select("i", *cols).orderBy("i").collect()]


def test_redact_rules(spark):
    rows = _run(spark, [
        "mail bob.smith+x@example.co.uk now",
        "server at 10.0.0.1 port 80",
        "card 4111111111111111 stolen",
        "call +4915112345678 or 555-123-4567",
        "clean text with numbers 42 and 1.5",
    ])
    assert rows[0]["red"] == "mail <EMAIL> now" and rows[0]["n_email"] == 1
    assert rows[1]["red"] == "server at <IP> port 80" and rows[1]["n_ipv4"] == 1
    assert rows[2]["red"] == "card <CARD> stolen" and rows[2]["n_card"] == 1
    assert rows[3]["red"] == "call <PHONE> or <PHONE>" and rows[3]["n_phone"] == 2
    assert rows[4]["red"] == "clean text with numbers 42 and 1.5"
    assert all(rows[4][k] == 0 for k in ("n_email", "n_ipv4", "n_card", "n_phone"))


def test_redact_order_specific_before_digit_rules(spark):
    # the email's digit run and the IP's octets must NOT be re-matched
    # by card/phone rules; a 15-digit run inside an email local part is
    # consumed by the email rule first
    rows = _run(spark, ["a 123456789012345@x.io b", "ip 192.168.100.200 end"])
    assert rows[0]["red"] == "a <EMAIL> b"
    assert rows[0]["n_card"] == 0
    assert rows[1]["red"] == "ip <IP> end"
    assert rows[1]["n_phone"] == 0 and rows[1]["n_card"] == 0

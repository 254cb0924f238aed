"""Distributed Bloom-filter seen-set (operators/bloom.py): no false
negatives, FPR near design, JVM/Python position parity, roundtrip
serialization, and the bounded-shuffle build plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwmbl_spark.operators.bloom import (
    BloomFilter,
    bloom_parameters,
    build_bloom,
    filter_unseen,
)


def _urls(spark, start, n):
    return spark.range(start, start + n).select(
        F.concat(F.lit("https://example.org/page/"), F.col("id")).alias("url")
    )


def test_no_false_negatives_and_fpr(spark):
    n = 5000
    m, k = bloom_parameters(n, fpr=0.01)
    seen = _urls(spark, 0, n)
    bloom = build_bloom(seen, "url", m, k)
    # every seen URL must be dropped by filter_unseen
    assert filter_unseen(seen, "url", bloom).count() == 0
    # unseen URLs survive at >= 1 - 3*fpr
    fresh = _urls(spark, 1_000_000, n)
    kept = filter_unseen(fresh, "url", bloom).count()
    fp_rate = 1.0 - kept / n
    assert fp_rate <= 0.03, fp_rate


def test_filter_preserves_rows_and_schema(spark):
    seen = _urls(spark, 0, 100)
    m, k = bloom_parameters(100, 0.01)
    bloom = build_bloom(seen, "url", m, k)
    df = _urls(spark, 500_000, 50).withColumn("extra", F.lit(7))
    out = filter_unseen(df, "url", bloom)
    assert out.columns == ["url", "extra"]
    rows = out.collect()
    assert len(rows) >= 48  # at most a false positive or two
    assert all(r.extra == 7 for r in rows)


def test_serialization_roundtrip(spark):
    seen = _urls(spark, 0, 200)
    m, k = bloom_parameters(200, 0.01)
    bloom = build_bloom(seen, "url", m, k)
    again = BloomFilter.from_bytes(bloom.to_bytes())
    assert again.m_bits == bloom.m_bits and again.k_hashes == bloom.k_hashes
    assert (again.words == bloom.words).all()
    assert filter_unseen(seen, "url", again).count() == 0


def test_parameters_sizing():
    m, k = bloom_parameters(1_000_000, 0.01)
    assert m % 64 == 0
    assert 9.0 < m / 1_000_000 < 10.5  # ~9.6 bits/item at 1%
    assert k == 7


def test_build_shuffle_is_filter_bounded(spark):
    """The bit_or aggregation must have a map-side partial: the
    exchange carries word rows (<= m/64 per partition), not item rows."""
    seen = _urls(spark, 0, 1000)
    m, k = bloom_parameters(1000, 0.01)
    pos = seen.select(
        F.explode(
            F.array(
                *[F.pmod(F.xxhash64(F.col("url"), F.lit(i)), F.lit(m)) for i in range(k)]
            )
        ).alias("pos")
    )
    agg = (
        pos.select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan  # partial + final

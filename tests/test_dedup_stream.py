"""Streaming exact dedup: in-batch, cross-epoch, and restart state."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwmbl_spark.streaming.dedup_stream import exact_dedup_stream


def _write(spark, path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_exact_dedup_stream_cross_epoch(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    # epoch 1: t0..t9 plus an in-batch duplicate of t0
    _write(spark, src, [(i, f"text {i}") for i in range(10)] + [(100, "text 0")])
    exact_dedup_stream(spark, src, out, ckpt)
    got1 = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(got1) == sorted(f"text {i}" for i in range(10))

    # epoch 2 (same checkpoint = restart + resume): t5..t14 — only the
    # five genuinely-new texts may appear; t5..t9 are state-suppressed
    _write(spark, src, [(200 + i, f"text {i}") for i in range(5, 15)])
    exact_dedup_stream(spark, src, out, ckpt)
    got2 = [r.text for r in spark.read.parquet(out).collect()]
    assert sorted(got2) == sorted(f"text {i}" for i in range(15))
    assert len(got2) == len(set(got2)), "no text may ever appear twice"

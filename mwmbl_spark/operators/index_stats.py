"""Sampled index statistics — distinct-count estimation from a page
sample (reference: mwmbl/count_urls.py:45-85).

The reference samples PAGE_PROPORTION_TO_SAMPLE of index pages daily,
counts per-URL / per-domain occurrences within the sample, extrapolates
total results, and feeds the frequency table to pydistinct's smoothed
jackknife estimator. Spark-first shape:

- page sampling is a DETERMINISTIC hash predicate (pmod(xxhash64(page,
  seed))) — a partition-prunable filter instead of a driver-side RNG
  loop, reproducible across engines and runs;
- frequency-of-frequencies (f1, f2, d) is two aggregations;
- the estimator is bias-corrected Chao1: d + f1*(f1-1)/(2*(f2+1)).
  pydistinct (and its smoothed jackknife) is not in this container;
  Chao1 is the standard frequency-of-frequency lower-bound estimator
  from the same family (Chao 1984, as used in species-richness and DV
  estimation literature) and slots into the identical dataflow — the
  estimator is one expression, swap it if pydistinct is available.

Everything is one small plan: sample filter -> two narrow groupBys over
(page, url); at 10^10 URLs the sampled slice is proportion*N rows and
the shuffle key is the URL hash, never full pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_PROPORTION_TO_SAMPLE = 0.01  # count_urls.py:24


def sample_pages(pages: DataFrame, proportion: float, seed: int = 1,
                 page_col: str = "page", portable: bool = False) -> DataFrame:
    """Deterministic ~proportion page sample: hash-bucket the page id.
    ``portable=True`` uses the md5-derived hash (engine-portable, so a
    SQL oracle states the identical sample); default xxhash64 is the
    fast JVM path for production."""
    buckets = 1_000_000
    if portable:
        h = F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(page_col).cast("string"))), 1, 15),
                16, 10,
            ).cast("long"),
            F.lit(buckets),
        )
    else:
        h = F.pmod(F.xxhash64(F.col(page_col), F.lit(seed)), F.lit(buckets))
    return pages.where(h < int(proportion * buckets))


def sampled_index_stats(
    pages: DataFrame,
    proportion: float = PAGE_PROPORTION_TO_SAMPLE,
    seed: int = 1,
    page_col: str = "page",
    url_col: str = "url",
    portable: bool = False,
) -> DataFrame:
    """One-row DataFrame: (n_results_estimate, distinct_urls_estimate,
    sample_docs, sample_distinct, f1, f2) — the count_urls.py daily
    metric set. ``pages``: (page, url) doc rows."""
    s = sample_pages(pages, proportion, seed, page_col, portable)
    # per-URL page frequency within the sample (the reference counts a
    # url once per page: Counter.update({doc.url for doc in page}))
    freq = (
        s.select(page_col, url_col).distinct()
        .groupBy(url_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fof = freq.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum((F.col("n") == 1).cast("long")).alias("f1"),
        F.sum((F.col("n") == 2).cast("long")).alias("f2"),
    )
    total = s.agg(F.count(F.lit(1)).alias("sample_docs"))
    return total.crossJoin(fof).select(
        (F.col("sample_docs") / F.lit(proportion)).cast("long").alias("n_results_estimate"),
        (
            F.col("d")
            + (F.col("f1") * (F.col("f1") - 1)) / (2.0 * (F.col("f2") + 1))
        ).cast("long").alias("distinct_urls_estimate"),
        "sample_docs",
        F.col("d").alias("sample_distinct"),
        "f1",
        "f2",
    )

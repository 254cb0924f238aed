"""Corpus mixing, deterministic sampling, and sequence packing for
training-data pipelines.

The reference never samples — it indexes everything it crawls
(/root/reference/mwmbl/indexer/index_batches.py) — but a 100 TB
training corpus is always a *mixture*: per-source quotas, smoothed
language/source shares, and token-budget packing into model context
windows. Everything here is deterministic (md5-derived hash60, no RNG
state), so results are stable under retries, re-partitioning, and
engine ports — Spark's own ``df.sample`` is seed-stable only for a
fixed partitioning, which makes it unreproducible after any upstream
shuffle change.

Scale notes:
- ``hash_sample`` / ``temperature_mix`` are pure filters (plus one
  tiny group-count aggregate broadcast back); zero shuffle of the
  corpus itself.
- ``quota_sample`` is the cap_term_index plan: row_number over
  (group) lowers to a map-side WindowGroupLimit, so each input
  partition forwards at most ``cap`` rows per group into the shuffle.
- ``pack_sequences`` shards by hash and runs a bounded running sum
  per shard: O(1) window state, sequential only within a shard —
  pick ``n_shards`` >= cluster cores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.dedup import hash60

HASH_MOD = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic uniform integer in [0, HASH_MOD) — DuckDB twin:
    ('0x' || substr(md5(key || salt), 1, 15))::BIGINT % 1000000."""
    return F.pmod(hash60(F.concat(key.cast("string"), F.lit(salt))), F.lit(HASH_MOD))


def _hash_unit(key: Column, salt: str) -> Column:
    """Uniform double in [0, 1) on a 1e-6 grid. Rates compared against
    it must stay RAW doubles — rounding a rate to 6 decimals would park
    it exactly on the grid and turn float noise into membership flips."""
    return _hash_bucket(key, salt) / F.lit(HASH_MOD)


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash-unit is
    below ``fraction``. Change ``salt`` for an independent draw."""
    return df.where(_hash_unit(F.col(id_col), salt) < fraction)


def quota_sample(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """At most ``cap`` rows per group: the group's top-``cap`` by
    ``order_col`` descending when given (e.g. a quality score), else by
    deterministic hash shuffle — id tiebreak either way."""
    if order_col is not None:
        order = [F.col(order_col).desc(), F.col(id_col).asc()]
    else:
        order = [_hash_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
) -> DataFrame:
    """(group, n_rows, keep_rate): temperature-smoothed mixture shares,
    target share of group g ∝ n_g**alpha (the multilingual-LM exponent
    smoothing of mBERT / XLM-R, arXiv:1911.02116 §3.1), scaled to a
    total row ``budget`` (default: corpus size) and capped at 1.0 —
    this operator only down-samples.

    alpha == 0.5 routes through sqrt, which IEEE 754 rounds correctly
    (unlike pow) — the contract pins that value so the DuckDB oracle is
    bit-identical.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    n = F.col("n_rows").cast("double")
    weight = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    weighted = counts.select(group_col, "n_rows", weight.alias("w"))
    totals = weighted.agg(
        F.sum("w").alias("sum_w"), F.sum("n_rows").alias("n_total")
    )
    b = F.lit(float(budget)) if budget is not None else F.col("n_total").cast("double")
    return weighted.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_rows",
        F.least(F.lit(1.0), F.col("w") / F.col("sum_w") * b / n).alias("keep_rate"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature resampling: per-group keep rates from
    ``temperature_rates`` applied as a hash-unit Bernoulli filter. The
    rate table is tiny (one row per group) and broadcast — the corpus
    itself is never shuffled."""
    rates = temperature_rates(df, group_col, alpha, budget)
    return (
        df.join(F.broadcast(rates.select(group_col, "keep_rate")), group_col)
        .where(_hash_unit(F.col(id_col), salt) < F.col("keep_rate"))
        .drop("keep_rate")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are sharded by
    hash, laid end-to-end in id order within each shard, and cut into
    training sequences of ``max_tokens``. Output adds
    (shard, seq_id, tok_offset): the document's tokens start at
    ``tok_offset`` of shard-local sequence ``seq_id``; a document
    whose tokens cross a boundary continues into the next sequence
    (the standard streaming concat-and-chunk semantics — the consumer
    splits at boundaries, nothing is dropped).

    All-integer math (exclusive running sum over a ROWS frame), so the
    oracle is exact; packing is sequential only within a shard.
    """
    shard = _hash_bucket(F.col(id_col), "shard") % n_shards
    out = df.withColumn("shard", shard.cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0)).cast("long")
    # integral `div`, not floor(x / y): double division drifts past 2^53
    return (
        out.withColumn("__cum", cum)
        .select(
            "*",
            F.expr(f"__cum div {int(max_tokens)}").alias("seq_id"),
            F.pmod(F.col("__cum"), F.lit(max_tokens)).cast("long").alias("tok_offset"),
        )
        .drop("__cum")
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic split assignment: every row sharing
    ``key_col`` lands in the same split, because the hash is taken on
    the GROUP key — split transcripts by conv_id, never by turn, or
    sibling turns of one conversation leak across train/test. Pure
    expression (no shuffle); weights need not be normalized.

    Boundary determinism: cut points sit on the same doubles in every
    engine (same literals, same IEEE division), so membership is exact
    cross-engine even for a hash-unit landing exactly on a cut.
    """
    total = sum(w for _, w in splits)
    u = _hash_unit(F.col(key_col), salt)
    expr = F.lit(splits[-1][0])
    cum = 0.0
    conds = []
    for name, w in splits[:-1]:
        cum += w / total
        conds.append((cum, name))
    for cut, name in reversed(conds):
        expr = F.when(u < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)

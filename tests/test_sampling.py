"""Deterministic sampling / mixing / packing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from mwmbl_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    quota_sample,
    temperature_mix,
    temperature_rates,
)


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g in sorted(sizes):
        for _ in range(sizes[g]):
            rows.append((i, g, float(i % 7)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, grp string, score double")


def test_hash_sample_deterministic_and_partition_stable(spark):
    df = _corpus(spark, {"a": 400})
    ids1 = sorted(r.doc_id for r in hash_sample(df, 0.3).collect())
    ids2 = sorted(r.doc_id for r in hash_sample(df.repartition(7), 0.3).collect())
    assert ids1 == ids2, "membership must not depend on partitioning"
    assert 0.2 < len(ids1) / 400 < 0.4
    salted = sorted(r.doc_id for r in hash_sample(df, 0.3, salt="s1").collect())
    assert salted != ids1, "salt must give an independent draw"


def test_quota_sample_cap_and_score_order(spark):
    df = _corpus(spark, {"a": 50, "b": 3})
    out = quota_sample(df, "grp", cap=10, order_col="score")
    by_grp = {}
    for r in out.collect():
        by_grp.setdefault(r.grp, []).append(r)
    assert len(by_grp["a"]) == 10 and len(by_grp["b"]) == 3
    # top-by-score: every kept score must be >= every dropped score in a
    kept = {r.doc_id for r in by_grp["a"]}
    scores = {r.doc_id: r.score for r in df.where("grp='a'").collect()}
    worst_kept = min(scores[d] for d in kept)
    best_dropped = max(s for d, s in scores.items() if d not in kept)
    assert worst_kept >= best_dropped


def test_quota_sample_hash_order_deterministic(spark):
    df = _corpus(spark, {"a": 50})
    a = sorted(r.doc_id for r in quota_sample(df, "grp", cap=20).collect())
    b = sorted(r.doc_id for r in quota_sample(df.repartition(5), "grp", cap=20).collect())
    assert a == b and len(a) == 20


def test_temperature_rates_smooth_shares(spark):
    df = _corpus(spark, {"big": 900, "small": 100})
    rates = {r.grp: r for r in temperature_rates(df, "grp", alpha=0.5).collect()}
    # sqrt smoothing: big gets 0.75 of budget -> rate 1000*.75/900 = .8333
    assert abs(rates["big"].keep_rate - 0.75 * 1000 / 900) < 1e-12
    assert rates["small"].keep_rate == 1.0, "small groups cap at keep-all"


def test_temperature_mix_downsamples_head_group(spark):
    df = _corpus(spark, {"big": 900, "small": 100})
    out = temperature_mix(df, "grp", alpha=0.5)
    got = {g: n for g, n in out.groupBy("grp").count().collect()}
    assert got["small"] == 100
    assert 0.75 * 1000 / 900 * 900 * 0.85 < got["big"] < 0.75 * 1000 / 900 * 900 * 1.15
    again = {g: n for g, n in temperature_mix(df.repartition(9), "grp").groupBy("grp").count().collect()}
    assert got == again


def test_pack_sequences_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, 80), (1, 50), (2, 90), (3, 10)], "doc_id long, n_tokens int"
    )
    out = pack_sequences(df, max_tokens=100, n_shards=1)
    got = {r.doc_id: (r.seq_id, r.tok_offset) for r in out.collect()}
    # cumsum-exclusive: 0, 80, 130, 220 -> seq 0@0, 0@80 (straddles), 1@30, 2@20
    assert got == {0: (0, 0), 1: (0, 80), 2: (1, 30), 3: (2, 20)}


def test_pack_sequences_sharded_no_cross_talk(spark):
    df = spark.createDataFrame([(i, 10) for i in range(200)], "doc_id long, n_tokens int")
    out = pack_sequences(df, max_tokens=35, n_shards=4)
    rows = out.collect()
    assert {r.shard for r in rows} == {0, 1, 2, 3}
    # within each shard the offsets replay the exclusive cumsum in id order
    for shard in range(4):
        mine = sorted((r.doc_id, r.seq_id, r.tok_offset) for r in rows if r.shard == shard)
        cum = 0
        for _, seq_id, off in mine:
            assert (seq_id, off) == (cum // 35, cum % 35)
            cum += 10


def test_assign_split_group_coherent_and_proportional(spark):
    rows = [(c, t, f"conv-{c}") for c in range(300) for t in range(4)]
    df = spark.createDataFrame(rows, "c int, t int, conv_id string")
    from mwmbl_spark.operators.sampling import assign_split

    out = assign_split(df, "conv_id").collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conv_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_conv.values()), "turns must not leak"
    convs = {c: next(iter(s)) for c, s in by_conv.items()}
    n = len(convs)
    shares = {name: sum(1 for v in convs.values() if v == name) / n
              for name in ("train", "val", "test")}
    assert 0.84 < shares["train"] < 0.96
    assert 0.02 < shares["val"] < 0.09 and 0.02 < shares["test"] < 0.09
    again = {r.conv_id: r.split
             for r in assign_split(df.repartition(11), "conv_id").collect()}
    assert all(again[c] == v for c, v in convs.items())

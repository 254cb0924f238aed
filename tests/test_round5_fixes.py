"""Round-5 fixes (VERDICT r4 items 3/4/9/10 + ADVICE items): pmi_pairs
scale defaults, embedding-dedup default bucket cap, serving-loop
broadcast hygiene over many query batches, the multi-shard delete-map
bound, bigram-LM backoff for reused models, xgboost base_score link
mapping, and the A7 oracle-twin null-score convention."""

from __future__ import annotations

import inspect
import logging
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pmi_pairs: default per-doc cap ON, no vocabulary-grain broadcast hint
# ---------------------------------------------------------------------------


def test_pmi_default_cap_is_on():
    from mwmbl_spark.operators.corpus_analytics import (
        DEFAULT_PMI_DOC_CAP,
        pmi_pairs,
    )

    default = inspect.signature(pmi_pairs).parameters["max_terms_per_doc"].default
    assert default == DEFAULT_PMI_DOC_CAP and default is not None


def test_pmi_cap_drops_mega_doc(spark):
    from mwmbl_spark.operators.corpus_analytics import pmi_pairs

    # doc 0 holds 30 distinct terms (over the cap of 20), docs 1-4 hold
    # the same 3-term set; every term passes min_df via doc 5 repeats
    mega = [f"t{i:03d}" for i in range(30)]
    small = ["alpha", "beta", "gamma"]
    rows = [(0, mega)] + [(i, small) for i in range(1, 5)] + [(5, mega + small)]
    docs = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    out = pmi_pairs(docs, min_df=2, k=100, max_terms_per_doc=20).collect()
    # mega-doc (and doc 5) dropped whole: only the small-set pairs
    # remain, with n_ab == 4 (docs 1-4) and N == population of 4
    got = {(r["term_a"], r["term_b"]): r for r in out}
    assert set(got) == {("alpha", "beta"), ("alpha", "gamma"), ("beta", "gamma")}
    for r in got.values():
        assert r["n_ab"] == 4
        # pmi = ln(4 * 4 / (5 * 5)): dfs still count the dropped docs
        assert abs(r["pmi"] - round(math.log(16 / 25), 6)) < 1e-9


def test_pmi_no_vocab_broadcast_hint(spark):
    from mwmbl_spark.operators.corpus_analytics import pmi_pairs

    docs = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["a", "b"])], "doc_id long, toks array<string>"
    )
    plan = pmi_pairs(docs)._jdf.queryExecution().analyzed().toString()
    # exactly one hint survives: the 1-row N scalar. The vocabulary-
    # grain df tables must NOT be force-broadcast (executor OOM at
    # corpus scale; AQE broadcasts them at runtime when they fit).
    assert plan.count("ResolvedHint") == 1


# ---------------------------------------------------------------------------
# embedding_near_duplicates: bucket cap defaults ON + warns on degenerate
# ---------------------------------------------------------------------------


def test_embedding_dedup_bucket_cap_default():
    from mwmbl_spark.operators.dedup import DEFAULT_BAND_CAP
    from mwmbl_spark.operators.similarity import (
        DEFAULT_BUCKET_CAP,
        embedding_near_duplicates,
    )

    default = inspect.signature(embedding_near_duplicates).parameters[
        "bucket_cap"
    ].default
    assert default == DEFAULT_BUCKET_CAP == DEFAULT_BAND_CAP


def test_embedding_dedup_warns_on_degenerate_bucket(spark, caplog):
    from mwmbl_spark.operators.similarity import embedding_near_duplicates

    # all-zeros embeddings: one sign bucket holds the whole corpus —
    # the classic dead-encoder failure that would go quadratic
    vecs = spark.createDataFrame(
        [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    with caplog.at_level(logging.WARNING, logger="mwmbl_spark.dedup"):
        out = embedding_near_duplicates(vecs, threshold=0.9, bucket_cap=10)
        # the warning is SYNCHRONOUS (fires at plan-build time): the
        # round-4 Observation form was silently lost once the capped
        # table fed the self-join — the exact case this test pins
        assert any("cap_bands" in r.message for r in caplog.records)
        assert out.count() == 0  # capped bucket dropped WHOLE


# ---------------------------------------------------------------------------
# serving loop: ONE live delete-map broadcast across many query batches
# ---------------------------------------------------------------------------


def test_serving_loop_single_delete_broadcast(spark, tmp_path, monkeypatch):
    from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
    from mwmbl_spark.synth import synth_transcripts, with_doc_id

    t = with_doc_id(synth_transcripts(spark, n_conv=20, turns_per_conv=3, seed=31))
    cfg = IndexConfig(
        path=str(tmp_path / "idx"), num_buckets=8, nsalt=2, n_src_partitions=2
    )
    b = IndexBuilder(spark, cfg)
    b.build(t)
    b.upsert(t.limit(5).select("doc_id", F.concat("text", F.lit(" v2")).alias("text")))

    from mwmbl_spark.operators import upsert as upsert_mod

    loads = []
    real_load = upsert_mod.load_delete_map

    def counting_load(*a, **kw):
        loads.append(1)
        return real_load(*a, **kw)

    monkeypatch.setattr(upsert_mod, "load_delete_map", counting_load)
    b._deletes_cache = None  # force one fresh load under the counter

    qdf = spark.createDataFrame([(0, "the spark")], "query_id long, query string")
    first = b.delete_broadcast()
    assert first is not None
    for _ in range(50):
        b.query_topk(qdf, k=5).collect()
        assert b._deletes_cache[2] is first  # same live broadcast object
    assert sum(loads) == 1  # vectors read from disk exactly once


# ---------------------------------------------------------------------------
# multi-shard delete-map bound
# ---------------------------------------------------------------------------


def test_merge_shard_deletes_warns_at_threshold(caplog):
    from mwmbl_spark.plans.build_index import _merge_shard_deletes

    per_salt = {
        0: [
            (np.array([3, 1], dtype=np.uint64), np.array([7, 9], dtype=np.int64)),
            (np.array([2], dtype=np.uint64), np.array([8], dtype=np.int64)),
        ]
    }
    with caplog.at_level(logging.WARNING, logger="mwmbl_spark.build_index"):
        merged = _merge_shard_deletes(per_salt, n_shards=2, warn_threshold=2)
    assert any("multi-shard delete map" in r.message for r in caplog.records)
    ids, seqs = merged[0]
    assert list(ids) == [1, 2, 3] and list(seqs) == [9, 8, 7]

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="mwmbl_spark.build_index"):
        _merge_shard_deletes(per_salt, n_shards=2, warn_threshold=3)
    assert not caplog.records  # at-or-below threshold: silent


# ---------------------------------------------------------------------------
# bigram LM: reused-model scoring backs off instead of dropping docs
# ---------------------------------------------------------------------------


def test_bigram_logprob_reused_model_backoff(spark):
    from mwmbl_spark.operators.lm_quality import bigram_logprob, train_bigram_model

    train = spark.createDataFrame(
        [(0, ["the", "cat", "sat"]), (1, ["the", "cat", "ran"])],
        "doc_id long, toks array<string>",
    )
    model = train_bigram_model(train)
    new = spark.createDataFrame(
        [
            (10, ["cat", "the"]),        # unseen bigram, seen unigrams
            (11, ["zzz", "qqq", "the"]),  # fully OOV words
        ],
        "doc_id long, toks array<string>",
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(new, model=model).collect()}
    assert set(rows) == {10, 11}  # nothing silently dropped
    for r in rows.values():
        assert math.isfinite(r["bigram_logprob"])
    # unseen bigram backs off to (1-lam) * cf(w2)/T exactly:
    # cf(the)=2, T=6 -> p = 0.2 * 2/6
    assert abs(rows[10]["bigram_logprob"] - round(math.log(0.2 * 2 / 6), 6)) < 1e-9
    # OOV w2 scores the 0.5 pseudo-count, strictly worse than a seen one
    assert rows[11]["bigram_logprob"] < rows[10]["bigram_logprob"]


def test_bigram_logprob_same_corpus_unchanged(spark):
    from mwmbl_spark.operators.lm_quality import bigram_logprob, train_bigram_model

    docs = spark.createDataFrame(
        [(0, ["a", "b", "a", "b"]), (1, ["b", "a"])],
        "doc_id long, toks array<string>",
    )
    implicit = {r["doc_id"]: r["bigram_logprob"] for r in bigram_logprob(docs).collect()}
    explicit = {
        r["doc_id"]: r["bigram_logprob"]
        for r in bigram_logprob(docs, model=train_bigram_model(docs)).collect()
    }
    assert implicit == explicit


# ---------------------------------------------------------------------------
# xgboost base_score -> margin link per objective family
# ---------------------------------------------------------------------------


def _stub_model(objective: str, base_score: float) -> dict:
    return {
        "learner": {
            "objective": {"name": objective},
            "gradient_booster": {
                "model": {
                    "trees": [
                        {
                            "split_indices": [0],
                            "split_conditions": [0.5],
                            "left_children": [-1],
                            "right_children": [-1],
                            "default_left": [1],
                        }
                    ]
                }
            },
            "learner_model_param": {"base_score": str(base_score)},
        }
    }


def test_xgb_base_margin_links():
    from mwmbl_spark.functions.xgb_model import XgbTreesModel

    logit = XgbTreesModel(_stub_model("binary:logistic", 0.5)).base_margin
    assert abs(logit - 0.0) < 1e-12
    pois = XgbTreesModel(_stub_model("count:poisson", 0.5)).base_margin
    assert abs(pois - math.log(0.5)) < 1e-12  # log link, NOT logit
    rank = XgbTreesModel(_stub_model("rank:pairwise", 0.5)).base_margin
    assert rank == 0.5  # identity link
    reg = XgbTreesModel(_stub_model("reg:squarederror", 1.25)).base_margin
    assert reg == 1.25


# ---------------------------------------------------------------------------
# A7 oracle twin: null crawl score sorts LAST (desc_nulls_last)
# ---------------------------------------------------------------------------


def test_oracle_a7_cap_null_score_sorts_last():
    import sys

    sys.path.insert(0, ".")
    from oracle.search import search_py

    docs = [
        {"doc_id": 1, "title": "spark guide alpha", "extract": "",
         "url": "https://a.com/1", "score": None, "state": None},
        {"doc_id": 2, "title": "spark guide beta", "extract": "",
         "url": "https://b.com/2", "score": -5.0, "state": None},
        {"doc_id": 3, "title": "spark guide gamma", "extract": "",
         "url": "https://c.com/3", "score": 2.0, "state": None},
    ]
    # cap=2 keeps the two best by crawl score: 2.0 then -5.0 — the None
    # doc must fall out (a `score or 0.0` twin would wrongly keep it
    # ABOVE the negative score)
    out = search_py(docs, "spark guide ", k=10, term_doc_cap=2)
    assert {d["doc_id"] for d in out} == {2, 3}

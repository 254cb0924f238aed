"""Re-shard (S8) and LTR (W2) operators."""

from __future__ import annotations

import numpy as np
import pytest

from mwmbl_spark.operators.ltr import (
    FEATURE_NAMES,
    featurize_py,
    load_xgboost_model,
    logistic_baseline,
    ltr_rank,
)
from mwmbl_spark.operators.reshard import decode_segments, reshard
from mwmbl_spark.plans.build_index import IndexBuilder, IndexConfig
from mwmbl_spark.synth import synth_transcripts, with_doc_id

QUERIES = [(0, "w0001 w0002"), (1, "the spark")]


def test_reshard_preserves_query_results(spark, tmp_path):
    df = with_doc_id(synth_transcripts(spark, n_conv=30, turns_per_conv=4, seed=31))
    old_cfg = IndexConfig(path=str(tmp_path / "old"), num_buckets=16, nsalt=4, n_src_partitions=2)
    old = IndexBuilder(spark, old_cfg)
    old.build(df)

    new_cfg = IndexConfig(path=str(tmp_path / "new"), num_buckets=64, nsalt=8, n_src_partitions=1)
    new = reshard(spark, old, new_cfg)
    # idempotent: second call is a no-op (manifest cursor)
    reshard(spark, old, new_cfg)

    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    a = [(r["query_id"], r["doc_id"], round(r["score"], 9))
         for r in old.query_topk(qdf, k=10).orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["doc_id"], round(r["score"], 9))
         for r in new.query_topk(qdf, k=10).orderBy("query_id", "rank").collect()]
    assert a == b

    # decode roundtrip: postings identical between layouts
    pa = {(r["term"], r["doc_id"], r["tf"]) for r in decode_segments(old.segments()).collect()}
    pb = {(r["term"], r["doc_id"], r["tf"]) for r in decode_segments(new.segments()).collect()}
    assert pa == pb and len(pa) > 0


def test_feature_vector_is_50_wide():
    assert len(FEATURE_NAMES) == 50  # 7 fields x 6 + 8 globals (features.rs:80)
    v = featurize_py(["spark"], "Spark guide", "https://x.com/spark", "about spark", 1.0, True)
    assert len(v) == len(FEATURE_NAMES)
    assert all(isinstance(x, float) for x in v)


def test_ltr_rank_orders_by_model(spark):
    rows = [
        (0, ["spark"], 1, "Spark guide", "https://a.com/spark", "spark text", 1.0, None),
        (0, ["spark"], 2, "Unrelated", "https://b.com/other", "nothing", 1.0, None),
        (0, ["spark"], 3, "spark spark spark", "https://c.com/spark", "spark all about spark", 1.0, None),
    ]
    schema = (
        "query_id long, terms array<string>, doc_id long, title string, "
        "url string, extract string, score double, state int"
    )
    df = spark.createDataFrame(rows, schema)
    out = ltr_rank(df, model=logistic_baseline).orderBy("ltr_rank").collect()
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids  # masked: no match signal -> score <= 0
    assert set(ids) == {1, 3}
    # python-side parity: ranking order matches direct model eval
    feats = {r[2]: featurize_py(r[1], r[3], r[4], r[5], r[7], True) for r in rows}
    direct = {d: float(logistic_baseline(np.array([f]))[0]) for d, f in feats.items()}
    want = [d for d, s in sorted(direct.items(), key=lambda kv: (-kv[1], kv[0])) if s > 0]
    assert ids == want


def test_xgboost_loader_no_longer_gated():
    """Round 4 replaced the xgboost-absent NotImplementedError gate with
    the dependency-free reader (functions/xgb_model.py, full coverage in
    tests/test_xgb_model.py): a missing file is now an ordinary
    FileNotFoundError, not a capability gap."""
    with pytest.raises(FileNotFoundError):
        load_xgboost_model("/nonexistent.model")

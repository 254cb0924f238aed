"""LTR training pipeline — fit/predict/save/load round-trip ported from
the reference's test_rust_pipeline.py:27-160, plus the distributed
gradient fit and a learning-works (ordering improves) assert."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mwmbl_spark.operators.ltr import (
    LtrPipeline,
    fit_logistic_distributed,
    ltr_featurize,
    ltr_rank,
)

QUERIES = ["rust programming", "python web", "machine learning", "search engine", "open source"]
TITLES = [
    "Rust Programming Language", "Python Web Framework", "Machine Learning Guide",
    "Search Engine Optimization", "Open Source Software",
]
URLS = [
    "https://www.rust-lang.org/", "https://www.djangoproject.com/",
    "https://scikit-learn.org/", "https://mwmbl.org/", "https://github.com/",
]
EXTRACTS = [
    "A systems programming language focused on safety.",
    "The web framework for perfectionists with deadlines.",
    "Machine learning in Python.",
    "A free, open-source search engine.",
    "Where the world builds software.",
]


def make_dataframe(n: int = 30, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        idx = i % len(QUERIES)
        rows.append({
            "query": QUERIES[idx], "url": URLS[idx], "title": TITLES[idx],
            "extract": EXTRACTS[idx], "score": float(rng.uniform(0, 2)),
        })
    return pd.DataFrame(rows)


def make_labels(n: int = 30, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).uniform(0, 1, size=n).astype(np.float32)


def make_separable(n_per: int = 20) -> tuple[pd.DataFrame, np.ndarray]:
    """Relevant rows match the query in the title; irrelevant don't."""
    rows, labels = [], []
    for i in range(n_per):
        q = QUERIES[i % len(QUERIES)]
        rows.append({"query": q, "url": URLS[i % 5], "title": q.title(),
                     "extract": f"all about {q}", "score": 1.0})
        labels.append(1.0)
        rows.append({"query": q, "url": "https://other.example.com/x",
                     "title": "Unrelated Page", "extract": "nothing here", "score": 1.0})
        labels.append(0.0)
    return pd.DataFrame(rows), np.array(labels)


@pytest.fixture(scope="module")
def trained():
    X, y = make_separable()
    pipe = LtrPipeline(num_rounds=200).fit(X, y)
    return pipe, X, y


# --- ported reference shape tests ---------------------------------------------

def test_fit_returns_self():
    X, y = make_dataframe(20), make_labels(20)
    pipe = LtrPipeline(num_rounds=10)
    assert pipe.fit(X, y) is pipe


def test_predict_without_fit_raises():
    with pytest.raises(RuntimeError, match="fit"):
        LtrPipeline().predict(make_dataframe(5))


def test_predict_shape_dtype_range_nan(trained):
    pipe, X, _ = trained
    preds = pipe.predict(X)
    assert preds.shape == (len(X),)
    assert preds.dtype == np.float32
    assert np.all(preds >= 0.0) and np.all(preds <= 1.0)
    assert not np.any(np.isnan(preds))


def test_predict_empty_and_single(trained):
    pipe, X, _ = trained
    assert len(pipe.predict(X.iloc[:0])) == 0
    assert pipe.predict(X.iloc[:1]).shape == (1,)


def test_predict_with_null_fields(trained):
    pipe, X, _ = trained
    X2 = X.copy()
    X2.loc[0, "title"] = None
    X2.loc[1, "extract"] = None
    assert not np.any(np.isnan(pipe.predict(X2)))


def test_repr():
    assert "LtrPipeline" in repr(LtrPipeline()) and "threshold" in repr(LtrPipeline())


# --- learning + round-trip ------------------------------------------------------

def test_learning_separates_relevant_from_irrelevant(trained):
    pipe, X, y = trained
    preds = pipe.predict(X)
    # every relevant row outranks every irrelevant row (term-count
    # zeroing already floors the no-match rows at 0)
    assert preds[y == 1].min() > preds[y == 0].max()
    assert (preds[y == 0] == 0.0).all()  # RankingPredictor zeroing


def test_save_load_round_trip(trained, tmp_path):
    pipe, X, _ = trained
    path = str(tmp_path / "ltr_model.json")
    pipe.save_model(path)
    loaded = LtrPipeline.load_model(path)
    assert np.array_equal(loaded.predict(X), pipe.predict(X))


def test_trained_model_drives_ltr_rank(spark, trained):
    pipe, _, _ = trained
    rows = [
        (0, ["rust", "programming"], 1, "Rust Programming", "https://rust-lang.org/", "rust programming language", 1.0, None),
        (0, ["rust", "programming"], 2, "Cooking", "https://food.com/", "pasta recipes", 1.0, None),
    ]
    schema = ("query_id long, terms array<string>, doc_id long, title string, "
              "url string, extract string, score double, state int")
    out = ltr_rank(spark.createDataFrame(rows, schema), model=pipe.as_model()).collect()
    # the no-match doc is zeroed and masked out; the match ranks first
    assert [r["doc_id"] for r in out] == [1]


# --- distributed gradient fit ----------------------------------------------------

def test_distributed_fit_matches_driver_fit(spark):
    X, y = make_separable(10)
    qdf = spark.createDataFrame(
        [
            (list(r["query"].lower().split()), r["title"], r["url"], r["extract"],
             r["score"], float(lbl))
            for (_, r), lbl in zip(X.iterrows(), y)
        ],
        "terms array<string>, title string, url string, extract string, "
        "score double, label double",
    )
    feats = ltr_featurize(qdf)
    w, b, mean, std = fit_logistic_distributed(
        feats, num_rounds=60, learning_rate=0.5
    )
    pipe = LtrPipeline()
    pipe.weights, pipe.bias, pipe.mean, pipe.std = w, b, mean, std
    preds = pipe.predict(X)
    assert preds[y == 1].min() > preds[y == 0].max()


# --- MLlib boosted trees (no xgboost dependency) ---------------------------------

def test_gbt_fit_rank_ndcg_save_load(spark, tmp_path):
    """GbtLtr: MLlib GBTClassifier behind the LtrPipeline contract —
    distributed boosted-tree training without xgboost (the reference
    trains XGBoost, ltr.py:83-230). fit -> Spark-native transform rank
    -> NDCG -> save/load round trip."""
    from mwmbl_spark.operators.ltr import GbtLtr
    from mwmbl_spark.operators.rankeval import ndcg_at_10

    X, y = make_separable(12)
    qdf = spark.createDataFrame(
        [
            (list(r["query"].lower().split()), r["title"], r["url"], r["extract"],
             r["score"], float(lbl))
            for (_, r), lbl in zip(X.iterrows(), y)
        ],
        "terms array<string>, title string, url string, extract string, "
        "score double, label double",
    )
    gbt = GbtLtr(max_iter=10, max_depth=3).fit(ltr_featurize(qdf))

    rows = [
        (0, ["rust", "programming"], 1, "Rust Programming", "https://rust-lang.org/",
         "rust programming language", 1.0, None),
        (0, ["rust", "programming"], 2, "Cooking", "https://food.com/",
         "pasta recipes", 1.0, None),
        (1, ["python", "web"], 3, "Python Web Framework", "https://djangoproject.com/",
         "python web framework", 1.0, None),
        (1, ["python", "web"], 4, "Gardening", "https://plants.example.com/",
         "flowers and soil", 1.0, None),
    ]
    schema = (
        "query_id long, terms array<string>, doc_id long, title string, "
        "url string, extract string, score double, state int"
    )
    cand = spark.createDataFrame(rows, schema)
    out = gbt.rank(cand).orderBy("query_id", "ltr_rank").collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    # no-match docs are zeroed by the RankingPredictor mask and dropped
    assert by_q == {0: [1], 1: [3]}
    assert all(r["ltr_score"] > 0.5 for r in out)

    # NDCG leg: gold = the relevant doc at rank 1 -> perfect NDCG
    pred = gbt.rank(cand).select(
        "query_id", "doc_id", F.col("ltr_rank").alias("rank")
    )
    gold = spark.createDataFrame(
        [(0, 1, 1), (1, 3, 1)], "query_id long, doc_id long, gold_rank int"
    )
    nd = {r["query_id"]: r["ndcg"] for r in ndcg_at_10(pred, gold).collect()}
    assert nd == {0: 1.0, 1: 1.0}

    # save/load: identical scores through MLlib persistence
    path = str(tmp_path / "gbt_model")
    gbt.save(path)
    loaded = GbtLtr.load(path)
    out2 = loaded.rank(cand).orderBy("query_id", "ltr_rank").collect()
    assert [(r["query_id"], r["doc_id"], r["ltr_score"]) for r in out2] == [
        (r["query_id"], r["doc_id"], r["ltr_score"]) for r in out
    ]

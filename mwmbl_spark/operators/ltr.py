"""Learning-to-rank scoring (reference W2: ltr_rank.py + mwmbl_rank/).

The reference extracts a 50-feature vector per (query, doc) — the
heuristic's match features over 7 fields plus globals — and scores with
an XGBoost binary classifier, masking scores <= 0 and sorting desc
(ltr_rank.py:56-79; feature order fixed by the Rust twin
mwmbl_rank/src/features.rs:18-103).

This module reproduces the OPERATOR: feature extraction is the
Arrow-batched twin of get_features_py (exact field/feature set and
order below), and the model is pluggable — any
``predict(np.ndarray[n, 50]) -> np.ndarray[n]`` callable. XGBoost is
not in this container, so model loading is import-gated; a
deterministic logistic baseline ships for tests, and a real model
drops in without touching the plan.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.operators.heuristic import get_features_py

# 50-feature order: 7 fields x 6 match features + 8 globals, matching
# the reference's FEATURE ordering (mwmbl_rank/src/features.rs:18-103).
FIELDS = ["title", "extract", "domain", "domain_tokenized", "path", "query", "whole"]
PER_FIELD = [
    "last_match_char_{}",
    "match_length_{}",
    "total_possible_match_length_{}",
    "match_score_{}",
    "match_terms_{}",
    "match_term_proportion_{}",
]
GLOBALS = [
    "num_terms", "num_chars", "domain_score", "path_length",
    "domain_length", "wiki_score", "item_score", "match_terms",
]
FEATURE_NAMES = [p.format(f) for f in FIELDS for p in PER_FIELD] + GLOBALS
NUM_FEATURES = len(FEATURE_NAMES)  # 50, asserted against features.rs:80
assert NUM_FEATURES == 50


def featurize_py(terms, title, url, extract, score, is_complete, domain_scores=None, wiki_scores=None) -> list[float]:
    feats = get_features_py(terms, title or "", url, extract or "", score or 0.0, is_complete, domain_scores, wiki_scores)
    return [float(feats[name]) for name in FEATURE_NAMES]


def logistic_baseline(x: np.ndarray) -> np.ndarray:
    """Deterministic stand-in model: logistic over match-score features
    gated by match presence (a field with zero matched terms contributes
    nothing, so no-signal docs land exactly at 0 and get masked)."""
    s_idx = [FEATURE_NAMES.index(f"match_score_{f}") for f in FIELDS]
    t_idx = [FEATURE_NAMES.index(f"match_terms_{f}") for f in FIELDS]
    w = np.array([4.0, 1.0, 2.0, 2.0, 1.0, 0.5, 0.5])
    z = (x[:, s_idx] * (x[:, t_idx] > 0)) @ w
    return 1.0 / (1.0 + np.exp(-z)) - 0.5  # centered: <=0 means "no signal"


def load_xgboost_model(path: str) -> Callable[[np.ndarray], np.ndarray]:
    try:
        import xgboost as xgb
    except ImportError as e:  # container has no xgboost
        raise NotImplementedError(
            "xgboost is not available in this environment; pass any "
            "predict(ndarray)->ndarray callable (e.g. logistic_baseline)"
        ) from e
    booster = xgb.Booster()
    booster.load_model(path)
    return lambda x: booster.predict(xgb.DMatrix(x, feature_names=FEATURE_NAMES))


def ltr_rank(
    candidates: DataFrame,
    model: Callable[[np.ndarray], np.ndarray] = logistic_baseline,
    domain_scores: dict[str, float] | None = None,
    wiki_scores: dict[str, float] | None = None,
    is_complete: bool = True,
    k: int | None = None,
) -> DataFrame:
    """Score candidates (query_id, terms array<string>, doc_id, title,
    url, extract, score, state) with the 50-feature LTR model; mask
    scores <= 0; rank desc per query (ltr_rank.py:56-79 semantics)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = candidates.columns
    out_schema = StructType(list(candidates.schema.fields) + [StructField("ltr_score", DoubleType())])

    def batches(it):
        for pdf in it:
            if len(pdf):
                x = np.array(
                    [
                        featurize_py(list(t), ti, u, e, s, is_complete, domain_scores, wiki_scores)
                        for t, ti, u, e, s in zip(
                            pdf["terms"], pdf["title"], pdf["url"], pdf["extract"], pdf["score"]
                        )
                    ]
                )
                pdf = pdf.copy()
                pdf["ltr_score"] = model(x)
            else:
                pdf = pdf.copy()
                pdf["ltr_score"] = pd.Series([], dtype="float64")
            yield pdf[cols + ["ltr_score"]]

    scored = candidates.mapInPandas(batches, schema=out_schema)
    masked = scored.where(F.col("ltr_score") > 0)
    w = Window.partitionBy("query_id").orderBy(F.desc("ltr_score"), F.asc("doc_id"))
    ranked = masked.withColumn("ltr_rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.where(F.col("ltr_rank") <= k)
    return ranked

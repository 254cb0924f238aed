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
    """Load an XGBoost model (JSON or UBJSON — the reference's
    ``model.xgb`` artifact shape) via the DEPENDENCY-FREE reader
    (functions/xgb_model.py): a model trained by the reference's Rust
    pipeline (mwmbl/tinysearchengine/ltr.py:83-230) drops straight into
    ``ltr_rank``/``LtrPipeline`` without the xgboost package. When
    xgboost IS installed, it is preferred (covers exotic boosters the
    native reader rejects) and the native reader is the fallback."""
    try:
        import xgboost as xgb

        booster = xgb.Booster()
        booster.load_model(path)
        return lambda x: booster.predict(
            xgb.DMatrix(x, feature_names=FEATURE_NAMES)
        )
    except ImportError:
        from mwmbl_spark.functions.xgb_model import load_xgb_model

        model = load_xgb_model(path)
        if model.feature_names and list(model.feature_names) != FEATURE_NAMES:
            raise ValueError(
                "model feature_names do not match the 50-feature LTR "
                "order (features.rs:18-103)"
            )
        return model


class LtrPipeline:
    """Fit/predict/save/load over the 50-feature extractor — the
    RustXGBPipeline shape (mwmbl/tinysearchengine/ltr.py:83-230,
    mwmbl_rank/src/pipeline.rs) with a logistic model standing in for
    XGBoost (absent from this container; any booster with
    ``predict(ndarray[n,50]) -> ndarray[n]`` drops into ``ltr_rank``
    unchanged). Ported semantics:

    - terms = query.lower().split(), is_complete=True
      (FeatureExtractor, ltr.py:39-63)
    - labels binarised y > threshold before training
      (ThresholdPredictor, ltr.py:22-37); predict returns P(relevant)
    - predictions zeroed when match_term_proportion_whole <= 0.5 AND
      match_terms_whole <= 1.0 (RankingPredictor, ltr.py:75-80)

    Training runs driver-side (curation-label training sets are
    human-scale); ``fit_logistic_distributed`` is the Spark-native
    gradient loop for feature tables that don't fit one machine.
    """

    _MTP_IDX = FEATURE_NAMES.index("match_term_proportion_whole")
    _MT_IDX = FEATURE_NAMES.index("match_terms_whole")

    def __init__(self, threshold: float = 0.0, num_rounds: int = 100,
                 learning_rate: float = 0.5, reg_lambda: float = 2.0):
        self.threshold = threshold
        self.num_rounds = num_rounds
        self.learning_rate = learning_rate
        self.reg_lambda = reg_lambda
        self.weights: np.ndarray | None = None
        self.bias: float = 0.0
        self.mean: np.ndarray | None = None
        self.std: np.ndarray | None = None

    def __repr__(self) -> str:
        return (
            f"LtrPipeline(threshold={self.threshold}, num_rounds={self.num_rounds}, "
            f"learning_rate={self.learning_rate}, reg_lambda={self.reg_lambda})"
        )

    # -- feature boundary ---------------------------------------------------
    def _featurize(self, X) -> np.ndarray:
        records = X.to_dict("records") if hasattr(X, "to_dict") else list(X)
        if not records:
            return np.empty((0, NUM_FEATURES))
        return np.array(
            [
                featurize_py(
                    r["query"].lower().split(), r.get("title"), r["url"],
                    r.get("extract"), r.get("score") or 0.0, True,
                )
                for r in records
            ]
        )

    # -- fit / predict --------------------------------------------------------
    def fit(self, X, y) -> "LtrPipeline":
        feats = self._featurize(X)
        y_bin = (np.asarray(y, dtype=np.float64) > self.threshold).astype(np.float64)
        self.mean = feats.mean(axis=0)
        self.std = np.where(feats.std(axis=0) > 0, feats.std(axis=0), 1.0)
        z = (feats - self.mean) / self.std
        n = len(z)
        w = np.zeros(NUM_FEATURES)
        b = 0.0
        for _ in range(self.num_rounds):
            p = 1.0 / (1.0 + np.exp(-(z @ w + b)))
            err = p - y_bin
            grad_w = z.T @ err / n + self.reg_lambda / n * w
            grad_b = float(err.mean())
            w -= self.learning_rate * grad_w
            b -= self.learning_rate * grad_b
        self.weights, self.bias = w, b
        return self

    def _proba(self, feats: np.ndarray) -> np.ndarray:
        z = (feats - self.mean) / self.std
        p = 1.0 / (1.0 + np.exp(-(z @ self.weights + self.bias)))
        # RankingPredictor term-count zeroing (ltr.py:78-80)
        too_few = (feats[:, self._MTP_IDX] <= 0.5) & (feats[:, self._MT_IDX] <= 1.0)
        p[too_few] = 0.0
        return p.astype(np.float32)

    def predict(self, X) -> np.ndarray:
        if self.weights is None:
            raise RuntimeError("predict called before fit (or load_model)")
        feats = self._featurize(X)
        if not len(feats):
            return np.empty(0, dtype=np.float32)
        return self._proba(feats)

    def as_model(self):
        """Adapter for ``ltr_rank(model=...)``: raw 50-vector in,
        masked probability out."""
        if self.weights is None:
            raise RuntimeError("as_model called before fit (or load_model)")
        return lambda x: self._proba(np.asarray(x, dtype=np.float64))

    # -- persistence ----------------------------------------------------------
    def save_model(self, path: str) -> None:
        import json

        if self.weights is None:
            raise RuntimeError("save_model called before fit")
        with open(path, "w") as f:
            json.dump(
                {
                    "feature_names": FEATURE_NAMES,
                    "threshold": self.threshold,
                    "weights": self.weights.tolist(),
                    "bias": self.bias,
                    "mean": self.mean.tolist(),
                    "std": self.std.tolist(),
                },
                f,
            )

    @classmethod
    def load_model(cls, path: str) -> "LtrPipeline":
        import json

        with open(path) as f:
            blob = json.load(f)
        assert blob["feature_names"] == FEATURE_NAMES, "feature-order mismatch"
        out = cls(threshold=blob["threshold"])
        out.weights = np.asarray(blob["weights"])
        out.bias = float(blob["bias"])
        out.mean = np.asarray(blob["mean"])
        out.std = np.asarray(blob["std"])
        return out


def ltr_featurize(
    candidates: DataFrame,
    domain_scores: dict[str, float] | None = None,
    wiki_scores: dict[str, float] | None = None,
    is_complete: bool = True,
) -> DataFrame:
    """Add a ``features array<double>`` column (the 50-vector) to a
    candidate DataFrame — the distributed feature-table builder that
    ``fit_logistic_distributed`` trains over."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    cols = candidates.columns
    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField("features", ArrayType(DoubleType()))]
    )

    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = [
                featurize_py(list(t), ti, u, e, s, is_complete, domain_scores, wiki_scores)
                for t, ti, u, e, s in zip(
                    pdf["terms"], pdf["title"], pdf["url"], pdf["extract"], pdf["score"]
                )
            ]
            yield pdf[cols + ["features"]]

    return candidates.mapInPandas(batches, schema=out_schema)


def fit_logistic_distributed(
    feats: DataFrame,
    label_col: str = "label",
    num_rounds: int = 50,
    learning_rate: float = 0.5,
    reg_lambda: float = 0.0,
) -> tuple[np.ndarray, float, np.ndarray, np.ndarray]:
    """Spark-native batch gradient descent over (features array<double>,
    label) — for feature tables too big to collect. Per round: one job
    computing the 50-dim gradient as a posexplode + groupBy(pos) partial
    aggregation (map-side combine; shuffle is 50 rows x partitions).
    Returns (weights, bias, mean, std) — plug into LtrPipeline fields.

    The standardized feature relation is localCheckpoint'ed once and
    reused every round (on a cluster: a staging table)."""
    n = feats.count()
    stats = (
        feats.select(F.posexplode("features").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
        .orderBy("pos")
        .collect()
    )
    mean = np.array([r["mu"] for r in stats])
    std = np.array([r["sd"] if r["sd"] and r["sd"] > 0 else 1.0 for r in stats])
    z = feats.select(
        F.col(label_col).cast("double").alias("y"),
        F.zip_with(
            "features",
            F.array(*[F.lit(float(v)) for v in mean]),
            lambda x, m: x - m,
        ).alias("_c"),
    ).select(
        "y",
        F.zip_with(
            "_c",
            F.array(*[F.lit(float(v)) for v in std]),
            lambda x, s: x / s,
        ).alias("z"),
    ).localCheckpoint(eager=True)

    w = np.zeros(len(mean))
    b = 0.0
    for _ in range(num_rounds):
        w_lit = F.array(*[F.lit(float(v)) for v in w])
        dot = F.aggregate(
            F.zip_with("z", w_lit, lambda x, wv: x * wv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot + F.lit(b)))) - F.col("y")).alias("err")
        g = (
            z.select(err, "z")
            .select("err", F.posexplode("z").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("err")).alias("g"))
            .orderBy("pos")
            .collect()
        )
        eb = z.select(err).agg(F.avg("err")).collect()[0][0]
        grad_w = np.array([r["g"] for r in g]) / n + reg_lambda / n * w
        w -= learning_rate * grad_w
        b -= learning_rate * float(eb)
    return w, b, mean, std


class GbtLtr:
    """Distributed gradient-boosted-tree LTR behind the LtrPipeline
    semantics — Spark MLlib's GBTClassifier standing in for the
    reference's XGBoost (mwmbl/tinysearchengine/ltr.py:83-230), so
    boosted-tree training parity does not depend on xgboost being
    installed. Same contract as LtrPipeline: labels binarised at
    ``threshold`` (ThresholdPredictor, ltr.py:22-37), scores are
    P(relevant), and the RankingPredictor zeroing applies
    (match_term_proportion_whole <= 0.5 AND match_terms_whole <= 1.0 ->
    0, ltr.py:75-80).

    Training AND inference are Spark-native: fit over the distributed
    (features array<double>, label) table from ``ltr_featurize``;
    ranking uses ``model.transform`` (JVM tree evaluation, no Python in
    the scoring loop). Deterministic under a fixed seed."""

    _MTP_IDX = FEATURE_NAMES.index("match_term_proportion_whole")
    _MT_IDX = FEATURE_NAMES.index("match_terms_whole")

    def __init__(self, threshold: float = 0.0, max_iter: int = 20,
                 max_depth: int = 3, step_size: float = 0.1, seed: int = 7):
        self.threshold = threshold
        self.max_iter = max_iter
        self.max_depth = max_depth
        self.step_size = step_size
        self.seed = seed
        self.model = None

    def fit(self, feats: DataFrame, label_col: str = "label") -> "GbtLtr":
        from pyspark.ml.classification import GBTClassifier
        from pyspark.ml.functions import array_to_vector

        train = feats.select(
            array_to_vector("features").alias("fv"),
            (F.col(label_col).cast("double") > self.threshold).cast("double").alias("y"),
        )
        self.model = GBTClassifier(
            featuresCol="fv", labelCol="y", maxIter=self.max_iter,
            maxDepth=self.max_depth, stepSize=self.step_size, seed=self.seed,
        ).fit(train)
        return self

    def rank(
        self,
        candidates: DataFrame,
        domain_scores: dict[str, float] | None = None,
        wiki_scores: dict[str, float] | None = None,
        is_complete: bool = True,
        k: int | None = None,
    ) -> DataFrame:
        """ltr_rank semantics through the JVM: featurize -> tree
        ensemble transform -> P(relevant) -> zeroing mask -> per-query
        rank desc."""
        if self.model is None:
            raise RuntimeError("rank called before fit (or load)")
        from pyspark.ml.functions import array_to_vector, vector_to_array

        feats = ltr_featurize(candidates, domain_scores, wiki_scores, is_complete)
        fv = feats.withColumn("fv", array_to_vector("features"))
        scored = self.model.transform(fv).select(
            *candidates.columns,
            F.when(
                (F.element_at("features", self._MTP_IDX + 1) <= 0.5)
                & (F.element_at("features", self._MT_IDX + 1) <= 1.0),
                F.lit(0.0),
            )
            .otherwise(F.element_at(vector_to_array("probability"), 2))
            .alias("ltr_score"),
        )
        masked = scored.where(F.col("ltr_score") > 0)
        w = Window.partitionBy("query_id").orderBy(F.desc("ltr_score"), F.asc("doc_id"))
        ranked = masked.withColumn("ltr_rank", F.row_number().over(w))
        if k is not None:
            ranked = ranked.where(F.col("ltr_rank") <= k)
        return ranked

    def save(self, path: str) -> None:
        if self.model is None:
            raise RuntimeError("save called before fit")
        self.model.write().overwrite().save(path)

    @classmethod
    def load(cls, path: str, threshold: float = 0.0) -> "GbtLtr":
        from pyspark.ml.classification import GBTClassificationModel

        out = cls(threshold=threshold)
        out.model = GBTClassificationModel.load(path)
        return out


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

"""Dependency-free XGBoost model reader (functions/xgb_model.py):
hand-built forests with hand-computed expectations, JSON and UBJSON
encodings of the same document, NaN default-routing, and the logistic
link on base_score. No Spark needed — pure NumPy."""

from __future__ import annotations

import json
import math
import struct

import numpy as np
import pytest

from mwmbl_spark.functions.xgb_model import (
    XgbTreesModel,
    _parse_ubjson,
    load_xgb_model,
)


def _tree(split_indices, split_conditions, left, right, default_left):
    return {
        "split_indices": split_indices,
        "split_conditions": split_conditions,
        "left_children": left,
        "right_children": right,
        "default_left": default_left,
    }


def _doc(trees, objective="binary:logistic", base_score=0.5):
    return {
        "learner": {
            "objective": {"name": objective},
            "learner_model_param": {"base_score": str(base_score)},
            "feature_names": [],
            "gradient_booster": {"model": {"trees": trees}},
        }
    }


# tree 0: node0 splits on f0 < 1.5 (default LEFT on missing);
#         left -> leaf +2.0, right -> node3 splits f1 < 0.5 (default
#         right) -> leaves -1.0 / +0.5
T0 = _tree(
    split_indices=[0, 0, 1, 0, 0],
    split_conditions=[1.5, 2.0, 0.5, -1.0, 0.5],
    left=[1, -1, 3, -1, -1],
    right=[2, -1, 4, -1, -1],
    default_left=[1, 0, 0, 0, 0],
)
# tree 1: single leaf +0.25
T1 = _tree(
    split_indices=[0], split_conditions=[0.25], left=[-1], right=[-1],
    default_left=[0],
)


def _expect_margin(x0, x1):
    if math.isnan(x0):
        t0 = 2.0  # default_left at root
    elif x0 < 1.5:
        t0 = 2.0
    else:
        t0 = -1.0 if (not math.isnan(x1) and x1 < 0.5) else 0.5
    return t0 + 0.25  # + tree 1 leaf; base_score 0.5 -> margin 0


def test_hand_built_model_json_predicts_exactly(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(_doc([T0, T1])))
    m = load_xgb_model(str(p))
    X = np.array([
        [1.0, 0.0], [2.0, 0.0], [2.0, 1.0],
        [np.nan, 0.0], [2.0, np.nan],
    ])
    margins = m.predict_margin(X)
    want = [_expect_margin(a, b) for a, b in X]
    assert np.allclose(margins, want)
    assert np.allclose(m.predict(X), 1.0 / (1.0 + np.exp(-margins)))


def test_base_score_link():
    m = XgbTreesModel(_doc([T1], base_score=0.8))
    # logit(0.8) + 0.25
    assert abs(m.predict_margin(np.zeros((1, 1)))[0]
               - (math.log(0.8 / 0.2) + 0.25)) < 1e-12
    r = XgbTreesModel(_doc([T1], objective="reg:squarederror", base_score=3.0))
    assert abs(r.predict(np.zeros((1, 1)))[0] - 3.25) < 1e-12


# ---------------------------------------------------------------------------
# UBJSON: a tiny encoder for the subset xgboost emits, to exercise the
# decoder against the SAME document (plain + typed/count containers)
# ---------------------------------------------------------------------------

def _u_key(k: bytes) -> bytes:
    return b"i" + struct.pack("b", len(k)) + k


def _u_str(s: str) -> bytes:
    b = s.encode()
    return b"S" + b"i" + struct.pack("b", len(b)) + b


def _u_val(v, typed_arrays: bool) -> bytes:
    if isinstance(v, dict):
        out = b"{"
        for k, val in v.items():
            out += _u_key(k.encode()) + _u_val(val, typed_arrays)
        return out + b"}"
    if isinstance(v, list):
        if typed_arrays and v and all(isinstance(x, int) for x in v):
            return (b"[$l#" + b"i" + struct.pack("b", len(v))
                    + b"".join(struct.pack(">i", x) for x in v))
        if typed_arrays and v and all(isinstance(x, float) for x in v):
            return (b"[$D#" + b"i" + struct.pack("b", len(v))
                    + b"".join(struct.pack(">d", x) for x in v))
        out = b"["
        for x in v:
            out += _u_val(x, typed_arrays)
        return out + b"]"
    if isinstance(v, str):
        return _u_str(v)
    if isinstance(v, bool):
        return b"T" if v else b"F"
    if isinstance(v, int):
        return b"l" + struct.pack(">i", v)
    if isinstance(v, float):
        return b"D" + struct.pack(">d", v)
    raise TypeError(type(v))


def _floatify(doc):
    """split_conditions must be floats for the typed-array encoder."""
    import copy

    doc = copy.deepcopy(doc)
    for t in doc["learner"]["gradient_booster"]["model"]["trees"]:
        t["split_conditions"] = [float(x) for x in t["split_conditions"]]
    return doc


@pytest.mark.parametrize("typed", [False, True])
def test_ubjson_roundtrip_matches_json(tmp_path, typed):
    doc = _floatify(_doc([T0, T1]))
    parsed = _parse_ubjson(_u_val(doc, typed))
    X = np.array([[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [np.nan, np.nan]])
    got = XgbTreesModel(parsed).predict(X)
    want = XgbTreesModel(doc).predict(X)
    assert np.allclose(got, want)


def test_ubjson_file_sniffing(tmp_path):
    p = tmp_path / "m.ubj"
    p.write_bytes(_u_val(_floatify(_doc([T0, T1])), True))
    m = load_xgb_model(str(p))
    assert len(m.trees) == 2 and m.objective == "binary:logistic"


def test_ltr_loader_uses_native_reader(tmp_path):
    """load_xgboost_model works WITHOUT the xgboost package: a 50-wide
    single-leaf model loads and scores through the LTR surface."""
    from mwmbl_spark.operators.ltr import NUM_FEATURES, load_xgboost_model

    leaf = _tree([0], [0.7], [-1], [-1], [0])
    p = tmp_path / "m50.json"
    p.write_text(json.dumps(_doc([leaf])))
    model = load_xgboost_model(str(p))
    out = model(np.zeros((3, NUM_FEATURES)))
    assert np.allclose(out, 1.0 / (1.0 + math.exp(-0.7)))

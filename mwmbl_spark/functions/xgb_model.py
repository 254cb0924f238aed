"""Dependency-free XGBoost model reader + vectorized tree inference.

The reference ranks with an XGBoost model trained by its Rust pipeline
(/root/reference/mwmbl/tinysearchengine/ltr.py:83-230 RustXGBPipeline;
shipped artifact mwmbl/resources/model.xgb). Loading such a model
previously required the ``xgboost`` package (absent in this
environment). XGBoost's serialized model format is a PUBLIC, versioned
schema (doc/model.schema in the xgboost repo) available in two
encodings of the same document: JSON text and UBJSON (Universal Binary
JSON, spec at ubjson.org — ``.xgb``/``.ubj`` files). This module reads
both with the stdlib + NumPy only:

- ``_parse_ubjson``: a minimal UBJSON decoder covering the subset
  XGBoost emits (objects/arrays incl. strongly-typed ``$``/count ``#``
  containers, int8/uint8/int16/int32/int64, float32/64, strings).
- ``XgbTreesModel``: the gbtree forest as NumPy arrays with a
  level-synchronous vectorized traversal — all rows walk their current
  node in lockstep per depth step, so inference is O(depth) NumPy ops
  per tree, no per-row Python.

Schema semantics implemented (from the public model schema):
- per-tree arrays ``split_indices`` (feature id), ``split_conditions``
  (threshold at internal nodes, LEAF VALUE at leaves),
  ``left_children``/``right_children`` (-1 at leaves),
  ``default_left`` (missing-value routing);
- decision rule: missing (NaN) -> default side, else
  ``x[f] < threshold`` -> left;
- margin(x) = sum of leaf values over trees + intercept, where the
  stored ``base_score`` lives in the OUTPUT space and is mapped to
  margin space by the objective's link (logit for binary:logistic,
  identity for regression) — matching xgboost's own load behavior;
- predict applies the inverse link (sigmoid for binary:logistic).
"""

from __future__ import annotations

import json
import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Minimal UBJSON decoder (the subset XGBoost writes)
# ---------------------------------------------------------------------------

_INT_FMT = {b"i": ("b", 1), b"U": ("B", 1), b"I": (">h", 2), b"l": (">i", 4), b"L": (">q", 8)}
_FLOAT_FMT = {b"d": (">f", 4), b"D": (">d", 8)}


class _Ubj:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated UBJSON input")
        self.pos += n
        return b

    def _marker(self) -> bytes:
        m = self._take(1)
        while m == b"N":  # no-op
            m = self._take(1)
        return m

    def _number(self, marker: bytes):
        if marker in _INT_FMT:
            fmt, n = _INT_FMT[marker]
            return struct.unpack(fmt, self._take(n))[0]
        if marker in _FLOAT_FMT:
            fmt, n = _FLOAT_FMT[marker]
            return struct.unpack(fmt, self._take(n))[0]
        raise ValueError(f"unexpected UBJSON numeric marker {marker!r}")

    def _length(self) -> int:
        return int(self._number(self._marker()))

    def _string(self) -> str:
        return self._take(self._length()).decode("utf-8")

    def _container_header(self):
        """Optional ``$``-type and ``#``-count for [ and { containers."""
        typ = None
        count = None
        m = self._marker()
        if m == b"$":
            typ = self._take(1)
            m = self._marker()
        if m == b"#":
            count = self._length()
            return typ, count, None
        return typ, None, m  # m is the first element's marker (untyped)

    def _value(self, marker: bytes):
        if marker == b"{":
            return self._object()
        if marker == b"[":
            return self._array()
        if marker == b"S":
            return self._string()
        if marker == b"T":
            return True
        if marker == b"F":
            return False
        if marker == b"Z":
            return None
        return self._number(marker)

    def _array(self):
        typ, count, first = self._container_header()
        if count is not None:
            if typ is not None:
                if typ in _FLOAT_FMT:
                    fmt, n = _FLOAT_FMT[typ]
                    arr = np.frombuffer(
                        self._take(n * count),
                        dtype=np.dtype(fmt.removeprefix(">")).newbyteorder(">"),
                    )
                    return arr.astype(np.float64 if typ == b"D" else np.float32)
                if typ in _INT_FMT:
                    fmt, n = _INT_FMT[typ]
                    kind = fmt.removeprefix(">")
                    arr = np.frombuffer(
                        self._take(n * count),
                        dtype=np.dtype(kind).newbyteorder(">" if n > 1 else "="),
                    )
                    return arr.astype(np.int64)
                raise ValueError(f"unsupported typed-array marker {typ!r}")
            return [self._value(self._marker()) for _ in range(count)]
        out = []
        m = first
        while m != b"]":
            out.append(self._value(m))
            m = self._marker()
        return out

    def _object(self):
        typ, count, first = self._container_header()
        out = {}
        if count is not None:
            for _ in range(count):
                out[self._string()] = self._value(self._marker())
            return out
        m = first
        while m != b"}":
            # object keys are written WITHOUT an S marker: the first
            # marker we read is the key length's numeric marker
            key = self._take(self._number(m)).decode("utf-8")
            out[key] = self._value(self._marker())
            m = self._marker()
        return out

    def parse(self):
        return self._value(self._marker())


def _parse_ubjson(buf: bytes):
    return _Ubj(buf).parse()


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class XgbTreesModel:
    """gbtree/binary-or-regression forest with vectorized inference."""

    def __init__(self, doc: dict):
        learner = doc["learner"]
        self.objective = learner["objective"]["name"]
        booster = learner["gradient_booster"]
        if "model" not in booster:  # 'gbtree' nested under dart etc.
            raise ValueError(f"unsupported booster: {booster.get('name')}")
        model = booster["model"]
        self.trees = []
        for t in model["trees"]:
            self.trees.append(
                {
                    "split_indices": np.asarray(t["split_indices"], dtype=np.int64),
                    "split_conditions": np.asarray(
                        t["split_conditions"], dtype=np.float64
                    ),
                    "left": np.asarray(t["left_children"], dtype=np.int64),
                    "right": np.asarray(t["right_children"], dtype=np.int64),
                    "default_left": np.asarray(t["default_left"], dtype=np.int64),
                }
            )
        base_score = float(learner["learner_model_param"]["base_score"])
        # stored base_score is in OUTPUT space; move it to margin space
        # via the objective's link (xgboost ProbToMargin semantics:
        # logit for binary:*, log for the poisson family — count:*,
        # reg:gamma, reg:tweedie — identity for rank:* and other reg:*)
        if self.objective.startswith("binary:"):
            eps = 1e-16
            p = min(max(base_score, eps), 1.0 - eps)
            self.base_margin = math.log(p / (1.0 - p))
        elif self.objective.startswith("count:") or self.objective in (
            "reg:gamma",
            "reg:tweedie",
        ):
            self.base_margin = math.log(max(base_score, 1e-16))
        else:  # rank:*, other reg:* — identity link
            self.base_margin = base_score
        self.feature_names = learner.get("feature_names") or None

    # -- inference ----------------------------------------------------------
    def _tree_leaf_values(self, tree: dict, X: np.ndarray) -> np.ndarray:
        node = np.zeros(X.shape[0], dtype=np.int64)
        left, right = tree["left"], tree["right"]
        sidx, scond, dleft = (
            tree["split_indices"], tree["split_conditions"], tree["default_left"]
        )
        active = left[node] != -1
        while active.any():
            n = node[active]
            f = sidx[n]
            x = X[active, f]
            thresh = scond[n]
            missing = np.isnan(x)
            go_left = np.where(missing, dleft[n] == 1, x < thresh)
            node[active] = np.where(go_left, left[n], right[n])
            active = left[node] != -1
        return scond[node]  # leaf value lives in split_conditions

    def predict_margin(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[None, :]
        out = np.full(X.shape[0], self.base_margin, dtype=np.float64)
        for tree in self.trees:
            out += self._tree_leaf_values(tree, X)
        return out

    def predict(self, X: np.ndarray) -> np.ndarray:
        margin = self.predict_margin(X)
        if self.objective.startswith("binary:logistic"):
            return 1.0 / (1.0 + np.exp(-margin))
        return margin

    def __call__(self, X: np.ndarray) -> np.ndarray:
        return self.predict(X)


def load_xgb_model(path: str) -> XgbTreesModel:
    """Read an XGBoost model saved as JSON (``.json``) or UBJSON
    (``.ubj`` / the reference's ``.xgb``) without the xgboost package.
    Encoding is sniffed, not extension-trusted: valid JSON text wins,
    anything else parses as UBJSON."""
    with open(path, "rb") as f:
        buf = f.read()
    try:
        doc = json.loads(buf.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError):
        doc = _parse_ubjson(buf)
    return XgbTreesModel(doc)

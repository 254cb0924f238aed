"""50-feature LTR vector parity — ported from the reference's
test/test_rust_features.py (CASES, feature-order and NaN asserts) with
mwmbl_rank/src/features.rs:18-80 as the canonical order fixture."""

from __future__ import annotations

import math

from mwmbl_spark.operators.heuristic import get_features_py, get_wiki_score_py
from mwmbl_spark.operators.ltr import FEATURE_NAMES, NUM_FEATURES, featurize_py

# Canonical order, transcribed from mwmbl_rank/src/features.rs:18-79.
_FIELDS = ["title", "extract", "domain", "domain_tokenized", "path", "query", "whole"]
REFERENCE_FEATURE_NAMES = [
    name
    for f in _FIELDS
    for name in [
        f"last_match_char_{f}",
        f"match_length_{f}",
        f"total_possible_match_length_{f}",
        f"match_score_{f}",
        f"match_terms_{f}",
        f"match_term_proportion_{f}",
    ]
] + [
    "num_terms",
    "num_chars",
    "domain_score",
    "path_length",
    "domain_length",
    "wiki_score",
    "item_score",
    "match_terms",
]

# (terms, title, url, extract, score, is_complete) — reference CASES
CASES = [
    (["rust", "programming"], "Rust Programming Language", "https://www.rust-lang.org/",
     "A systems programming language focused on safety and performance.", 1.0, True),
    (["python"], "Python (programming language)",
     "https://en.wikipedia.org/wiki/Python_(programming_language)",
     "Python is a high-level, general-purpose programming language.", 0.5, True),
    (["search", "engine"], "Mwmbl Search Engine", "https://mwmbl.org/",
     "A free, open-source search engine.", 0.8, False),
    (["django"], "Django Web Framework", "https://www.djangoproject.com/",
     "The web framework for perfectionists with deadlines.", 0.3, True),
    (["machine", "learning"], "", "https://example.com/ml", "", 0.0, True),
    (["xgboost"], "XGBoost Documentation", "https://xgboost.readthedocs.io/en/stable/",
     "XGBoost is an optimized distributed gradient boosting library.", 0.9, True),
    (["paul", "graham"], "Paul Graham Essays", "https://paulgraham.com/articles.html",
     "Essays by Paul Graham on startups and technology.", 0.7, True),
    (["rust"], "Rust Blog", "https://blog.rust-lang.org/2024/01/01/release.html",
     "The Rust programming language blog.", 0.6, False),
    (["test"], "Test Page", "https://totally-unknown-xyz123.example.com/test/page?q=foo",
     "A test page.", 0.1, True),
]


def test_num_features_is_50():
    # features.rs:80 — assert NUM_FEATURES == 50; a reference-trained
    # XGBoost model must be shape-compatible
    assert NUM_FEATURES == 50
    assert len(FEATURE_NAMES) == 50


def test_feature_names_match_reference_order():
    assert FEATURE_NAMES == REFERENCE_FEATURE_NAMES


def test_get_features_dict_order_matches_vector_order():
    # the reference's Python get_features builds the dict in vector order
    # (test_rust_features.py::test_feature_names_match)
    feats = get_features_py(["test"], "Test", "https://example.com/", "Extract", 1.0, True)
    assert list(feats.keys()) == REFERENCE_FEATURE_NAMES


def test_no_nan_and_full_length_for_reference_cases():
    for terms, title, url, extract, score, is_complete in CASES:
        vec = featurize_py(terms, title, url, extract, score, is_complete)
        assert len(vec) == 50, (terms, url)
        for name, v in zip(FEATURE_NAMES, vec):
            assert not math.isnan(v), (name, terms, url)


def test_wiki_score_zero_without_table():
    vec = featurize_py(["test"], "Test", "https://example.com/test", "", 1.0, True)
    assert vec[FEATURE_NAMES.index("wiki_score")] == 0.0


def test_wiki_score_lookup_and_normalization():
    # rank.py:204-206: last path segment is the article title; scores are
    # normalized by the table max (wiki_stats.json is sorted descending)
    table = {"Python_(programming_language)": 200.0, "Rust": 50.0}
    url = "https://en.wikipedia.org/wiki/Python_(programming_language)"
    assert get_wiki_score_py(url, table) == 1.0
    assert get_wiki_score_py("https://en.wikipedia.org/wiki/Rust", table) == 0.25
    assert get_wiki_score_py("https://en.wikipedia.org/wiki/Unknown_XYZ", table) == 0.0
    vec = featurize_py(["python"], "Python", url, "", 0.5, True, None, table)
    assert vec[FEATURE_NAMES.index("wiki_score")] == 1.0
    # wiki_score sits between domain_length and item_score (features.rs:76-78)
    i = FEATURE_NAMES.index("wiki_score")
    assert FEATURE_NAMES[i - 1] == "domain_length"
    assert FEATURE_NAMES[i + 1] == "item_score"

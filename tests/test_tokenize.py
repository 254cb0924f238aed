"""Tokenizer parity tests (reference ops P1-P5).

Assertions ported from the reference's behavior at
/root/reference/mwmbl/tokenizer.py and mwmbl/indexer/index.py
(test model: /root/reference/test/test_index_batches.py) — rewritten
against the Spark expression path, the pandas-UDF path, and the
plain-Python oracle path; all three must agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mwmbl_spark.functions.tokenize import (
    bigrams_expr,
    document_terms_expr,
    document_terms_py,
    get_bigrams_py,
    index_terms_expr,
    index_terms_py,
    tokenize_expr,
    tokenize_pd,
    tokenize_py,
)

CASES = [
    "hello world",
    "  leading and   trailing  ",
    "MiXeD CaSe Tokens",
    "one",
    "",
    "truncated extract word cut…",
    "a…",  # ellipsis with 1 token -> []
    "tab\tand\nnewline separated",
    "unicode naïve café …",
]


def _spark_tokenize(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(tokenize_expr(F.col("text")).alias("toks")).collect()
    return [r["toks"] for r in rows]


def test_tokenize_expr_matches_python(spark):
    got = _spark_tokenize(spark, CASES)
    want = [tokenize_py(t) for t in CASES]
    assert got == want


def test_tokenize_pandas_udf_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    rows = df.select(tokenize_pd(F.col("text")).alias("toks")).collect()
    assert [r["toks"] for r in rows] == [tokenize_py(t) for t in CASES]


def test_ellipsis_drops_last_two():
    # reference mwmbl/tokenizer.py:4-6
    assert tokenize_py("one two three four…") == ["one", "two"]
    assert tokenize_py("one two three four") == ["one", "two", "three", "four"]


def test_bigrams_first_n_only():
    # reference mwmbl/tokenizer.py:10-13 — FIRST n bigrams, not all
    toks = ["a", "b", "c", "d", "e"]
    assert get_bigrams_py(2, toks) == ["a b", "b c"]
    assert get_bigrams_py(10, toks) == ["a b", "b c", "c d", "d e"]
    assert get_bigrams_py(10, ["x"]) == []
    assert get_bigrams_py(10, []) == []


def test_bigrams_expr_matches_python(spark):
    texts = ["a b c d e", "x", "", "one two"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        bigrams_expr(tokenize_expr(F.col("text"))).alias("bg")
    ).collect()
    want = [get_bigrams_py(10, tokenize_py(t)) for t in texts]
    assert [r["bg"] for r in rows] == want


def test_index_terms_first10_union_bigrams(spark):
    text = " ".join(f"t{i}" for i in range(15))
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(index_terms_expr(tokenize_expr(F.col("text"))).alias("terms")).collect()[0]
    assert set(row["terms"]) == index_terms_py(tokenize_py(text))
    # 10 unigrams + 10 bigrams
    assert len(row["terms"]) == 20


def test_document_terms_union_across_fields(spark):
    title, url, extract = "My Great Page", "https://example.com/a_b/c.html", "some extract text"
    df = spark.createDataFrame([(title, url, extract)], "title string, url string, extract string")
    row = df.select(
        document_terms_expr(F.col("title"), F.col("url"), F.col("extract")).alias("terms")
    ).collect()[0]
    assert set(row["terms"]) == document_terms_py(title, url, extract)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=80))
def test_tokenize_py_matches_reference_semantics(text):
    want = text.lower().split()
    if text.endswith("…"):
        want = want[:-2]
    assert tokenize_py(text) == want


@pytest.mark.parametrize("n", [0, 1, 5])
def test_bigram_count_bounds(n):
    toks = [f"w{i}" for i in range(n)]
    assert len(get_bigrams_py(10, toks)) == max(0, min(10, n - 1))


def test_xxhash64_py_matches_spark(spark):
    """Driver-side XXH64 twin must be bit-identical to F.xxhash64 (the
    serving fast path derives segment buckets from it)."""
    import random
    import string

    from pyspark.sql import functions as F

    from mwmbl_spark.functions.xxhash import xxhash64_py

    rng = random.Random(3)
    cases = ["", "a", "spark", "w0001", "the spark data query", "…",
             "héllo wörld", "x" * 31, "y" * 32, "z" * 33, "long " * 50]
    cases += [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 100)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    assert all(got[c] == xxhash64_py(c) for c in cases)

"""Tokenization & index-term extraction (reference ops P1-P5).

Semantics derived from the reference:

- ``tokenize``: utf-8 clean -> lower -> whitespace split; if the *raw*
  input ends with the ellipsis character the last TWO tokens are dropped
  (a truncated crawl extract likely cut a word in half)
  [/root/reference/mwmbl/tokenizer.py:1-7].
- ``get_bigrams(n, tokens)``: only the FIRST ``min(n, len-1)`` adjacent
  bigrams — positional, not all bigrams
  [/root/reference/mwmbl/tokenizer.py:10-13].
- index terms: ``set(first 10 tokens) | set(first 10 bigrams)`` per field
  [/root/reference/mwmbl/indexer/index.py:14-15,48-52].
- URL canonicalization for tokenizing: strip http(s) scheme, percent-
  decode, then ``/ . _`` -> space
  [/root/reference/mwmbl/indexer/index.py:37-45].

Two implementations of each:

1. ``*_expr`` — pure Column expressions. JVM-side, whole-stage-codegen,
   zero Python in the hot path. This is the build/scale path.
2. ``*_pd`` / ``*_py`` — Arrow-vectorized pandas UDF / plain-Python
   twins with exact CPython ``str.lower()/str.split()`` semantics, used
   by the parity tests and the single-node oracle. For ASCII corpora the
   two paths are identical; the expression path is authoritative for the
   engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

NUM_FIRST_TOKENS = 10  # reference mwmbl/indexer/index.py:14
NUM_BIGRAMS = 10  # reference mwmbl/indexer/index.py:15
ELLIPSIS = "…"

def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


# ---------------------------------------------------------------------------
# Column-expression implementations (JVM hot path)
# ---------------------------------------------------------------------------

def _split_ws(col: Column) -> Column:
    """lower + split on whitespace runs, dropping empty strings.

    Equivalent to Python ``s.lower().split()`` for well-formed text:
    ``str.split()`` with no args splits on any whitespace run and drops
    leading/trailing empties, which ``\\s+`` split on a trimmed string
    reproduces.
    """
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_expr(col: Column) -> Column:
    """P1: tokenize a text column -> array<string>."""
    toks = _split_ws(col)
    n = F.size(toks)
    return F.when(
        col.endswith(ELLIPSIS),
        F.slice(toks, 1, F.greatest(F.lit(0), n - F.lit(2))),
    ).otherwise(toks)


def bigrams_expr(toks: Column, num_bigrams: int = NUM_BIGRAMS) -> Column:
    """P3: first ``min(num_bigrams, len-1)`` adjacent bigrams."""
    cnt = F.least(F.lit(num_bigrams), F.size(toks) - F.lit(1))
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(_empty_str_array())


def index_terms_expr(toks: Column) -> Column:
    """P5 (per field): distinct(first 10 tokens + first 10 bigrams).

    The reference builds a Python ``set`` (arbitrary order); term order is
    not part of rank semantics, so first-occurrence order here is fine.
    """
    return F.array_distinct(
        F.concat(F.slice(toks, 1, NUM_FIRST_TOKENS), bigrams_expr(toks))
    )


def prepare_url_expr(col: Column) -> Column:
    """P4: strip scheme, map ``/ . _`` to spaces (expression path).

    Percent-decoding is skipped here (Spark's ``url_decode`` follows
    form-encoding '+'-as-space, Python's ``unquote`` does not); the
    parity-exact percent-decode lives in ``prepare_url_pd``.
    """
    no_scheme = F.regexp_replace(col, r"^https?://", "")
    return F.translate(no_scheme, "/._", "   ")


def document_terms_expr(
    title: Column, url: Column, extract: Column
) -> Column:
    """P5 (document level): union of per-field index terms
    [/root/reference/mwmbl/indexer/index.py:55-66]."""
    return F.array_union(
        index_terms_expr(tokenize_expr(title)),
        F.array_union(
            index_terms_expr(tokenize_expr(prepare_url_expr(url))),
            index_terms_expr(tokenize_expr(extract)),
        ),
    )


# ---------------------------------------------------------------------------
# Plain-Python twins (oracle + parity tests) — exact CPython semantics
# ---------------------------------------------------------------------------

def clean_unicode_py(s: str) -> str:
    """P2 [/root/reference/mwmbl/tokenizer.py:16-17]."""
    return s.encode("utf-8", errors="ignore").decode("utf-8")


def tokenize_py(text: str) -> list[str]:
    toks = clean_unicode_py(text).lower().split()
    if text.endswith(ELLIPSIS):
        toks = toks[:-2]
    return toks


def get_bigrams_py(num_bigrams: int, tokens: list[str]) -> list[str]:
    num_bigrams = min(num_bigrams, len(tokens) - 1)
    return [f"{tokens[i]} {tokens[i + 1]}" for i in range(num_bigrams)]


def index_terms_py(tokens: list[str]) -> set[str]:
    return set(tokens[:NUM_FIRST_TOKENS] + get_bigrams_py(NUM_BIGRAMS, tokens))


def prepare_url_py(url: str) -> str:
    from urllib.parse import unquote

    for start in ("http://", "https://"):
        if url.startswith(start):
            url = url[len(start):]
            break
    url = unquote(url)
    for c in "/._":
        url = url.replace(c, " ")
    return url


def document_terms_py(title: str, url: str, extract: str) -> set[str]:
    return (
        index_terms_py(tokenize_py(title))
        | index_terms_py(tokenize_py(prepare_url_py(url)))
        | index_terms_py(tokenize_py(extract))
    )


# ---------------------------------------------------------------------------
# Arrow-vectorized pandas UDFs (parity path on Spark)
# ---------------------------------------------------------------------------

@pandas_udf(ArrayType(StringType()))
def tokenize_pd(texts: pd.Series) -> pd.Series:
    """P1 with exact CPython semantics, Arrow-batched (no per-row Python
    at the Spark boundary; the inner loop is a pandas map over a batch)."""
    return texts.map(lambda t: tokenize_py(t) if t is not None else None)


@pandas_udf(StringType())
def prepare_url_pd(urls: pd.Series) -> pd.Series:
    """P4 with exact ``urllib.parse.unquote`` percent-decode semantics."""
    return urls.map(lambda u: prepare_url_py(u) if u is not None else None)

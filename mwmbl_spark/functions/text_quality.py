"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM, codegen) with deterministic,
engine-portable definitions so the DuckDB oracle can state the same
computation. The reference's only text analytics are its stopword sets
(index.py:18-34, format.py:18-33) and tf-idf features (rank.py:81-122);
these extend that to the standard corpus-curation signals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr
from mwmbl_spark.operators.dedup import hash60

# marker-token lists per language (deterministic heuristic lang-ID)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "les", "des", "un", "est"],
}

STOPWORDS_SMALL = ["the", "a", "and", "of", "to", "in", "is", "it", "on", "for"]

BPE_ISH_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _count_in(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id_expr(text: Column, toks: Column | None = None) -> Column:
    """Predicted language: argmax of marker-token counts, ties and
    all-zero -> 'unknown'; tiebreak = first language in sorted order
    strictly greater than all later ones (deterministic).

    Pass a pre-materialized ``toks`` column (e.g. tokenize_pd behind the
    Arrow-UDF projection barrier) on wide scans: the expression
    references the token array several times and Catalyst re-inlines a
    raw tokenize per reference (docs/SCALE.md pathology note)."""
    toks = tokenize_expr(text) if toks is None else toks
    counts = {lang: _count_in(toks, words) for lang, words in sorted(LANG_MARKERS.items())}
    langs = sorted(counts)
    best = F.greatest(*[counts[lg] for lg in langs])
    pred = F.lit("unknown")
    # first lang (sorted asc) achieving the max wins
    for lg in reversed(langs):
        pred = F.when((counts[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return pred


def quality_features(text: Column, toks: Column | None = None) -> dict[str, Column]:
    toks = tokenize_expr(text) if toks is None else toks
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    stop = _count_in(toks, STOPWORDS_SMALL)
    non_alnum = n_chars - F.length(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""))
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "mean_token_len": n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)),
        "stopword_ratio": stop.cast("double") / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": non_alnum.cast("double") / F.greatest(n_chars, F.lit(1)),
    }


def quality_score_expr(text: Column, toks: Column | None = None) -> Column:
    """Composite quality in [0,1]: length saturation + stopword presence
    - punctuation noise. An explicit, deterministic formula (the exact
    weights are a policy choice; what matters is the engine computes it
    columnar and the oracle agrees)."""
    f = quality_features(text, toks)
    length_component = F.least(f["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    stop_component = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_penalty = F.least(f["punct_ratio"] * 2.0, F.lit(1.0))
    return F.round(
        0.5 * length_component + 0.3 * stop_component + 0.2 * (1.0 - punct_penalty), 6
    )


def token_counts(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Whitespace token count + BPE-ish regex token count."""
    return {
        "n_ws_tokens": F.size(tokenize_expr(text) if toks is None else toks),
        "n_bpe_tokens": F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_REGEX), 0)),
        "n_chars": F.length(text),
    }


FP_MOD = 1 << 32


def fingerprint_expr(text: Column, toks: Column | None = None) -> Column:
    """Order-sensitive 32-bit document fingerprint: positional rolling
    hash sum_i (hash60(i || ':' || tok_i) mod 2^32) mod 2^32. Reordering
    tokens changes the value (unlike a bag-of-words hash)."""
    toks = tokenize_expr(text) if toks is None else toks
    contribs = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda t, i: F.pmod(hash60(F.concat(i.cast("string"), F.lit(":"), t)), F.lit(FP_MOD)),
    )
    total = F.aggregate(contribs, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(toks) > 0, F.pmod(total, F.lit(FP_MOD))).otherwise(F.lit(0).cast("long"))

"""Unigram language-model quality scoring (perplexity-proxy filter).

The CCNet / C4 lineage filters training documents by language-model
perplexity (Wenzek et al. 2020, arXiv:1911.00359 §4.3 — KenLM over
Wikipedia). A full LM is out of scope for a deterministic cross-engine
contract, but the honest distributed core is the same shape: a corpus
frequency model joined back against every document, reduced to a
per-token log-probability. Documents whose tokens are collectively
improbable under the corpus's own unigram distribution (gibberish,
boilerplate floods, wrong-language fragments) land in the tails.

score(d) = (1 / |d|) * sum_t tf(d, t) * ln(cf(t) / total_tokens)

Plan shape (the 100 TB lens): the frequency model is ONE aggregate over
postings (map-side partials); the scoring pass is a single shuffle join
postings ⋈ cf on term — vocabulary can be billions of rows, so this is
deliberately a shuffle join, not a broadcast — followed by a (doc_id)
aggregation with partials. The scalar total rides a broadcast
crossJoin, never a collect.

Float determinism: the per-doc sum's addend order is engine-dependent;
results are rounded to 6 decimals AFTER the final division, the same
convention every BM25 contract in this repo uses (sum-order noise is
~1e-15 against a 5e-7 rounding grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_frequencies(postings: DataFrame) -> DataFrame:
    """(term, cf): collection frequency of every vocabulary term."""
    return postings.groupBy("term").agg(F.sum("tf").alias("cf"))


def unigram_logprob(postings: DataFrame, term_freqs: DataFrame | None = None) -> DataFrame:
    """(doc_id, doc_len, logprob_per_token) — mean per-token natural-log
    unigram probability under the corpus's own distribution. Always
    finite: every scored term has cf >= tf >= 1. Pass a precomputed
    ``term_freqs`` to amortize the model across scoring epochs."""
    cf = term_freqs if term_freqs is not None else term_frequencies(postings)
    total = cf.agg(F.sum("cf").cast("double").alias("total"))
    scored = (
        postings.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("doc_len"),
            F.sum(F.col("tf") * F.log(F.col("cf") / F.col("total"))).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        "doc_len",
        F.round(F.col("lp") / F.col("doc_len"), 6).alias("logprob_per_token"),
    )


def lm_quality_band(
    postings: DataFrame,
    min_lp: float,
    max_lp: float,
    term_freqs: DataFrame | None = None,
) -> DataFrame:
    """doc_ids whose mean log-prob lies in [min_lp, max_lp] — the CCNet
    middle band (both tails are suspect: the high tail is degenerate
    repetition of frequent tokens, the low tail is noise)."""
    lp = unigram_logprob(postings, term_freqs)
    return lp.where(
        (F.col("logprob_per_token") >= min_lp) & (F.col("logprob_per_token") <= max_lp)
    ).select("doc_id", "logprob_per_token")

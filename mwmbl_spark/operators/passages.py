"""Passage shattering: fixed-stride token windows as retrieval units.

The reference ranks whole pages (/root/reference/mwmbl/tinysearchengine/
rank.py scores page-grain postings); retrieval-augmented pipelines
consume PASSAGES — overlapping fixed-size token windows (DPR, Karpukhin
et al. 2020 use 100-word windows; RAG serving stacks stride them). This
module only SHATTERS: each doc yields windows of ``window`` tokens at
``stride``, re-encoded as synthetic passage docs so the engine's whole
existing posting/stats/BM25/WAND stack runs unchanged at passage grain
(passage df, passage length norm — the statistics a passage ranker
needs are exactly doc statistics over the shattered table).

Passage identity has two encodings. ``packed=True`` packs
``doc_id * pid_offset + start`` (1-based token start) into one BIGINT
— decomposable by div/mod at serve time, ideal for small sequential id
spaces (ANSI mode fails loud on overflow rather than corrupting ids).
``packed=False`` is the overflow-safe general form: the id column
becomes a ``struct(doc_id, start)`` — joins, groupBys and the top-k
tie-break (struct ordering is lexicographic = (doc_id, start) asc,
exactly the packed order for non-negative ids) all work unchanged
through the posting/BM25 stack, and it survives hash-shaped 64-bit
doc ids that would overflow any multiplier.

Scale shape: one tokenize pass, one ``explode`` over the per-doc start
sequence (output rows ~ tokens/stride — linear in corpus tokens), all
JVM expressions. The shattered table is a normal corpus: partition it,
index it, upsert it like any other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr

__all__ = ["build_passages"]


def build_passages(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    pid_offset: int = 1_000_000,
    packed: bool = True,
) -> DataFrame:
    """Shatter (id, text) into (passage-id, text) windows.

    Window starts are 1, 1+stride, 1+2·stride, ... while <= token
    count (an empty/whitespace-only doc still yields one empty passage
    at start 1, so every input doc stays addressable downstream); each
    passage's text is its ``window`` tokens joined by single spaces —
    re-tokenizing it reproduces the token slice exactly (the engine's
    tokens are whitespace atoms).

    Returns (id_col, text) where id_col is the packed BIGINT
    ``doc_id·pid_offset + start`` (``packed=True``; requires
    ``doc_id < 2^63 / pid_offset`` — ANSI overflow aborts otherwise)
    or the overflow-safe ``struct(doc_id, start)`` (``packed=False``;
    decompose downstream via ``col(id_col + ".doc_id")``).
    """
    pid = (
        (F.col("_did") * pid_offset + F.col("start"))
        if packed
        else F.struct(
            F.col("_did").alias("doc_id"), F.col("start").alias("start")
        )
    )
    toks = docs.select(
        F.col(id_col).alias("_did"), tokenize_expr(F.col(text_col)).alias("toks")
    )
    return (
        toks.select(
            "_did",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("toks"), F.lit(1)),
                    F.lit(stride),
                )
            ).alias("start"),
        )
        .select(
            pid.alias(id_col),
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start"), F.lit(window))
            ).alias(text_col),
        )
    )

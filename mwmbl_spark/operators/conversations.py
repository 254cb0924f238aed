"""Conversation-level operators over the transcript table.

The north-rule input is a turn-grained transcript
(conv_id, turn_idx, role, text, tool, ts, doc_id — see
sources/transcripts.py); a training-data pipeline consumes it at two
grains the reference never needed (its unit is the crawled page,
/root/reference/mwmbl/tinysearchengine/indexer.py): the conversation
rollup, and supervised (context, target) pairs cut from the turn
sequence.

Both are single-shuffle plans keyed on conv_id. Conversations are
bounded (tens-to-hundreds of turns), so the per-key state is small and
skew-free by construction — the window frame below is ROWS-bounded,
never growing with corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwmbl_spark.functions.tokenize import tokenize_expr


def conversation_stats(transcripts: DataFrame, toks_col: str | None = None) -> DataFrame:
    """Per-conversation rollup: turn counts by role, token total, and
    wall-clock span in whole minutes (ts differences are
    timezone-safe; the synthetic ts grid is minute-aligned).

    One hash aggregation on conv_id with map-side partials. Pass a
    pre-materialized token column (Arrow-UDF barrier) on wide scans.
    """
    toks = tokenize_expr(F.col("text")) if toks_col is None else F.col(toks_col)
    role = F.col("role")
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((role == "user").cast("int")).alias("n_user_turns"),
        F.sum((role == "assistant").cast("int")).alias("n_assistant_turns"),
        F.sum((role == "tool").cast("int")).alias("n_tool_turns"),
        F.sum(F.size(toks)).alias("n_tokens"),
        ((F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 60)
        .cast("long")
        .alias("span_minutes"),
    )


def training_pairs(
    transcripts: DataFrame,
    context_window: int = 3,
    sep: str = " [SEP] ",
    target_roles: Sequence[str] = ("assistant",),
) -> DataFrame:
    """Supervised (context, target) pairs: for every turn whose role is
    in ``target_roles``, the context is the previous ``context_window``
    turns rendered ``role: text`` and joined by ``sep`` in turn order;
    the target is the turn's own text. Turns with an empty context
    (conversation openers) are dropped — there is nothing to condition
    on.

    The frame is ROWS BETWEEN -context_window AND -1 over
    (conv_id, turn_idx): collect_list over a bounded ordered frame is
    deterministic (frame order) and its state is O(context_window)
    per row — this never buffers a whole conversation, let alone a
    partition. One shuffle on conv_id; the role filter is applied
    after the frame so context turns of EVERY role are visible.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_window, -1)
    )
    ctx = F.collect_list(F.concat_ws(": ", "role", "text")).over(w)
    out = transcripts.select(
        "doc_id", "conv_id", "turn_idx", "role", "text", ctx.alias("ctx")
    )
    return out.where(
        F.col("role").isin(list(target_roles)) & (F.size("ctx") > 0)
    ).select(
        "doc_id",
        "conv_id",
        "turn_idx",
        F.concat_ws(sep, F.col("ctx")).alias("context"),
        F.col("text").alias("target"),
        F.size("ctx").alias("n_context_turns"),
    )


def conversation_topk(
    scored: DataFrame, conv_map: DataFrame, k: int = 10
) -> DataFrame:
    """Conversation-grained retrieval (round-5): rank CONVERSATIONS by
    their best turn's relevance score — the result grain a transcript
    user actually wants back ("which conversations discuss X", not
    "which isolated turns"). Consumes any (query_id, doc_id, score)
    relation (bm25_scores, the WAND kernel output, tf-idf) plus a
    (doc_id, conv_id) mapping; returns
    (query_id, conv_id, best_doc_id, score, rank) with rank <= k.

    Plan shape: one join to attach conv_id, then two windows — best
    turn per (query, conv) and top-k conversations per query. Both are
    row_number cuts, so Catalyst inserts map-side WindowGroupLimits:
    only ~1 row per (partition, conv) reaches the first shuffle and
    ~k rows per partition reach the second. Ties: score desc, doc_id
    asc within a conversation; score desc, best_doc_id asc across
    conversations — a total order shared with the oracle.
    """
    j = scored.join(conv_map, "doc_id")
    w_turn = Window.partitionBy("query_id", "conv_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    best = (
        j.withColumn("_rn", F.row_number().over(w_turn))
        .where(F.col("_rn") == 1)
        .select("query_id", "conv_id", F.col("doc_id").alias("best_doc_id"), "score")
    )
    w_conv = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("best_doc_id")
    )
    return (
        best.withColumn("rank", F.row_number().over(w_conv))
        .where(F.col("rank") <= k)
        .select("query_id", "conv_id", "best_doc_id", "score", "rank")
    )

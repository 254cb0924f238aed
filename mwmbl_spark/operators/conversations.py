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

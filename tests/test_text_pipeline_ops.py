"""Repetition signals + conversation operators, hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mwmbl_spark.operators.conversations import conversation_stats, training_pairs
from mwmbl_spark.operators.repetition import ngrams_expr, repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_ngrams_expr_short_docs(spark):
    df = _docs(
        spark, [(0, ["a", "b", "c"]), (1, ["a"]), (2, []), (3, ["a", "b"])]
    ).select("doc_id", ngrams_expr(F.col("toks"), 2).alias("g"))
    got = {r.doc_id: r.g for r in df.collect()}
    assert got == {0: ["a b", "b c"], 1: [], 2: [], 3: ["a b"]}


def test_repetition_features_hand_computed(spark):
    # "a b a b a": bigrams {a b:2, b a:2} -> n=4 top=2/4 dup=4/4
    #              trigrams {a b a:2, b a b:1} -> n=3 top=2/3 dup=2/3
    df = repetition_features(
        _docs(spark, [(0, ["a", "b", "a", "b", "a"]), (1, ["x"]), (2, [])])
    )
    got = {r.doc_id: r.asDict() for r in df.collect()}
    assert set(got) == {0, 1, 2}, "every input doc must appear"
    r0 = got[0]
    assert r0["n_bigrams"] == 4 and r0["n_trigrams"] == 3
    assert r0["top_bigram_frac"] == 0.5 and r0["dup_bigram_frac"] == 1.0
    assert r0["top_trigram_frac"] == round(2 / 3, 6)
    assert r0["dup_trigram_frac"] == round(2 / 3, 6)
    for short in (1, 2):
        r = got[short]
        assert r["n_bigrams"] == 0 and r["top_bigram_frac"] == 0.0
        assert r["dup_trigram_frac"] == 0.0


def test_repetition_boilerplate_spikes(spark):
    clean = [f"w{i}" for i in range(40)]
    spam = ["buy", "now"] * 20
    df = repetition_features(_docs(spark, [(0, clean), (1, spam)]))
    got = {r.doc_id: r.asDict() for r in df.collect()}
    assert got[0]["dup_bigram_frac"] == 0.0
    assert got[1]["dup_bigram_frac"] == 1.0 and got[1]["top_bigram_frac"] > 0.5


def _transcript(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        # conv A: 5 turns, roles u/a/u/t/a
        ("A", 0, "user", "hi there", None, base, 0),
        ("A", 1, "assistant", "hello", None, base + dt.timedelta(minutes=1), 1),
        ("A", 2, "user", "run it", None, base + dt.timedelta(minutes=2), 2),
        ("A", 3, "tool", "ran ok", "search", base + dt.timedelta(minutes=3), 3),
        ("A", 4, "assistant", "done", None, base + dt.timedelta(minutes=9), 4),
        # conv B: opener-only assistant (no context -> dropped)
        ("B", 0, "assistant", "solo", None, base, 5),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, doc_id long",
    )


def test_training_pairs_window_and_order(spark):
    got = {
        r.doc_id: r.asDict()
        for r in training_pairs(_transcript(spark), context_window=2).collect()
    }
    assert set(got) == {1, 4}, "openers and non-assistant turns excluded"
    assert got[1]["context"] == "user: hi there" and got[1]["n_context_turns"] == 1
    # turn 4 sees only turns 2,3 (ROWS -2..-1), in turn order
    assert got[4]["context"] == "user: run it [SEP] tool: ran ok"
    assert got[4]["target"] == "done" and got[4]["n_context_turns"] == 2


def test_training_pairs_multi_role_targets(spark):
    got = {
        r.doc_id: r.role if hasattr(r, "role") else None
        for r in training_pairs(
            _transcript(spark), context_window=3, target_roles=("assistant", "tool")
        ).collect()
    }
    assert set(got) == {1, 3, 4}


def test_conversation_stats(spark):
    got = {
        r.conv_id: r.asDict() for r in conversation_stats(_transcript(spark)).collect()
    }
    a = got["A"]
    assert a["n_turns"] == 5 and a["n_user_turns"] == 2
    assert a["n_assistant_turns"] == 2 and a["n_tool_turns"] == 1
    assert a["n_tokens"] == 2 + 1 + 2 + 2 + 1
    assert a["span_minutes"] == 9
    b = got["B"]
    assert b["n_turns"] == 1 and b["span_minutes"] == 0


def test_duplicated_span_stats(spark):
    from mwmbl_spark.operators.repetition import duplicated_span_stats

    df = _docs(spark, [
        (0, ["a", "b", "c", "d"]),        # windows: abc, bcd
        (1, ["x", "a", "b", "c"]),        # windows: xab, abc -> abc dup with doc 0
        (2, ["q", "q", "q", "q", "q"]),   # qqq x3 -> all self-dup
        (3, ["z", "y"]),                  # too short: 0 windows
    ])
    got = {r.doc_id: r.asDict() for r in duplicated_span_stats(df, n=3).collect()}
    assert got[0] == {"doc_id": 0, "n_windows": 2, "dup_window_frac": 0.5}
    assert got[1] == {"doc_id": 1, "n_windows": 2, "dup_window_frac": 0.5}
    assert got[2] == {"doc_id": 2, "n_windows": 3, "dup_window_frac": 1.0}
    assert got[3] == {"doc_id": 3, "n_windows": 0, "dup_window_frac": 0.0}

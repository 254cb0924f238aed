"""Sessionization + Markov transition operators (operators/sessions.py).

Covers the semantics the sf-grid contract can't pin: timestamp
tie-breaking via order_col, the exact >gap boundary (a gap of exactly
``gap_minutes`` does NOT cut), cross-session transition suppression,
and per-prev-state probability normalization.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mwmbl_spark.operators.sessions import (
    session_stats,
    sessionize,
    transition_counts,
)

SCHEMA = "user_id long, event_id long, ts timestamp_ntz, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def ts(minute: int, second: int = 0, micro: int = 0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second, micro)


def test_gap_boundary_is_strict(spark):
    # gaps: exactly 30 min (no cut), 30 min + 1 us (cut)
    df = _ev(
        spark,
        [
            (1, 0, ts(0), "a"),
            (1, 1, ts(30), "b"),  # exactly 30 min later: same session
            (1, 2, ts(60, 0, 1), "c"),  # 30 min + 1 us: new session
        ],
    )
    got = {
        r.event_id: r.session_seq
        for r in sessionize(df, gap_minutes=30.0).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2}


def test_tie_break_on_order_col(spark):
    # two events at the IDENTICAL timestamp: order_col decides the
    # sequence, so the session assignment is deterministic
    df = _ev(
        spark,
        [
            (1, 2, ts(0), "b"),
            (1, 1, ts(0), "a"),
            (1, 3, ts(100), "c"),
        ],
    )
    rows = sessionize(df, gap_minutes=30.0).orderBy("session_seq", "event_id").collect()
    assert [(r.event_id, r.session_seq) for r in rows] == [(1, 1), (2, 1), (3, 2)]


def test_session_stats_rollup(spark):
    df = _ev(
        spark,
        [
            (1, 0, ts(0), "a"),
            (1, 1, ts(10), "a"),
            (1, 2, ts(200), "b"),
            (2, 3, ts(5), "c"),
        ],
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.n_types, r.duration_secs)
        for r in session_stats(df, gap_minutes=30.0).collect()
    }
    assert got == {
        (1, 1): (2, 1, 600),
        (1, 2): (1, 1, 0),
        (2, 1): (1, 1, 0),
    }


def test_transitions_cut_at_session_boundary(spark):
    # a->b inside session 1; b->c crosses the gap and must NOT count
    df = _ev(
        spark,
        [
            (1, 0, ts(0), "a"),
            (1, 1, ts(5), "b"),
            (1, 2, ts(500), "c"),
            (1, 3, ts(505), "a"),
        ],
    )
    tc = transition_counts(df, gap_minutes=30.0)
    got = {(r.prev_state, r.state): r.n for r in tc.collect()}
    assert got == {("a", "b"): 1, ("c", "a"): 1}


def test_transition_probabilities_normalize(spark):
    df = _ev(
        spark,
        [
            (1, 0, ts(0), "a"),
            (1, 1, ts(1), "b"),
            (1, 2, ts(2), "a"),
            (1, 3, ts(3), "a"),
            (1, 4, ts(4), "c"),
        ],
    )
    tc = transition_counts(df, gap_minutes=30.0).collect()
    by_prev: dict[str, float] = {}
    for r in tc:
        by_prev[r.prev_state] = by_prev.get(r.prev_state, 0.0) + r.p
    assert all(abs(v - 1.0) < 1e-12 for v in by_prev.values())
    got = {(r.prev_state, r.state): r.p for r in tc}
    # a's outgoing transitions: a->b, a->a, a->c (one each)
    assert got[("a", "b")] == 1.0 / 3.0
    assert got[("a", "a")] == 1.0 / 3.0
    assert got[("a", "c")] == 1.0 / 3.0
    assert got[("b", "a")] == 1.0


def test_transitions_without_gap_use_full_history(spark):
    df = _ev(
        spark,
        [
            (1, 0, ts(0), "a"),
            (1, 1, ts(500), "b"),
        ],
    )
    got = {
        (r.prev_state, r.state): r.n
        for r in transition_counts(df).collect()
    }
    assert got == {("a", "b"): 1}


def test_sessionize_one_shuffle(spark):
    """Both window passes (lag + running sum) share one Exchange on the
    session key — the plan must not re-shuffle between them."""
    df = _ev(spark, [(1, 0, ts(0), "a")])
    plan = sessionize(df, gap_minutes=30.0)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan

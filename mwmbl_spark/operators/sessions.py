"""Sessionization and Markov transition analytics over event streams.

The reference keeps per-day/per-user crawler counters in Redis
(/root/reference/mwmbl/crawler/stats.py:64-216: date-keyed hincrby of
user/host event counts) — aggregate grains only; it never reconstructs
*sessions* from the event stream. A query/interaction log pipeline
needs that grain: gap-based session IDs (industry-standard 30-minute
idle cutoff, tunable), session rollups, and state-transition counts
(which event follows which) for behaviour modelling.

Plan shape (the 100 TB lens): every operator here is ONE shuffle on the
session key followed by windowed lags / hash aggregation with map-side
partials. The window frames are lag(1)/running-sum — O(1) state per
row, never buffering a partition. Keys are users; per-user event counts
are bounded (human-generated), so no salting is needed — if a bot key
were hot, the same pre-aggregation trick as postings (salted two-phase,
operators/postings.py) applies, but we do not pay its cost by default.

Float determinism: transition probabilities are a single int/int IEEE
division (exact per operand pair, engine-independent); no rounding
needed. Gap comparison runs on exact integer MICROSECONDS
(``unix_micros`` here, ``epoch_us`` in the DuckDB oracle) — a
seconds-granularity ``unix_timestamp`` would silently truncate
sub-second gaps and disagree with any engine comparing full precision.
``timestampdiff(MICROSECOND, ...)`` is the one Spark micro-diff that
accepts TIMESTAMP_NTZ (parquet event logs read as NTZ; ``unix_micros``
rejects it, and casting NTZ->TIMESTAMP would drag the session timezone
into the arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign 1-based ``session_seq`` per key: a new session starts when
    the gap to the previous event exceeds ``gap_minutes``.

    ``order_col`` breaks ts ties deterministically (identical
    timestamps are real in event logs). Two window passes over the SAME
    (key, order) sort — Spark reuses one Exchange + one Sort for both,
    so this is one shuffle end-to-end.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    staged = events.withColumn("_prev_ts", F.lag(ts_col).over(w))
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    new_session = (
        F.col("_prev_ts").isNull() | (gap_us > gap_minutes * 60.0 * 1_000_000.0)
    ).cast("int")
    running = Window.partitionBy(key_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return staged.withColumn(
        "session_seq", F.sum(new_session).over(running).cast("long")
    ).drop("_prev_ts")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: float = 30.0,
    type_col: str = "event_type",
) -> DataFrame:
    """Session rollup: event count, distinct event types, start/end
    timestamps and whole-second duration. One shuffle (the sessionize
    window) + one hash aggregation on (key, session_seq)."""
    s = sessionize(events, key_col, ts_col, order_col, gap_minutes)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(type_col).alias("n_types"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        # integral DIV, not floor(x/y): stays in exact int64 arithmetic
        F.expr(
            f"timestampdiff(MICROSECOND, min({ts_col}), max({ts_col}))"
            " DIV 1000000"
        ).alias("duration_secs"),
    )


def transition_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
    gap_minutes: float | None = None,
    session_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition table over the event-state
    sequence: (prev_state, state, n, p) where p = n / sum(n | prev).

    Transitions are counted within a session when ``gap_minutes`` is
    given (the sequence is cut at session boundaries — a click 3 days
    later is not a "transition") or within ``session_col`` if the
    caller already sessionized; otherwise over the key's full history.

    The lag window shares the sessionize Exchange+Sort (same
    partition/order keys: session_seq is a function of that order), so
    the whole plan is one shuffle + one small aggregation. The output
    is |states|^2 rows — probabilities via a window over that tiny
    aggregate, not over the event stream.
    """
    if gap_minutes is not None and session_col is None:
        events = sessionize(events, key_col, ts_col, order_col, gap_minutes)
        session_col = "session_seq"
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev_state = F.lag(state_col).over(w)
    same_run = (
        F.lag(session_col).over(w) == F.col(session_col)
        if session_col is not None
        else F.lit(True)
    )
    pairs = events.select(
        prev_state.alias("prev_state"),
        F.col(state_col).alias("state"),
        same_run.alias("same_run"),
    ).where(F.col("prev_state").isNotNull() & F.col("same_run"))
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(total)).alias("p"),
    )

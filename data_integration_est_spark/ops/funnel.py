"""Ordered event-funnel analysis (engine extension; SURVEY §2 P-ops
family).  Given an ordered list of step event types, compute for every
user the earliest timestamp at which each step was reached, where step i
counts only if it happens STRICTLY AFTER the user's step-(i-1) time —
the standard product-analytics funnel (each step must follow the
previous one; re-orderings don't count).

Spark-first shape: one filtered min-timestamp aggregation per step, each
chained on the previous step's per-user table.  Every aggregation and
join keys on the user column, so after the first shuffle the remaining
stages reuse the same hash partitioning; the per-step filter
(``event_type = <step>``) is pushed to the parquet scan.  k steps cost k
cheap filtered passes — no per-user sort, no window over full history,
no state beyond one timestamp per (user, step).

``funnel_counts`` reduces the per-user table to the funnel's step-
conversion row — the thing a dashboard plots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step.

    Returns one row per user who completed step 1, with columns
    ``t_1 .. t_k`` (nullable from step 2 on: null = funnel abandoned
    there).  Step i's time is min(ts of a step-i event strictly after
    t_{i-1}).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, f"t_{i-1}"), on=user_col)
            .filter(F.col(ts_col) > F.col(f"t_{i-1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, on=user_col, how="left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One-row funnel summary: ``n_step_i`` = users whose ordered funnel
    reached step i (non-null ``t_i``)."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    return times.agg(
        *[
            F.sum(F.col(f"t_{i}").isNotNull().cast("long")).alias(f"n_step_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )

"""Rolling time-range features over event streams (engine extension).

Per-entity trailing-window aggregates — "this user's event count / value
sum over the preceding hour" — the bread-and-butter features of fraud,
recommendation, and training-data pipelines.

Spark-first shape: ONE shuffle on the entity key, then a RANGE window
over the numeric event time (``unix_micros``), all inside whole-stage
codegen.  A RANGE frame (not ROWS) makes equal-timestamp peers agree
with ANSI SQL ``RANGE BETWEEN ... PRECEDING AND CURRENT ROW`` exactly,
so DuckDB can verify bit-for-bit.  State per partition is the in-frame
row span — bounded by the window duration, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_rolling_features(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    suffix: str | None = None,
) -> DataFrame:
    """Append trailing-window features per entity:

    ``roll_cnt<suffix>``  events in [t - window, t] (inclusive both ends)
    ``roll_sum<suffix>``  sum of ``value_col`` over the same frame
    ``roll_avg<suffix>``  mean over the same frame (never null: the
                          current row is always in-frame)

    The frame is anchored on microseconds so sub-second event times
    resolve identically in Spark and ANSI-SQL oracles.
    """
    sfx = suffix if suffix is not None else f"_{window_seconds}s"
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    v = F.col(value_col).cast("double")
    return (
        df.withColumn(f"roll_cnt{sfx}", F.count(F.lit(1)).over(w))
        .withColumn(f"roll_sum{sfx}", F.round(F.sum(v).over(w), 6))
        .withColumn(f"roll_avg{sfx}", F.round(F.avg(v).over(w), 6))
    )

"""Time-series regularization — resample events onto a fixed grid per
key, densify the gaps, and fill them (zero / forward-fill / linear
interpolation).

Every monitoring, feature-engineering, or training-curve pipeline hits
this: raw events are irregular, downstream consumers want one row per
(key, bucket) with NO holes.  The engine's existing time ops sessionize
(``streaming``/entry rows) and roll (``ops/rolling``); this module adds
the missing regularize step.

Spark-first shapes (no Python anywhere):
- bucketing is ``timestamp_seconds(floor(unix / step) * step)`` — a
  pure column expression that pushes through partition pruning;
- densification explodes ONE ``sequence(min_bucket, max_bucket, step)``
  per key (computed in the same grouped pass as the aggregates' span),
  so the shuffle carries grid rows, not a cross join — grid mass is
  sum_k(span_k/step), the honest output size;
- forward-fill is ``last(value, ignorenulls=True)`` over the grid
  window; linear interpolation derives from the SAME two fill scans
  (previous/next observed value + their grid positions) — two window
  passes total over grid-sized data, never a self-join.

At 100 TB the only corpus-scale stage is the first aggregation; the
grid is keys x buckets, and each fill is a keyed window over it.  Guard
the grid mass like any densification: a single key spanning years at
1-second steps is a 31M-row key — pick ``step`` for the consumer, and
cap spans upstream if keys are unbounded.

Cites: reference has no time-series surface; engine extension
(pandas ``resample``/``asfreq`` semantics, gaps-and-islands family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FILLS = ("none", "zero", "ffill", "linear")

# allowlist: the aggregate name is interpolated into the plan, so it is
# validated here — a typo fails loudly at call time (not as an opaque
# Catalyst parse error), and nothing outside this table can be injected
_AGGS = {
    "sum": F.sum, "avg": F.avg, "mean": F.avg, "count": F.count,
    "min": F.min, "max": F.max, "stddev": F.stddev,
    "stddev_samp": F.stddev_samp, "stddev_pop": F.stddev_pop,
    "variance": F.variance, "var_samp": F.var_samp, "var_pop": F.var_pop,
    "median": F.median, "first": F.first, "last": F.last,
    "any_value": F.any_value,
}


def bucket_ts(ts: Column, step_seconds: int) -> Column:
    """Floor a timestamp onto the step grid — exact integer arithmetic
    on unix seconds (identical in any engine)."""
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(ts) / step_seconds) * step_seconds)
        .cast("long")
    )


def resample_timeseries(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | str | None = None,
    step_seconds: int = 3600,
    agg: str = "sum",
    fill: str = "ffill",
    out_col: str | None = None,
) -> DataFrame:
    """One row per (key, bucket) over each key's OWN observed span
    (min..max bucket, inclusive), holes filled per ``fill``:

    - ``none``  — keep null at empty buckets;
    - ``zero``  — 0.0 (the right fill for counts/sums);
    - ``ffill`` — last observed aggregate carried forward (leading
      holes stay null: nothing to carry);
    - ``linear`` — straight line between the previous and next observed
      buckets (leading/trailing holes fall back to forward/backward
      carry — pandas ``interpolate(limit_direction='both')``).

    ``agg`` is an aggregate name from the allowlist (sum, avg/mean,
    count, min, max, stddev[_samp|_pop], variance/var_samp/var_pop,
    median, first, last, any_value) — validated, never interpolated
    raw.  Output: ``key_cols..., bucket, <out_col>``
    plus ``n_obs`` (rows observed in the bucket; 0 marks filled rows).

    Column types: ``bucket`` is a timestamp on the step grid; the value
    column is double."""
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}")
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    if agg not in _AGGS:
        raise ValueError(
            f"agg must be one of {sorted(_AGGS)}; got {agg!r}"
        )
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols or [])
    out_col = out_col or f"{agg}_{value_col}"

    secs = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        .cast("long").alias("__b__")
    )
    observed = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, secs, F.col(value_col).alias("__v__"))
        .groupBy(*keys, "__b__")
        .agg(
            _AGGS[agg]("__v__").cast("double").alias("__agg__"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    # one grouped pass gives each key's span; the grid explodes from a
    # per-key sequence — grid-sized output, no cross join
    span = observed.groupBy(*keys).agg(
        F.min("__b__").alias("__lo__"), F.max("__b__").alias("__hi__")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(1))
        ).alias("__b__"),
    )
    dense = (
        grid.join(observed, [*keys, "__b__"], "left")
        .withColumn("n_obs", F.coalesce("n_obs", F.lit(0)))
    )

    v = F.col("__agg__")
    if fill == "zero":
        filled = F.coalesce(v, F.lit(0.0))
    elif fill in ("ffill", "linear"):
        w_back = (
            Window.partitionBy(*keys).orderBy("__b__")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_v = F.last(v, ignorenulls=True).over(w_back)
        prev_b = F.last(
            F.when(v.isNotNull(), F.col("__b__")), ignorenulls=True
        ).over(w_back)
        if fill == "ffill":
            filled = prev_v
        else:
            w_fwd = (
                Window.partitionBy(*keys).orderBy("__b__")
                .rowsBetween(0, Window.unboundedFollowing)
            )
            next_v = F.first(v, ignorenulls=True).over(w_fwd)
            next_b = F.first(
                F.when(v.isNotNull(), F.col("__b__")), ignorenulls=True
            ).over(w_fwd)
            frac = (F.col("__b__") - prev_b) / (next_b - prev_b)
            filled = (
                F.when(v.isNotNull(), v)
                .when(
                    prev_v.isNotNull() & next_v.isNotNull(),
                    prev_v + frac * (next_v - prev_v),
                )
                .otherwise(F.coalesce(prev_v, next_v))
            )
    else:
        filled = v

    return dense.select(
        *keys,
        F.timestamp_seconds(F.col("__b__") * step_seconds).alias("bucket"),
        filled.alias(out_col),
        "n_obs",
    )

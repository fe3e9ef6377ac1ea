"""As-of (nearest-timestamp) join — a training-pipeline staple Spark's
join operators don't express directly (pandas ``merge_asof``, DuckDB
``ASOF JOIN``).

Spark-first shape: UNION the two sides, then ONE per-key window pass
carries the most recent right-side values forward onto left rows —
one shuffle on the key, state bounded by a single row of carried
columns, no range-condition join (which Spark would execute as a
broadcast-nested-loop or an exploding theta-join).  The same pattern
backs the streaming sessionizer; at 100 TB it scales exactly like any
keyed window (AQE handles key skew).

Semantics match ``merge_asof(direction=...)`` / DuckDB ``ASOF JOIN``:
  backward  latest right row with r.ts <= l.ts   (inclusive)
  forward   earliest right row with r.ts >= l.ts (inclusive)
``tolerance`` (seconds) nulls out matches farther than the bound, like
merge_asof's tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``<v><suffix>`` for each
    of ``value_cols`` plus ``<ts_col><suffix>`` (the matched right
    timestamp), or nulls when no right row qualifies.

    Ties: right rows sharing (key, ts) are resolved by the LAST one in
    the window order — pass pre-deduplicated right sides when exact tie
    behavior matters (DuckDB/pandas are equally arbitrary here).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{ts_col}{suffix}"]
    # Carry ONE struct per right row (never null at the struct level even
    # when individual value fields are NULL) so every carried field comes
    # from the SAME matched right row — per-column last(ignorenulls) would
    # splice a stale previous row's value into a NULL field, which pandas
    # merge_asof / DuckDB ASOF JOIN never do.
    r2 = right.select(
        *by_cols,
        F.col(ts_col),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias("__carry__"),
    ).withColumn("__side__", F.lit(0))
    l2 = left.withColumn("__side__", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts (side 0 < 1), making
    # both directions inclusive; forward just reverses the time order.
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("__side__").asc()]
    else:
        order = [F.col(ts_col).desc(), F.col("__side__").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__carry__", F.last(F.col("__carry__"), ignorenulls=True).over(w))

    out = u.filter(F.col("__side__") == 1).drop("__side__")
    for c in carried:
        out = out.withColumn(c, F.col("__carry__").getField(c))
    out = out.drop("__carry__")
    if tolerance is not None:
        ts_r = F.col(f"{ts_col}{suffix}")
        lag = F.abs(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(ts_r)
        ) / 1e6
        keep = ts_r.isNotNull() & (lag <= float(tolerance))
        for c in carried:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out

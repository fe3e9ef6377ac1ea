"""Robust outlier detection — per-group median/MAD z-scores.

The data-cleaning cut that survives heavy tails (where mean/sd flags
half the data or nothing): a row is an outlier when

    |x - median_g| > k * 1.4826 * MAD_g,
    MAD_g = median_g(|x - median_g|)

with 1.4826 the normal-consistency constant (so ``k`` reads as "robust
sigmas").  Groups with MAD = 0 (a majority-constant column) fall back
to flagging any row different from the median — the conventional
degenerate-MAD behavior, loud rather than silently flagging nothing.

Scale shape: TWO grouped exact-percentile aggregations (Spark's
``percentile`` — same continuous interpolation as DuckDB's ``median``,
so the oracle replays bit-for-bit at 6 dp) + one broadcast join of the
O(groups) threshold table back onto the rows.  For extreme-cardinality
groups swap ``percentile`` for ``kernels.quantile.svyquantile``'s
bisection; the flag algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_CONSISTENCY = 1.4826


def mad_outlier_flags(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | str | None = None,
    k: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Flag rows whose ``value_col`` sits more than ``k`` robust sigmas
    from their group's median.  Adds ``out_col`` (0/1 int; NULL value ->
    NULL flag) plus ``__med__``-free original columns."""
    if k <= 0:
        raise ValueError("k must be > 0")
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols else []
    )
    x = F.col(value_col).cast("double")
    med_tbl = (
        df.groupBy(*keys).agg(F.percentile(x, 0.5).alias("__med__"))
        if keys else
        df.agg(F.percentile(x, 0.5).alias("__med__"))
    )
    with_med = (
        df.join(F.broadcast(med_tbl), on=keys) if keys
        else df.crossJoin(F.broadcast(med_tbl))
    )
    mad_tbl = (
        with_med.groupBy(*keys).agg(
            F.percentile(F.abs(x - F.col("__med__")), 0.5).alias("__mad__")
        )
        if keys else
        with_med.agg(
            F.percentile(F.abs(x - F.col("__med__")), 0.5).alias("__mad__")
        )
    )
    full = (
        with_med.join(F.broadcast(mad_tbl), on=keys) if keys
        else with_med.crossJoin(F.broadcast(mad_tbl))
    )
    dev = F.abs(x - F.col("__med__"))
    flag = F.when(
        x.isNull(), F.lit(None).cast("int")
    ).when(
        F.col("__mad__") == 0.0, (dev > 0.0).cast("int")
    ).otherwise(
        (dev > F.lit(k * MAD_CONSISTENCY) * F.col("__mad__")).cast("int")
    )
    return full.withColumn(out_col, flag).drop("__med__", "__mad__")

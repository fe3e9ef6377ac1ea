"""One-shot data profiling: per-column completeness, cardinality,
numeric moments and top categorical values — the ``summarizeColumns``
/ ``dbt docs`` / Deequ-style profile every integration pipeline runs
before trusting a new source (the reference eyeballs its inputs with
``summary()`` in the notebook; this is that, industrialized).

Spark-first decomposition:

  pass 1 — ONE wide aggregation over the table: total count and, per
      column, null count + exact ``count(distinct)`` and (numerics)
      min/max/mean/stddev.  Multiple exact distincts make Catalyst
      EXPAND the input k ways — the honest exact-profile cost;
      ``approx=True`` swaps in ``approx_count_distinct`` (HLL++, one
      map-side pass, no expand) for wide tables at 100 TB.
  pass 2 — string columns only: melt to (column, value) with ONE
      generator, one groupBy for value counts, top-1 per column by
      (count DESC, value ASC) — deterministic.

Only k-row results reach the driver; the profile is assembled there
and returned as a small long-format DataFrame (one row per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType, DoubleType, LongType, NumericType, StringType,
    StructField, StructType, TimestampType,
)

from data_integration_est_spark.util import local_df


def _kind(dtype) -> str:
    if isinstance(dtype, NumericType):
        return "numeric"
    if isinstance(dtype, StringType):
        return "string"
    if isinstance(dtype, (DateType, TimestampType)):
        return "temporal"
    return "other"


def profile(
    df: DataFrame,
    columns: list | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column:
    ``(column, kind, n_rows, n_null, n_distinct, min_num, max_num,
    mean, sd, top_value, top_count)`` — numeric stats null for
    non-numeric columns, top value/count only for string columns (the
    mode of a continuous column is noise, and float->string rendering
    is engine-specific; categorical modes are the portable ones).

    ``approx=True`` estimates distinct counts with HLL++ instead of
    exact expand — the wide-table scale path; everything else is
    unchanged.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column '{c}' not found")
    if not cols:
        raise ValueError("profile needs at least one column")
    kinds = {f.name: _kind(f.dataType) for f in df.schema.fields if f.name in cols}

    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"nd_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if kinds[c] == "numeric":
            aggs.append(F.min(F.col(c).cast("double")).alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"av_{c}"))
            aggs.append(F.stddev_samp(F.col(c).cast("double")).alias(f"sd_{c}"))
    r = df.agg(*aggs).collect()[0]

    str_cols = [c for c in cols if kinds[c] == "string"]
    tops: dict = {}
    if str_cols:
        melted = df.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(c).alias("column"), F.col(c).alias("value"))
                    for c in str_cols
                ])
            ).alias("kv")
        ).select("kv.column", "kv.value").filter(F.col("value").isNotNull())
        counts = melted.groupBy("column", "value").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # deterministic top-1: max count, then lexicographically smallest
        # value — a max_by on (cnt, inverted-rank) doesn't exist for
        # strings, so take the 2-level sort on the tiny counts table
        from pyspark.sql import Window

        w = Window.partitionBy("column").orderBy(
            F.col("cnt").desc(), F.col("value").asc()
        )
        top_rows = (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .collect()
        )
        tops = {t["column"]: (t["value"], int(t["cnt"])) for t in top_rows}

    out_rows = []
    for c in cols:
        is_num = kinds[c] == "numeric"
        top = tops.get(c)
        out_rows.append((
            c,
            kinds[c],
            int(r["__n__"]),
            int(r[f"nn_{c}"]),
            int(r[f"nd_{c}"]),
            float(r[f"mn_{c}"]) if is_num and r[f"mn_{c}"] is not None else None,
            float(r[f"mx_{c}"]) if is_num and r[f"mx_{c}"] is not None else None,
            float(r[f"av_{c}"]) if is_num and r[f"av_{c}"] is not None else None,
            float(r[f"sd_{c}"]) if is_num and r[f"sd_{c}"] is not None else None,
            top[0] if top else None,
            top[1] if top else None,
        ))
    schema = StructType([
        StructField("column", StringType()),
        StructField("kind", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_null", LongType()),
        StructField("n_distinct", LongType()),
        StructField("min_num", DoubleType()),
        StructField("max_num", DoubleType()),
        StructField("mean", DoubleType()),
        StructField("sd", DoubleType()),
        StructField("top_value", StringType()),
        StructField("top_count", LongType()),
    ])
    return local_df(df.sparkSession, out_rows, schema)

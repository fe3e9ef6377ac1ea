"""Design-based survey statistics: HT totals, weighted means, and the
linearization variance of (calibrated) weighted means.

Engine-normative variance formulas (SURVEY.md §4.3-2; these are the
documented semantics our DuckDB oracles implement — parity with the
reference's ``survey::svymean`` linearization for element-level
with-replacement designs, ``ids=~1``, no FPC):

- ``svytotal``:  T = sum_s w_i y_i,
  V = n/(n-1) * sum_s (w_i y_i - mean(w y))^2

- ``svymean``:   m = sum_s w_i y_i / sum_s w_i,
  influence u_i = w_i * e_i / sum_s w_i   with
  e_i = (y_i - m)                               (plain design), or
  e_i = (y_i - m) - x_i^T B                     (calibrated design), where
  B solves  (sum_s d_i x_i x_i^T) B = sum_s d_i x_i (y_i - m)
  over the *pre-calibration* weights d and the calibration design columns x
  (survey-package semantics: calibration replaces y by its residuals).
  V = n/(n-1) * sum_s (u_i - mean(u))^2

Everything is a 2-3 pass DataFrame aggregation; only O(k^2 * groups)
scalars reach the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.gram import gram_aggregate
from data_integration_est_spark.kernels.linalg import _solve_stacked


@dataclass
class EstimateRow:
    key: tuple
    estimate: float
    variance: float
    n: int

    @property
    def se(self) -> float:
        return float(np.sqrt(self.variance))


def _collect_keyed(df: DataFrame, group_cols: list[str], aggs: list[Column]) -> dict[tuple, dict]:
    if group_cols:
        rows = df.groupBy(*group_cols).agg(*aggs).collect()
    else:
        rows = df.agg(*aggs).collect()
    return {tuple(r[c] for c in group_cols): r.asDict() for r in rows}


def weighted_mean(
    df: DataFrame, y_col: str, weight_col: str, group_cols: list[str] | None = None
) -> dict[tuple, float]:
    """Point estimate only: sum(w*y)/sum(w) per group."""
    group_cols = list(group_cols or [])
    w = F.col(weight_col).cast("double")
    y = F.col(y_col).cast("double")
    res = _collect_keyed(
        df.na.drop(subset=[y_col, weight_col]),
        group_cols,
        [F.sum(w * y).alias("__swy__"), F.sum(w).alias("__sw__")],
    )
    return {k: (r["__swy__"] or 0.0) / r["__sw__"] for k, r in res.items()}


def svytotal(
    design: SurveyDesign, y_col: str, group_cols: list[str] | None = None
) -> list[EstimateRow]:
    """HT total + with-replacement variance (reference ``PC.R:190-193``)."""
    group_cols = list(group_cols or [])
    df = design.df.na.drop(subset=[y_col, design.weight_col])
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    wy = w * y
    res = _collect_keyed(
        df,
        group_cols,
        [
            F.sum(wy).alias("__t__"),
            F.sum(wy * wy).alias("__t2__"),
            F.count(F.lit(1)).alias("__n__"),
        ],
    )
    out = []
    for k, r in res.items():
        n = int(r["__n__"])
        t = r["__t__"] or 0.0
        t2 = r["__t2__"] or 0.0
        # n/(n-1) * (sum z^2 - n*zbar^2), z = w*y
        v = float("nan") if n < 2 else n / (n - 1.0) * (t2 - t * t / n)
        out.append(EstimateRow(key=k, estimate=float(t), variance=float(v), n=n))
    return out


def svymean(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str] | None = None,
) -> list[EstimateRow]:
    """Weighted mean + linearization variance; calibration-aware.

    For calibrated designs the influence residual is regressed (with the
    pre-calibration weights) on the calibration columns — see module
    docstring.  Reference sites: ``RegDI2.R:246-248,305-307,322-324``,
    ``PC.R:245-247``.
    """
    group_cols = list(group_cols or [])
    subset = [y_col, design.weight_col] + (
        [design.base_weight_col] if design.is_calibrated else []
    )
    df = design.df.na.drop(subset=list(dict.fromkeys(subset)))
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")

    # pass 1: per-group mean
    p1 = _collect_keyed(
        df, group_cols,
        [F.sum(w * y).alias("__swy__"), F.sum(w).alias("__sw__"), F.count(F.lit(1)).alias("__n__")],
    )
    keys = list(p1.keys())
    means = {k: (p1[k]["__swy__"] or 0.0) / p1[k]["__sw__"] for k in keys}

    # pass 2 (calibrated only): per-group residual projection B
    B: dict[tuple, np.ndarray] | None = None
    if design.is_calibrated:
        xcols = list(design.calibration_cols or [])
        kx = len(xcols)
        # One Gram pass with an appended constant column: row kx of the
        # augmented Gram is the HT totals sum_s d_i x_j, needed for the
        # centered RHS  sum d*x*(y - m) = xy - m * sum d*x.
        ones = "__var_ones__"
        g = gram_aggregate(
            df.withColumn(ones, F.lit(1.0)), xcols + [ones],
            y_cols=[y_col], weight_col=design.base_weight_col, group_cols=group_cols,
        )
        ht = g.gram[:, kx, :kx]
        m_vec = np.array([means[key] for key in g.keys])
        rhs = g.xy[:, :kx, 0] - m_vec[:, None] * ht
        Bm = _solve_stacked(g.gram[:, :kx, :kx], rhs[..., None],
                            "svymean residual projection").squeeze(-1)
        B = {key: Bm[i].reshape(kx) for i, key in enumerate(g.keys)}

    # pass 3: variance of the influence values
    out: list[EstimateRow] = []
    if not group_cols:
        key = ()
        m = means[key]
        e: Column = y - F.lit(float(m))
        if B is not None:
            for c, b in zip(design.calibration_cols or [], B[key]):
                e = e - F.lit(float(b)) * F.col(c).cast("double")
        u = w * e / F.lit(float(p1[key]["__sw__"]))
        r = df.agg(
            F.sum(u * u).alias("__u2__"), F.sum(u).alias("__u1__"), F.count(F.lit(1)).alias("__n__")
        ).collect()[0]
        n = int(r["__n__"])
        v = float("nan") if n < 2 else n / (n - 1.0) * ((r["__u2__"] or 0.0) - (r["__u1__"] or 0.0) ** 2 / n)
        out.append(EstimateRow(key=key, estimate=float(m), variance=float(v), n=n))
        return out

    # grouped: broadcast-join per-group scalars (m, sw, B) then one agg
    spark = df.sparkSession
    from pyspark.sql.types import DoubleType, StructField, StructType

    kx = len(design.calibration_cols or []) if B is not None else 0
    scalar_cols = ["__m__", "__swall__"] + [f"__B_{j}__" for j in range(kx)]
    rows = []
    for key in keys:
        extra = tuple(float(v) for v in B[key]) if B is not None else ()
        rows.append(tuple(key) + (float(means[key]), float(p1[key]["__sw__"])) + extra)
    key_schema = df.select(*group_cols).schema
    schema = StructType(
        list(key_schema.fields) + [StructField(c, DoubleType(), False) for c in scalar_cols]
    )
    sdf = spark.createDataFrame(rows, schema)
    j = df.join(F.broadcast(sdf), on=group_cols, how="inner")
    e = y - F.col("__m__")
    if B is not None:
        for jx, c in enumerate(design.calibration_cols or []):
            e = e - F.col(f"__B_{jx}__") * F.col(c).cast("double")
    u = w * e / F.col("__swall__")
    p3 = _collect_keyed(
        j, group_cols,
        [F.sum(u * u).alias("__u2__"), F.sum(u).alias("__u1__"), F.count(F.lit(1)).alias("__n__")],
    )
    for key in keys:
        r = p3[key]
        n = int(r["__n__"])
        v = float("nan") if n < 2 else n / (n - 1.0) * ((r["__u2__"] or 0.0) - (r["__u1__"] or 0.0) ** 2 / n)
        out.append(EstimateRow(key=key, estimate=float(means[key]), variance=float(v), n=n))
    return out

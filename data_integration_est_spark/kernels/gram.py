"""Gram-matrix aggregation — the shared kernel behind calibration, OLS,
IRLS logistic, and design-based variance (SURVEY.md §4.3-1).

Computes, in ONE distributed pass (optionally per group):

    G   = sum_i w_i * x_i x_i^T          (k x k, symmetric — k(k+1)/2 sums)
    c_y = sum_i w_i * x_i * y_i          (k-vector per target column y)
    sw  = sum_i w_i,  n = count(*)

k <= ~10 in every reference usage, so the aggregate row is tiny (< ~120
doubles); only this O(k^2 * groups) result ever reaches the driver.  The
data-side expression is pure Column arithmetic — whole-stage-codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class GramResult:
    """Collected Gram aggregates.

    ``gram``: (g, k, k) stacked symmetric matrices, one per group (g=1 when
    ungrouped).  ``xy``: (g, k, m) cross-products for the m target columns.
    ``sum_w``: (g,) weight totals.  ``count``: (g,) row counts.
    ``keys``: list of group-key tuples aligned with axis 0.
    """

    x_cols: list[str]
    y_cols: list[str]
    keys: list[tuple]
    gram: np.ndarray
    xy: np.ndarray
    sum_w: np.ndarray
    count: np.ndarray

    def group_index(self) -> dict[tuple, int]:
        return {k: i for i, k in enumerate(self.keys)}


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def gram_aggregate(
    df: DataFrame,
    x_cols: list[str],
    y_cols: list[str] | None = None,
    weight_col: str | Column | None = None,
    group_cols: list[str] | None = None,
) -> GramResult:
    """One-pass weighted cross-product aggregation; collects the k x k result.

    Null handling: rows with a null in any x/y/weight column are dropped
    (complete-case, matching R ``lm``'s ``na.action=na.omit``).
    """
    y_cols = list(y_cols or [])
    group_cols = list(group_cols or [])
    k = len(x_cols)
    if k == 0:
        raise ValueError("at least one design column is required")

    needed = list(dict.fromkeys(x_cols + y_cols))
    if isinstance(weight_col, str):
        needed.append(weight_col)
    df = df.na.drop(subset=needed)

    w = F.lit(1.0) if weight_col is None else _as_col(weight_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    ys = [F.col(c).cast("double") for c in y_cols]

    aggs: list[Column] = [
        F.sum(w).alias("__sw__"),
        F.count(F.lit(1)).alias("__n__"),
    ]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(w * xs[i] * xs[j]).alias(f"__g_{i}_{j}__"))
    for i in range(k):
        for t in range(len(ys)):
            aggs.append(F.sum(w * xs[i] * ys[t]).alias(f"__c_{i}_{t}__"))

    if group_cols:
        rows = df.groupBy(*group_cols).agg(*aggs).collect()
    else:
        rows = df.agg(*aggs).collect()

    g = len(rows)
    gram = np.zeros((g, k, k))
    xy = np.zeros((g, k, max(len(y_cols), 1)))
    sum_w = np.zeros(g)
    count = np.zeros(g, dtype=np.int64)
    keys: list[tuple] = []
    for r, row in enumerate(rows):
        keys.append(tuple(row[c] for c in group_cols))
        sum_w[r] = row["__sw__"] or 0.0
        count[r] = row["__n__"] or 0
        for i in range(k):
            for j in range(i, k):
                v = row[f"__g_{i}_{j}__"]
                gram[r, i, j] = gram[r, j, i] = 0.0 if v is None else v
            for t in range(len(y_cols)):
                v = row[f"__c_{i}_{t}__"]
                xy[r, i, t] = 0.0 if v is None else v
    return GramResult(
        x_cols=list(x_cols),
        y_cols=y_cols,
        keys=keys,
        gram=gram,
        xy=xy[:, :, : len(y_cols)] if y_cols else xy[:, :, :0],
        sum_w=sum_w,
        count=count,
    )


def dot_expr(x_cols: list[str], coeffs: np.ndarray | list[float], intercept: float = 0.0) -> Column:
    """Broadcast a solved k-vector back into a JVM-side column expression:
    ``intercept + sum_j coeffs[j] * x_j`` — the 'predict' step (reference
    ``RegDI2.R:212``, ``PC.R:280-283``) with zero Python in the data path."""
    expr: Column = F.lit(float(intercept))
    for c, b in zip(x_cols, np.asarray(coeffs, dtype=float).ravel()):
        expr = expr + F.lit(float(b)) * F.col(c).cast("double")
    return expr

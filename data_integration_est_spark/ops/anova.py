"""Distributed ANOVA (SURVEY.md §2.4 A9).

The reference fits ``aov(Bias ~ factor(Sd)*factor(Gamma) + Estimator)``
(``nb[42]:6-9``) — a fixed-effects ANOVA on the Monte Carlo results table.
Spark has no ANOVA; we compute sequential (Type I, R ``aov`` semantics)
sums of squares by regression: dummy-encode each term, fit the nested
model sequence with the shared Gram kernel (ONE distributed pass per
nested model — the data never leaves the executors; each fit collects a
k x k Gram, k = cumulative dummy count), and take each term's SS as the
drop in residual SS.  F statistics and p-values (regularized incomplete
beta, driver-side numpy) complete the table.

This regression formulation handles unbalanced designs exactly like R.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from data_integration_est_spark.kernels.gram import gram_aggregate
from data_integration_est_spark.util import local_df


def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < 1e-30:
        d = 1e-30
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-30:
            d = 1e-30
        c = 1.0 + aa / c
        if abs(c) < 1e-30:
            c = 1e-30
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(f_stat: float, df1: float, df2: float) -> float:
    """Survival function of the F distribution (the ANOVA p-value)."""
    if f_stat <= 0 or df1 <= 0 or df2 <= 0:
        return 1.0
    x = df2 / (df2 + df1 * f_stat)
    return _betainc(df2 / 2.0, df1 / 2.0, x)


MAX_FACTOR_LEVELS = 100


def _dummies(df: DataFrame, col: str) -> tuple[DataFrame, list[str]]:
    """Drop-first dummy encoding; level order is sorted (R factor order).

    Guarded at ``MAX_FACTOR_LEVELS``: each level becomes a dummy design
    column and the Gram solve is O(k^2) driver memory / O(k^2) agg state,
    so an accidental high-cardinality factor (an id column, say) must
    fail loudly instead of building thousands of columns.  The LIMIT is
    pushed into the distinct scan so the driver never receives more than
    the cap + 1 rows even for million-level columns.
    """
    capped = (
        df.select(col).filter(F.col(col).isNotNull()).distinct()
        .limit(MAX_FACTOR_LEVELS + 1).collect()
    )
    if len(capped) > MAX_FACTOR_LEVELS:
        raise ValueError(
            f"anova_type1: factor {col!r} has more than {MAX_FACTOR_LEVELS} "
            "distinct levels - almost certainly a continuous or id column. "
            "Bucket it first, or raise anova.MAX_FACTOR_LEVELS explicitly."
        )
    levels = sorted(r[0] for r in capped)
    names = []
    # index-based names: level VALUES may contain dots (e.g. numeric factor
    # levels like 0.25) which F.col would parse as struct access
    for i, lv in enumerate(levels[1:], start=1):
        name = f"__d_{col}_{i}__"
        df = df.withColumn(name, F.when(F.col(col) == lv, 1.0).otherwise(0.0))
        names.append(name)
    return df, names


def anova_type1(
    df: DataFrame,
    response: str,
    terms: list[tuple[str, ...]],
) -> DataFrame:
    """Sequential (Type I) ANOVA table.

    ``terms``: ordered list; 1-tuples are factor main effects, 2-tuples
    interactions (their factors must appear earlier as main effects —
    matching R's term ordering for ``A*B + C`` = A, B, C, A:B).

    Returns (term, df, sum_sq, mean_sq, f_value, p_value) + a Residuals
    row, as a (tiny) DataFrame.
    """
    work = df.withColumn("__y__", F.col(response).cast("double"))
    dummy_cols: dict[str, list[str]] = {}
    for t in terms:
        for c in t:
            if c not in dummy_cols:
                work, dummy_cols[c] = _dummies(work, c)

    term_cols: list[tuple[str, list[str]]] = []
    for t in terms:
        if len(t) == 1:
            term_cols.append(("_".join(t), list(dummy_cols[t[0]])))
        else:
            cols = []
            for i, ca in enumerate(dummy_cols[t[0]]):
                for j, cb in enumerate(dummy_cols[t[1]]):
                    name = f"__x_{t[0]}_{t[1]}_{i}_{j}__"
                    work = work.withColumn(name, F.col(ca) * F.col(cb))
                    cols.append(name)
            term_cols.append((":".join(t), cols))

    # ONE Gram pass over the full design (y appended as the last column so
    # y'y and X'y are entries of the same matrix); every nested model's
    # normal equations are sub-blocks — no per-model re-scan.
    ones = "__one__"
    work = work.withColumn(ones, F.lit(1.0))
    all_x = [ones] + [c for _, cols in term_cols for c in cols]
    g = gram_aggregate(work, all_x + ["__y__"])
    full = g.gram[0]
    G = full[:-1, :-1]
    cy = full[:-1, -1]
    yy = float(full[-1, -1])
    n = int(g.count[0])

    def rss(k: int) -> tuple[float, int]:
        """Residual SS + model rank using the first k design columns."""
        Gk, ck = G[:k, :k], cy[:k]
        beta, _, rank, _ = np.linalg.lstsq(Gk, ck, rcond=None)
        return float(yy - ck @ beta), int(rank)

    rows = []
    k = 1
    prev_rss, prev_rank = rss(k)
    for name, cols in term_cols:
        k += len(cols)
        cur_rss, cur_rank = rss(k)
        rows.append((name, cur_rank - prev_rank, prev_rss - cur_rss))
        prev_rss, prev_rank = cur_rss, cur_rank

    df_resid = n - prev_rank
    ms_resid = prev_rss / df_resid if df_resid > 0 else float("nan")
    out = []
    for name, dfree, ss in rows:
        ms = ss / dfree if dfree > 0 else float("nan")
        fv = ms / ms_resid if ms_resid > 0 else float("nan")
        out.append((name, int(dfree), round(ss, 6), round(ms, 6),
                    round(fv, 6), round(f_sf(fv, dfree, df_resid), 10)))
    out.append(("Residuals", int(df_resid), round(prev_rss, 6),
                round(ms_resid, 6), None, None))

    schema = StructType([
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),
        StructField("sum_sq", DoubleType(), True),
        StructField("mean_sq", DoubleType(), True),
        StructField("f_value", DoubleType(), True),
        StructField("p_value", DoubleType(), True),
    ])
    return local_df(df.sparkSession, out, schema)

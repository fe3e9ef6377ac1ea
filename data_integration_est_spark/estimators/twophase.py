"""Two-phase (double) sampling with a regression estimator —
``survey::twophase`` / Cochran ch. 12 territory, the classic design
when the outcome y is expensive to measure but a covariate x is cheap:
measure x on a large phase-1 sample, y (and x) on a phase-2 subsample,
and regress the gap away.

    ybar_lr = ybar_2 + b (xbar_1 - xbar_2),
    b = S_xy(2) / S_x^2(2),
    V = S_e^2 (1/n2 - 1/n1) + S_y^2 (1/n1 - 1/N)

(Cochran 1977 eq. 12.72 form: the first term is the phase-2-given-
phase-1 regression-residual variance, the second the phase-1 sampling
of y itself; N = Inf drops the second term's FPC).  S_e^2 is the
phase-2 residual variance with the 1-df regression correction
(n2 - 2 divisor).

This is conceptually the reference's data-integration problem (a big
cheap sample + a small expensive one) under PROBABILITY sampling of
both phases instead of a non-probability big sample — the estimator a
survey statistician reaches for when both phases are designed.

Scale shape: ONE aggregation pass over the phase-1 table computing
both phases' moments simultaneously (phase-2 moments are conditional
sums on the indicator) — x/y sums, squares, and the cross term; the
estimator and variance are driver arithmetic on those 10 scalars.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TwoPhaseResult:
    estimate: float
    se: float
    b: float
    n1: int
    n2: int

    @property
    def variance(self) -> float:
        return self.se * self.se


def _twophase_from_moments(row: dict, key_desc: str, N: float | None) -> TwoPhaseResult:
    """Driver arithmetic on one group's 10 moment scalars."""
    n1 = int(row["n1"])
    n2 = int(row["n2"] or 0)
    if int(row["n2_miss"] or 0):
        raise ValueError(
            f"twophase{key_desc}: {row['n2_miss']} phase-2 row(s) have "
            "null y — phase-2 nonresponse is a different problem (impute "
            "or reweight first); refusing to silently misalign the moments"
        )
    if n2 < 3:
        raise ValueError(f"twophase{key_desc}: phase-2 sample too small (n2={n2})")
    if n2 > n1:
        raise ValueError(
            f"twophase{key_desc}: phase-2 indicator marks more rows than phase 1"
        )
    sx1 = float(row["sx1"] or 0.0)
    sx2 = float(row["sx2"] or 0.0)
    sy2 = float(row["sy2"] or 0.0)
    sxx2 = float(row["sxx2"] or 0.0)
    sxy2 = float(row["sxy2"] or 0.0)
    syy2 = float(row["syy2"] or 0.0)

    xbar1 = sx1 / n1
    xbar2 = sx2 / n2
    ybar2 = sy2 / n2
    ssx = sxx2 - n2 * xbar2 * xbar2
    if ssx <= 0.0:
        raise ValueError(f"twophase{key_desc}: zero x-variance in phase 2")
    ssxy = sxy2 - n2 * xbar2 * ybar2
    ssy = syy2 - n2 * ybar2 * ybar2
    b = ssxy / ssx
    est = ybar2 + b * (xbar1 - xbar2)

    s2_y = ssy / (n2 - 1.0)
    # residual SS with the 1-df regression correction
    ss_e = max(0.0, ssy - b * ssxy)
    s2_e = ss_e / (n2 - 2.0)
    inv_N = 0.0 if N is None else 1.0 / float(N)
    v = s2_e * (1.0 / n2 - 1.0 / n1) + s2_y * (1.0 / n1 - inv_N)
    v = max(0.0, v)
    return TwoPhaseResult(
        estimate=float(est), se=float(v ** 0.5), b=float(b), n1=n1, n2=n2
    )


def twophase_regression_mean(
    df: DataFrame,
    y_col: str,
    x_col: str,
    phase2_col: str,
    N: float | None = None,
    group_cols: list[str] | None = None,
) -> TwoPhaseResult | dict[tuple, TwoPhaseResult]:
    """Double-sampling regression estimate of the mean of ``y_col``.

    ``df`` holds the PHASE-1 sample (x observed on every row);
    ``phase2_col`` is the 0/1 phase-2 membership indicator; ``y_col``
    is used only on phase-2 rows (it may be null elsewhere).  ``N`` is
    the population size behind phase 1 (None = infinite: no phase-1
    FPC).  Raises on degenerate designs (n2 < 3, zero x-variance).

    ``group_cols`` fits every stratum/domain in ONE grouped moment pass
    (the per-group estimator is applied independently per key — a
    per-stratum double-sampling study); returns ``{key_tuple:
    TwoPhaseResult}``.  Ungrouped (the default) returns the single
    ``TwoPhaseResult`` unchanged.
    """
    group_cols = list(group_cols or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    p2 = F.col(phase2_col).cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n1"),
        F.sum(x).alias("sx1"),
        F.sum(p2).alias("n2"),
        F.sum(F.when((p2 == 1) & y.isNull(), 1).otherwise(0)).alias("n2_miss"),
        F.sum(F.when(p2 == 1, x)).alias("sx2"),
        F.sum(F.when(p2 == 1, y)).alias("sy2"),
        F.sum(F.when(p2 == 1, x * x)).alias("sxx2"),
        F.sum(F.when(p2 == 1, x * y)).alias("sxy2"),
        F.sum(F.when(p2 == 1, y * y)).alias("syy2"),
    ]
    if not group_cols:
        row = df.agg(*aggs).collect()[0]
        return _twophase_from_moments(row.asDict(), "", N)
    rows = df.groupBy(*group_cols).agg(*aggs).collect()
    return {
        tuple(r[c] for c in group_cols): _twophase_from_moments(
            r.asDict(), f"[{tuple(r[c] for c in group_cols)!r}]", N
        )
        for r in rows
    }

"""Inverse-propensity weighting for non-probability samples (Chen, Li
& Wu 2020, JASA, "Doubly robust inference with non-probability survey
samples") — the canonical modern estimator for the reference's exact
problem setting: a big non-probability sample B with the outcome, a
probability sample A with design weights carrying the covariates.

The participation propensity pi(x) = P(i in B | x) is fit by the CLW
PSEUDO-log-likelihood over the combined sample,

    l(theta) = sum_B x_i' theta - sum_A d_i log(1 + exp(x_i' theta)),

whose score and Hessian are plain weighted moments:

    U(theta) = sum_B x_i - sum_A d_i p_i x_i
    H(theta) = - sum_A d_i p_i (1 - p_i) x_i x_i'

(the design-weighted A sample estimates the population integral the
likelihood needs — this is NOT ordinary logistic regression on B vs A
membership; the reference's ``PC.R`` scenario-2 models the same
selection with a different normalization, cited for parity not code).

Estimators returned:

  IPW:  mu = sum_B (y_i / p_i) / sum_B (1 / p_i)       (Hajek form)
  DR:   mu = [sum_B (y_i - m_i)/p_i + sum_A d_i m_i] / N_hat,
        N_hat = sum_A d_i, with m(x) = x'beta an OLS outcome model on B
        — consistent if EITHER the propensity or the outcome model
        holds (CLW eq. 9).

Spark-first decomposition: every Newton step is ONE aggregation pass
over the stacked frame (indicator-masked moments, k x k to the
driver); the OLS outcome model is one Gram pass; the final estimators
are one more masked-moment pass with theta/beta folded in as column
literals.  Nothing O(N) reaches the driver, plan depth is constant in
n_iter only through the literal folding (each iteration re-derives
p_i from the RAW columns, not from a chained plan).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IPWError(ValueError):
    pass


@dataclass(frozen=True)
class IPWResult:
    mean_ipw: float
    mean_dr: float | None
    theta: tuple          # propensity coefficients (intercept first)
    beta: tuple | None    # outcome-model coefficients (DR only)
    n_a: int
    n_b: int
    n_hat: float          # sum of A design weights
    sum_invp_b: float     # sum_B 1/p_i (IPW denominator)
    n_iter: int


def _xs(x_cols: list, intercept: bool) -> list:
    xs = ["1.0"] if intercept else []
    xs += [f"CAST({c} AS DOUBLE)" for c in x_cols]
    return xs


def propensity_weighted_mean(
    df: DataFrame,
    y_col: str,
    x_cols: list,
    ind_A: str,
    ind_B: str,
    weight_A_col: str | None = None,
    intercept: bool = True,
    n_iter: int = 15,
    augment: bool = True,
    outcome_x_cols: list | None = None,
) -> IPWResult:
    """Fit the CLW propensity model and return the IPW (and, with
    ``augment=True``, the doubly robust) mean of ``y_col``.

    ``df`` is the stacked frame: ``ind_A``/``ind_B`` are 0/1 sample
    indicators (a unit may be in both); ``y_col`` must be non-null
    wherever ``ind_B = 1``; ``weight_A_col`` are A's design weights
    (default 1.0 — a self-weighting A sample).

    ``outcome_x_cols`` (default: ``x_cols``) are the DR outcome-model
    regressors — deliberately decoupled from the propensity model's,
    because double robustness is exactly the promise that ONE of the
    two specifications may be wrong.
    """
    if outcome_x_cols is None:
        outcome_x_cols = list(x_cols)
    for c in [y_col, ind_A, ind_B, *x_cols, *outcome_x_cols] + (
        [weight_A_col] if weight_A_col else []
    ):
        if c not in df.columns:
            raise IPWError(f"column '{c}' not found")
    k = len(x_cols) + int(intercept)
    if k == 0:
        raise IPWError("propensity model needs at least one regressor")

    xs = _xs(x_cols, intercept)
    a = f"CAST({ind_A} AS DOUBLE)"
    b = f"CAST({ind_B} AS DOUBLE)"
    d = (
        f"CAST({weight_A_col} AS DOUBLE)" if weight_A_col else "1.0"
    )
    y = f"CAST({y_col} AS DOUBLE)"

    bad = df.filter(
        (F.col(ind_B).cast("int") == 1) & F.col(y_col).isNull()
    ).limit(1).count()
    if bad:
        raise IPWError(f"'{y_col}' is null on an ind_B=1 row")

    def eta(th: np.ndarray) -> str:
        terms = " + ".join(
            f"({float(th[i])!r}) * {xs[i]}" for i in range(k)
        )
        return f"({terms})"

    # ---- Newton on the pseudo-likelihood: one agg pass per step ----
    theta = np.zeros(k)
    for _ in range(n_iter):
        p = f"(1.0 / (1.0 + exp(-{eta(theta)})))"
        exprs = []
        for i in range(k):
            exprs.append(
                F.expr(f"sum({b} * {xs[i]} - {a} * {d} * {p} * {xs[i]})")
                .alias(f"u{i}")
            )
            for j in range(i, k):
                exprs.append(
                    F.expr(
                        f"sum({a} * {d} * {p} * (1.0 - {p}) * {xs[i]} * {xs[j]})"
                    ).alias(f"h{i}{j}")
                )
        r = df.agg(*exprs).collect()[0]
        H = np.empty((k, k))
        for i in range(k):
            for j in range(i, k):
                H[i, j] = H[j, i] = float(r[f"h{i}{j}"])
        U = np.array([float(r[f"u{i}"]) for i in range(k)])
        try:
            theta = theta + np.linalg.solve(H, U)
        except np.linalg.LinAlgError as e:
            raise IPWError(
                f"singular pseudo-likelihood Hessian (separable x?): {e}"
            ) from e

    p = f"(1.0 / (1.0 + exp(-{eta(theta)})))"

    beta = None
    oxs = _xs(outcome_x_cols, intercept)
    ko = len(oxs)
    if augment:
        # outcome model on B: OLS of y on outcome_x (CLW eq. 8 m(x))
        exprs = []
        for i in range(ko):
            exprs.append(F.expr(f"sum({b} * {oxs[i]} * {y})").alias(f"xy{i}"))
            for j in range(i, ko):
                exprs.append(
                    F.expr(f"sum({b} * {oxs[i]} * {oxs[j]})").alias(f"xx{i}{j}")
                )
        r = df.agg(*exprs).collect()[0]
        G = np.empty((ko, ko))
        for i in range(ko):
            for j in range(i, ko):
                G[i, j] = G[j, i] = float(r[f"xx{i}{j}"])
        try:
            beta = np.linalg.solve(
                G, np.array([float(r[f"xy{i}"]) for i in range(ko)])
            )
        except np.linalg.LinAlgError as e:
            raise IPWError(f"singular B-sample outcome Gram: {e}") from e

    # ---- final masked-moment pass: all estimators at once ----
    final = [
        F.expr(f"sum({a})").alias("na"),
        F.expr(f"sum({b})").alias("nb"),
        F.expr(f"sum({a} * {d})").alias("nhat"),
        F.expr(f"sum({b} / {p})").alias("sinv"),
        F.expr(f"sum({b} * {y} / {p})").alias("sy"),
    ]
    if augment:
        m = " + ".join(f"({float(beta[i])!r}) * {oxs[i]}" for i in range(ko))
        final.append(F.expr(f"sum({b} * ({y} - ({m})) / {p})").alias("sres"))
        final.append(F.expr(f"sum({a} * {d} * ({m}))").alias("sma"))
    r = df.agg(*final).collect()[0]
    if not r["nb"]:
        raise IPWError("no units with ind_B = 1")
    if not r["nhat"]:
        raise IPWError("no units with ind_A = 1 (or zero design weights)")

    mean_ipw = float(r["sy"]) / float(r["sinv"])
    mean_dr = (
        (float(r["sres"]) + float(r["sma"])) / float(r["nhat"])
        if augment
        else None
    )
    return IPWResult(
        mean_ipw=mean_ipw,
        mean_dr=mean_dr,
        theta=tuple(float(t) for t in theta),
        beta=tuple(float(v) for v in beta) if beta is not None else None,
        n_a=int(r["na"]),
        n_b=int(r["nb"]),
        n_hat=float(r["nhat"]),
        sum_invp_b=float(r["sinv"]),
        n_iter=n_iter,
    )

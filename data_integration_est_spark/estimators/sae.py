"""Fay–Herriot small-area estimation: EBLUP with the Prasad–Rao
moment estimator of the area-effect variance and the Prasad–Rao MSE
approximation (Fay & Herriot 1979; Prasad & Rao 1990; Rao & Molina
2015 ch. 6 — the ``sae::eblupFH(method="FH"|"ML")`` surface, here with
the closed-form moment method so every number is SQL-replayable).

Model, one row per area d = 1..m:

    y_d = x_d' beta + v_d + e_d,   v_d ~ (0, sigma2_v),  e_d ~ (0, psi_d)

with KNOWN sampling variances psi_d (the defining FH feature: the
direct estimates arrive with their design variances, e.g. from
``svymean(group_cols=...)``).  The EBLUP shrinks each direct estimate
toward the regression synthetic estimate:

    gamma_d = sigma2_v / (sigma2_v + psi_d)
    theta_d = gamma_d * y_d + (1 - gamma_d) * x_d' beta_wls

This is the data-integration estimator for MANY SMALL DOMAINS — the
reference's RegDI/PC machinery (``RegDI2.R``, ``PC.R``) integrates two
samples for ONE population mean; Fay–Herriot integrates a direct
survey signal with an auxiliary regression signal per domain, borrowing
strength across domains exactly where per-domain sample sizes are too
small for ``regdi_by``-style separate fits.

Spark-first decomposition (areas stay distributed end-to-end; only
p x p Grams and scalars reach the driver — safe for millions of areas):

  pass 1 (ONE agg): X'X, X'y, y'y, sum psi, sum psi^2,
      sum psi * x x' (upper triangle), m
      -> driver: beta_ols (p x p solve), residual SS via the Gram
         identity y'y - 2 b'X'y + b'X'Xb, and the CLOSED-FORM
         Prasad–Rao moment estimate
         sigma2_v = max(0, [SSR - (sum psi - tr((X'X)^-1 sum psi xx'))]
                           / (m - p))
  pass 2 (ONE agg): a_d = 1/(sigma2_v + psi_d) weighted Grams
      sum a x x', sum a x y  -> driver: beta_wls, A^-1 for g2
  pass 3 (map-only): per-area gamma, EBLUP, and MSE
      g1 = gamma * psi
      g2 = (1-gamma)^2 * x' A^-1 x
      g3 = psi^2 / (sigma2_v+psi)^3 * Vbar,
           Vbar = (2/m^2) * sum_i (sigma2_v + psi_i)^2
      mse = g1 + g2 + 2*g3            (Prasad & Rao 1990 eq. 5.3.9)

No shuffle anywhere: both agg passes are map-side-combined reductions,
pass 3 is a projection with broadcast scalars.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SAEError(ValueError):
    pass


def _design(x_cols: list, intercept: bool) -> list:
    xs: list = [F.lit(1.0).alias("__x0__")] if intercept else []
    xs += [F.col(c).cast("double").alias(f"__x{i + int(intercept)}__")
           for i, c in enumerate(x_cols)]
    return xs


def fay_herriot(
    areas: DataFrame,
    y_col: str,
    var_col: str,
    x_cols: list,
    intercept: bool = True,
    keep_cols: list | None = None,
) -> DataFrame:
    """Fit the FH model and return one row per area with
    ``(direct, psi, synthetic, gamma, eblup, mse)`` plus ``keep_cols``
    (default: every non-model input column, so area ids survive).

    ``areas``: one row per area — direct estimate ``y_col``, KNOWN
    sampling variance ``var_col`` (> 0), covariates ``x_cols``.
    Raises :class:`SAEError` on m <= p (moment estimator undefined) or
    non-positive/null sampling variances (an area with psi = 0 is a
    census area — it needs no shrinkage and breaks the model; filter
    it out and union it back unshrunk).
    """
    for c in [y_col, var_col, *x_cols]:
        if c not in areas.columns:
            raise SAEError(f"column '{c}' not found in areas")
    p = len(x_cols) + int(intercept)
    if p == 0:
        raise SAEError("fay_herriot needs at least one regressor")
    if keep_cols is None:
        model_cols = {y_col, var_col, *x_cols}
        keep_cols = [c for c in areas.columns if c not in model_cols]

    xs = _design(x_cols, intercept)
    d = areas.select(
        F.col(y_col).cast("double").alias("__y__"),
        F.col(var_col).cast("double").alias("__psi__"),
        *xs,
        *[F.col(c) for c in keep_cols],
    )

    xn = [f"__x{i}__" for i in range(p)]

    # ---- pass 1: unweighted Gram + psi moments (ONE reduction) ----
    null_model = F.col("__y__").isNull()
    for i in range(p):
        null_model = null_model | F.col(xn[i]).isNull()
    aggs = [F.count(F.lit(1)).alias("m"),
            F.sum(F.when((F.col("__psi__").isNull()) | (F.col("__psi__") <= 0),
                         1).otherwise(0)).alias("bad_psi"),
            # null y or x areas would be COUNTED in m yet silently
            # dropped from every null-skipping moment sum — the Grams
            # and m would disagree (round-9 ADVICE); reject loudly
            F.sum(F.when(null_model, 1).otherwise(0)).alias("bad_model"),
            F.sum(F.col("__y__") * F.col("__y__")).alias("yy"),
            F.sum("__psi__").alias("spsi"),
            F.sum(F.col("__psi__") * F.col("__psi__")).alias("spsi2")]
    for i in range(p):
        aggs.append(F.sum(F.col(xn[i]) * F.col("__y__")).alias(f"xy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(F.col(xn[i]) * F.col(xn[j])).alias(f"xx{i}{j}"))
            aggs.append(
                F.sum(F.col("__psi__") * F.col(xn[i]) * F.col(xn[j]))
                .alias(f"pxx{i}{j}")
            )
    r = d.agg(*aggs).collect()[0]
    m = int(r["m"])
    if r["bad_psi"]:
        raise SAEError(
            f"{r['bad_psi']} area(s) with null or non-positive sampling "
            f"variance '{var_col}' — psi_d must be > 0 for every area"
        )
    if r["bad_model"]:
        raise SAEError(
            f"{r['bad_model']} area(s) with null direct estimate "
            f"'{y_col}' or null covariate(s) — drop them (or impute) "
            "before fitting; they cannot enter the FH moment equations"
        )
    if m <= p:
        raise SAEError(f"need more areas than regressors: m={m}, p={p}")

    def sym(prefix: str) -> np.ndarray:
        a = np.empty((p, p))
        for i in range(p):
            for j in range(i, p):
                a[i, j] = a[j, i] = float(r[f"{prefix}{i}{j}"])
        return a

    xtx = sym("xx")
    pxx = sym("pxx")
    xty = np.array([float(r[f"xy{i}"]) for i in range(p)])
    try:
        xtx_inv = np.linalg.inv(xtx)
    except np.linalg.LinAlgError as e:
        raise SAEError(f"singular design (collinear x_cols?): {e}") from e
    b_ols = xtx_inv @ xty
    ssr = float(r["yy"]) - 2.0 * float(b_ols @ xty) + float(b_ols @ xtx @ b_ols)
    # Prasad–Rao moment estimator, truncated at 0:
    # E[SSR] = (m - p) sigma2_v + sum psi_d (1 - h_dd),
    # sum psi h_dd = tr((X'X)^-1 sum psi x x')
    tr_h = float(np.trace(xtx_inv @ pxx))
    sigma2 = max(0.0, (ssr - (float(r["spsi"]) - tr_h)) / (m - p))
    # V(sigma2_hat) for the moment estimator (Prasad–Rao):
    # (2/m^2) sum (sigma2 + psi_i)^2, expanded from pass-1 moments
    vbar = (2.0 / (m * m)) * (
        m * sigma2 * sigma2 + 2.0 * sigma2 * float(r["spsi"]) + float(r["spsi2"])
    )

    # ---- pass 2: WLS Gram with a_d = 1/(sigma2 + psi_d) ----
    a_col = 1.0 / (F.lit(sigma2) + F.col("__psi__"))
    aggs2 = []
    for i in range(p):
        aggs2.append(F.sum(a_col * F.col(xn[i]) * F.col("__y__")).alias(f"axy{i}"))
        for j in range(i, p):
            aggs2.append(
                F.sum(a_col * F.col(xn[i]) * F.col(xn[j])).alias(f"axx{i}{j}")
            )
    r2 = d.agg(*aggs2).collect()[0]
    awxx = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            awxx[i, j] = awxx[j, i] = float(r2[f"axx{i}{j}"])
    awxy = np.array([float(r2[f"axy{i}"]) for i in range(p)])
    a_inv = np.linalg.inv(awxx)
    b_wls = a_inv @ awxy

    # ---- pass 3: map-only EBLUP + Prasad–Rao MSE ----
    synth: Column = sum(
        (F.lit(float(b_wls[i])) * F.col(xn[i]) for i in range(1, p)),
        F.lit(float(b_wls[0])) * F.col(xn[0]),
    )
    gamma = F.lit(sigma2) / (F.lit(sigma2) + F.col("__psi__"))
    # x' A^-1 x as an explicit double sum (p is small; codegen-friendly)
    quad: Column = F.lit(0.0)
    for i in range(p):
        for j in range(p):
            quad = quad + F.lit(float(a_inv[i, j])) * F.col(xn[i]) * F.col(xn[j])
    g1 = gamma * F.col("__psi__")
    g2 = (F.lit(1.0) - gamma) * (F.lit(1.0) - gamma) * quad
    g3 = (
        F.col("__psi__") * F.col("__psi__")
        / F.pow(F.lit(sigma2) + F.col("__psi__"), F.lit(3.0))
        * F.lit(vbar)
    )
    return d.select(
        *keep_cols,
        F.col("__y__").alias("direct"),
        F.col("__psi__").alias("psi"),
        synth.alias("synthetic"),
        gamma.alias("gamma"),
        (gamma * F.col("__y__") + (F.lit(1.0) - gamma) * synth).alias("eblup"),
        (g1 + g2 + F.lit(2.0) * g3).alias("mse"),
        F.lit(sigma2).alias("sigma2_v"),
    )

"""Design-based regression — ``survey::svyglm`` parity.

The reference fits its working models with ``lm``/``glm`` inside the
estimator pipelines (``RegDI2.R:209,258``, ``PC.R:272,308``) and leans on
the survey package for design-based inference.  ``svyglm`` is that
inference surface for regression COEFFICIENTS: the point estimates are
the weighted fit, and the variance is the linearization ("sandwich")

    V = n/(n-1) * A^{-1} M A^{-1},   A = sum w_i psi'_i,
    M = sum w_i^2 s_i s_i'           (s_i = per-unit score)

with s_i = x_i e_i (linear; e = y - x'B) or x_i (y_i - p_i) (logistic),
A = sum w x x' resp. sum w p(1-p) x x'.

Scale shape: TWO distributed passes — the Gram/fit pass (shared
``kernels.gram``/IRLS machinery) and one score-moment pass with the
residual as a column expression; only O(k^2 x groups) scalars reach the
driver.  With ``group_cols`` (domains / MC cells — the ``svyby`` x
``svyglm`` composition) both passes run grouped: the fit rides the
stacked grouped solvers, per-group coefficients rejoin as a broadcast
table for the score pass, and the sandwich assembles per group from one
collected aggregate — shuffle count independent of the group count.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.kernels.linalg import fit_logistic, fit_ols, fit_poisson


def _sandwich(A: np.ndarray, M: np.ndarray, n: float) -> np.ndarray:
    """n/(n-1) * A^{-1} M A^{-1} diag, via solves (no explicit inverse)."""
    X = np.linalg.solve(A, M)
    V = n / (n - 1.0) * np.linalg.solve(A, X.T).T
    return np.sqrt(np.clip(np.diag(V), 0.0, None))


def svyglm(
    design: SurveyDesign,
    formula: str | Formula,
    model_type: str = "normal",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Design-weighted GLM with sandwich SEs.  Returns one row per term
    (per group with ``group_cols``): (group_cols..., term, coef, se).
    ``model_type``: 'normal' (identity), 'logistic', or 'poisson'
    (log link).  Groups with
    fewer rows than design columns report NULL coef/se (the grouped
    solvers' degenerate-key convention)."""
    f = Formula.parse(formula) if isinstance(formula, str) else formula
    group_cols = list(group_cols or [])
    xs = list(f.predictors)
    df = design.df.na.drop(
        subset=[f.response, design.weight_col] + xs + group_cols
    )
    w = F.col(design.weight_col).cast("double")
    y = F.col(f.response).cast("double")

    if model_type == "normal":
        fit = fit_ols(df, y_col=f.response, x_cols=xs,
                      weight_col=design.weight_col, intercept=f.intercept,
                      group_cols=group_cols)
    elif model_type == "logistic":
        fit = fit_logistic(df, y_col=f.response, x_cols=xs,
                           weight_col=design.weight_col, intercept=f.intercept,
                           group_cols=group_cols)
    elif model_type == "poisson":
        fit = fit_poisson(df, y_col=f.response, x_cols=xs,
                          weight_col=design.weight_col, intercept=f.intercept,
                          group_cols=group_cols)
    else:
        raise ValueError(
            "model_type must be 'normal', 'logistic', or 'poisson'")
    terms = (["(Intercept)"] if f.intercept else []) + xs
    k = len(terms)
    xcols = ([F.lit(1.0)] if f.intercept else []) + [
        F.col(c).cast("double") for c in xs
    ]

    # score pass: per-row prediction as a column expression (per-group
    # coefficients broadcast-joined back when grouped)
    if group_cols:
        work, pred = fit.predict_expr_grouped(df)
    else:
        beta0 = np.asarray(fit.coef_for(()), dtype=float)
        eta = None
        for b, xc in zip(beta0, xcols):
            term = xc * float(b)
            eta = term if eta is None else eta + term
        if model_type == "logistic":
            pred = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        elif model_type == "poisson":
            pred = F.exp(eta)
        else:
            pred = eta
        work = df
    resid = y - pred
    # A = sum w * V(mu) x x': V = 1 (identity), p(1-p) (binomial), mu (Poisson)
    if model_type == "normal":
        a_w = w
    elif model_type == "logistic":
        a_w = w * pred * (1.0 - pred)
    else:
        a_w = w * pred

    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(a_w * xcols[i] * xcols[j]).alias(f"a_{i}_{j}"))
            aggs.append(
                F.sum(w * w * resid * resid * xcols[i] * xcols[j]).alias(f"m_{i}_{j}")
            )
    if group_cols:
        collected = work.groupBy(*group_cols).agg(*aggs).collect()
    else:
        collected = work.agg(*aggs).collect()
    by_key = {tuple(r[c] for c in group_cols): r for r in collected}

    degenerate = set(fit.degenerate_keys)
    out_rows = []
    for key in fit.keys:
        r = by_key[key]
        beta = np.asarray(fit.coef_for(key), dtype=float)
        if key in degenerate or not np.all(np.isfinite(beta)):
            for t in terms:
                out_rows.append(tuple(key) + (t, None, None))
            continue
        n = float(r["n"])
        A = np.zeros((k, k))
        M = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                A[i, j] = A[j, i] = float(r[f"a_{i}_{j}"] or 0.0)
                M[i, j] = M[j, i] = float(r[f"m_{i}_{j}"] or 0.0)
        se = _sandwich(A, M, n)
        for t, b, s in zip(terms, beta, se):
            out_rows.append(tuple(key) + (t, round(float(b), 6), round(float(s), 6)))

    spark = design.df.sparkSession
    key_fields = list(df.select(*group_cols).schema.fields)
    schema = StructType(
        key_fields
        + [
            StructField("term", StringType(), False),
            StructField("coef", DoubleType(), True),
            StructField("se", DoubleType(), True),
        ]
    )
    return spark.createDataFrame(sorted(out_rows, key=lambda t: tuple(
        map(str, t[:len(group_cols)]))), schema)

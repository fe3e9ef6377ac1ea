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
residual as a column expression; only O(k^2) scalars reach the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.kernels.linalg import fit_logistic, fit_ols


def svyglm(
    design: SurveyDesign,
    formula: str | Formula,
    model_type: str = "normal",
) -> DataFrame:
    """Design-weighted GLM with sandwich SEs.  Returns one row per term:
    (term, coef, se).  ``model_type``: 'normal' (identity link) or
    'logistic'."""
    f = Formula.parse(formula) if isinstance(formula, str) else formula
    xs = list(f.predictors)
    df = design.df.na.drop(subset=[f.response, design.weight_col] + xs)
    w = F.col(design.weight_col).cast("double")
    y = F.col(f.response).cast("double")

    if model_type == "normal":
        fit = fit_ols(df, y_col=f.response, x_cols=xs,
                      weight_col=design.weight_col, intercept=f.intercept)
    elif model_type == "logistic":
        fit = fit_logistic(df, y_col=f.response, x_cols=xs,
                           weight_col=design.weight_col, intercept=f.intercept)
    else:
        raise ValueError("model_type must be 'normal' or 'logistic'")
    beta = np.asarray(fit.coef_for(()), dtype=float)
    terms = (["(Intercept)"] if f.intercept else []) + xs
    k = len(terms)

    # score pass: residual as a column expression
    xcols = ([F.lit(1.0)] if f.intercept else []) + [
        F.col(c).cast("double") for c in xs
    ]
    eta = None
    for b, xc in zip(beta, xcols):
        term = xc * float(b)
        eta = term if eta is None else eta + term
    if model_type == "normal":
        resid = y - eta
        a_w = w  # A = sum w x x'
    else:
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        resid = y - p
        a_w = w * p * (1.0 - p)  # IRLS curvature
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(a_w * xcols[i] * xcols[j]).alias(f"a_{i}_{j}"))
            aggs.append(
                F.sum(w * w * resid * resid * xcols[i] * xcols[j]).alias(f"m_{i}_{j}")
            )
    r = df.agg(*aggs).collect()[0]
    n = float(r["n"])
    A = np.zeros((k, k))
    M = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            A[i, j] = A[j, i] = float(r[f"a_{i}_{j}"] or 0.0)
            M[i, j] = M[j, i] = float(r[f"m_{i}_{j}"] or 0.0)
    Ainv = np.linalg.inv(A)
    V = n / (n - 1.0) * (Ainv @ M @ Ainv)
    se = np.sqrt(np.clip(np.diag(V), 0.0, None))
    spark = design.df.sparkSession
    schema = StructType([
        StructField("term", StringType(), False),
        StructField("coef", DoubleType(), True),
        StructField("se", DoubleType(), True),
    ])
    return spark.createDataFrame(
        [(t, round(float(b), 6), round(float(s), 6))
         for t, b, s in zip(terms, beta, se)],
        schema,
    )

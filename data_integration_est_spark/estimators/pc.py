"""PC — pseudo-calibration estimator (Golini & Righi 2024).

Spark-first re-implementation of the reference's ``PC_Estimator()``
(``PC.R:47-358``).  The big-data sample S_B gets pseudo-design weights
calibrated to population auxiliary totals (known, or HT-estimated from the
probability sample S_A); three scenarios then produce the estimate:

  1  y observed in S_B: calibrated weighted mean of y_B + SE
     (``PC.R:240-253``)
  2  y NOT observed in S_B: fit prediction model on the A∩B overlap,
     Yhat = (sum_B d_B*yhat + sum_A d_A*(y_A - yhat)) / N   (``PC.R:255-297``)
  3  NMAR / DR1: fit model on A,
     Yhat = (sum_B d_B*(y_B - yhat) + sum_U yhat) / N       (``PC.R:299-354``)

Model types: ``"normal"`` (OLS) or ``"logistic"`` (IRLS GLM), with the
reference's dynamic formula re-resolution against join suffixes
(``construir_formula_dinamica``, ``PC.R:1-39``) via ``Formula.resolve``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.integrate import IntegrationError
from data_integration_est_spark.kernels.linalg import CalibrationError, fit_logistic, fit_ols
from data_integration_est_spark.kernels.stats import svymean
from data_integration_est_spark.estimators.regdi import _prepare


@dataclass
class PCResult:
    estimate: float
    se: float | None = None
    model_coef: np.ndarray | None = None
    rmse: float | None = None
    r2: float | None = None
    df: DataFrame | None = None  # combined table with d_i_A / d_i_B columns
    weight_col: str | None = None  # calibrated B weights
    # IRLS convergence of the outcome model (scenarios 2/3); None when no
    # model is fit (scenario 1) — mirrors R glm's $converged.
    model_converged: bool | None = None


def pc_estimator(
    data: DataFrame | None = None,
    data_A: DataFrame | None = None,
    data_B: DataFrame | None = None,
    id_var_A: str | None = None,
    id_var_B: str | None = None,
    ind_var_A: str | None = None,
    ind_var_B: str | None = None,
    y_A_col: str | None = None,
    y_B_col: str | None = None,
    aux_vars: list[str] | None = None,
    N_total: float | None = None,
    weights_A: str | None = None,
    weights_B: str | None = None,
    outcome_model: str | None = None,
    model_type: str = "normal",
    scenario: int = 1,
    eval_model_performance: bool = False,
) -> PCResult:
    df, ind_A, ind_B, y_A, y_B, aux_A, aux_B, data_direct = _prepare(
        data, data_A, data_B, id_var_A, id_var_B, ind_var_A, ind_var_B,
        # scenario 2 allows y_B_col=None conceptually, but the join/indicator
        # derivation needs B's observation marker; the reference requires the
        # same (ind derivation reads y_B_col, ``PC.R:95-109``).
        y_A_col or "", y_B_col or y_A_col or "", aux_vars,
    )
    indA = F.col(ind_A) == 1
    indB = F.col(ind_B) == 1

    # ONE fused pass: sizes, weight sums, aux population totals (direct
    # sums or the masked HT ingredients), AND the B-side calibration Gram
    # (an indB-masked weighted sum, scaled on the driver when d_i_B is the
    # constant N/n_B).  Scenario 1 then completes in TWO data passes total
    # (this one + the single-pass svymean).
    aux_list = list(aux_vars or [])
    cal_cols = aux_list if data_direct else aux_B
    kb = len(cal_cols)
    aggs = [
        F.count(F.lit(1)).alias("nrows"),
        F.sum(F.when(indA, 1).otherwise(0)).alias("size_A"),
        F.sum(F.when(indB, 1).otherwise(0)).alias("size_B"),
    ]
    if weights_A is not None:
        if weights_A not in df.columns:
            raise IntegrationError(f"'weights_A' column {weights_A!r} not found in the data")
        aggs.append(
            F.sum(F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)).alias("sum_wA")
        )
    if weights_B is not None and weights_B not in df.columns:
        raise IntegrationError(f"'weights_B' column {weights_B!r} not found in the data")
    if data_direct:
        # population aux totals: direct sums over the full table (``PC.R:182-187``)
        aggs += [F.sum(F.col(z).cast("double")).alias(f"pt_{z}") for z in aux_list]
    else:
        # HT ingredients from sample A: masked sums of the A-side aux
        # (``PC.R:188-193``); scaled by N/n_A afterwards when weights_A
        # is absent
        wA_mask = (
            F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)
            if weights_A is not None
            else F.when(indA, 1.0).otherwise(0.0)
        )
        aggs += [
            F.sum(wA_mask * F.col(z).cast("double")).alias(f"ht_{i}")
            for i, z in enumerate(aux_A)
        ]
    wB_mask = (
        F.when(indB, F.col(weights_B).cast("double")).otherwise(0.0)
        if weights_B is not None
        else F.when(indB, 1.0).otherwise(0.0)
    )
    zb = [F.col(c).cast("double") for c in cal_cols]
    aggs += [
        F.sum(wB_mask * zb[i] * zb[j]).alias(f"gb_{i}_{j}")
        for i in range(kb) for j in range(i, kb)
    ]
    aggs += [F.sum(wB_mask * zb[i]).alias(f"hb_{i}") for i in range(kb)]
    df = df.persist()
    tot = df.agg(*aggs).collect()[0]

    size_A, size_B = int(tot["size_A"] or 0), int(tot["size_B"] or 0)
    if size_A == 0:
        raise IntegrationError("no units in sample A")
    if size_B == 0:
        raise IntegrationError("no units in sample B")

    if N_total is None:
        if data_direct:
            N_total = float(tot["nrows"])
        elif weights_A is not None:
            N_total = float(tot["sum_wA"])
        else:
            raise IntegrationError(
                "to approximate N_total, provide sample-A weights ('weights_A')"
            )

    # design weights (``PC.R:149-171``)
    if weights_A is not None:
        dA = F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)
    else:
        dA = F.when(indA, F.lit(float(N_total) / size_A)).otherwise(0.0)
    if weights_B is not None:
        dB = F.when(indB, F.col(weights_B).cast("double")).otherwise(0.0)
    else:
        dB = F.when(indB, F.lit(float(N_total) / size_B)).otherwise(0.0)
    df = df.withColumn("d_i_A", dA).withColumn("d_i_B", dB)

    # population aux totals (``PC.R:180-199``): direct sums, or HT from
    # sample A — note the reference calibrates on aux_vars_B with totals
    # estimated on aux_vars_A; we reproduce exactly that pairing.
    a_scale = 1.0 if weights_A is not None else float(N_total) / size_A
    if aux_list:
        if data_direct:
            T_b = np.array([float(tot[f"pt_{z}"] or 0.0) for z in aux_list])
        else:
            T_b = np.array([
                a_scale * float(tot[f"ht_{i}"] or 0.0) for i in range(len(aux_A))
            ])
    else:
        T_b = None

    # calibrate S_B weights (``PC.R:216-237``): driver solve over the
    # fused-pass Gram, weights as a broadcast column expression
    sample_B = df.filter(indB)
    if aux_list:
        from data_integration_est_spark.kernels.gram import dot_expr
        from data_integration_est_spark.kernels.linalg import _solve_stacked

        b_scale = 1.0 if weights_B is not None else float(N_total) / size_B
        Gb = np.zeros((kb, kb))
        for i in range(kb):
            for j in range(i, kb):
                Gb[i, j] = Gb[j, i] = b_scale * float(tot[f"gb_{i}_{j}"] or 0.0)
        hb = np.array([b_scale * float(tot[f"hb_{i}"] or 0.0) for i in range(kb)])
        lam = _solve_stacked(Gb[None, ...], (T_b - hb)[None, :, None], "calibrate").ravel()
        wB_cal_expr = F.col("d_i_B") * (F.lit(1.0) + dot_expr(cal_cols, lam))
        b_df = sample_B.withColumn("w_cal_B", wB_cal_expr)
        b_design = SurveyDesign(
            df=b_df, weight_col="w_cal_B", calibration_cols=cal_cols, base_weight_col="d_i_B"
        )
    else:
        wB_cal_expr = F.col("d_i_B")
        b_df = sample_B.withColumn("w_cal_B", wB_cal_expr)
        b_design = SurveyDesign(df=b_df, weight_col="w_cal_B")

    try:
        if scenario == 1:
            if y_B_col is None:
                raise ValueError("for scenario 1, 'y_B_col' cannot be None")
            est = svymean(b_design, y_B)[0]
            return PCResult(estimate=est.estimate, se=est.se, df=b_df, weight_col="w_cal_B")
        if scenario == 2:
            return _scenario_2(
                df, b_df, wB_cal_expr, indA, indB, y_A, outcome_model, model_type, N_total
            )
        if scenario == 3:
            return _scenario_3(
                df, b_df, wB_cal_expr, indA, indB, y_A, y_B, outcome_model, model_type,
                N_total, eval_model_performance,
            )
        raise ValueError(f"invalid scenario {scenario!r}: must be 1, 2 or 3")
    finally:
        df.unpersist()


def _fit(sample: DataFrame, formula: Formula, model_type: str):
    if model_type == "normal":
        return fit_ols(sample, y_col=formula.response, x_cols=list(formula.predictors),
                       intercept=formula.intercept)
    if model_type == "logistic":
        return fit_logistic(sample, y_col=formula.response, x_cols=list(formula.predictors),
                            intercept=formula.intercept)
    raise ValueError("model_type must be 'normal' or 'logistic'")


def _scenario_2(df, b_df, wB_cal_expr, indA, indB, y_A, outcome_model, model_type,
                N_total) -> PCResult:
    """y unobserved in S_B: model on A∩B, combine (``PC.R:255-297``).

    term1 (over S_B) and term2 (over S_A) are indicator-masked sums over the
    same combined table, so they run as ONE fused aggregation; the empty-
    intersection case surfaces from the fit's own Gram pass (no pre-count job).
    """
    if outcome_model is None:
        raise ValueError("must provide 'outcome_model' for the prediction model")
    if not y_A:
        raise ValueError("must provide 'y_A_col' for the prediction model")
    formula = Formula.parse(outcome_model).resolve(df.columns)
    try:
        fit = _fit(df.filter(indA & indB), formula, model_type)
    except CalibrationError as e:
        raise IntegrationError(
            f"cannot fit the prediction model on the S_A ∩ S_B intersection: {e}"
        ) from e
    pred = fit.predict_expr()

    # term1 = sum_B w_cal_B * yhat ; term2 = sum_A d_A * (y_A - yhat)
    row = df.agg(
        F.sum(F.when(indB, wB_cal_expr * pred)).alias("t1"),
        F.sum(F.when(indA, F.col("d_i_A") * (F.col(y_A).cast("double") - pred))).alias("t2"),
    ).collect()[0]
    est = ((row["t1"] or 0.0) + (row["t2"] or 0.0)) / float(N_total)
    return PCResult(estimate=float(est), model_coef=fit.coef_for(()), df=b_df,
                    weight_col="w_cal_B", model_converged=fit.converged)


def _scenario_3(
    df, b_df, wB_cal_expr, indA, indB, y_A, y_B, outcome_model, model_type, N_total,
    eval_model_performance,
) -> PCResult:
    """NMAR DR1 (``PC.R:299-354``):
    Yhat_DR1 = (sum_B d_B*(y_B - yhat) + sum_U yhat) / N.

    The U-side prediction sum, the A-side residual stats, AND the B-side
    calibrated residual total are all masked sums over the same combined
    table — ONE fused aggregation after the model fit."""
    if outcome_model is None:
        raise ValueError("must provide 'outcome_model' for the prediction model")
    if not y_A:
        raise ValueError("must provide 'y_A_col' for the prediction model")
    if not y_B:
        raise ValueError("for scenario 3, 'y_B_col' cannot be None")
    formula = Formula.parse(outcome_model).resolve(df.columns)
    fit = _fit(df.filter(indA), formula, model_type)
    pred = fit.predict_expr()

    ya = F.col(y_A).cast("double")
    # term1 = sum_B w_cal_B * (y_B - yhat)  — the reference's d_i_B holds the
    # calibrated weights at this point (``PC.R:233``), zero off-B, and the
    # sum in ``PC.R:325`` therefore only ranges over B rows.
    stats = df.select(
        pred.alias("__yhat__"),
        ya.alias("__ya__"),
        F.when(indA, 1).otherwise(0).alias("__ia__"),
        F.when(indB, wB_cal_expr * (F.col(y_B).cast("double") - pred)).alias("__bres__"),
    ).agg(
        F.sum("__yhat__").alias("sum_pred_U"),
        F.sum(F.when(F.col("__ia__") == 1, F.pow(F.col("__ya__") - F.col("__yhat__"), 2))).alias("ssr_A"),
        F.avg(F.when(F.col("__ia__") == 1, F.pow(F.col("__ya__") - F.col("__yhat__"), 2))).alias("mse_A"),
        F.var_samp(F.when(F.col("__ia__") == 1, F.col("__ya__"))).alias("var_yA"),
        F.sum(F.when(F.col("__ia__") == 1, 1).otherwise(0)).alias("n_A"),
        F.sum("__bres__").alias("t1"),
    ).collect()[0]

    est = ((stats["t1"] or 0.0) + (stats["sum_pred_U"] or 0.0)) / float(N_total)

    rmse = r2 = None
    if eval_model_performance:
        rmse = float((stats["mse_A"] or 0.0) ** 0.5)
        n_A = int(stats["n_A"])
        sst = (stats["var_yA"] or 0.0) * (n_A - 1)
        r2 = 1.0 - (stats["ssr_A"] or 0.0) / sst if sst > 0 else float("nan")
    return PCResult(estimate=float(est), model_coef=fit.coef_for(()), rmse=rmse, r2=r2,
                    df=b_df, weight_col="w_cal_B", model_converged=fit.converged)

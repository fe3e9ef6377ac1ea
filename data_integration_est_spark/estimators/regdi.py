"""RegDI — calibration-based data integration estimator (Kim & Tam 2021).

Spark-first re-implementation of the reference's ``RegDI2()``
(``RegDI2.R:5-333``).  The estimator combines a probability sample S_A
(with design weights) and a big-data sample S_B by calibrating S_A's
weights to population totals that *include* S_B membership and S_B's
outcome total — so the calibrated mean of y over S_A "borrows" S_B's size.

Corrections (``RegDI2.R:20``):
  0/1  plain calibration estimate             (``RegDI2.R:244-248,320-325``)
  2    measurement-error correction: fit y_A ~ y_B on the A∩B validation
       overlap, map y_A onto B's scale via the inverse fit, recalibrate
       (``RegDI2.R:250-307``).  NOTE the estimand: correction 2 treats
       S_B as the measurement gold standard — ``y_corrected = (y_A -
       b0)/b1`` puts A's outcome on the B scale (``RegDI2.R:264-266``),
       so the reported mean targets E[y_B-scale], not E[y_A-scale].
       (The notebook's contaminated-proxy Scenario II instead uses
       correction 1 with ``y_B_col = tilde``, ``nb[5]:48-57``, which
       stays unbiased for E[y_A-scale].)
  3    doubly-robust: outcome model on A, DR point + ad-hoc variance
       (``RegDI2.R:196-241,309-318``; the reference README documents this
       variance as incomplete — we reproduce the code's formula)

Execution profile per call (at ANY scale — nothing O(N) is collected):
  1 shuffle for the A/B join (two-table mode only), ONE multi-sum pass for
  sizes+totals, ONE Gram pass + driver k x k solve for the calibration,
  2 passes for the calibrated mean + linearized variance.  k = 3 + #aux.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.integrate import IntegrationError, integrate_samples
from data_integration_est_spark.kernels.linalg import calibrate, fit_ols
from data_integration_est_spark.kernels.stats import svymean


@dataclass
class RegDIResult:
    mean: float
    variance: float
    rmse: float | None = None
    r2: float | None = None
    # The combined table with derived columns (incl. calibrated weights for
    # corrections 0/1/2) — lazy; callers can inspect or reuse it.
    df: DataFrame | None = None
    weight_col: str | None = None

    @property
    def se(self) -> float:
        return float(self.variance) ** 0.5


def _prepare(
    data,
    data_A,
    data_B,
    id_var_A,
    id_var_B,
    ind_var_A,
    ind_var_B,
    y_A_col,
    y_B_col,
    aux_vars,
):
    """Shared combine/validate step (``RegDI2.R:23-88``, ``PC.R:66-132``).

    Returns (df, ind_A, ind_B, y_A, y_B, aux_A, aux_B, data_direct).
    """
    data_direct = data is not None
    if not data_direct and (data_A is None or data_B is None):
        raise IntegrationError("must provide 'data' or both 'data_A' and 'data_B'")
    aux_vars = list(aux_vars or [])
    if data_direct:
        for c in [ind_var_A, ind_var_B, y_A_col, y_B_col]:
            if c is None:
                raise IntegrationError(
                    "direct mode requires 'ind_var_A', 'ind_var_B', 'y_A_col', 'y_B_col'"
                )
            if c not in data.columns:
                raise IntegrationError(f"column {c!r} not found in 'data'")
        for c in aux_vars:
            if c not in data.columns:
                raise IntegrationError(f"aux column {c!r} not found in 'data'")
        return data, ind_var_A, ind_var_B, y_A_col, y_B_col, aux_vars, aux_vars, True
    if id_var_A is None or id_var_B is None:
        raise IntegrationError(
            "must specify 'id_var_A' and 'id_var_B' when providing 'data_A' and 'data_B'"
        )
    integ = integrate_samples(data_A, data_B, id_var_A, id_var_B, y_A_col, y_B_col)
    aux_A = [integ.col_A(c) for c in aux_vars]
    aux_B = [integ.col_B(c) for c in aux_vars]
    return integ.df, integ.ind_A, integ.ind_B, integ.y_A, integ.y_B, aux_A, aux_B, False


def regdi(
    data: DataFrame | None = None,
    data_A: DataFrame | None = None,
    data_B: DataFrame | None = None,
    id_var_A: str | None = None,
    id_var_B: str | None = None,
    ind_var_A: str | None = None,
    ind_var_B: str | None = None,
    y_A_col: str = "",
    y_B_col: str = "",
    aux_vars: list[str] | None = None,
    N_total: float | None = None,
    weights_A: str | None = None,
    outcome_model: str | None = None,
    correction: int = 0,
    eval_model_performance: bool = False,
) -> RegDIResult:
    df, ind_A, ind_B, y_A, y_B, aux_A, aux_B, data_direct = _prepare(
        data, data_A, data_B, id_var_A, id_var_B, ind_var_A, ind_var_B,
        y_A_col, y_B_col, aux_vars,
    )
    indA = F.col(ind_A) == 1
    indB = F.col(ind_B) == 1

    # delta_* helper columns (``RegDI2.R:126-141``)
    df = (
        df.withColumn("uno", F.lit(1.0))
        .withColumn("delta_i", F.when(indB, 1.0).otherwise(0.0))
        .withColumn("delta_yi", F.when(indB, F.col(y_B).cast("double")).otherwise(0.0))
    )
    delta_aux = []
    for z in aux_B:
        dc = f"delta_{z}"
        df = df.withColumn(dc, F.when(indB, F.col(z).cast("double")).otherwise(0.0))
        delta_aux.append(dc)

    # ONE fused pass: row count, sample sizes, weight total, calibration
    # totals (``RegDI2.R:91-168`` is several sequential sums in R), AND the
    # calibration Gram.  The Gram over sample A is just an A-masked
    # weighted sum, so it rides the same full-table aggregation; when
    # design weights are the constant N/n_A the mask weight is 1 and the
    # driver scales the collected matrix afterwards.  Net effect:
    # corrections 0/1 run in TWO data passes total (this one + the
    # single-pass svymean).
    x_cols = ["uno", "delta_i", "delta_yi"] + delta_aux
    k = len(x_cols)
    if weights_A is not None and weights_A not in df.columns:
        raise IntegrationError(f"'weights_A' column {weights_A!r} not found in the data")
    gram_w = (
        F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)
        if weights_A is not None
        else F.when(indA, 1.0).otherwise(0.0)
    )
    xs = [F.col(c).cast("double") for c in x_cols]
    aggs = [
        F.count(F.lit(1)).alias("nrows"),
        F.sum(F.when(indA, 1).otherwise(0)).alias("size_A"),
        F.sum(F.when(indB, 1).otherwise(0)).alias("size_B"),
        F.sum("delta_i").alias("t_delta_i"),
        F.sum("delta_yi").alias("t_delta_yi"),
        *[F.sum(c).alias(f"t_{c}") for c in delta_aux],
        *[
            F.sum(gram_w * xs[i] * xs[j]).alias(f"g_{i}_{j}")
            for i in range(k) for j in range(i, k)
        ],
        *[F.sum(gram_w * xs[i]).alias(f"h_{i}") for i in range(k)],
    ]
    if weights_A is not None:
        aggs.append(
            F.sum(F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)).alias("sum_wA")
        )
    if correction == 2:
        # Correction 2's y_A ~ y_B validation fit and corrected-outcome total
        # expand in six extra sums, so they ride THIS pass instead of costing
        # a Gram job + a t_corr job (``RegDI2.R:250-265`` runs them serially).
        yAc = F.col(y_A).cast("double")
        yBc = F.col(y_B).cast("double")
        ok = indA & indB & yAc.isNotNull() & yBc.isNotNull()
        aggs += [
            F.sum(F.when(ok, 1).otherwise(0)).alias("c2_n"),
            F.sum(F.when(ok, yBc)).alias("c2_syB"),
            F.sum(F.when(ok, yBc * yBc)).alias("c2_syB2"),
            F.sum(F.when(ok, yAc)).alias("c2_syA"),
            F.sum(F.when(ok, yAc * yBc)).alias("c2_syAyB"),
            # t_corr ingredients: overlap rows contribute (y_A-b0)/b1 whenever
            # y_A is present (y_B null or not), B-only rows contribute y_B
            F.sum(F.when(indA & indB, yAc)).alias("c2_syA_all"),
            F.sum(F.when(indA & indB & yAc.isNotNull(), 1).otherwise(0)).alias("c2_n_all"),
            F.sum(F.when(indB & ~indA, yBc)).alias("c2_syB_nonA"),
        ]
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

    # design weights d_i_A (``RegDI2.R:106-116``)
    if weights_A is not None:
        d_expr = F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)
        d_scale = 1.0  # Gram already collected under the real weights
    else:
        d_scale = float(N_total) / size_A
        d_expr = F.when(indA, F.lit(d_scale)).otherwise(0.0)
    df = df.withColumn("d_i_A", d_expr)

    # calibration totals (``RegDI2.R:143-168``) and the driver-side GREG
    # solve: (sum_A d x x') lam = T - sum_A d x  (``RegDI2.R:188-193``)
    totals = {
        "uno": float(tot["nrows"]) if data_direct else float(N_total),
        "delta_i": float(tot["t_delta_i"]),
        "delta_yi": float(tot["t_delta_yi"]),
        **{c: float(tot[f"t_{c}"]) for c in delta_aux},
    }
    import numpy as np

    from data_integration_est_spark.kernels.gram import dot_expr
    from data_integration_est_spark.kernels.linalg import _solve_stacked

    G = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            G[i, j] = G[j, i] = d_scale * float(tot[f"g_{i}_{j}"] or 0.0)
    h = np.array([d_scale * float(tot[f"h_{i}"] or 0.0) for i in range(k)])
    T = np.array([totals[c] for c in x_cols])
    lam = _solve_stacked(G[None, ...], (T - h)[None, :, None], "calibrate").ravel()

    w_cal_expr = F.col("d_i_A") * (F.lit(1.0) + dot_expr(x_cols, lam))
    sample_A = df.filter(indA).withColumn("w_cal", w_cal_expr)
    cal_design = SurveyDesign(
        df=sample_A, weight_col="w_cal", calibration_cols=x_cols, base_weight_col="d_i_A"
    )

    try:
        if correction in (0, 1):
            est = svymean(cal_design, y_A)[0]
            return RegDIResult(mean=est.estimate, variance=est.variance,
                               df=sample_A, weight_col="w_cal")
        if correction == 2:
            return _correction_2(df, tot, indA, indB, y_A, y_B, delta_aux, totals)
        if correction == 3:
            return _correction_3(
                df, sample_A, w_cal_expr, indA, y_A, N_total, size_A,
                outcome_model, eval_model_performance,
            )
        raise ValueError(f"invalid correction {correction!r}: must be 0, 1, 2 or 3")
    finally:
        df.unpersist()


def _correction_2(df, tot, indA, indB, y_A, y_B, delta_aux, totals) -> RegDIResult:
    """Measurement-error correction (``RegDI2.R:250-307``).

    The y_A ~ y_B validation OLS and the corrected-outcome total t_corr are
    both closed forms in the six ``c2_*`` sums collected by the main fused
    pass, so correction 2 adds NO data pass before the recalibration Gram
    (the reference runs ``lm`` + a separate sum serially, ``RegDI2.R:254-265``).
    """
    import numpy as np

    from data_integration_est_spark.kernels.linalg import _solve_stacked

    n_ov = int(tot["c2_n"] or 0)
    if n_ov < 2:
        # the reference's validation-data guard (``RegDI2.R:254-255``)
        raise IntegrationError(
            f"insufficient validation data for correction 2: {n_ov} usable "
            "S_A ∩ S_B overlap row(s), need >= 2 with y_A and y_B observed"
        )
    s_yB = float(tot["c2_syB"] or 0.0)
    s_yA = float(tot["c2_syA"] or 0.0)
    G = np.array([[float(n_ov), s_yB], [s_yB, float(tot["c2_syB2"] or 0.0)]])
    rhs = np.array([s_yA, float(tot["c2_syAyB"] or 0.0)])
    b0, b1 = (float(v) for v in
              _solve_stacked(G[None], rhs[None, :, None], "correction-2 fit").ravel())
    if abs(b1) < 1e-10:
        raise IntegrationError(
            f"correction 2: fitted slope b1={b1:.3e} is numerically zero — "
            "y_corrected = (y_A - b0)/b1 is undefined (no usable association "
            "between y_A and y_B on the validation overlap)"
        )

    # y_corrected: de-biased y_A on A rows, raw y_B elsewhere (``RegDI2.R:264-265``)
    y_corr = F.when(indA, (F.col(y_A).cast("double") - F.lit(b0)) / F.lit(b1)).otherwise(
        F.col(y_B).cast("double")
    )
    df = df.withColumn("y_corrected", y_corr).withColumn(
        "delta_yi_corrected", F.when(indB, F.col("y_corrected")).otherwise(0.0)
    )
    # sum_B y_corrected = (sum_{A∩B} y_A − n·b0)/b1 + sum_{B∖A} y_B
    t_corr = (float(tot["c2_syA_all"] or 0.0) - float(tot["c2_n_all"] or 0) * b0) / b1 \
        + float(tot["c2_syB_nonA"] or 0.0)

    x_corr = ["uno", "delta_i", "delta_yi_corrected"] + delta_aux
    totals_corr = {
        "uno": totals["uno"],
        "delta_i": totals["delta_i"],
        "delta_yi_corrected": float(t_corr),
        **{c: totals[c] for c in delta_aux},
    }
    cal = calibrate(df.filter(indA), x_corr, totals_corr, d_col="d_i_A", out_col="w_cal")
    design = SurveyDesign(
        df=cal.df, weight_col="w_cal", calibration_cols=x_corr, base_weight_col="d_i_A"
    )
    est = svymean(design, "y_corrected")[0]
    return RegDIResult(mean=est.estimate, variance=est.variance, df=cal.df, weight_col="w_cal")


def _correction_3(
    df, cal_df, w_cal_expr, indA, y_A, N_total, size_A, outcome_model,
    eval_model_performance,
) -> RegDIResult:
    """Doubly-robust estimator (``RegDI2.R:196-241``).

    T_DR = (sum_A w_cal*(y - yhat) + sum_U yhat) / N
    V_DR = var(w_cal*(y - yhat))/n_A + var_U(yhat)/N      (the code's ad-hoc
    variance at ``RegDI2.R:222-225`` — reproduced as-is, see module doc).

    The A-side residual stats and the population-side prediction stats are
    indA-masked sums over the SAME table, so they run as one fused pass
    (null-skipping aggregates implement the mask for free).
    """
    if outcome_model is None:
        raise ValueError("must specify the outcome model via 'outcome_model'")
    formula = Formula.parse(outcome_model).resolve(df.columns)
    fit = fit_ols(
        df.filter(indA), y_col=formula.response, x_cols=list(formula.predictors),
        intercept=formula.intercept,
    )
    pred = fit.predict_expr()

    y = F.col(y_A).cast("double")
    res = y - pred
    wres = F.when(indA, w_cal_expr * res)  # null off-A -> skipped by the aggs
    stats = df.agg(
        F.sum(wres).alias("sum_wres"),
        F.var_samp(wres).alias("var_wres"),
        F.sum(F.when(indA, F.pow(res, 2))).alias("ssr"),
        F.avg(F.when(indA, F.pow(res, 2))).alias("mse"),
        F.var_samp(F.when(indA, y)).alias("var_y"),
        F.sum(F.when(indA, 1).otherwise(0)).alias("n"),
        F.sum(pred).alias("sum_pred"),
        F.var_samp(pred).alias("var_pred"),
    ).collect()[0]
    a_stats = u_stats = stats
    full = cal_df  # A rows only, carries the w_cal column (returned to caller)

    n_A = int(a_stats["n"])
    T_DR = ((a_stats["sum_wres"] or 0.0) + (u_stats["sum_pred"] or 0.0)) / float(N_total)
    V_DR = (a_stats["var_wres"] or 0.0) / n_A + (u_stats["var_pred"] or 0.0) / float(N_total)

    rmse = r2 = None
    if eval_model_performance:
        rmse = float((a_stats["mse"] or 0.0) ** 0.5)
        sst = (a_stats["var_y"] or 0.0) * (n_A - 1)
        r2 = 1.0 - (a_stats["ssr"] or 0.0) / sst if sst > 0 else float("nan")
    return RegDIResult(mean=float(T_DR), variance=float(V_DR), rmse=rmse, r2=r2,
                       df=full, weight_col="w_cal")

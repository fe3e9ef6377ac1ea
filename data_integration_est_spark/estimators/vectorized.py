"""Replicate-vectorized estimators — the Monte Carlo engine.

The reference runs its Monte Carlo studies as a serial R loop
(``nb[4]:29-196``) or a ``parLapply`` process pool over (gamma, sim) cells
(``nb[23]:130-143``).  Here the replicate and grid dimensions are ordinary
key columns of ONE DataFrame and every estimator below computes ALL cells
at once: per-group totals are a single groupBy pass, the per-group k x k
calibration/OLS solves are one stacked ``numpy.linalg.solve`` on the
driver, and the solved vectors return to executors via a broadcast join.
Per full estimator-suite-on-a-grid: ~4-6 shuffles TOTAL, independent of
the number of replicates — the 100 TB-shaped replacement for a process
pool.

Only O(k^2 * groups) scalars ever reach the driver (k <= ~6, groups =
|grid| x n_sim — thousands).  Group keys must not be named like internal
columns (``uno``, ``delta_*``, ``d_i_A``...).

Each function returns ``{group_key_tuple: (estimate, se | None)}``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.kernels.linalg import calibrate, fit_logistic, fit_ols
from data_integration_est_spark.kernels.stats import svymean
from data_integration_est_spark.util import local_df


def _fit_grouped(sample: DataFrame, formula: Formula, model_type: str, group_cols):
    if model_type == "normal":
        return fit_ols(sample, y_col=formula.response, x_cols=list(formula.predictors),
                       intercept=formula.intercept, group_cols=group_cols)
    if model_type == "logistic":
        return fit_logistic(sample, y_col=formula.response,
                            x_cols=list(formula.predictors),
                            intercept=formula.intercept, group_cols=group_cols)
    raise ValueError("model_type must be 'normal' or 'logistic'")


def _note_fit(diag: dict | None, fit) -> None:
    """Accumulate fit-health counters into a caller-supplied dict — the
    Monte Carlo harness surfaces these on MCResult.diagnostics so silent
    numerical issues in big grids (unconverged IRLS, undersized cells)
    are visible without scraping warnings."""
    if diag is None:
        return
    diag["n_fits"] = diag.get("n_fits", 0) + 1
    if fit.kind == "logistic" and not fit.converged:
        diag["unconverged"] = diag.get("unconverged", 0) + 1
    diag["degenerate_groups"] = (
        diag.get("degenerate_groups", 0) + len(fit.degenerate_keys)
    )


def _broadcast_scalars(
    df: DataFrame, group_cols: list[str], values: dict[tuple, tuple], names: list[str]
) -> DataFrame:
    """Broadcast-join per-group driver scalars back onto the big table."""
    spark = df.sparkSession
    rows = [tuple(k) + tuple(float(v) for v in vals) for k, vals in values.items()]
    key_schema = df.select(*group_cols).schema
    schema = StructType(
        list(key_schema.fields) + [StructField(n, DoubleType(), False) for n in names]
    )
    sdf = local_df(spark, rows, schema)
    return df.join(F.broadcast(sdf), on=group_cols, how="inner")


def naive_mean_grouped(
    df: DataFrame, y_col: str, ind_col: str, group_cols: list[str]
) -> dict[tuple, tuple]:
    """Unweighted sample mean + SRS se per group (``nb[4]:37-49``)."""
    rows = (
        df.filter(F.col(ind_col) == 1)
        .groupBy(*group_cols)
        .agg(
            F.avg(F.col(y_col).cast("double")).alias("m"),
            F.stddev_samp(F.col(y_col).cast("double")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    return {
        tuple(r[c] for c in group_cols): (
            float(r["m"]),
            float(r["s"]) / float(r["n"]) ** 0.5 if r["s"] is not None else None,
        )
        for r in rows
    }


def weighted_mean_grouped(
    df: DataFrame, y_col: str, ind_col: str, weight_col: str, group_cols: list[str]
) -> dict[tuple, tuple]:
    """Design-weighted sample mean per group — ``svymean(~y, svydesign(
    weights=~d))`` point estimate (``nb[12]:36-38``)."""
    w = F.col(weight_col).cast("double")
    y = F.col(y_col).cast("double")
    rows = (
        df.filter(F.col(ind_col) == 1)
        .groupBy(*group_cols)
        .agg(F.sum(w * y).alias("swy"), F.sum(w).alias("sw"))
        .collect()
    )
    # null guards match the sibling grouped estimators: an all-NULL y (or
    # weight) group yields NaN instead of raising TypeError on float(None)
    return {
        tuple(r[c] for c in group_cols): (
            float(r["swy"]) / float(r["sw"])
            if r["swy"] is not None and (r["sw"] or 0.0) != 0.0
            else float("nan"),
            None,
        )
        for r in rows
    }


def regdi_c0_grouped(
    df: DataFrame,
    y_A_col: str,
    y_B_col: str,
    ind_var_A: str,
    ind_var_B: str,
    group_cols: list[str],
    aux_vars: list[str] | None = None,
    weights_A: str | None = None,
) -> dict[tuple, tuple]:
    """RegDI correction-0 for every group at once (``RegDI2.R:126-193,
    244-248`` vectorized).  Direct mode: each group is its own population.
    With ``weights_A`` the design weights come from that column and the
    population size is approximated by their sum (``RegDI2.R:106-116`` —
    the stratified-study call shape, ``nb[12]:48-76``)."""
    indA = F.col(ind_var_A) == 1
    indB = F.col(ind_var_B) == 1
    aux = list(aux_vars or [])

    work = (
        df.withColumn("uno", F.lit(1.0))
        .withColumn("delta_i", F.when(indB, 1.0).otherwise(0.0))
        .withColumn("delta_yi", F.when(indB, F.col(y_B_col).cast("double")).otherwise(0.0))
    )
    delta_aux = []
    for z in aux:
        dc = f"delta_{z}"
        work = work.withColumn(dc, F.when(indB, F.col(z).cast("double")).otherwise(0.0))
        delta_aux.append(dc)
    x_cols = ["uno", "delta_i", "delta_yi"] + delta_aux

    aggs = [
        F.count(F.lit(1)).alias("N"),
        F.sum(F.when(indA, 1).otherwise(0)).alias("nA"),
        F.sum("delta_i").alias("t_di"),
        F.sum("delta_yi").alias("t_dyi"),
        *[F.sum(c).alias(f"t_{c}") for c in delta_aux],
    ]
    if weights_A is not None:
        aggs.append(
            F.sum(F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)).alias("swA")
        )
    tot_rows = work.groupBy(*group_cols).agg(*aggs).collect()
    totals_by_group: dict[tuple, np.ndarray] = {}
    d_by_group: dict[tuple, tuple] = {}
    for r in tot_rows:
        key = tuple(r[c] for c in group_cols)
        N_uno = float(r["swA"]) if weights_A is not None else float(r["N"])
        totals_by_group[key] = np.array(
            [N_uno, float(r["t_di"] or 0.0), float(r["t_dyi"] or 0.0)]
            + [float(r[f"t_{c}"] or 0.0) for c in delta_aux]
        )
        d_by_group[key] = (N_uno / max(int(r["nA"]), 1),)

    if weights_A is not None:
        sample_A = work.filter(indA).withColumn(
            "d_i_A", F.col(weights_A).cast("double")
        )
    else:
        sample_A = _broadcast_scalars(
            work.filter(indA), group_cols, d_by_group, ["d_i_A"]
        )
    cal = calibrate(
        sample_A, x_cols, totals=None, d_col="d_i_A", out_col="w_cal",
        group_cols=group_cols, totals_by_group=totals_by_group,
    )
    design = SurveyDesign(
        df=cal.df, weight_col="w_cal", calibration_cols=x_cols, base_weight_col="d_i_A"
    )
    return {
        e.key: (e.estimate, e.se) for e in svymean(design, y_A_col, group_cols)
    }


def regdi_c2_grouped(
    df: DataFrame,
    y_A_col: str,
    y_B_col: str,
    ind_var_A: str,
    ind_var_B: str,
    group_cols: list[str],
    aux_vars: list[str] | None = None,
    diag: dict | None = None,
) -> dict[tuple, tuple]:
    """RegDI correction-2 (measurement error) for every group at once
    (``RegDI2.R:250-307`` vectorized): per-group OLS of y_A on y_B over
    the A∩B overlap, de-bias, then the correction-0 machinery on the
    corrected outcome."""
    indA = F.col(ind_var_A) == 1
    indB = F.col(ind_var_B) == 1
    fit = fit_ols(
        df.filter(indA & indB), y_col=y_A_col, x_cols=[y_B_col],
        group_cols=group_cols,
    )
    _note_fit(diag, fit)
    coefs = {
        key: (float(fit.coef_for(key)[0]), float(fit.coef_for(key)[1]))
        for key in fit.keys
    }
    j = _broadcast_scalars(df, group_cols, coefs, ["__b0__", "__b1__"])
    y_corr = F.when(
        indA, (F.col(y_A_col).cast("double") - F.col("__b0__")) / F.col("__b1__")
    ).otherwise(F.col(y_B_col).cast("double"))
    work = j.withColumn("__y_corr__", y_corr).drop("__b0__", "__b1__")
    return regdi_c0_grouped(
        work, "__y_corr__", "__y_corr__", ind_var_A, ind_var_B, group_cols,
        aux_vars=aux_vars,
    )


def pc_s2_grouped(
    df: DataFrame,
    y_A_col: str,
    y_B_col: str,
    ind_var_A: str,
    ind_var_B: str,
    aux_vars: list[str],
    outcome_model: str,
    group_cols: list[str],
    model_type: str = "normal",
    weights_A: str | None = None,
    diag: dict | None = None,
    calb: tuple | None = None,
) -> dict[tuple, tuple]:
    """PC scenario 2 (y unobserved in B) for every group
    (``PC.R:255-297`` vectorized):
    Yhat = (sum_B w_cal_B*yhat + sum_A d_A*(y_A - yhat)) / N.
    ``model_type='logistic'`` runs the grouped IRLS GLM (``PC.R:274``);
    ``weights_A`` uses the design-weight column for d_A and HT totals.
    ``calb``: precomputed ``_calibrated_b`` result (see
    ``pc_s1_grouped``)."""
    indA = F.col(ind_var_A) == 1
    indB = F.col(ind_var_B) == 1
    b_df, _, sizes = calb if calb is not None else _calibrated_b(
        df, ind_var_B, aux_vars, group_cols, weights_A=weights_A, ind_var_A=ind_var_A
    )

    formula = Formula.parse(outcome_model).resolve(df.columns)
    fit = _fit_grouped(df.filter(indA & indB), formula, model_type, group_cols)
    _note_fit(diag, fit)

    b_join, b_pred = fit.predict_expr_grouped(b_df)
    t1_rows = (
        b_join.select(*group_cols, (F.col("w_cal_B") * b_pred).alias("__t__"))
        .groupBy(*group_cols).agg(F.sum("__t__").alias("t1"))
        .collect()
    )
    t1 = {tuple(r[c] for c in group_cols): float(r["t1"] or 0.0) for r in t1_rows}

    if weights_A is not None:
        a_sample = df.filter(indA).withColumn("d_i_A", F.col(weights_A).cast("double"))
    else:
        # d_A = N / n_A per group (sizes carries n_B, so collect n_A here)
        nA_rows = (
            df.groupBy(*group_cols)
            .agg(F.sum(F.when(indA, 1).otherwise(0)).alias("nA"))
            .collect()
        )
        d_by_group = {
            tuple(r[c] for c in group_cols): (
                sizes[tuple(r[c] for c in group_cols)][0] / max(int(r["nA"]), 1),
            )
            for r in nA_rows
        }
        a_sample = _broadcast_scalars(df.filter(indA), group_cols, d_by_group, ["d_i_A"])
    a_join, a_pred = fit.predict_expr_grouped(a_sample)
    t2_rows = (
        a_join.select(
            *group_cols,
            (F.col("d_i_A") * (F.col(y_A_col).cast("double") - a_pred)).alias("__t__"),
        )
        .groupBy(*group_cols).agg(F.sum("__t__").alias("t2"))
        .collect()
    )
    out: dict[tuple, tuple] = {}
    for r in t2_rows:
        key = tuple(r[c] for c in group_cols)
        N, _ = sizes[key]
        out[key] = ((t1[key] + float(r["t2"] or 0.0)) / N, None)
    return out


def _calibrated_b(
    df: DataFrame,
    ind_var_B: str,
    aux_vars: list[str],
    group_cols: list[str],
    weights_A: str | None = None,
    ind_var_A: str | None = None,
):
    """Shared PC step: per-group aux totals + B-weight calibration
    (``PC.R:180-237`` vectorized).  Returns (b_df, x_cols, per-group
    N / n_B dict).

    Default: direct population sums (direct mode).  With ``weights_A``
    (and ``ind_var_A``) the totals are Horvitz-Thompson estimates from
    the weighted probability sample and N is the weight sum — the
    reference's two-table shape (``PC.R:188-199``, ``nb[12]:78-88``)."""
    indB = F.col(ind_var_B) == 1
    ht = weights_A is not None
    if ht:
        indA = F.col(ind_var_A) == 1
        wA = F.when(indA, F.col(weights_A).cast("double")).otherwise(0.0)
        aggs = [
            F.sum(wA).alias("N"),
            F.sum(F.when(indB, 1).otherwise(0)).alias("nB"),
            *[F.sum(wA * F.col(z).cast("double")).alias(f"t_{z}") for z in aux_vars],
        ]
    else:
        aggs = [
            F.count(F.lit(1)).cast("double").alias("N"),
            F.sum(F.when(indB, 1).otherwise(0)).alias("nB"),
            *[F.sum(F.col(z).cast("double")).alias(f"t_{z}") for z in aux_vars],
        ]
    tot_rows = df.groupBy(*group_cols).agg(*aggs).collect()
    totals_by_group: dict[tuple, np.ndarray] = {}
    scalars: dict[tuple, tuple] = {}
    sizes: dict[tuple, tuple] = {}
    for r in tot_rows:
        key = tuple(r[c] for c in group_cols)
        totals_by_group[key] = np.array([float(r[f"t_{z}"] or 0.0) for z in aux_vars])
        scalars[key] = (float(r["N"]) / max(int(r["nB"]), 1),)
        sizes[key] = (float(r["N"]), int(r["nB"]))
    sample_B = _broadcast_scalars(df.filter(indB), group_cols, scalars, ["d_i_B"])
    cal = calibrate(
        sample_B, list(aux_vars), totals=None, d_col="d_i_B", out_col="w_cal_B",
        group_cols=group_cols, totals_by_group=totals_by_group,
    )
    return cal.df, list(aux_vars), sizes


def pc_s1_grouped(
    df: DataFrame,
    y_B_col: str,
    ind_var_B: str,
    aux_vars: list[str],
    group_cols: list[str],
    weights_A: str | None = None,
    ind_var_A: str | None = None,
    calb: tuple | None = None,
) -> dict[tuple, tuple]:
    """PC scenario 1 for every group at once (``PC.R:240-253`` vectorized);
    ``weights_A`` switches to HT-estimated aux totals (``PC.R:188-193``).

    ``calb`` (r17, guide §1.2 don't-compute-twice): a precomputed
    ``_calibrated_b(df, ind_var_B, aux_vars, group_cols, ...)`` result —
    several PC battery members calibrate the SAME B sample to the SAME
    aux totals, so the MC harness computes the triple once and hands it
    to each member; the values are the ones this function would compute
    itself (caller's responsibility to pass a same-arguments result)."""
    b_df, x_cols, _ = calb if calb is not None else _calibrated_b(
        df, ind_var_B, aux_vars, group_cols, weights_A=weights_A, ind_var_A=ind_var_A
    )
    design = SurveyDesign(
        df=b_df, weight_col="w_cal_B", calibration_cols=x_cols, base_weight_col="d_i_B"
    )
    return {e.key: (e.estimate, e.se) for e in svymean(design, y_B_col, group_cols)}


def pc_dr1_grouped(
    df: DataFrame,
    y_A_col: str,
    y_B_col: str,
    ind_var_A: str,
    ind_var_B: str,
    aux_vars: list[str],
    outcome_model: str,
    group_cols: list[str],
    model_type: str = "normal",
    eval_model_performance: bool = False,
    diag: dict | None = None,
    fit=None,
    calb: tuple | None = None,
    u_stats: dict | None = None,
) -> dict[tuple, tuple]:
    """PC scenario-3 DR1 for every group (``PC.R:299-328`` vectorized):
    Yhat = (sum_B w_cal_B*(y_B - yhat) + sum_U yhat) / N.
    ``model_type='logistic'`` runs the grouped IRLS GLM (``PC.R:311``).

    With ``eval_model_performance`` each value tuple gains the
    per-group A-sample R² of the outcome model (``PC.R:330-340``,
    recorded by the nb[37] study) — the residual stats ride the same
    U-side pass as masked sums, no extra job.

    Share hooks (r17, guide §1.2 don't-compute-twice): ``fit`` injects
    a precomputed outcome model (several MC battery members fit the
    IDENTICAL formula on the identical A sample), ``calb`` a
    precomputed ``_calibrated_b`` result, and ``u_stats`` the
    full-population prediction moments from
    :func:`u_pred_stats_grouped` under the SAME fit (ignored when
    ``eval_model_performance`` needs the A-masked residual stats that
    ride the U pass)."""
    indA = F.col(ind_var_A) == 1
    b_df, _, sizes = calb if calb is not None else _calibrated_b(
        df, ind_var_B, aux_vars, group_cols
    )

    formula = Formula.parse(outcome_model).resolve(df.columns)
    if fit is None:
        fit = _fit_grouped(df.filter(indA), formula, model_type, group_cols)
    _note_fit(diag, fit)

    if u_stats is not None and not eval_model_performance:
        u_by = u_stats
    else:
        u_join, u_pred = fit.predict_expr_grouped(df)
        ya = F.col(y_A_col).cast("double")
        u_aggs = [F.sum(F.col("__yhat__")).alias("sum_pred")]
        if eval_model_performance:
            res2 = F.when(indA, F.pow(ya - F.col("__yhat__"), 2))
            u_aggs += [
                F.sum(res2).alias("ssr_A"),
                F.var_samp(F.when(indA, ya)).alias("var_yA"),
                F.sum(F.when(indA, 1).otherwise(0)).alias("n_A"),
            ]
        u_rows = (
            u_join.withColumn("__yhat__", u_pred)
            .groupBy(*group_cols).agg(*u_aggs)
            .collect()
        )
        u_by = {tuple(r[c] for c in group_cols): r for r in u_rows}

    b_join, b_pred = fit.predict_expr_grouped(b_df)
    t1_rows = (
        b_join.select(
            *group_cols,
            (F.col("w_cal_B") * (F.col(y_B_col).cast("double") - b_pred)).alias("__t__"),
        )
        .groupBy(*group_cols).agg(F.sum("__t__").alias("t1"))
        .collect()
    )
    out: dict[tuple, tuple] = {}
    for r in t1_rows:
        key = tuple(r[c] for c in group_cols)
        N, _ = sizes[key]
        u = u_by[key]
        est = (float(r["t1"] or 0.0) + float(u["sum_pred"] or 0.0)) / N
        if eval_model_performance:
            n_A = int(u["n_A"] or 0)
            sst = (u["var_yA"] or 0.0) * max(n_A - 1, 0)
            r2 = 1.0 - (u["ssr_A"] or 0.0) / sst if sst > 0 else float("nan")
            out[key] = (est, None, float(r2))
        else:
            out[key] = (est, None)
    return out


def fit_outcome_grouped(
    df: DataFrame,
    ind_var_A: str,
    outcome_model: str,
    group_cols: list[str],
    model_type: str = "normal",
):
    """The outcome-model fit the DR estimators run internally
    (A-sample, grouped) as a standalone call — EXACTLY the statement
    ``pc_dr1_grouped``/``regdi_dr_grouped`` issue, so a battery whose
    members share (sample, formula) can compute it once and inject it
    via their ``fit=`` hooks (r17)."""
    formula = Formula.parse(outcome_model).resolve(df.columns)
    return _fit_grouped(
        df.filter(F.col(ind_var_A) == 1), formula, model_type, group_cols
    )


def calibrated_b_grouped(
    df: DataFrame,
    ind_var_B: str,
    aux_vars: list[str],
    group_cols: list[str],
    weights_A: str | None = None,
    ind_var_A: str | None = None,
) -> tuple:
    """Public alias of the shared PC calibration step — computed once
    per (B sample, aux set) and injected into the PC members'
    ``calb=`` hooks (r17)."""
    return _calibrated_b(
        df, ind_var_B, aux_vars, group_cols,
        weights_A=weights_A, ind_var_A=ind_var_A,
    )


def u_pred_stats_grouped(df: DataFrame, fit, group_cols: list[str]) -> dict:
    """Full-population prediction moments under ``fit``: key ->
    Row(sum_pred, var_pred) — the U-side pass that RegDI-DR has always
    run (identical statement shape, so identical floats), now callable
    once and shared with every DR battery member that uses the SAME
    fit (r17, guide §1.2 don't-compute-twice / §2.4 share the pass)."""
    u_join, u_pred = fit.predict_expr_grouped(df)
    u_rows = (
        u_join.select(*group_cols, u_pred.alias("__yhat__"))
        .groupBy(*group_cols)
        .agg(F.sum("__yhat__").alias("sum_pred"),
             F.var_samp("__yhat__").alias("var_pred"))
        .collect()
    )
    return {tuple(r[c] for c in group_cols): r for r in u_rows}


def regdi_dr_grouped(
    df: DataFrame,
    y_A_col: str,
    y_B_col: str,
    ind_var_A: str,
    ind_var_B: str,
    outcome_model: str,
    group_cols: list[str],
    aux_vars: list[str] | None = None,
    diag: dict | None = None,
    fit=None,
    u_stats: dict | None = None,
) -> dict[tuple, tuple]:
    """RegDI correction-3 (doubly robust) for every group
    (``RegDI2.R:196-241`` vectorized):
    T = (sum_A w_cal*(y - yhat) + sum_U yhat)/N,
    V = var(w*(y - yhat))/n_A + var_U(yhat)/N.

    ``fit``/``u_stats`` (r17): share hooks for a precomputed outcome
    model and its full-population prediction moments
    (:func:`u_pred_stats_grouped`) — see ``pc_dr1_grouped``."""
    indA = F.col(ind_var_A) == 1
    indB = F.col(ind_var_B) == 1
    aux = list(aux_vars or [])

    work = (
        df.withColumn("uno", F.lit(1.0))
        .withColumn("delta_i", F.when(indB, 1.0).otherwise(0.0))
        .withColumn("delta_yi", F.when(indB, F.col(y_B_col).cast("double")).otherwise(0.0))
    )
    delta_aux = []
    for z in aux:
        dc = f"delta_{z}"
        work = work.withColumn(dc, F.when(indB, F.col(z).cast("double")).otherwise(0.0))
        delta_aux.append(dc)
    x_cols = ["uno", "delta_i", "delta_yi"] + delta_aux

    tot_rows = (
        work.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("N"),
            F.sum(F.when(indA, 1).otherwise(0)).alias("nA"),
            F.sum("delta_i").alias("t_di"),
            F.sum("delta_yi").alias("t_dyi"),
            *[F.sum(c).alias(f"t_{c}") for c in delta_aux],
        )
        .collect()
    )
    totals_by_group: dict[tuple, np.ndarray] = {}
    d_by_group: dict[tuple, tuple] = {}
    N_by_group: dict[tuple, float] = {}
    for r in tot_rows:
        key = tuple(r[c] for c in group_cols)
        totals_by_group[key] = np.array(
            [float(r["N"]), float(r["t_di"] or 0.0), float(r["t_dyi"] or 0.0)]
            + [float(r[f"t_{c}"] or 0.0) for c in delta_aux]
        )
        d_by_group[key] = (float(r["N"]) / max(int(r["nA"]), 1),)
        N_by_group[key] = float(r["N"])

    sample_A = _broadcast_scalars(work.filter(indA), group_cols, d_by_group, ["d_i_A"])
    cal = calibrate(
        sample_A, x_cols, totals=None, d_col="d_i_A", out_col="w_cal",
        group_cols=group_cols, totals_by_group=totals_by_group,
    )

    formula = Formula.parse(outcome_model).resolve(df.columns)
    if fit is None:
        fit = fit_ols(
            df.filter(indA), y_col=formula.response,
            x_cols=list(formula.predictors),
            intercept=formula.intercept, group_cols=group_cols,
        )
    _note_fit(diag, fit)

    a_join, a_pred = fit.predict_expr_grouped(cal.df)
    a_rows = (
        a_join.select(
            *group_cols,
            (F.col("w_cal") * (F.col(y_A_col).cast("double") - a_pred)).alias("__wres__"),
        )
        .groupBy(*group_cols)
        .agg(
            F.sum("__wres__").alias("sum_wres"),
            F.var_samp("__wres__").alias("var_wres"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if u_stats is not None:
        u_by = u_stats
    else:
        u_by = u_pred_stats_grouped(df, fit, group_cols)

    out: dict[tuple, tuple] = {}
    for r in a_rows:
        key = tuple(r[c] for c in group_cols)
        N = N_by_group[key]
        n_A = int(r["n"])
        u = u_by[key]
        t = ((r["sum_wres"] or 0.0) + (u["sum_pred"] or 0.0)) / N
        v = (r["var_wres"] or 0.0) / n_A + (u["var_pred"] or 0.0) / N
        out[key] = (float(t), float(v) ** 0.5)
    return out


def clw_grouped(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    ind_var_A: str,
    ind_var_B: str,
    group_cols: list[str],
    weights_A: str | None = None,
    n_iter: int = 8,
    outcome_x_cols: list[str] | None = None,
    variance: bool = True,
    diag: dict | None = None,
) -> dict[tuple, tuple]:
    """Chen–Li–Wu propensity-weighted integration for EVERY group in
    one battery pass — the grouped twin of ``estimators/ipw.
    propensity_weighted_mean`` (same pseudo-likelihood, same Hajek IPW
    / DR estimators, same plug-in sandwich SEs), which lets the CLW
    estimators sit in the MC bias/SE tables next to the reference
    families (``nb[23]:113-127`` report an SE for every estimator).

    Returns ``key -> (mean_ipw, se_ipw, mean_dr, se_dr)``.

    ``weights_A=None`` derives the self-representing design weight
    d_g = N_g / n_A,g per group (the MC grid layout, where each cell
    carries the full population) — the same convention as
    ``pc_s2_grouped``.  Groups whose pseudo-likelihood Hessian is
    singular yield NaN and are counted in ``diag['degenerate_groups']``.

    Cost: n_iter + 3 grouped aggregation passes (Newton score/Hessian
    per step; one OLS Gram via ``fit_ols``; one estimate+moment pass;
    one squared-influence variance pass) — per-group k x k solves on
    the driver, nothing O(N)."""
    if outcome_x_cols is None:
        outcome_x_cols = list(x_cols)
    if n_iter < 1:
        # diag['newton_passes'] reads the loop variable after the Newton
        # loop; zero passes would also silently return the theta=0 start
        raise ValueError(f"n_iter must be >= 1; got {n_iter}")
    k = len(x_cols) + 1
    ko = len(outcome_x_cols) + 1
    a = f"CAST({ind_var_A} AS DOUBLE)"
    b = f"CAST({ind_var_B} AS DOUBLE)"
    y = f"COALESCE(CAST({y_col} AS DOUBLE), 0.0)"
    xs = ["1.0"] + [f"CAST({c} AS DOUBLE)" for c in x_cols]
    oxs = ["1.0"] + [f"CAST({c} AS DOUBLE)" for c in outcome_x_cols]

    # Every moment below is a- or b-masked, so rows in NEITHER sample
    # contribute exactly zero to every sum — drop them once instead of
    # scanning them n_iter + 3 times (the MC grid layout carries the
    # full population per cell: A + B is ~2.5% of rows there).  The
    # population size for the default d = N/n_A is taken BEFORE the cut.
    in_sample = (F.col(ind_var_A) == 1) | (F.col(ind_var_B) == 1)
    if weights_A is not None:
        d = f"COALESCE(CAST({weights_A} AS DOUBLE), 0.0)"
        base = df.filter(in_sample)
    else:
        n_rows = (
            df.groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("nt"),
                F.sum(F.col(ind_var_A).cast("double")).alias("na"),
            )
            .collect()
        )
        d_by = {
            tuple(r[c] for c in group_cols): (
                float(r["nt"]) / max(float(r["na"] or 0.0), 1.0),
            )
            for r in n_rows
        }
        base = _broadcast_scalars(df.filter(in_sample), group_cols, d_by,
                                  ["__dA__"])
        d = "__dA__"
    # n_iter + 3 passes re-read this small (A ∪ B) frame: cache it so
    # each Newton step scans ~|A|+|B| rows, not the full population
    # (data-proportional partition count: the Newton passes pay a fixed
    # per-task floor on near-empty partitions otherwise)
    from data_integration_est_spark.util import adaptive_coalesce

    base = adaptive_coalesce(base).persist()
    # the cached (A ∪ B) frame must be released even when a solve
    # or collect raises mid-battery (else repeated failing MC runs
    # accumulate leaked executor cache blocks)
    try:

        keys0 = sorted(d_by.keys()) if weights_A is None else [
            tuple(r[c] for c in group_cols)
            for r in df.select(*group_cols).distinct().collect()
        ]
        thetas: dict[tuple, np.ndarray] = {key: np.zeros(k) for key in keys0}
        tcols = [f"__t{i}__" for i in range(k)]
        bad_keys: set = set()

        def eta_sql() -> str:
            return "(" + " + ".join(f"{tcols[i]} * {xs[i]}" for i in range(k)) + ")"

        for _it in range(n_iter):
            work = _broadcast_scalars(
                base, group_cols,
                {key: tuple(th) for key, th in thetas.items()}, tcols,
            )
            # 1e-300 floor: an underflowed sigmoid (exact 0.0 at extreme
            # negative eta) would raise ANSI DIVIDE_BY_ZERO in every /p
            # moment; the floor binds only past double underflow (see
            # estimators/ipw.py)
            p = f"greatest(1e-300, (1.0 / (1.0 + exp(-{eta_sql()}))))"
            aggs = []
            for i in range(k):
                aggs.append(
                    F.expr(f"sum({b} * {xs[i]} - {a} * {d} * {p} * {xs[i]})")
                    .alias(f"u{i}")
                )
                for j in range(i, k):
                    aggs.append(
                        F.expr(
                            f"sum({a} * {d} * {p} * (1.0 - {p})"
                            f" * {xs[i]} * {xs[j]})"
                        ).alias(f"h{i}{j}")
                    )
            rows = work.groupBy(*group_cols).agg(*aggs).collect()
            max_step = 0.0
            for r in rows:
                key = tuple(r[c] for c in group_cols)
                if key in bad_keys:
                    continue
                H = np.empty((k, k))
                for i in range(k):
                    for j in range(i, k):
                        H[i, j] = H[j, i] = float(r[f"h{i}{j}"] or 0.0)
                U = np.array([float(r[f"u{i}"] or 0.0) for i in range(k)])
                try:
                    step = np.linalg.solve(H, U)
                except np.linalg.LinAlgError:
                    bad_keys.add(key)
                    continue
                thetas[key] = thetas[key] + step
                max_step = max(max_step, float(np.max(np.abs(step))))
            # every group converged: stop paying grid passes (Newton on the
            # smooth pseudo-likelihood typically lands in 5-6 iterations;
            # below 1e-10 further steps are FP noise, so the early stop is
            # invisible at the vectorized==scalar 1e-9 pin)
            if max_step < 1e-10:
                break

        if diag is not None:
            diag["newton_passes"] = diag.get("newton_passes", 0) + _it + 1
        if diag is not None and bad_keys:
            diag["degenerate_groups"] = (
                diag.get("degenerate_groups", 0) + len(bad_keys)
            )

        # outcome model on B (one grouped Gram); m(x) rides as a column
        fit = fit_ols(
            base.filter(F.col(ind_var_B) == 1), y_col=y_col,
            x_cols=list(outcome_x_cols), group_cols=group_cols,
        )
        _note_fit(diag, fit)

        work = _broadcast_scalars(
            base, group_cols, {key: tuple(th) for key, th in thetas.items()},
            tcols,
        )
        work, m_col = fit.predict_expr_grouped(work)
        p_c = F.expr(f"greatest(1e-300, (1.0 / (1.0 + exp(-{eta_sql()}))))")
        a_c, b_c = F.expr(a), F.expr(b)
        d_c, y_c = F.expr(d), F.expr(y)
        work = work.withColumn("__m__", m_col)
        m_c = F.col("__m__")

        aggs = [
            F.sum(a_c).alias("na"), F.sum(b_c).alias("nb"),
            F.sum(a_c * d_c).alias("nhat"),
            F.sum(b_c / p_c).alias("sinv"),
            F.sum(b_c * y_c / p_c).alias("sy"),
            F.sum(b_c * (y_c - m_c) / p_c).alias("sres"),
            F.sum(a_c * d_c * m_c).alias("sma"),
        ]
        if variance:
            for i in range(k):
                xi = F.expr(xs[i])
                for j in range(i, k):
                    aggs.append(
                        F.sum(a_c * d_c * p_c * (1.0 - p_c) * xi * F.expr(xs[j]))
                        .alias(f"h{i}{j}")
                    )
                aggs.append(
                    F.sum(b_c * (1.0 - p_c) / p_c * y_c * xi).alias(f"gy{i}")
                )
                aggs.append(F.sum(b_c * (1.0 - p_c) / p_c * xi).alias(f"gs{i}"))
                aggs.append(
                    F.sum(b_c * (1.0 - p_c) / p_c * (y_c - m_c) * xi)
                    .alias(f"gt{i}")
                )
            for i in range(ko):
                oxi = F.expr(oxs[i])
                aggs.append(F.sum(b_c * oxi / p_c).alias(f"gb1{i}"))
                aggs.append(F.sum(a_c * d_c * oxi).alias(f"gb2{i}"))
            # the per-group B Gram (ko x ko sums) rides the same pass —
            # it depends on nothing computed later, so a separate
            # grouped scan of `base` would be a pure extra pass
            for i in range(ko):
                for j in range(i, ko):
                    aggs.append(
                        F.expr(f"sum({b} * {oxs[i]} * {oxs[j]})")
                        .alias(f"xx{i}{j}")
                    )
        est_rows = {tuple(r[c] for c in group_cols): r
                    for r in work.groupBy(*group_cols).agg(*aggs).collect()}

        out: dict[tuple, tuple] = {}
        sol: dict[tuple, tuple] = {}
        nan4 = (float("nan"), None, float("nan"), None)
        for key, r in est_rows.items():
            sinv_ok = r["sinv"] is not None and 0.0 < float(r["sinv"]) < 1e100
            if key in bad_keys or not r["nb"] or not r["nhat"] or not sinv_ok:
                # sinv >= 1e100 marks a diverged ((quasi-)separable)
                # propensity fit: some B unit's p underflowed, 1/p exploded
                out[key] = nan4
                if diag is not None and not sinv_ok and key not in bad_keys:
                    diag["degenerate_groups"] = (
                        diag.get("degenerate_groups", 0) + 1
                    )
                continue
            mu_i = float(r["sy"] or 0.0) / float(r["sinv"])
            mu_d = (float(r["sres"] or 0.0) + float(r["sma"] or 0.0)) / float(
                r["nhat"]
            )
            out[key] = (mu_i, None, mu_d, None)
            if not variance or int(r["na"]) < 2:
                continue
            Hf = np.empty((k, k))
            for i in range(k):
                for j in range(i, k):
                    Hf[i, j] = Hf[j, i] = float(r[f"h{i}{j}"] or 0.0)
            gy = np.array([float(r[f"gy{i}"] or 0.0) for i in range(k)])
            gs = np.array([float(r[f"gs{i}"] or 0.0) for i in range(k)])
            gt = np.array([float(r[f"gt{i}"] or 0.0) for i in range(k)])
            gb = -np.array([float(r[f"gb1{i}"] or 0.0) for i in range(ko)]) + \
                np.array([float(r[f"gb2{i}"] or 0.0) for i in range(ko)])
            try:
                b_ipw = np.linalg.solve(Hf, -(gy - mu_i * gs))
                bt = np.linalg.solve(Hf, -gt)
            except np.linalg.LinAlgError:
                continue
            sol[key] = (mu_i, mu_d, b_ipw, bt, gb)
        # groups present in df but with NO in-sample rows never reach
        # est_rows (`base` is filtered to A ∪ B), so they would vanish
        # from the result despite the every-group contract: emit the
        # documented NaN tuple and count them degenerate
        for key in thetas:
            if key not in out:
                out[key] = nan4
                if diag is not None:
                    diag["degenerate_groups"] = (
                        diag.get("degenerate_groups", 0) + 1
                    )
        # bb needs the per-group B Gram, already collected in the
        # estimate pass (the xx{i}{j} aggregates ride `aggs` above)
        if variance and sol:
            names = (
                ["__mu_i__", "__mu_d__"]
                + [f"__bi{i}__" for i in range(k)]
                + [f"__bt{i}__" for i in range(k)]
                + [f"__bb{i}__" for i in range(ko)]
            )
            folded = {}
            for key, (mu_i, mu_d, b_ipw, bt, gb) in sol.items():
                r = est_rows[key]
                G = np.empty((ko, ko))
                for i in range(ko):
                    for j in range(i, ko):
                        G[i, j] = G[j, i] = float(r[f"xx{i}{j}"] or 0.0)
                try:
                    bb = np.linalg.solve(G, gb)
                except np.linalg.LinAlgError:
                    continue
                folded[key] = (mu_i, mu_d, *b_ipw, *bt, *bb)
            if folded:
                vwork = _broadcast_scalars(
                    _broadcast_scalars(
                        base, group_cols,
                        {key: tuple(th) for key, th in thetas.items()}, tcols,
                    ),
                    group_cols, folded, names,
                )
                vwork, m2 = fit.predict_expr_grouped(vwork)
                vwork = vwork.withColumn("__m__", m2)
                bx = sum(
                    (F.col(f"__bi{i}__") * F.expr(xs[i]) for i in range(k)),
                    F.lit(0.0),
                )
                btx = sum(
                    (F.col(f"__bt{i}__") * F.expr(xs[i]) for i in range(k)),
                    F.lit(0.0),
                )
                bbo = sum(
                    (F.col(f"__bb{i}__") * F.expr(oxs[i]) for i in range(ko)),
                    F.lit(0.0),
                )
                mu_i_c, mu_d_c = F.col("__mu_i__"), F.col("__mu_d__")
                m_c2 = F.col("__m__")
                zdr = d_c * ((m_c2 - mu_d_c) - p_c * btx)
                vrows = (
                    vwork.groupBy(*group_cols)
                    .agg(
                        F.sum(
                            b_c * (1.0 - p_c)
                            * F.pow((y_c - mu_i_c) / p_c + bx, F.lit(2.0))
                        ).alias("vb_i"),
                        F.sum(a_c * d_c * p_c * bx).alias("za1"),
                        F.sum(a_c * F.pow(d_c * p_c * bx, F.lit(2.0)))
                        .alias("za2"),
                        F.sum(
                            b_c * (1.0 - p_c)
                            * F.pow(
                                (y_c - m_c2) / p_c + btx + bbo * (y_c - m_c2),
                                F.lit(2.0),
                            )
                        ).alias("vb_d"),
                        F.sum(a_c * zdr).alias("zd1"),
                        F.sum(a_c * F.pow(zdr, F.lit(2.0))).alias("zd2"),
                    )
                    .collect()
                )
                for r in vrows:
                    key = tuple(r[c] for c in group_cols)
                    if key not in folded:
                        continue
                    er = est_rows[key]
                    na = float(er["na"])
                    mu_i, mu_d = out[key][0], out[key][2]

                    def _wr(s1, s2):
                        return na / (na - 1.0) * (s2 - s1 * s1 / na)

                    v_i = max(
                        (float(r["vb_i"] or 0.0)
                         + _wr(float(r["za1"] or 0.0), float(r["za2"] or 0.0)))
                        / float(er["sinv"]) ** 2,
                        0.0,
                    )
                    v_d = max(
                        (float(r["vb_d"] or 0.0)
                         + _wr(float(r["zd1"] or 0.0), float(r["zd2"] or 0.0)))
                        / float(er["nhat"]) ** 2,
                        0.0,
                    )
                    out[key] = (mu_i, float(np.sqrt(v_i)), mu_d,
                                float(np.sqrt(v_d)))
    finally:
        base.unpersist()
    return out

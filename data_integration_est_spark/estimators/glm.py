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
from data_integration_est_spark.util import local_df


def _sandwich(A: np.ndarray, M: np.ndarray, factor: float = 1.0) -> np.ndarray:
    """factor * A^{-1} M A^{-1} diag, via solves (no explicit inverse).
    The element path passes factor = n/(n-1) with uncentered M; the PSU
    path passes factor = 1 (its M is already per-stratum df-corrected)."""
    X = np.linalg.solve(A, M)
    V = factor * np.linalg.solve(A, X.T).T
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
    solvers' degenerate-key convention).

    Cluster designs (``psu_col``, r15): coefficients are unchanged
    (the weighted fit), and M becomes the per-stratum df-corrected
    centered second moment of the weighted PSU score totals — the
    cluster-robust (CR0-with-df) sandwich, matching the element path
    in the every-element-its-own-PSU limit (where Σwş ≈ 0 at
    convergence makes centering a no-op).  Stratified element designs
    (``strata_col`` alone, r15) get the same per-stratum df-corrected
    centered moments with elements as the first-stage units —
    previously strata were silently ignored.  A stratum with a single
    sampled unit yields NULL SEs for that group (the NaN variance
    convention); calibrated + psu refuses loudly.  ``fpc_col`` (r16 —
    previously silently ignored here, ADVICE r15 #1): each stratum's M
    contribution is scaled by the same (1 - n_h/N_h) factor the moment
    kernels apply (PSU-population counts under ``psu_col``, element
    counts under ``strata_col`` alone); a census stratum contributes
    zero variance and is exempt from the lonely-unit NaN rule."""
    f = Formula.parse(formula) if isinstance(formula, str) else formula
    group_cols = list(group_cols or [])
    xs = list(f.predictors)
    psu = design.psu_col
    strat = design.strata_col
    if psu:
        from data_integration_est_spark.kernels.stats import (
            _psu_refuses_calibration)
        _psu_refuses_calibration(design, "svyglm")
    df = design.df.na.drop(
        subset=[f.response, design.weight_col] + xs + group_cols
        + ([psu] if psu else []) + ([strat] if strat else [])
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

    if psu or strat:
        # design-robust sandwich (r15): M is the per-stratum
        # df-corrected centered second moment of the weighted score
        # TOTALS of the first-stage sampling units — PSUs when
        # ``psu_col`` is set (the survey first-stage with-replacement
        # linearization; TWO-LEVEL aggregation: (group, stratum, PSU)
        # grain builds score totals + A partials, one more groupBy
        # collapses to (group, stratum)), ELEMENTS when only
        # ``strata_col`` is set (stratified element sampling; ONE
        # aggregation at (group, stratum) grain, uu = Σ w²s s' —
        # previously strata were silently ignored here).  Either way
        # O(groups × strata × k²) driver scalars.
        hcols = [strat] if strat else []
        fpc = design.fpc_col
        if psu:
            l1 = [F.count(F.lit(1)).alias("n_el")]
            for i in range(k):
                l1.append(F.sum(w * resid * xcols[i]).alias(f"u_{i}"))
                for j in range(i, k):
                    l1.append(
                        F.sum(a_w * xcols[i] * xcols[j]).alias(f"a_{i}_{j}")
                    )
            if fpc:
                l1.append(F.max(F.col(fpc).cast("double")).alias("__N__"))
            lvl1 = work.groupBy(*group_cols, *hcols, psu).agg(*l1)
            l2 = [
                F.count(F.lit(1)).alias("n_psu"),
                F.sum("n_el").alias("n_el"),
            ]
            for i in range(k):
                l2.append(F.sum(F.col(f"u_{i}")).alias(f"s_{i}"))
                for j in range(i, k):
                    l2.append(F.sum(F.col(f"a_{i}_{j}")).alias(f"a_{i}_{j}"))
                    l2.append(
                        F.sum(F.col(f"u_{i}") * F.col(f"u_{j}"))
                        .alias(f"uu_{i}_{j}")
                    )
            if fpc:
                l2.append(F.max("__N__").alias("__N__"))
            collected = lvl1.groupBy(*group_cols, *hcols).agg(*l2).collect()
        else:
            le = [F.count(F.lit(1)).alias("n_psu")]
            for i in range(k):
                le.append(F.sum(w * resid * xcols[i]).alias(f"s_{i}"))
                for j in range(i, k):
                    le.append(
                        F.sum(a_w * xcols[i] * xcols[j]).alias(f"a_{i}_{j}")
                    )
                    le.append(
                        F.sum(w * w * resid * resid * xcols[i] * xcols[j])
                        .alias(f"uu_{i}_{j}")
                    )
            if fpc:
                le.append(F.max(F.col(fpc).cast("double")).alias("__N__"))
            collected = work.groupBy(*group_cols, *hcols).agg(*le).collect()
        # domain estimation: d.o.f. uses the FULL-design unit count per
        # stratum (units with no in-group rows contribute zero scores)
        full_psu_n = None
        if group_cols:
            unit_cnt = (
                F.countDistinct(F.col(psu)) if psu else F.count(F.lit(1))
            )
            cnt = df.groupBy(*hcols).agg(unit_cnt.alias("__n__")).collect()
            full_psu_n = {
                (r[strat] if strat else None): int(r["__n__"]) for r in cnt
            }
        by_key = {}
        for r in collected:
            by_key.setdefault(tuple(r[c] for c in group_cols), []).append(r)
    else:
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
        beta = np.asarray(fit.coef_for(key), dtype=float)
        if key in degenerate or not np.all(np.isfinite(beta)):
            for t in terms:
                out_rows.append(tuple(key) + (t, None, None))
            continue
        A = np.zeros((k, k))
        M = np.zeros((k, k))
        if psu or strat:
            from data_integration_est_spark.kernels.stats import _fpc_factor

            rows = by_key[key]
            bad = False
            for r in rows:
                hval = r[strat] if strat else None
                n_h = (full_psu_n[hval] if full_psu_n is not None
                       else int(r["n_psu"]))
                # fpc (r16, ADVICE r15 #1): same per-stratum SRS-WOR
                # factor the moment kernels apply — N_h is the PSU
                # population count under psu_col, the element count
                # under strata_col alone; a census stratum contributes
                # zero variance regardless of its d.o.f.
                f_h = _fpc_factor(
                    n_h, float(r["__N__"]) if design.fpc_col else None
                )
                if n_h < 2 and f_h != 0.0:
                    bad = True
                    break
                S = np.array([float(r[f"s_{i}"] or 0.0) for i in range(k)])
                UU = np.zeros((k, k))
                for i in range(k):
                    for j in range(i, k):
                        UU[i, j] = UU[j, i] = float(r[f"uu_{i}_{j}"] or 0.0)
                        A[i, j] = float(A[i, j]) + float(r[f"a_{i}_{j}"] or 0.0)
                        A[j, i] = A[i, j]
                if f_h != 0.0:
                    M += f_h * n_h / (n_h - 1.0) * (UU - np.outer(S, S) / n_h)
            if bad:
                # lonely-PSU stratum: the point fit stands, the
                # first-stage variance is undefined (NaN convention)
                for t, b in zip(terms, beta):
                    out_rows.append(tuple(key) + (t, round(float(b), 6), None))
                continue
            se = _sandwich(A, M)
        else:
            r = by_key[key]
            n = float(r["n"])
            for i in range(k):
                for j in range(i, k):
                    A[i, j] = A[j, i] = float(r[f"a_{i}_{j}"] or 0.0)
                    M[i, j] = M[j, i] = float(r[f"m_{i}_{j}"] or 0.0)
            se = _sandwich(A, M, n / (n - 1.0))
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
    return local_df(spark, sorted(out_rows, key=lambda t: tuple(
        map(str, t[:len(group_cols)]))), schema)

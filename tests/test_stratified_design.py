"""Stratified-design variance (``svydesign(ids=~1, strata=~h)``) and the
nb[12] stratified Monte Carlo study.

The reference itself only ever constructs ``ids=~1`` designs
(``RegDI2.R:181-185``), so the strata slot is an engine extension; its
linearization is pinned against a direct numpy implementation of the
survey-package formula V = Σ_h n_h/(n_h-1) Σ_{i∈h} (u_i - ū_h)².
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import montecarlo as mc
from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.linalg import calibrate
from data_integration_est_spark.kernels.stats import svymean, svytotal


@pytest.fixture(scope="module")
def strat_df(spark):
    rng = np.random.default_rng(7)
    n = 400
    h = rng.integers(0, 3, n)
    y = rng.normal(5 + h, 1.0)
    w = rng.uniform(1, 4, n)
    x = rng.normal(0, 1, n)
    rows = [
        (int(h[i]), float(y[i]), float(w[i]), float(x[i]), 1.0)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "h int, y double, w double, x double, uno double")
    return df, h, y, w, x


def _np_strat_var(u, h):
    v = 0.0
    for s in np.unique(h):
        m = h == s
        nh = int(m.sum())
        v += nh / (nh - 1) * ((u[m] ** 2).sum() - u[m].sum() ** 2 / nh)
    return v


def test_svymean_stratified_matches_numpy(strat_df):
    df, h, y, w, x = strat_df
    des = SurveyDesign(df=df, weight_col="w", strata_col="h")
    est = svymean(des, "y")[0]
    m = (w * y).sum() / w.sum()
    u = w * (y - m) / w.sum()
    assert abs(est.estimate - m) < 1e-9
    assert abs(est.variance - _np_strat_var(u, h)) < 1e-9


def test_svymean_unstratified_unchanged(strat_df):
    df, h, y, w, x = strat_df
    e0 = svymean(SurveyDesign(df=df, weight_col="w"), "y")[0]
    m = (w * y).sum() / w.sum()
    u = w * (y - m) / w.sum()
    n = len(y)
    v0 = n / (n - 1) * ((u ** 2).sum() - u.sum() ** 2 / n)
    assert abs(e0.variance - v0) < 1e-9


def test_svytotal_stratified_matches_numpy(strat_df):
    df, h, y, w, x = strat_df
    t = svytotal(SurveyDesign(df=df, weight_col="w", strata_col="h"), "y")[0]
    z = w * y
    assert abs(t.estimate - z.sum()) < 1e-6
    assert abs(t.variance - _np_strat_var(z, h)) < 1e-5 * abs(t.variance)


def test_svymean_calibrated_stratified(strat_df):
    """Calibrated + stratified: residual projection B is global, variance
    sums per stratum — numpy replica of survey's calibrate + strata."""
    df, h, y, w, x = strat_df
    X = np.column_stack([np.ones_like(x), x])
    T = np.array([450.0, 10.0])
    G = (X * w[:, None]).T @ X
    lam = np.linalg.solve(G, T - (w[:, None] * X).sum(axis=0))
    wc = w * (1.0 + X @ lam)

    cal = calibrate(df, ["uno", "x"], {"uno": 450.0, "x": 10.0}, d_col="w",
                    out_col="wc")
    des = SurveyDesign(df=cal.df, weight_col="wc", calibration_cols=["uno", "x"],
                       base_weight_col="w", strata_col="h")
    est = svymean(des, "y")[0]

    m = (wc * y).sum() / wc.sum()
    B = np.linalg.solve((X * w[:, None]).T @ X, (X * w[:, None]).T @ (y - m))
    e = y - m - X @ B
    u = wc * e / wc.sum()
    assert abs(est.estimate - m) < 1e-9
    assert abs(est.variance - _np_strat_var(u, h)) < 1e-9 * max(1.0, est.variance)


def test_stratified_study_golden_bands(spark):
    """nb[12] golden bands, scaled to test size: RegDI bias ~ 0 with SE
    whose sqrt(n_A)-scaled value lands on the reference's 0.024; the
    naive B mean shows the stratum-selection bias; scenario II RegDI
    stays unbiased for the clean mean (calibrating to the proxy total
    does not bias the calibrated mean of y_A)."""
    res = mc.run_stratified_study(
        spark, N=8_000, n_sim=5, n_A_total=400, n_B_total=2_400, seed=123
    )
    rows = {r["estimator"]: r for r in res.summary.collect()}

    for est in ("RegDI", "RegDI_X1", "RegDI_II", "RegDI_X1_II"):
        assert abs(rows[est]["bias_mean"]) < 0.06, (est, rows[est])
    # reference SE 0.024 at n_A=2000 -> x sqrt(2000/400) ~ 0.054 here
    scaled_se = rows["RegDI"]["bias_sd"] * (400 / 2000) ** 0.5
    assert 0.012 < scaled_se < 0.04, scaled_se
    # the selection bias the integration estimators remove (golden -0.056)
    assert rows["Mean_S_B"]["bias_mean"] < -0.02
    # scenario II: naive proxy mean ~ 3x the y-selection bias
    assert rows["Mean_S_B_II"]["bias_mean"] < -0.05
    # PC scenario 2 with stratum-only calibration reproduces the +1.83
    # value the reference's scenario-II table records
    assert 1.5 < rows["PC_X1_II"]["bias_mean"] < 2.2
    # design-weighted A mean is unbiased
    assert abs(rows["Mean_S_A"]["bias_mean"]) < 0.06


def test_nb13_rich_aux_scenario2_deviation(spark):
    """Pins the documented nb[13] deviation (run_stratified_study
    docstring, montecarlo.py): the reference notebook's table prints
    +0.284 for its rich-aux scenario-II PC call (nb[13]:41-59: two-table,
    aux = x_i + z_i + stratum, weights_A = d_i_A, y_i ~ tilde_y_i), but
    from the COMMITTED generator semantics that call is near-unbiased
    (~+0.04) — the large +1.83 arises only under stratum-ONLY
    calibration, which is exactly what the reference's scenario-II table
    row reproduces.  Assert both ends of the contrast so neither can
    silently drift."""
    from data_integration_est_spark import pc_estimator
    from data_integration_est_spark.generators import (
        generate_population_stratified,
    )

    rich, strat_only = [], []
    for seed in (11, 12, 13):
        pop = generate_population_stratified(
            spark, N=20_000, n_A_total=400, n_B_total=6_000, seed=seed
        ).persist()
        pop.count()
        data_A = pop.filter(F.col("ind_A") == 1).select(
            "id", "x_i", "z_i", "stratum", "y_i", "d_i_A"
        )
        data_B = pop.filter(F.col("ind_B") == 1).select(
            "id", "x_i", "z_i", "stratum", "tilde_y_i"
        )
        common = dict(
            data_A=data_A, data_B=data_B, id_var_A="id", id_var_B="id",
            y_A_col="y_i", y_B_col="tilde_y_i", weights_A="d_i_A",
            scenario=2, outcome_model="y_i ~ tilde_y_i",
        )
        rich.append(
            pc_estimator(aux_vars=["x_i", "z_i", "stratum"], **common).estimate
        )
        strat_only.append(pc_estimator(aux_vars=["stratum"], **common).estimate)
        pop.unpersist()

    bias_rich = sum(rich) / len(rich) - 7.5
    bias_strat = sum(strat_only) / len(strat_only) - 7.5
    # rich aux: near-unbiased (engine value ~ +0.04; generous MC band at
    # 3 seeds x n_A=400, but far below both +0.284 and +1.83)
    assert -0.2 < bias_rich < 0.2, (bias_rich, rich)
    # stratum-only: reproduces the +1.83 the reference table prints
    assert 1.4 < bias_strat < 2.3, (bias_strat, strat_only)


def test_fpc_scales_variance_by_1_minus_f(spark):
    """r7: svydesign(fpc=~N) — the SRS-WOR correction scales every
    variance by exactly (1 - n/N) in the unstratified case, per stratum
    otherwise; a census stratum contributes zero."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_integration_est_spark.design import SurveyDesign
    from data_integration_est_spark.kernels.stats import (
        svymean, svyratio, svytotal, svyvar,
    )

    rng = np.random.RandomState(5)
    n = 400
    rows = [
        (i, float(rng.normal(10, 2)), 1.0 + i % 3, float(1 + (i % 4)))
        for i in range(n)
    ]
    df = (
        spark.createDataFrame(rows, "id long, y double, w double, x double")
        .withColumn("N", F.lit(1000.0))
    )
    plain = SurveyDesign(df=df, weight_col="w")
    fpcd = SurveyDesign(df=df, weight_col="w", fpc_col="N")
    f = 1.0 - n / 1000.0
    for fn, kw in [
        (svymean, {}), (svytotal, {}), (svyvar, {}),
        (svyratio, {"den_col": "x"}),
    ]:
        args = ("y", kw["den_col"]) if kw else ("y",)
        a = fn(plain, *args)[0]
        b = fn(fpcd, *args)[0]
        assert b.estimate == a.estimate
        assert b.variance == pytest.approx(f * a.variance, rel=1e-12), fn

    # stratified: per-stratum factors; census stratum contributes zero
    sdf = df.withColumn("h", (F.col("id") % 2).cast("long")).withColumn(
        "N", F.when(F.col("h") == 0, 200.0).otherwise(1e12)
    )
    s_plain = SurveyDesign(df=sdf, weight_col="w", strata_col="h")
    s_fpc = SurveyDesign(df=sdf, weight_col="w", strata_col="h", fpc_col="N")
    a = svymean(s_plain, "y")[0]
    b = svymean(s_fpc, "y")[0]
    assert b.variance < a.variance  # stratum 0 damped by (1 - 200/200...)
    # census everywhere -> zero variance
    census = SurveyDesign(
        df=sdf.withColumn("N", F.lit(float(n // 2))), weight_col="w",
        strata_col="h", fpc_col="N",
    )
    c = svymean(census, "y")[0]
    assert c.variance == 0.0

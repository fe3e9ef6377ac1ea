import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels import (
    CalibrationError,
    calibrate,
    fit_logistic,
    fit_ols,
    gram_aggregate,
    svymean,
    svytotal,
)

import oracle_np


@pytest.fixture(scope="module")
def small_df(spark):
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "g": rng.integers(0, 3, n),
            "x1": rng.normal(2, 1, n),
            "x2": rng.integers(0, 2, n).astype(float),
            "y": rng.normal(0, 1, n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = 1.5 + 0.8 * pdf.x1 - 0.3 * pdf.x2 + pdf.y
    return spark.createDataFrame(pdf), pdf


def test_gram_matches_numpy(small_df):
    df, pdf = small_df
    g = gram_aggregate(df, ["x1", "x2"], y_cols=["y"], weight_col="w")
    X = pdf[["x1", "x2"]].to_numpy()
    w = pdf["w"].to_numpy()
    expected = (X * w[:, None]).T @ X
    np.testing.assert_allclose(g.gram[0], expected, rtol=1e-10)
    np.testing.assert_allclose(g.xy[0, :, 0], (X * w[:, None]).T @ pdf["y"].to_numpy(), rtol=1e-10)


def test_gram_grouped(small_df):
    df, pdf = small_df
    g = gram_aggregate(df, ["x1"], weight_col="w", group_cols=["g"])
    idx = g.group_index()
    for gv, sub in pdf.groupby("g"):
        expected = float(np.sum(sub.w * sub.x1 * sub.x1))
        np.testing.assert_allclose(g.gram[idx[(gv,)], 0, 0], expected, rtol=1e-10)


def test_calibrate_hits_totals_exactly(small_df):
    df, pdf = small_df
    totals = {"x1": float(pdf.x1.sum() * 1.7), "x2": float(pdf.x2.sum() * 1.7)}
    res = calibrate(df, ["x1", "x2"], totals, d_col="w", out_col="wc")
    got = res.df.selectExpr("sum(wc*x1) as t1", "sum(wc*x2) as t2").collect()[0]
    np.testing.assert_allclose(got["t1"], totals["x1"], rtol=1e-9)
    np.testing.assert_allclose(got["t2"], totals["x2"], rtol=1e-9)
    # matches the numpy closed form
    w_np = oracle_np.greg_calibrate(
        pdf[["x1", "x2"]].to_numpy(), pdf["w"].to_numpy(),
        np.array([totals["x1"], totals["x2"]]),
    )
    w_spark = [r["wc"] for r in res.df.select("id", "wc").orderBy("id").collect()]
    np.testing.assert_allclose(w_spark, w_np, rtol=1e-9)


def test_calibrate_singular_raises(spark):
    pdf = pd.DataFrame({"x1": [1.0, 2.0, 3.0], "x2": [2.0, 4.0, 6.0], "d": [1.0, 1.0, 1.0]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(CalibrationError):
        calibrate(df, ["x1", "x2"], {"x1": 10.0, "x2": 20.0}, d_col="d")


def test_ols_matches_numpy(small_df):
    df, pdf = small_df
    fit = fit_ols(df, "y", ["x1", "x2"], intercept=True)
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    expected = oracle_np.ols(X, pdf.y.to_numpy())
    np.testing.assert_allclose(fit.coef_for(()), expected, rtol=1e-9)


def test_ols_grouped(small_df):
    df, pdf = small_df
    fit = fit_ols(df, "y", ["x1"], intercept=True, group_cols=["g"])
    for gv, sub in pdf.groupby("g"):
        X = np.column_stack([np.ones(len(sub)), sub.x1])
        expected = oracle_np.ols(X, sub.y.to_numpy())
        np.testing.assert_allclose(fit.coef_for((gv,)), expected, rtol=1e-8)


def test_logistic_score_is_zero_at_solution(spark):
    rng = np.random.default_rng(11)
    n = 600
    x = rng.normal(0, 1, n)
    p = 1 / (1 + np.exp(-(0.5 + 1.2 * x)))
    y = (rng.uniform(size=n) < p).astype(float)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    fit = fit_logistic(df, "y", ["x"], intercept=True)
    b = fit.coef_for(())
    # property check (non-circular): score equations sum x*(y-p) == 0
    X = np.column_stack([np.ones(n), x])
    phat = 1 / (1 + np.exp(-(X @ b)))
    score = X.T @ (y - phat)
    np.testing.assert_allclose(score, 0.0, atol=1e-6)
    # and matches an independent IRLS
    np.testing.assert_allclose(b, oracle_np.irls_logistic(X, y), rtol=1e-6)


def test_svytotal_and_svymean_formulas(small_df):
    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    t = svytotal(des, "y")[0]
    z = pdf.w * pdf.y
    n = len(pdf)
    np.testing.assert_allclose(t.estimate, z.sum(), rtol=1e-10)
    np.testing.assert_allclose(t.variance, n / (n - 1) * ((z - z.mean()) ** 2).sum(), rtol=1e-9)

    m = svymean(des, "y")[0]
    m_np, v_np = oracle_np.svymean_var(pdf.y.to_numpy(), pdf.w.to_numpy())
    np.testing.assert_allclose(m.estimate, m_np, rtol=1e-10)
    np.testing.assert_allclose(m.variance, v_np, rtol=1e-9)


def test_svymean_calibrated_variance(small_df):
    df, pdf = small_df
    totals = {"x1": float(pdf.x1.sum() * 1.3), "x2": float(pdf.x2.sum() * 1.3)}
    res = calibrate(df, ["x1", "x2"], totals, d_col="w", out_col="wc")
    des = SurveyDesign(df=res.df, weight_col="wc",
                       calibration_cols=["x1", "x2"], base_weight_col="w")
    m = svymean(des, "y")[0]
    w_np = oracle_np.greg_calibrate(
        pdf[["x1", "x2"]].to_numpy(), pdf.w.to_numpy(),
        np.array([totals["x1"], totals["x2"]]),
    )
    m_np, v_np = oracle_np.svymean_var(
        pdf.y.to_numpy(), w_np, X=pdf[["x1", "x2"]].to_numpy(), d=pdf.w.to_numpy()
    )
    np.testing.assert_allclose(m.estimate, m_np, rtol=1e-9)
    np.testing.assert_allclose(m.variance, v_np, rtol=1e-8)


def test_svymean_grouped_matches_ungrouped(small_df):
    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    rows = {r.key: r for r in svymean(des, "y", group_cols=["g"])}
    for gv, sub in pdf.groupby("g"):
        m_np, v_np = oracle_np.svymean_var(sub.y.to_numpy(), sub.w.to_numpy())
        np.testing.assert_allclose(rows[(gv,)].estimate, m_np, rtol=1e-9)
        np.testing.assert_allclose(rows[(gv,)].variance, v_np, rtol=1e-8)


def test_grouped_fit_degrades_undersized_group_to_nan(spark):
    """One undersized (n < k) group must NOT abort a grouped fit — its
    coefficients go NaN and the key is surfaced on FitResult (the
    reference's guard, RegDI2.R:254-255, is per-call, not per-grid)."""
    rng = np.random.default_rng(5)
    n = 120
    pdf = pd.DataFrame({
        "g": ["big"] * (n - 2) + ["tiny"] * 2,
        "x1": rng.normal(0, 1, n),
        "x2": rng.normal(0, 1, n),
        "y": rng.normal(0, 1, n),
    })
    pdf["y"] = 1.0 + 0.5 * pdf.x1 - 0.25 * pdf.x2 + pdf.y
    pdf["yb"] = (pdf.y > pdf.y.median()).astype(float)
    df = spark.createDataFrame(pdf)

    # 2 rows < 3 design columns (intercept + x1 + x2)
    fit = fit_ols(df, "y", ["x1", "x2"], intercept=True, group_cols=["g"])
    assert fit.degenerate_keys == (("tiny",),)
    assert np.isnan(fit.coef_for(("tiny",))).all()
    sub = pdf[pdf.g == "big"]
    X = np.column_stack([np.ones(len(sub)), sub.x1, sub.x2])
    np.testing.assert_allclose(
        fit.coef_for(("big",)), oracle_np.ols(X, sub.y.to_numpy()), rtol=1e-8
    )

    lfit = fit_logistic(df, "yb", ["x1", "x2"], intercept=True, group_cols=["g"])
    assert lfit.degenerate_keys == (("tiny",),)
    assert np.isnan(lfit.coef_for(("tiny",))).all()
    assert np.isfinite(lfit.coef_for(("big",))).all()

    # ungrouped fits keep the fatal reference behavior
    tiny = spark.createDataFrame(pdf[pdf.g == "tiny"])
    with pytest.raises(CalibrationError):
        fit_ols(tiny, "y", ["x1", "x2"], intercept=True)
    with pytest.raises(CalibrationError):
        fit_logistic(tiny, "yb", ["x1", "x2"], intercept=True)


def test_weighted_mean_grouped_all_null_group_is_nan(spark):
    """An all-NULL y group yields NaN (not TypeError) — parity with the
    sibling grouped estimators' null handling (ADVICE r02)."""
    from data_integration_est_spark.estimators.vectorized import weighted_mean_grouped

    df = spark.createDataFrame(
        [("a", 1.0, 1.0, 1), ("a", 3.0, 1.0, 1), ("b", None, 1.0, 1)],
        "g string, y double, w double, s int",
    )
    out = weighted_mean_grouped(df, "y", "s", "w", ["g"])
    assert out[("a",)][0] == pytest.approx(2.0)
    assert np.isnan(out[("b",)][0])


def test_svyratio_formula_and_groups(small_df):
    from data_integration_est_spark.kernels.stats import svyratio

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    # denominator: positive covariate x1 (+3 to keep it well away from 0)
    df3 = df.withColumn("xden", F.col("x1") + 3.0)
    des = SurveyDesign(df=df3, weight_col="w")
    r = svyratio(des, "y", "xden")[0]
    w, y, x = pdf.w.to_numpy(), pdf.y.to_numpy(), pdf.x1.to_numpy() + 3.0
    R = (w * y).sum() / (w * x).sum()
    u = w * (y - R * x) / (w * x).sum()
    n = len(w)
    v = n / (n - 1) * ((u - u.mean()) ** 2).sum()
    np.testing.assert_allclose(r.estimate, R, rtol=1e-10)
    np.testing.assert_allclose(r.variance, v, rtol=1e-9)

    # grouped: each group independently equals the filtered scalar call
    got = {e.key[0]: e for e in svyratio(des, "y", "xden", group_cols=["g"])}
    for g in sorted(pdf.g.unique()):
        m = pdf.g.to_numpy() == g
        Rg = (w[m] * y[m]).sum() / (w[m] * x[m]).sum()
        np.testing.assert_allclose(got[g].estimate, Rg, rtol=1e-10)


def test_svyratio_zero_denominator_nan(small_df):
    from data_integration_est_spark.kernels.stats import svyratio

    df, _ = small_df
    z = df.withColumn("zero", F.lit(0.0))
    des = SurveyDesign(df=z, weight_col="w")
    r = svyratio(des, "y", "zero")[0]
    assert np.isnan(r.estimate)


def test_svychisq_matches_numpy(small_df):
    from data_integration_est_spark.kernels.stats import svychisq_pearson, svytable

    df, pdf = small_df
    df2 = df.withColumn("r", (F.col("g") % 2).cast("string")).withColumn(
        "c", F.col("x2").cast("int").cast("string")
    )
    des = SurveyDesign(df=df2, weight_col="w")
    x2, dof, n = svychisq_pearson(des, "r", "c")
    # independent numpy reference
    import numpy as _np

    pr = pdf.assign(r=(pdf.g % 2).astype(str), c=pdf.x2.astype(int).astype(str))
    W = pr.w.sum()
    tab = pr.groupby(["r", "c"]).w.sum()
    rw = pr.groupby("r").w.sum()
    cw = pr.groupby("c").w.sum()
    want = 0.0
    for (r, c), ws in tab.items():
        p, e = ws / W, (rw[r] / W) * (cw[c] / W)
        want += (p - e) ** 2 / e
    want *= len(pr)
    assert x2 == pytest.approx(want, rel=1e-9)
    assert dof == (len(rw) - 1) * (len(cw) - 1)
    assert n == len(pr)
    # svytable totals agree with pandas
    tt = {(r0["r"], r0["c"]): r0["wsum"] for r0 in svytable(des, "r", "c").collect()}
    for k, v in tab.items():
        assert tt[k] == pytest.approx(v, rel=1e-9)


def test_svychisq_absent_cell_term(spark):
    from data_integration_est_spark.kernels.stats import svychisq_pearson

    # 2x2 with one structurally empty cell
    rows = [("a", "x", 2.0)] * 10 + [("a", "y", 1.0)] * 10 + [("b", "x", 1.0)] * 10
    df = spark.createDataFrame(rows, "r string, c string, w double")
    des = SurveyDesign(df=df, weight_col="w")
    x2, dof, n = svychisq_pearson(des, "r", "c")
    W = 40.0
    rw = {"a": 30.0, "b": 10.0}; cw = {"x": 30.0, "y": 10.0}
    cellws = {("a","x"):20.0, ("a","y"):10.0, ("b","x"):10.0}
    want = 0.0
    for r in rw:
        for c in cw:
            p = cellws.get((r, c), 0.0) / W
            e = (rw[r]/W)*(cw[c]/W)
            want += (p-e)**2/e
    want *= 30
    assert x2 == pytest.approx(want, rel=1e-12)
    assert dof == 1 and n == 30


def test_svyratio_stratified_matches_numpy(small_df):
    from data_integration_est_spark.kernels.stats import svyratio

    df, pdf = small_df
    df3 = df.withColumn("xden", F.col("x1") + 3.0)
    des = SurveyDesign(df=df3, weight_col="w", strata_col="g")
    r = svyratio(des, "y", "xden")[0]
    w, y, x = pdf.w.to_numpy(), pdf.y.to_numpy(), pdf.x1.to_numpy() + 3.0
    g = pdf.g.to_numpy()
    R = (w * y).sum() / (w * x).sum()
    u = w * (y - R * x) / (w * x).sum()
    v = 0.0
    for h in np.unique(g):
        m = g == h
        n_h = int(m.sum())
        v += n_h / (n_h - 1) * ((u[m] ** 2).sum() - u[m].sum() ** 2 / n_h)
    np.testing.assert_allclose(r.estimate, R, rtol=1e-10)
    np.testing.assert_allclose(r.variance, v, rtol=1e-9)


def test_calibrate_bounded_matches_numpy_and_bounds(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_bounded

    df, pdf = small_df
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.to_numpy()])
    d = pdf.w.to_numpy()
    # totals pushed away from the HT estimate so some units must clip
    T = np.array([(d * X[:, 0]).sum() * 1.15, (d * X[:, 1]).sum() * 1.25])
    L, U = 0.7, 1.4

    res = calibrate_bounded(
        df.withColumn("one", F.lit(1.0)), ["one", "x1"], T, d_col="w",
        bounds=(L, U),
    )
    out = res.df.select("one", "x1", "w", "w_cal").toPandas()
    g = out.w_cal.to_numpy() / out.w.to_numpy()
    assert g.min() >= L - 1e-12 and g.max() <= U + 1e-12
    # calibration equations hold exactly
    Xo = np.column_stack([out.one.to_numpy(), out.x1.to_numpy()])
    np.testing.assert_allclose(Xo.T @ out.w_cal.to_numpy(), T, rtol=1e-10)

    # independent numpy replay of the sticky truncated-GREG iteration
    state = np.zeros(len(d))
    lam = np.zeros(2)
    prev = -1
    for _ in range(10):
        free = state == 0
        wc = np.where(state == 1, U * d, np.where(state == -1, L * d, 0.0))
        G = (X[free] * d[free, None]).T @ X[free]
        h = (d[free, None] * X[free]).sum(0)
        c = (wc[~free, None] * X[~free]).sum(0) if (~free).any() else np.zeros(2)
        lam = np.linalg.solve(G, T - c - h)
        gg = 1 + X @ lam
        state = np.where(state != 0, state, np.where(gg > U, 1, np.where(gg < L, -1, 0)))
        n_clip = int((state != 0).sum())
        if n_clip == prev:
            break
        prev = n_clip
    w_np = np.where(state == 1, U * d, np.where(state == -1, L * d, d * (1 + X @ lam)))
    # align by row (toPandas preserves order of the small collected frame)
    np.testing.assert_allclose(np.sort(out.w_cal.to_numpy()), np.sort(w_np), rtol=1e-9)


def test_calibrate_bounded_validates_bounds(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_bounded

    df, _ = small_df
    with pytest.raises(CalibrationError, match="straddle"):
        calibrate_bounded(df, ["x1"], [1.0], d_col="w", bounds=(1.1, 2.0))


def test_calibrate_bounded_unbounded_case_matches_plain(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_bounded

    df, pdf = small_df
    d = pdf.w.to_numpy()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.to_numpy()])
    T = np.array([(d * X[:, 0]).sum() * 1.01, (d * X[:, 1]).sum() * 1.01])
    wide = calibrate_bounded(
        df.withColumn("one", F.lit(1.0)), ["one", "x1"], T, d_col="w",
        bounds=(0.01, 100.0),
    )
    plain = calibrate(
        df.withColumn("one", F.lit(1.0)), ["one", "x1"], T, d_col="w",
    )
    a = sorted(r["w_cal"] for r in wide.df.select("w_cal").collect())
    b = sorted(r["w_cal"] for r in plain.df.select("w_cal").collect())
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_calibrate_bounded_grouped_matches_per_group_runs(small_df):
    """r6: grouped bounded calibration (one groupBy pass + stacked solve
    per wave) must reproduce the per-group ungrouped runs exactly."""
    from data_integration_est_spark.kernels.linalg import calibrate_bounded

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    # per-group totals pushed off the HT estimate so clip waves differ
    # between groups
    totals_by_group = {}
    for gval, sub in pdf.groupby("g"):
        d = sub.w.to_numpy()
        x = sub.x1.to_numpy()
        totals_by_group[(gval,)] = np.array(
            [d.sum() * 1.1, (d * x).sum() * 1.2]
        )
    res = calibrate_bounded(
        dfx, ["one", "x1"], None, d_col="w", bounds=(0.7, 1.4),
        group_cols=["g"], totals_by_group=totals_by_group,
        state_col="st",
    )
    got = res.df.select("g", "x1", "w", "w_cal", "st").toPandas()
    assert res.keys == sorted(totals_by_group)
    for gval in sorted(pdf.g.unique()):
        single = calibrate_bounded(
            dfx.filter(F.col("g") == gval), ["one", "x1"],
            totals_by_group[(gval,)], d_col="w", bounds=(0.7, 1.4),
            state_col="st",
        )
        want = single.df.select("x1", "w", "w_cal", "st").toPandas()
        sub = got[got.g == gval]
        np.testing.assert_allclose(
            np.sort(sub.w_cal.to_numpy()), np.sort(want.w_cal.to_numpy()),
            rtol=1e-9,
        )
        assert sorted(sub.st) == sorted(want.st)
        # calibration equations hold per group on the free+clipped mix
        T = totals_by_group[(gval,)]
        X = np.column_stack([np.ones(len(sub)), sub.x1.to_numpy()])
        np.testing.assert_allclose(X.T @ sub.w_cal.to_numpy(), T, rtol=1e-9)


def test_calibrate_bounded_grouped_shared_totals_and_bounds(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_bounded

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    d = pdf.w.to_numpy()
    # shared totals: scaled GLOBAL sums split per group is wrong — use a
    # mild inflation each group can absorb within wide bounds
    per_g = {
        (g,): np.array([sub.w.sum() * 1.05,
                        (sub.w * sub.x1).sum() * 1.05])
        for g, sub in pdf.groupby("g")
    }
    res = calibrate_bounded(
        dfx, ["one", "x1"], None, d_col="w", bounds=(0.5, 2.0),
        group_cols=["g"], totals_by_group=per_g,
    )
    out = res.df.select("g", "w", "w_cal").toPandas()
    g_ratio = out.w_cal / out.w
    assert g_ratio.min() >= 0.5 - 1e-12 and g_ratio.max() <= 2.0 + 1e-12


def test_calibrate_raking_hits_totals_positive_weights(small_df):
    """r6: calfun='raking' — exponential tilt hits the totals exactly
    with strictly positive weights, matching a numpy Newton replay."""
    from data_integration_est_spark.kernels.linalg import calibrate_raking

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    d = pdf.w.to_numpy()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.to_numpy()])
    T = np.array([(d * X[:, 0]).sum() * 1.2, (d * X[:, 1]).sum() * 1.35])

    res = calibrate_raking(dfx, ["one", "x1"], T, d_col="w")
    out = res.df.select("one", "x1", "w", "w_cal").toPandas()
    Xo = np.column_stack([out.one.to_numpy(), out.x1.to_numpy()])
    np.testing.assert_allclose(Xo.T @ out.w_cal.to_numpy(), T, rtol=1e-9)
    assert (out.w_cal > 0).all()

    # numpy Newton replay
    lam = np.zeros(2)
    for _ in range(8):
        w = d * np.exp(X @ lam)
        r = T - X.T @ w
        J = (X * w[:, None]).T @ X
        step = np.linalg.solve(J, r)
        lam = lam + step
        if np.max(np.abs(step)) < 1e-10:
            break
    w_np = d * np.exp(X @ lam)
    np.testing.assert_allclose(
        np.sort(out.w_cal.to_numpy()), np.sort(w_np), rtol=1e-9)
    np.testing.assert_allclose(res.lambda_for(()), lam, rtol=1e-9)


def test_calibrate_raking_grouped_matches_per_group(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_raking

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    per_g = {}
    for gval, sub in pdf.groupby("g"):
        d = sub.w.to_numpy()
        x = sub.x1.to_numpy()
        per_g[(gval,)] = np.array([d.sum() * 1.15, (d * x).sum() * 1.25])
    res = calibrate_raking(
        dfx, ["one", "x1"], None, d_col="w", group_cols=["g"],
        totals_by_group=per_g,
    )
    got = res.df.select("g", "x1", "w", "w_cal").toPandas()
    for gval in sorted(pdf.g.unique()):
        single = calibrate_raking(
            dfx.filter(F.col("g") == gval), ["one", "x1"],
            per_g[(gval,)], d_col="w",
        )
        want = single.df.select("w_cal").toPandas().w_cal.to_numpy()
        sub = got[got.g == gval].w_cal.to_numpy()
        np.testing.assert_allclose(np.sort(sub), np.sort(want), rtol=1e-9)
        # calibration equations per group
        X = np.column_stack([np.ones(len(sub)),
                             got[got.g == gval].x1.to_numpy()])
        np.testing.assert_allclose(X.T @ sub, per_g[(gval,)], rtol=1e-9)


def test_calibrate_raking_validates(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_raking

    df, _ = small_df
    with pytest.raises(CalibrationError, match="expected 2 totals"):
        calibrate_raking(df, ["x1", "x2"], [1.0], d_col="w")
    with pytest.raises(ValueError, match="totals"):
        calibrate_raking(df, ["x1"], None, d_col="w")


def test_svyby_dispatch_matches_direct_calls(small_df):
    from data_integration_est_spark.kernels.stats import svyby, svymean, svytotal

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    got_m = {r["g"]: (r["est"], r["se"], r["n"])
             for r in svyby(des, "g", "y", "mean").collect()}
    want_m = {r.key[0]: (r.estimate, r.se, r.n)
              for r in svymean(des, "y", group_cols=["g"])}
    for g, (e, s, n) in want_m.items():
        assert got_m[g][0] == pytest.approx(e, rel=1e-12)
        assert got_m[g][1] == pytest.approx(s, rel=1e-12)
        assert got_m[g][2] == n
    got_t = {r["g"]: r["est"] for r in svyby(des, "g", "y", "total").collect()}
    want_t = {r.key[0]: r.estimate for r in svytotal(des, "y", group_cols=["g"])}
    for g in want_t:
        assert got_t[g] == pytest.approx(want_t[g], rel=1e-12)
    # quantile passthrough keeps svyquantile's layout
    q = svyby(des, "g", "y", "quantile", qs=(0.5,))
    assert set(q.columns) == {"g", "q", "quantile"}
    with pytest.raises(ValueError, match="unknown stat"):
        svyby(des, "g", "y", "mode")


def test_svyvar_matches_numpy_linearization(small_df):
    from data_integration_est_spark.kernels.stats import svyvar

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    r = svyvar(des, "y")[0]
    y, w = pdf.y.to_numpy(), pdf.w.to_numpy()
    n = len(y)
    m = (w * y).sum() / w.sum()
    V = (w * (y - m) ** 2).sum() / w.sum()
    u = w * ((y - m) ** 2 - V) / w.sum()
    want_var = n / (n - 1) * ((u ** 2).sum() - u.sum() ** 2 / n)
    np.testing.assert_allclose(r.estimate, V, rtol=1e-10)
    np.testing.assert_allclose(r.variance, want_var, rtol=1e-8)
    # grouped
    rows = {g.key: g for g in svyvar(des, "y", group_cols=["g"])}
    for gv, sub in pdf.groupby("g"):
        yv, wv = sub.y.to_numpy(), sub.w.to_numpy()
        mg = (wv * yv).sum() / wv.sum()
        Vg = (wv * (yv - mg) ** 2).sum() / wv.sum()
        np.testing.assert_allclose(rows[(gv,)].estimate, Vg, rtol=1e-10)
    # stratified: per-stratum df-corrected pieces with GLOBAL m, V
    des_s = SurveyDesign(df=df, weight_col="w", strata_col="g")
    rs = svyvar(des_s, "y")[0]
    g = pdf.g.to_numpy()
    u_all = w * ((y - m) ** 2 - V) / w.sum()
    v = 0.0
    for h in np.unique(g):
        mk = g == h
        n_h = int(mk.sum())
        v += n_h / (n_h - 1) * ((u_all[mk] ** 2).sum() - u_all[mk].sum() ** 2 / n_h)
    np.testing.assert_allclose(rs.estimate, V, rtol=1e-10)
    np.testing.assert_allclose(rs.variance, v, rtol=1e-8)


def test_calibrate_logit_hits_totals_within_open_bounds(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_logit

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    d = pdf.w.to_numpy()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1.to_numpy()])
    T = np.array([(d * X[:, 0]).sum() * 1.1, (d * X[:, 1]).sum() * 1.2])
    L, U = 0.5, 2.0
    res = calibrate_logit(dfx, ["one", "x1"], T, d_col="w", bounds=(L, U))
    out = res.df.select("one", "x1", "w", "w_cal").toPandas()
    Xo = np.column_stack([out.one.to_numpy(), out.x1.to_numpy()])
    np.testing.assert_allclose(Xo.T @ out.w_cal.to_numpy(), T, rtol=1e-8)
    g = out.w_cal.to_numpy() / out.w.to_numpy()
    # STRICTLY inside the bounds — the smooth link never pins a weight
    assert g.min() > L and g.max() < U

    # numpy Newton replay of the logit link
    A = (U - L) / ((1 - L) * (U - 1))
    lam = np.zeros(2)
    for _ in range(10):
        e = np.exp(A * (X @ lam))
        gg = (L * (U - 1) + U * (1 - L) * e) / ((U - 1) + (1 - L) * e)
        gp = A * (U - gg) * (gg - L) / (U - L)
        J = (X * (d * gp)[:, None]).T @ X
        r = T - X.T @ (d * gg)
        step = np.linalg.solve(J, r)
        lam = lam + step
        if np.max(np.abs(step)) < 1e-10:
            break
    e = np.exp(A * (X @ lam))
    w_np = d * (L * (U - 1) + U * (1 - L) * e) / ((U - 1) + (1 - L) * e)
    np.testing.assert_allclose(
        np.sort(out.w_cal.to_numpy()), np.sort(w_np), rtol=1e-8)


def test_calibrate_logit_grouped_matches_per_group(small_df):
    """r7: the logit calfun rides the same grouped stacked-solve engine
    as linear/bounded/raking — per-group results must equal running the
    ungrouped solver on each group's slice."""
    from data_integration_est_spark.kernels.linalg import calibrate_logit

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    L, U = 0.5, 2.0
    per_g = {}
    for gval, sub in pdf.groupby("g"):
        d = sub.w.to_numpy()
        x = sub.x1.to_numpy()
        per_g[(gval,)] = np.array([d.sum() * 1.1, (d * x).sum() * 1.15])
    res = calibrate_logit(
        dfx, ["one", "x1"], None, d_col="w", bounds=(L, U),
        group_cols=["g"], totals_by_group=per_g,
    )
    got = res.df.select("g", "x1", "w", "w_cal").toPandas()
    for gval in sorted(pdf.g.unique()):
        single = calibrate_logit(
            dfx.filter(F.col("g") == gval), ["one", "x1"],
            per_g[(gval,)], d_col="w", bounds=(L, U),
        )
        want = single.df.select("w_cal").toPandas().w_cal.to_numpy()
        sub = got[got.g == gval].w_cal.to_numpy()
        np.testing.assert_allclose(np.sort(sub), np.sort(want), rtol=1e-8)
        X = np.column_stack([np.ones(len(sub)),
                             got[got.g == gval].x1.to_numpy()])
        np.testing.assert_allclose(X.T @ sub, per_g[(gval,)], rtol=1e-8)
        ratio = sub / got[got.g == gval].w.to_numpy()
        assert ratio.min() > L and ratio.max() < U


def test_grouped_calibration_plan_depth_constant_in_n_iter(small_df):
    """r7 (r6 verdict item 5): the grouped Newton calfuns rebind their
    per-group lambdas from the ORIGINAL df each iteration, so the output
    plan holds exactly one broadcast join regardless of n_iter."""
    from data_integration_est_spark.kernels.linalg import (
        calibrate_logit,
        calibrate_raking,
    )

    df, pdf = small_df
    dfx = df.withColumn("one", F.lit(1.0))
    per_g = {
        (gval,): np.array([sub.w.sum() * 1.1, (sub.w * sub.x1).sum() * 1.15])
        for gval, sub in pdf.groupby("g")
    }

    def n_joins(res):
        plan = res.df._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Join")

    for fn, kw in [
        (calibrate_raking, {}),
        (calibrate_logit, {"bounds": (0.5, 2.0)}),
    ]:
        shallow = fn(dfx, ["one", "x1"], None, d_col="w", n_iter=2,
                     tol=None, group_cols=["g"], totals_by_group=per_g, **kw)
        deep = fn(dfx, ["one", "x1"], None, d_col="w", n_iter=8,
                  tol=None, group_cols=["g"], totals_by_group=per_g, **kw)
        assert n_joins(shallow) == n_joins(deep) == 1, fn.__name__


def test_calibrate_logit_validates(small_df):
    from data_integration_est_spark.kernels.linalg import calibrate_logit

    df, _ = small_df
    with pytest.raises(CalibrationError, match="straddle"):
        calibrate_logit(df, ["x1"], [1.0], d_col="w", bounds=(1.2, 2.0))
    with pytest.raises(CalibrationError, match="expected 1 totals"):
        calibrate_logit(df, ["x1"], [1.0, 2.0], d_col="w", bounds=(0.5, 2.0))


def test_svyby_var_dispatch(small_df):
    from data_integration_est_spark.kernels.stats import svyby, svyvar

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    got = {r["g"]: (r["est"], r["se"]) for r in svyby(des, "g", "y", "var").collect()}
    want = {r.key[0]: (r.estimate, r.se) for r in svyvar(des, "y", group_cols=["g"])}
    for g, (e, s) in want.items():
        assert got[g][0] == pytest.approx(e, rel=1e-12)
        assert got[g][1] == pytest.approx(s, rel=1e-12)


def test_design_effect_matches_numpy(small_df):
    """r7: DEFF = V_design / V_srs with the documented engine-normative
    SRS denominator; equal weights => deff ~ 1."""
    from data_integration_est_spark.kernels.stats import design_effect

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    r = design_effect(des, "y")[0]
    y, w = pdf.y.to_numpy(), pdf.w.to_numpy()
    n = len(y)
    m = (w * y).sum() / w.sum()
    u = w * (y - m) / w.sum()
    v_design = n / (n - 1) * ((u ** 2).sum() - u.sum() ** 2 / n)
    W = w.sum()
    S2 = ((w * (y - m) ** 2).sum() / W) * (W / (W - 1))
    v_srs = (1 - n / W) * S2 / n
    np.testing.assert_allclose(r.estimate, v_design / v_srs, rtol=1e-9)
    # with-replacement denominator drops the fpc
    r2 = design_effect(des, "y", with_replacement=True)[0]
    np.testing.assert_allclose(r2.estimate, v_design / (S2 / n), rtol=1e-9)
    # equal weights: deff near 1 (exact up to the n/(n-1) vs W/(W-1) df)
    eq = SurveyDesign(df=df.withColumn("w1", F.lit(1.0)), weight_col="w1")
    r3 = design_effect(eq, "y", with_replacement=True)[0]
    assert 0.9 < r3.estimate < 1.1


def test_svytotal_calibrated_variance(small_df):
    """r7: svytotal on a calibrated design linearizes on GREG residuals
    (z = w*e, e = y - x'B over pre-calibration d-weights) — survey
    semantics previously applied only by svymean."""
    from data_integration_est_spark.kernels.stats import svytotal as _svytotal

    df, pdf = small_df
    totals = {"x1": float(pdf.x1.sum() * 1.3), "x2": float(pdf.x2.sum() * 1.3)}
    res = calibrate(df, ["x1", "x2"], totals, d_col="w", out_col="wc")
    des = SurveyDesign(df=res.df, weight_col="wc",
                       calibration_cols=["x1", "x2"], base_weight_col="w")
    t = _svytotal(des, "y")[0]

    w_np = oracle_np.greg_calibrate(
        pdf[["x1", "x2"]].to_numpy(), pdf.w.to_numpy(),
        np.array([totals["x1"], totals["x2"]]),
    )
    y, d = pdf.y.to_numpy(), pdf.w.to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    B = np.linalg.solve((X * d[:, None]).T @ X, (X * d[:, None]).T @ y)
    e = y - X @ B
    z = w_np * e
    n = len(y)
    want_v = n / (n - 1) * float(np.sum((z - z.mean()) ** 2))
    np.testing.assert_allclose(t.estimate, float(np.sum(w_np * y)), rtol=1e-9)
    np.testing.assert_allclose(t.variance, want_v, rtol=1e-8)
    # the residual projection must SHRINK the variance vs ignoring it
    plain = SurveyDesign(df=res.df, weight_col="wc")
    t_plain = _svytotal(plain, "y")[0]
    assert t.variance < t_plain.variance
    # grouped + calibrated path agrees with per-group slices
    rows = {r.key: r for r in _svytotal(des, "y", group_cols=["g"])}
    assert set(rows) == {(g,) for g in pdf.g.unique()}


def test_svycov_matches_numpy_linearization(small_df):
    """r7: design-based covariance functional + linearized SE; the
    svyvar two-variable analogue (svycov(x, x) == svyvar(x))."""
    from data_integration_est_spark.kernels.stats import svycov, svyvar

    df, pdf = small_df
    des = SurveyDesign(df=df, weight_col="w")
    r = svycov(des, "x1", "y")[0]
    x, y, w = pdf.x1.to_numpy(), pdf.y.to_numpy(), pdf.w.to_numpy()
    n = len(y)
    mx = (w * x).sum() / w.sum()
    my = (w * y).sum() / w.sum()
    C = (w * (x - mx) * (y - my)).sum() / w.sum()
    u = w * ((x - mx) * (y - my) - C) / w.sum()
    want_var = n / (n - 1) * ((u ** 2).sum() - u.sum() ** 2 / n)
    np.testing.assert_allclose(r.estimate, C, rtol=1e-10)
    np.testing.assert_allclose(r.variance, want_var, rtol=1e-8)
    # diagonal consistency with svyvar
    rv = svyvar(des, "y")[0]
    rc = svycov(des, "y", "y")[0]
    np.testing.assert_allclose(rc.estimate, rv.estimate, rtol=1e-10)
    np.testing.assert_allclose(rc.variance, rv.variance, rtol=1e-8)
    # grouped
    rows = {g.key: g for g in svycov(des, "x1", "y", group_cols=["g"])}
    for gv, sub in pdf.groupby("g"):
        xv, yv, wv = sub.x1.to_numpy(), sub.y.to_numpy(), sub.w.to_numpy()
        mxg = (wv * xv).sum() / wv.sum()
        myg = (wv * yv).sum() / wv.sum()
        Cg = (wv * (xv - mxg) * (yv - myg)).sum() / wv.sum()
        np.testing.assert_allclose(rows[(gv,)].estimate, Cg, rtol=1e-10)


def test_svycov_stratified_and_fpc(small_df):
    """r7: svycov's stratified pieces (global mx/my/C, per-stratum df
    correction) and the fpc scaling, against a direct numpy replay."""
    from data_integration_est_spark.kernels.stats import svycov

    df, pdf = small_df
    sdes = SurveyDesign(df=df, weight_col="w", strata_col="g")
    r = svycov(sdes, "x1", "y")[0]
    x, y, w = pdf.x1.to_numpy(), pdf.y.to_numpy(), pdf.w.to_numpy()
    g = pdf.g.to_numpy()
    mx = (w * x).sum() / w.sum()
    my = (w * y).sum() / w.sum()
    C = (w * (x - mx) * (y - my)).sum() / w.sum()
    u = w * ((x - mx) * (y - my) - C) / w.sum()
    v = 0.0
    for h in np.unique(g):
        mk = g == h
        n_h = int(mk.sum())
        v += n_h / (n_h - 1) * ((u[mk] ** 2).sum() - u[mk].sum() ** 2 / n_h)
    np.testing.assert_allclose(r.estimate, C, rtol=1e-10)
    np.testing.assert_allclose(r.variance, v, rtol=1e-8)
    # fpc scales the unstratified variance by exactly (1 - n/N)
    fdes = SurveyDesign(
        df=df.withColumn("N", F.lit(4000.0)), weight_col="w", fpc_col="N"
    )
    plain = svycov(SurveyDesign(df=df, weight_col="w"), "x1", "y")[0]
    fr = svycov(fdes, "x1", "y")[0]
    n = len(pdf)
    np.testing.assert_allclose(
        fr.variance, (1 - n / 4000.0) * plain.variance, rtol=1e-12
    )

"""Round-8 kernel extensions: calibrated-design variance for svyratio /
svyvar (GREG-residual semantics shared with svymean/svytotal), grouped
BRR + two-phase estimators, and the widened design_effect surface
(statistic='total'|'ratio').  Oracles are pure numpy implementations of
the documented engine-normative formulas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.linalg import calibrate


@pytest.fixture(scope="module")
def cal_df(spark):
    rng = np.random.default_rng(11)
    n = 500
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "g": rng.integers(0, 3, n),
            "x1": rng.normal(2, 1, n),
            "x2": rng.integers(0, 2, n).astype(float),
            "den": rng.uniform(1.0, 3.0, n),
            "w": rng.uniform(0.5, 2.0, n),
        }
    )
    pdf["y"] = 1.5 + 0.8 * pdf.x1 - 0.3 * pdf.x2 + 0.5 * pdf.den + rng.normal(0, 1, n)
    return spark.createDataFrame(pdf), pdf


def _calibrated_design(df, pdf, scale=1.3):
    totals = {"x1": float(pdf.x1.sum() * scale), "x2": float(pdf.x2.sum() * scale)}
    res = calibrate(df, ["x1", "x2"], totals, d_col="w", out_col="wc")
    des = SurveyDesign(
        df=res.df, weight_col="wc",
        calibration_cols=["x1", "x2"], base_weight_col="w",
    )
    wc = oracle_greg_weights(pdf, totals)
    return des, wc


def oracle_greg_weights(pdf, totals):
    X = pdf[["x1", "x2"]].to_numpy()
    d = pdf.w.to_numpy()
    T = np.array([totals["x1"], totals["x2"]])
    lam = np.linalg.solve((X * d[:, None]).T @ X, T - X.T @ d)
    return d * (1.0 + X @ lam)


def test_svyratio_calibrated_variance(cal_df):
    """Calibrated svyratio linearizes on the GREG residual of t=y-Rx:
    z = w(y - Rx - xc'B)/Σwx, B from the d-weighted projection."""
    from data_integration_est_spark.kernels.stats import svyratio

    df, pdf = cal_df
    des, wc = _calibrated_design(df, pdf)
    r = svyratio(des, "y", "den")[0]

    y, x, d = pdf.y.to_numpy(), pdf.den.to_numpy(), pdf.w.to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    n = len(y)
    swx = float(np.sum(wc * x))
    R = float(np.sum(wc * y)) / swx
    t = y - R * x
    B = np.linalg.solve((X * d[:, None]).T @ X, (X * d[:, None]).T @ t)
    e = t - X @ B
    z = wc * e / swx
    want_v = n / (n - 1) * (np.sum(z ** 2) - np.sum(z) ** 2 / n)
    np.testing.assert_allclose(r.estimate, R, rtol=1e-10)
    np.testing.assert_allclose(r.variance, want_v, rtol=1e-8)
    # point estimate matches the plain (uncalibrated-variance) path
    plain = SurveyDesign(df=des.df, weight_col="wc")
    r_plain = svyratio(plain, "y", "den")[0]
    np.testing.assert_allclose(r.estimate, r_plain.estimate, rtol=1e-12)
    # grouped calibrated path: same keys as the data, finite variances
    rows = {g.key: g for g in svyratio(des, "y", "den", group_cols=["g"])}
    assert set(rows) == {(g,) for g in pdf.g.unique()}
    for g in rows.values():
        assert np.isfinite(g.variance)


def test_svyratio_calibrated_stratified(cal_df):
    """Stratified calibrated ratio sums df-corrected per-stratum pieces
    of the SAME residualized influence."""
    from data_integration_est_spark.kernels.stats import svyratio

    df, pdf = cal_df
    totals = {"x1": float(pdf.x1.sum() * 1.3), "x2": float(pdf.x2.sum() * 1.3)}
    res = calibrate(df, ["x1", "x2"], totals, d_col="w", out_col="wc")
    des = SurveyDesign(
        df=res.df, weight_col="wc", calibration_cols=["x1", "x2"],
        base_weight_col="w", strata_col="g",
    )
    r = svyratio(des, "y", "den")[0]

    y, x, d = pdf.y.to_numpy(), pdf.den.to_numpy(), pdf.w.to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    wc = oracle_greg_weights(pdf, totals)
    swx = float(np.sum(wc * x))
    R = float(np.sum(wc * y)) / swx
    t = y - R * x
    B = np.linalg.solve((X * d[:, None]).T @ X, (X * d[:, None]).T @ t)
    z = wc * (t - X @ B) / swx
    v = 0.0
    for g in sorted(pdf.g.unique()):
        zh = z[(pdf.g == g).to_numpy()]
        nh = len(zh)
        v += nh / (nh - 1) * (np.sum(zh ** 2) - np.sum(zh) ** 2 / nh)
    np.testing.assert_allclose(r.estimate, R, rtol=1e-10)
    np.testing.assert_allclose(r.variance, v, rtol=1e-8)


def test_svyvar_calibrated_variance(cal_df):
    """Calibrated svyvar linearizes on the GREG residual of
    h = (y-m)² - V: z = w(h - xc'B)/Σw."""
    from data_integration_est_spark.kernels.stats import svyvar

    df, pdf = cal_df
    des, wc = _calibrated_design(df, pdf)
    r = svyvar(des, "y")[0]

    y, d = pdf.y.to_numpy(), pdf.w.to_numpy()
    X = pdf[["x1", "x2"]].to_numpy()
    n = len(y)
    W = float(np.sum(wc))
    m = float(np.sum(wc * y)) / W
    V = float(np.sum(wc * (y - m) ** 2)) / W
    h = (y - m) ** 2 - V
    B = np.linalg.solve((X * d[:, None]).T @ X, (X * d[:, None]).T @ h)
    z = wc * (h - X @ B) / W
    want_v = n / (n - 1) * (np.sum(z ** 2) - np.sum(z) ** 2 / n)
    np.testing.assert_allclose(r.estimate, V, rtol=1e-10)
    np.testing.assert_allclose(r.variance, want_v, rtol=1e-8)
    # grouped calibrated path: keys, finiteness
    rows = {g.key: g for g in svyvar(des, "y", group_cols=["g"])}
    assert set(rows) == {(g,) for g in pdf.g.unique()}
    for g in rows.values():
        assert np.isfinite(g.variance)


@pytest.fixture(scope="module")
def brr_df(spark):
    rng = np.random.default_rng(23)
    n_h, reps = 6, 30
    rows = []
    i = 0
    for g in range(2):  # both groups contain ALL strata & both PSUs
        for h in range(n_h):
            for p in (0, 1):
                for _ in range(reps):
                    rows.append(
                        (i, g, h, p,
                         float(rng.normal(1.0 + 0.2 * h + 0.1 * g, 1.0)),
                         float(rng.uniform(0.5, 2.0)))
                    )
                    i += 1
    pdf = pd.DataFrame(rows, columns=["id", "g", "h", "p", "y", "w"])
    return spark.createDataFrame(pdf), pdf


def test_brr_grouped_matches_per_group(brr_df):
    """When every group spans the full stratum set, grouped BRR equals
    the ungrouped kernel run on each group slice (same Hadamard columns
    and R)."""
    from data_integration_est_spark.kernels.replicate import brr_mean

    df, pdf = brr_df
    grouped = {
        r["g"]: r for r in
        brr_mean(df, "y", "h", "p", weight_col="w", fay_rho=0.3,
                 group_cols=["g"]).collect()
    }
    assert set(grouped) == {0, 1}
    for g in (0, 1):
        solo = brr_mean(
            df.filter(f"g = {g}"), "y", "h", "p",
            weight_col="w", fay_rho=0.3,
        ).collect()[0]
        assert grouped[g]["mean"] == pytest.approx(solo["mean"], abs=2e-6)
        assert grouped[g]["se_brr"] == pytest.approx(solo["se_brr"], abs=2e-6)
        assert grouped[g]["n_replicates"] == solo["n_replicates"]
        assert grouped[g]["n_strata"] == solo["n_strata"]


def test_brr_grouped_domain_missing_stratum(brr_df):
    """A domain absent from some strata still estimates under the GLOBAL
    replicate design — numpy replay of the Hadamard half-samples with
    zero sums in the untouched strata."""
    from data_integration_est_spark.kernels.replicate import brr_mean

    df, pdf = brr_df
    # domain indicator touching only strata 0..2
    pdf2 = pdf.copy()
    pdf2["dom"] = np.where(pdf2.h <= 2, pdf2.g, 2)
    df2 = df.sparkSession.createDataFrame(pdf2)
    out = {
        r["dom"]: r for r in
        brr_mean(df2, "y", "h", "p", weight_col="w",
                 group_cols=["dom"]).collect()
    }
    assert set(out) == {0, 1, 2}
    # numpy replay for dom=0 under the GLOBAL design (6 strata, R=8)
    strata = sorted(pdf2.h.unique())
    col_of = {h: i + 1 for i, h in enumerate(strata)}
    R = 4
    while R <= len(strata):
        R *= 2
    sub = pdf2[pdf2.dom == 0]
    swy = {(h, p): float((sub[(sub.h == h) & (sub.p == p)].w
                          * sub[(sub.h == h) & (sub.p == p)].y).sum())
           for h in strata for p in (0, 1)}
    sw = {(h, p): float(sub[(sub.h == h) & (sub.p == p)].w.sum())
          for h in strata for p in (0, 1)}
    theta = sum(swy.values()) / sum(sw.values())
    v = 0.0
    for rep in range(R):
        num = den = 0.0
        for h in strata:
            s = -1.0 if bin(rep & col_of[h]).count("1") % 2 else 1.0
            for p in (0, 1):
                f = 1.0 + s * (1.0 - 2.0 * p)
                num += f * swy[(h, p)]
                den += f * sw[(h, p)]
        v += (num / den - theta) ** 2
    v /= R
    assert out[0]["mean"] == pytest.approx(round(theta, 6), abs=2e-6)
    assert out[0]["se_brr"] == pytest.approx(round(v ** 0.5, 6), abs=2e-6)
    assert out[0]["n_strata"] == len(strata)
    assert out[0]["n_replicates"] == R


def test_twophase_grouped_matches_per_group(spark):
    """Grouped two-phase == the ungrouped estimator applied per group
    slice (the estimator is independent per key)."""
    from data_integration_est_spark.estimators.twophase import (
        twophase_regression_mean,
    )

    rng = np.random.default_rng(31)
    n = 600
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "g": rng.integers(0, 3, n),
            "x": rng.normal(5, 2, n),
        }
    )
    pdf["p2"] = (rng.uniform(size=n) < 0.3).astype(int)
    pdf["y"] = np.where(
        pdf.p2 == 1, 2.0 + 0.7 * pdf.x + rng.normal(0, 1, n), np.nan
    )
    df = spark.createDataFrame(pdf)
    grouped = twophase_regression_mean(df, "y", "x", "p2", group_cols=["g"])
    assert set(grouped) == {(g,) for g in pdf.g.unique()}
    for g in sorted(pdf.g.unique()):
        solo = twophase_regression_mean(df.filter(f"g = {g}"), "y", "x", "p2")
        got = grouped[(g,)]
        assert got.estimate == pytest.approx(solo.estimate, rel=1e-12)
        assert got.se == pytest.approx(solo.se, rel=1e-12)
        assert got.b == pytest.approx(solo.b, rel=1e-12)
        assert (got.n1, got.n2) == (solo.n1, solo.n2)


def test_design_effect_total_and_ratio(cal_df):
    """r8: DEFF for totals (V_srs scaled by W²) and ratios (SRS variance
    of the linearized variable d = (y - Rx)/mx) — numpy oracles of the
    documented denominators."""
    from data_integration_est_spark.kernels.stats import (
        design_effect, svyratio, svytotal,
    )

    df, pdf = cal_df
    des = SurveyDesign(df=df, weight_col="w")
    y, x, w = pdf.y.to_numpy(), pdf.den.to_numpy(), pdf.w.to_numpy()
    n = len(y)
    W = w.sum()
    f = 1.0 - n / W

    # total
    r_tot = design_effect(des, "y", statistic="total")[0]
    m = (w * y).sum() / W
    S2 = ((w * (y - m) ** 2).sum() / W) * (W / (W - 1))
    v_srs_tot = W * W * f * S2 / n
    v_design_tot = svytotal(des, "y")[0].variance
    np.testing.assert_allclose(r_tot.estimate, v_design_tot / v_srs_tot, rtol=1e-9)

    # ratio
    r_rat = design_effect(des, "y", statistic="ratio", den_col="den")[0]
    R = (w * y).sum() / (w * x).sum()
    mx = (w * x).sum() / W
    dvar = (w * ((y - R * x) / mx - ((w * ((y - R * x) / mx)).sum() / W)) ** 2).sum() / W
    S2d = dvar * (W / (W - 1))
    v_srs_rat = f * S2d / n
    v_design_rat = svyratio(des, "y", "den")[0].variance
    np.testing.assert_allclose(r_rat.estimate, v_design_rat / v_srs_rat, rtol=1e-8)

    # guards
    with pytest.raises(ValueError):
        design_effect(des, "y", statistic="ratio")
    with pytest.raises(ValueError):
        design_effect(des, "y", statistic="median")

"""Two-stage cluster (PSU) designs — ``svydesign(ids=~psu)`` (r14).

The reference only ever constructs ``ids=~1`` (every element its own
cluster, ``RegDI2.R:181-185``), which the engine has always matched;
this round adds the with-replacement FIRST-STAGE linearization for real
PSU sampling: per-stratum variance of weighted PSU totals with the
n_h/(n_h-1) correction (n_h = sampled PSUs in stratum h), optional
first-stage fpc (N_h = population PSUs).  Checks here:

- numpy oracle: svymean/svytotal variance equals the closed-form PSU
  linearization computed directly from the fixture arrays;
- ids=~1 degeneracy: a psu_col with one element per PSU reproduces the
  element-level design bit-for-bit;
- BRR cross-check: on a 2-PSU-per-stratum fixture the BRR replicate SE
  of the mean approximates the linearization SE;
- domain estimation uses FULL-design PSU counts (a group that misses
  some PSUs keeps the design d.o.f.);
- calibrated + psu: svymean/svytotal linearize it directly (r15,
  svyrecvar shape — element d-Gram for B, PSU totals of w*e); the
  remaining kernels refuse with an actionable message.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.stats import svymean, svytotal


def _fixture(spark, n=400, n_psu=40, n_strata=4, seed=7):
    """Deterministic element table: PSU nests in stratum (psu % n_strata)."""
    rng = np.random.default_rng(seed)
    psu = rng.integers(0, n_psu, size=n)
    h = psu % n_strata
    w = 1.0 + (rng.integers(0, 10, size=n)).astype(float)
    # cluster-correlated outcome: a PSU effect plus element noise
    psu_eff = rng.normal(0, 2.0, size=n_psu)
    y = 10.0 + psu_eff[psu] + rng.normal(0, 1.0, size=n)
    grp = rng.integers(0, 2, size=n)
    rows = [(int(i), int(psu[i]), int(h[i]), float(w[i]), float(y[i]),
             int(grp[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "id long, psu long, h long, w double, y double, g long"
    )
    return df, psu, h, w, y, grp


def _np_psu_mean_var(psu, h, w, y, fpc_by_h=None, domain=None):
    """Closed-form PSU linearization for the mean: u_c = Σ_{i∈c} w_i
    (y_i - m)/sw; V = Σ_h f_h n_h/(n_h-1)(Σu² - (Σu)²/n_h) with n_h the
    FULL-design sampled-PSU count."""
    sel = np.ones(len(y), bool) if domain is None else domain
    sw = float(np.sum(w[sel]))
    m = float(np.sum(w[sel] * y[sel]) / sw)
    v = 0.0
    for hv in np.unique(h):
        n_h = len(np.unique(psu[h == hv]))  # full design, not domain
        us = []
        for c in np.unique(psu[(h == hv) & sel]):
            mask = (psu == c) & sel
            us.append(np.sum(w[mask] * (y[mask] - m)) / sw)
        us = np.asarray(us)
        f = 1.0
        if fpc_by_h is not None:
            f = max(0.0, 1.0 - n_h / float(fpc_by_h[int(hv)]))
        s1, s2 = float(us.sum()), float((us ** 2).sum())
        v += f * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
    return m, v


def test_svymean_psu_matches_numpy_oracle(spark):
    df, psu, h, w, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    est = svymean(des, "y")[0]
    m, v = _np_psu_mean_var(psu, h, w, y)
    assert est.estimate == pytest.approx(m, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)


def test_svymean_psu_fpc_matches_numpy_oracle(spark):
    df, psu, h, w, y, _ = _fixture(spark)
    fpc_by_h = {hv: 50.0 * (hv + 1) for hv in range(4)}  # population PSUs
    dff = df.withColumn(
        "Npsu", (F.col("h") + 1).cast("double") * F.lit(50.0)
    )
    des = SurveyDesign(df=dff, weight_col="w", strata_col="h",
                       psu_col="psu", fpc_col="Npsu")
    est = svymean(des, "y")[0]
    m, v = _np_psu_mean_var(psu, h, w, y, fpc_by_h=fpc_by_h)
    assert est.estimate == pytest.approx(m, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)


def test_svytotal_psu_matches_numpy_oracle(spark):
    df, psu, h, w, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    est = svytotal(des, "y")[0]
    t = float(np.sum(w * y))
    v = 0.0
    for hv in np.unique(h):
        zs = np.asarray([np.sum(w[psu == c] * y[psu == c])
                         for c in np.unique(psu[h == hv])])
        n_h = len(zs)
        v += n_h / (n_h - 1.0) * float(((zs - zs.mean()) ** 2).sum())
    assert est.estimate == pytest.approx(t, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)


def test_psu_one_element_per_cluster_degenerates_to_element_design(spark):
    df, *_ = _fixture(spark)
    # ids=~id: every element its own PSU == the reference's ids=~1
    elem = SurveyDesign(df=df, weight_col="w", strata_col="h")
    clus = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="id")
    e1, e2 = svymean(elem, "y")[0], svymean(clus, "y")[0]
    assert e2.estimate == pytest.approx(e1.estimate, rel=1e-12)
    assert e2.variance == pytest.approx(e1.variance, rel=1e-10)
    t1, t2 = svytotal(elem, "y")[0], svytotal(clus, "y")[0]
    assert t2.estimate == pytest.approx(t1.estimate, rel=1e-12)
    assert t2.variance == pytest.approx(t1.variance, rel=1e-10)


def test_psu_clustering_inflates_variance_vs_element_design(spark):
    # the whole point of cluster designs: with a real PSU effect the
    # element-level ids=~1 variance is an UNDERESTIMATE
    df, psu, h, w, y, _ = _fixture(spark)
    elem = SurveyDesign(df=df, weight_col="w", strata_col="h")
    clus = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    assert svymean(clus, "y")[0].variance > svymean(elem, "y")[0].variance


def test_brr_cross_check_two_psu_per_stratum(spark):
    """On the canonical 2-PSU-per-stratum design, BRR and linearization
    estimate the same variance (they agree exactly for totals on
    balanced designs; for the ratio-mean within a few percent)."""
    from data_integration_est_spark.kernels.replicate import brr_mean

    rng = np.random.default_rng(11)
    n_strata, n_per = 16, 12
    rows = []
    rid = 0
    for hv in range(n_strata):
        for p in (0, 1):
            eff = rng.normal(0, 1.5)
            for _ in range(n_per):
                rows.append((rid, hv, p, float(1 + rng.integers(0, 5)),
                             float(20 + eff + rng.normal(0, 1.0))))
                rid += 1
    df = spark.createDataFrame(
        rows, "id long, h long, psu long, w double, y double"
    )
    des = SurveyDesign(df=df, weight_col="w", strata_col="h",
                       psu_col="psu")
    lin = svymean(des, "y")[0]
    brr = brr_mean(df, "y", strata_col="h", psu_col="psu",
                   weight_col="w").first()
    assert brr["mean"] == pytest.approx(lin.estimate, abs=1e-6)  # 6-dp output
    assert brr["se_brr"] == pytest.approx(lin.se, rel=0.10)


def test_psu_domain_uses_full_design_psu_counts(spark):
    df, psu, h, w, y, grp = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    out = {r.key[0]: r for r in svymean(des, "y", group_cols=["g"])}
    for gv in (0, 1):
        m, v = _np_psu_mean_var(psu, h, w, y, domain=(grp == gv))
        assert out[gv].estimate == pytest.approx(m, rel=1e-12)
        assert out[gv].variance == pytest.approx(v, rel=1e-9)


def test_calibrated_psu_mean_total_linearized(spark):
    """r15 upgrade of the r14 refusal: calibrated cluster designs get
    the svyrecvar-shaped linearization in svymean/svytotal — element
    d-Gram for B, per-stratum PSU totals of w·e for the variance.
    Closed-form numpy replay from the fixture arrays."""
    df, psu, h, w, y, _ = _fixture(spark)
    x = 1.0 + (np.arange(len(y)) % 4).astype(float)
    N = float(np.sum(w)) * 1.03
    Tx = float(np.sum(w * x)) * 0.97
    X = np.column_stack([np.ones(len(y)), x])
    G = (X * w[:, None]).T @ X
    lam = np.linalg.solve(G, np.array([N, Tx]) - w @ X)
    wc = w * (1.0 + X @ lam)
    dfx = (
        df.withColumn("x", 1.0 + (F.col("id") % 4).cast("double"))
        .withColumn("one", F.lit(1.0))
    )
    lam_b = F.lit(float(lam[0])) + F.lit(float(lam[1])) * F.col("x")
    dfx = dfx.withColumn("wc", F.col("w") * (1.0 + lam_b))
    des = SurveyDesign(df=dfx, weight_col="wc", strata_col="h",
                       psu_col="psu", calibration_cols=["one", "x"],
                       base_weight_col="w")

    for mode, fn in (("mean", svymean), ("total", svytotal)):
        est = fn(des, "y")[0]
        sw = float(np.sum(wc))
        t = float(np.sum(wc * y))
        m = t / sw
        rhs = (w * y) @ X - (m * (w @ X) if mode == "mean" else 0.0)
        B = np.linalg.solve(G, rhs)
        e = y - (m if mode == "mean" else 0.0) - X @ B
        scale = sw if mode == "mean" else 1.0
        v = 0.0
        for hv in np.unique(h):
            us = np.asarray([
                float(np.sum(wc[psu == c] * e[psu == c])) / scale
                for c in np.unique(psu[h == hv])
            ])
            n_h = len(us)
            v += n_h / (n_h - 1.0) * (
                float((us**2).sum()) - float(us.sum()) ** 2 / n_h
            )
        want = m if mode == "mean" else t
        assert est.estimate == pytest.approx(want, rel=1e-12)
        assert est.variance == pytest.approx(v, rel=1e-9)
        # clustering widens vs the element-level calibrated design
        el = fn(
            SurveyDesign(df=dfx, weight_col="wc", strata_col="h",
                         calibration_cols=["one", "x"],
                         base_weight_col="w"),
            "y",
        )[0]
        assert est.variance > el.variance


def test_calibrated_psu_singleton_degenerates_to_element(spark):
    """ids=~1 pin for the calibrated cluster path: one element per PSU
    reproduces the element-level calibrated linearization."""
    df, psu, h, w, y, _ = _fixture(spark, n=200)
    dfx = df.withColumn("one", F.lit(1.0))
    el = svymean(
        SurveyDesign(df=dfx, weight_col="w", strata_col="h",
                     calibration_cols=["one"], base_weight_col="w"),
        "y",
    )[0]
    cl = svymean(
        SurveyDesign(df=dfx.withColumn("psu1", F.col("id")),
                     weight_col="w", strata_col="h", psu_col="psu1",
                     calibration_cols=["one"], base_weight_col="w"),
        "y",
    )[0]
    assert cl.estimate == pytest.approx(el.estimate, rel=1e-12)
    assert cl.variance == pytest.approx(el.variance, rel=1e-10)


def test_svyratio_psu_matches_numpy_oracle(spark):
    df, psu, h, w, y, _ = _fixture(spark)
    from data_integration_est_spark.kernels.stats import svyratio

    x = 1.0 + (np.arange(len(y)) % 4)
    dfr = df.withColumn("x", 1.0 + (F.col("id") % 4).cast("double"))
    des = SurveyDesign(df=dfr, weight_col="w", strata_col="h", psu_col="psu")
    est = svyratio(des, "y", "x")[0]
    swx = float(np.sum(w * x))
    R = float(np.sum(w * y) / swx)
    v = 0.0
    for hv in np.unique(h):
        us = np.asarray([
            np.sum(w[psu == c] * (y[psu == c] - R * x[psu == c])) / swx
            for c in np.unique(psu[h == hv])
        ])
        n_h = len(us)
        s1, s2 = float(us.sum()), float((us ** 2).sum())
        v += n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
    assert est.estimate == pytest.approx(R, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)


def test_svyvar_psu_matches_numpy_oracle(spark):
    df, psu, h, w, y, _ = _fixture(spark)
    from data_integration_est_spark.kernels.stats import svyvar

    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    est = svyvar(des, "y")[0]
    sw = float(np.sum(w))
    m = float(np.sum(w * y) / sw)
    V = float(np.sum(w * y * y) / sw - m * m)
    v = 0.0
    for hv in np.unique(h):
        us = np.asarray([
            np.sum(w[psu == c] * ((y[psu == c] - m) ** 2 - V)) / sw
            for c in np.unique(psu[h == hv])
        ])
        n_h = len(us)
        s1, s2 = float(us.sum()), float((us ** 2).sum())
        v += n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
    assert est.estimate == pytest.approx(V, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)


def test_svyratio_svyvar_psu_degeneracy_and_refusal(spark):
    df, *_ = _fixture(spark)
    from data_integration_est_spark.kernels.stats import svyratio, svyvar

    dfr = df.withColumn("x", 1.0 + (F.col("id") % 4).cast("double"))
    elem = SurveyDesign(df=dfr, weight_col="w", strata_col="h")
    clus = SurveyDesign(df=dfr, weight_col="w", strata_col="h", psu_col="id")
    r1, r2 = svyratio(elem, "y", "x")[0], svyratio(clus, "y", "x")[0]
    assert r2.estimate == pytest.approx(r1.estimate, rel=1e-12)
    assert r2.variance == pytest.approx(r1.variance, rel=1e-10)
    v1, v2 = svyvar(elem, "y")[0], svyvar(clus, "y")[0]
    assert v2.estimate == pytest.approx(v1.estimate, rel=1e-12)
    assert v2.variance == pytest.approx(v1.variance, rel=1e-10)
    # calibrated + psu: intercept-only calibration to the exact HT
    # total leaves weights unchanged (lam = 0), so the calibrated
    # cluster path must reproduce the uncalibrated psu linearization
    # (B = residual projection onto the constant) — a degeneracy pin
    # for _svyratio_calibrated_psu / _svyvar_calibrated_psu
    cal = SurveyDesign(df=dfr.withColumn("one", F.lit(1.0)), weight_col="w",
                       strata_col="h", psu_col="psu",
                       calibration_cols=["one"], base_weight_col="w")
    rc = svyratio(cal, "y", "x")[0]
    vc = svyvar(cal, "y")[0]
    assert np.isfinite(rc.variance) and np.isfinite(vc.variance)
    plain = SurveyDesign(df=dfr, weight_col="w", strata_col="h",
                         psu_col="psu")
    rp, vp = svyratio(plain, "y", "x")[0], svyvar(plain, "y")[0]
    assert rc.estimate == pytest.approx(rp.estimate, rel=1e-12)
    assert vc.estimate == pytest.approx(vp.estimate, rel=1e-12)
    # residualizing against the constant shrinks (or keeps) the
    # influence spread — the calibrated variance is <= the plain one
    assert rc.variance <= rp.variance * (1 + 1e-9)
    assert vc.variance <= vp.variance * (1 + 1e-9)


def test_calibrated_psu_ratio_var_match_numpy(spark):
    """r15: calibrated cluster svyratio/svyvar linearized via the
    shared _cal_psu_core — closed-form numpy replay."""
    from data_integration_est_spark.kernels.stats import svyratio, svyvar

    df, psu, h, w, y, _ = _fixture(spark)
    x = 1.0 + (np.arange(len(y)) % 4).astype(float)
    X = np.column_stack([np.ones(len(y)), x])
    N = float(np.sum(w)) * 1.03
    Tx = float(np.sum(w * x)) * 0.97
    G = (X * w[:, None]).T @ X
    lam = np.linalg.solve(G, np.array([N, Tx]) - w @ X)
    wc = w * (1.0 + X @ lam)
    dfx = (
        df.withColumn("x", 1.0 + (F.col("id") % 4).cast("double"))
        .withColumn("one", F.lit(1.0))
    )
    lam_b = F.lit(float(lam[0])) + F.lit(float(lam[1])) * F.col("x")
    dfx = dfx.withColumn("wc", F.col("w") * (1.0 + lam_b))
    des = SurveyDesign(df=dfx, weight_col="wc", strata_col="h",
                       psu_col="psu", calibration_cols=["one", "x"],
                       base_weight_col="w")

    def strat_v(e, scale):
        v = 0.0
        for hv in np.unique(h):
            us = np.asarray([
                float(np.sum(wc[psu == c] * e[psu == c])) / scale
                for c in np.unique(psu[h == hv])
            ])
            n_h = len(us)
            v += n_h / (n_h - 1.0) * (
                float((us**2).sum()) - float(us.sum()) ** 2 / n_h
            )
        return v

    # ratio: numerator y, denominator x
    est = svyratio(des, "y", "x")[0]
    swx = float(np.sum(wc * x))
    R = float(np.sum(wc * y)) / swx
    B = np.linalg.solve(G, (w * y) @ X - R * ((w * x) @ X))
    e = y - R * x - X @ B
    assert est.estimate == pytest.approx(R, rel=1e-12)
    assert est.variance == pytest.approx(strat_v(e, swx), rel=1e-9)

    # variance functional
    estv = svyvar(des, "y")[0]
    sw = float(np.sum(wc))
    m = float(np.sum(wc * y)) / sw
    V = float(np.sum(wc * y * y)) / sw - m * m
    c0 = m * m - V
    Bv = np.linalg.solve(
        G, (w * y * y) @ X - 2.0 * m * ((w * y) @ X) + c0 * (w @ X)
    )
    ev = y * y - 2.0 * m * y + c0 - X @ Bv
    assert estv.estimate == pytest.approx(V, rel=1e-12)
    assert estv.variance == pytest.approx(strat_v(ev, sw), rel=1e-9)

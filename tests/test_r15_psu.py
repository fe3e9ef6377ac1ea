"""r15: psu_col across the remaining SE surface (r14 verdict #1/#4).

r14 left the cluster-design component complete only for the four moment
kernels (svymean/svytotal/svyratio/svyvar); svyquantile, svyglm, svycov,
svychisq and design_effect accepted a ``SurveyDesign(psu_col=)`` and
silently ignored it — element-level SEs that understate clustering
variance with no warning.  r15 closes that hazard:

- ``svyquantile``: PSU-collapsed Woodruff SE (the indicator-mean
  linearization over weighted PSU totals, per-stratum df + fpc);
- ``svyglm``: cluster-robust sandwich (per-stratum df-corrected
  centered second moments of weighted PSU score totals);
- ``svycov``: the (1, x, y, xy)-basis Gram over PSU pseudo-elements
  (the svyvar materialize-before-collapse rule);
- ``svychisq_rao_scott``: cluster bootstrap (replicate multiplicities
  hashed from the PSU id — whole PSUs resampled together);
- ``svychisq_pearson``: loud refusal (its multinomial null assumes
  independent elements);
- ``design_effect``: honored BY DELEGATION (numerator kernels collapse;
  the SRS denominator is deliberately element-level) — pinned here;
- ``jackknife_psu_calibrated_mean``: the delete-a-group jackknife
  variance path for calibrated cluster designs, which the
  linearization kernels refuse.

Every check is a closed-form numpy replay from the fixture arrays, plus
ids=~1 degeneracy pins and refusal-message pins.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.estimators.glm import svyglm
from data_integration_est_spark.kernels.quantile import svyquantile
from data_integration_est_spark.kernels.replicate import (
    jackknife_psu_calibrated_mean,
)
from data_integration_est_spark.kernels.stats import (
    design_effect,
    svychisq_pearson,
    svychisq_rao_scott,
    svycov,
    svymean,
)


def _fixture(spark, n=600, n_psu=48, n_strata=4, seed=11):
    """Cluster-correlated element table: PSU nests in stratum psu % H."""
    rng = np.random.default_rng(seed)
    psu = rng.integers(0, n_psu, size=n)
    h = psu % n_strata
    w = 1.0 + rng.integers(0, 10, size=n).astype(float)
    psu_eff = rng.normal(0.0, 2.0, size=n_psu)
    x = rng.normal(0.0, 1.0, size=n) + 0.5 * psu_eff[psu]
    y = 10.0 + 1.5 * x + psu_eff[psu] + rng.normal(0.0, 1.0, size=n)
    grp = rng.integers(0, 2, size=n)
    rows = [
        (int(i), int(psu[i]), int(h[i]), float(w[i]), float(x[i]),
         float(y[i]), int(grp[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, psu long, h long, w double, x double, y double, g long"
    )
    return df, psu, h, w, x, y, grp


def _weighted_quantile(y, w, target):
    """Smallest observed y with cumulative weight >= target."""
    order = np.argsort(y, kind="stable")
    cum = 0.0
    for i in order:
        cum += w[i]
        if cum >= target:
            return float(y[i])
    return float(y[order[-1]])


def _np_psu_indicator_var(psu, h, w, z, sel=None):
    """V(p_hat) for the indicator mean under the first-stage WR
    linearization (full-design PSU counts for domains)."""
    if sel is None:
        sel = np.ones(len(z), bool)
    W = float(np.sum(w[sel]))
    p = float(np.sum(w[sel] * z[sel]) / W)
    v = 0.0
    for hv in np.unique(h):
        n_h = len(np.unique(psu[h == hv]))
        us = [
            float(np.sum(w[(psu == c) & sel] * (z[(psu == c) & sel] - p)))
            for c in np.unique(psu[(h == hv) & sel])
        ]
        us = np.asarray(us)
        s1, s2 = float(us.sum()), float((us**2).sum())
        v += n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
    return p, v / (W * W)


def test_svyquantile_psu_woodruff_matches_numpy(spark):
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    q = 0.5
    out = svyquantile(des, "y", qs=(q,), alpha=0.05).collect()
    assert len(out) == 1
    row = out[0]
    W = float(np.sum(w))
    qhat = _weighted_quantile(y, w, q * W)
    assert row["quantile"] == pytest.approx(qhat, abs=0)
    z = (y <= qhat).astype(float)
    _p, v = _np_psu_indicator_var(psu, h, w, z)
    se = np.sqrt(v)
    from statistics import NormalDist

    zc = NormalDist().inv_cdf(0.975)
    lo = _weighted_quantile(y, w, max(q - zc * se, 0.0) * W)
    hi = _weighted_quantile(y, w, min(q + zc * se, 1.0) * W)
    assert row["ci_l"] == pytest.approx(lo, abs=0)
    assert row["ci_u"] == pytest.approx(hi, abs=0)
    # clustering must WIDEN the interval vs the element-level design
    el = svyquantile(
        SurveyDesign(df=df, weight_col="w"), "y", qs=(q,), alpha=0.05
    ).collect()[0]
    assert (row["ci_u"] - row["ci_l"]) >= (el["ci_u"] - el["ci_l"])


def test_svyquantile_psu_grouped_uses_full_psu_counts(spark):
    df, psu, h, w, x, y, grp = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    q = 0.5
    out = {
        r["g"]: r
        for r in svyquantile(
            des, "y", qs=(q,), group_cols=["g"], alpha=0.05
        ).collect()
    }
    from statistics import NormalDist

    zc = NormalDist().inv_cdf(0.975)
    for gv in (0, 1):
        sel = grp == gv
        W = float(np.sum(w[sel]))
        qhat = _weighted_quantile(y[sel], w[sel], q * W)
        assert out[gv]["quantile"] == pytest.approx(qhat, abs=0)
        z = (y <= qhat).astype(float)
        _p, v = _np_psu_indicator_var(psu, h, w, z, sel=sel)
        se = np.sqrt(v)
        lo = _weighted_quantile(y[sel], w[sel], max(q - zc * se, 0.0) * W)
        hi = _weighted_quantile(y[sel], w[sel], min(q + zc * se, 1.0) * W)
        assert out[gv]["ci_l"] == pytest.approx(lo, abs=0)
        assert out[gv]["ci_u"] == pytest.approx(hi, abs=0)


def test_svyquantile_psu_singleton_psus_degenerate_to_element(spark):
    """ids=~1 pin: one element per PSU, no strata -> the element-level
    Woodruff CI exactly."""
    df, psu, h, w, x, y, _ = _fixture(spark, n=200)
    dfe = df.withColumn("psu1", F.col("id"))
    el = svyquantile(
        SurveyDesign(df=df, weight_col="w"), "y", qs=(0.5,), alpha=0.1
    ).collect()[0]
    cl = svyquantile(
        SurveyDesign(df=dfe, weight_col="w", psu_col="psu1"),
        "y", qs=(0.5,), alpha=0.1,
    ).collect()[0]
    assert cl["quantile"] == el["quantile"]
    assert cl["ci_l"] == pytest.approx(el["ci_l"], abs=0)
    assert cl["ci_u"] == pytest.approx(el["ci_u"], abs=0)


def test_svyquantile_calibrated_psu_refuses(spark):
    df, *_ = _fixture(spark, n=100)
    des = SurveyDesign(
        df=df.withColumn("one", F.lit(1.0)), weight_col="w",
        psu_col="psu", calibration_cols=["one"], base_weight_col="w",
    )
    with pytest.raises(NotImplementedError, match="svyquantile"):
        svyquantile(des, "y", qs=(0.5,), alpha=0.05)


def _np_ols(w, X, y):
    A = (X * w[:, None]).T @ X
    b = (X * w[:, None]).T @ y
    return np.linalg.solve(A, b)


def _np_cluster_sandwich(psu, h, w, X, resid, a_w):
    """A = sum a_w x x'; M = sum_h n_h/(n_h-1)(sum_c u u' - S S'/n_h)."""
    k = X.shape[1]
    A = (X * a_w[:, None]).T @ X
    M = np.zeros((k, k))
    for hv in np.unique(h):
        us = []
        for c in np.unique(psu[h == hv]):
            m = psu == c
            us.append((w[m] * resid[m]) @ X[m])
        U = np.asarray(us)
        n_h = U.shape[0]
        S = U.sum(0)
        M += n_h / (n_h - 1.0) * (U.T @ U - np.outer(S, S) / n_h)
    V = np.linalg.solve(A, np.linalg.solve(A, M).T).T
    return np.sqrt(np.clip(np.diag(V), 0.0, None))


def test_svyglm_psu_normal_matches_numpy(spark):
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    out = {r["term"]: r for r in svyglm(des, "y ~ x").collect()}
    X = np.column_stack([np.ones(len(x)), x])
    beta = _np_ols(w, X, y)
    resid = y - X @ beta
    se = _np_cluster_sandwich(psu, h, w, X, resid, w)
    assert out["(Intercept)"]["coef"] == pytest.approx(beta[0], abs=1e-6)
    assert out["x"]["coef"] == pytest.approx(beta[1], abs=1e-6)
    assert out["(Intercept)"]["se"] == pytest.approx(se[0], abs=2e-6)
    assert out["x"]["se"] == pytest.approx(se[1], abs=2e-6)
    # clustering must inflate the slope SE on this cluster-correlated
    # fixture vs the element-level sandwich
    el = {
        r["term"]: r
        for r in svyglm(SurveyDesign(df=df, weight_col="w"), "y ~ x").collect()
    }
    assert out["(Intercept)"]["se"] > el["(Intercept)"]["se"]


def test_svyglm_psu_logistic_matches_numpy(spark):
    df, psu, h, w, x, y, _ = _fixture(spark)
    med = float(np.median(y))
    df2 = df.withColumn("yb", (F.col("y") > med).cast("double"))
    yb = (y > med).astype(float)
    des = SurveyDesign(df=df2, weight_col="w", strata_col="h", psu_col="psu")
    out = {r["term"]: r for r in svyglm(des, "yb ~ x", model_type="logistic").collect()}
    X = np.column_stack([np.ones(len(x)), x])
    beta = np.zeros(2)
    for _ in range(60):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        Wd = w * p * (1.0 - p)
        A = (X * Wd[:, None]).T @ X
        g = (w * (yb - p)) @ X
        step = np.linalg.solve(A, g)
        beta = beta + step
        if np.max(np.abs(step)) < 1e-12:
            break
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    se = _np_cluster_sandwich(psu, h, w, X, yb - p, w * p * (1.0 - p))
    assert out["x"]["coef"] == pytest.approx(beta[1], abs=1e-5)
    assert out["x"]["se"] == pytest.approx(se[1], rel=1e-4, abs=1e-5)


def test_svyglm_psu_grouped_domain_full_counts(spark):
    """Domain estimation: per-group fits, full-design PSU d.o.f."""
    df, psu, h, w, x, y, grp = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    out = svyglm(des, "y ~ x", group_cols=["g"]).collect()
    by = {(r["g"], r["term"]): r for r in out}
    X = np.column_stack([np.ones(len(x)), x])
    for gv in (0, 1):
        sel = grp == gv
        beta = _np_ols(w[sel], X[sel], y[sel])
        # full-count domain sandwich: PSUs outside the domain contribute
        # zero scores but count toward n_h
        k = 2
        A = (X[sel] * (w[sel])[:, None]).T @ X[sel]
        resid = np.zeros(len(y))
        resid[sel] = y[sel] - X[sel] @ beta
        wr = w * resid * sel
        M = np.zeros((k, k))
        for hv in np.unique(h):
            n_h = len(np.unique(psu[h == hv]))
            us = []
            for c in np.unique(psu[(h == hv) & sel]):
                m = (psu == c) & sel
                us.append((w[m] * resid[m]) @ X[m])
            U = np.asarray(us) if us else np.zeros((0, k))
            S = U.sum(0) if len(U) else np.zeros(k)
            UU = U.T @ U if len(U) else np.zeros((k, k))
            M += n_h / (n_h - 1.0) * (UU - np.outer(S, S) / n_h)
        V = np.linalg.solve(A, np.linalg.solve(A, M).T).T
        se = np.sqrt(np.clip(np.diag(V), 0.0, None))
        assert by[(gv, "x")]["coef"] == pytest.approx(beta[1], abs=1e-6)
        assert by[(gv, "x")]["se"] == pytest.approx(se[1], abs=2e-6)


def test_svyglm_calibrated_psu_refuses(spark):
    df, *_ = _fixture(spark, n=100)
    des = SurveyDesign(
        df=df.withColumn("one", F.lit(1.0)), weight_col="w",
        psu_col="psu", calibration_cols=["one"], base_weight_col="w",
    )
    with pytest.raises(NotImplementedError, match="svyglm"):
        svyglm(des, "y ~ x")


def test_svycov_psu_matches_numpy(spark):
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    est = svycov(des, "x", "y")[0]
    sw = float(np.sum(w))
    mx, my = float(np.sum(w * x) / sw), float(np.sum(w * y) / sw)
    C = float(np.sum(w * x * y) / sw) - mx * my
    e = (x - mx) * (y - my) - C
    v = 0.0
    for hv in np.unique(h):
        us = [
            float(np.sum(w[psu == c] * e[psu == c])) / sw
            for c in np.unique(psu[h == hv])
        ]
        us = np.asarray(us)
        n_h = len(us)
        v += n_h / (n_h - 1.0) * (
            float((us**2).sum()) - float(us.sum()) ** 2 / n_h
        )
    assert est.estimate == pytest.approx(C, rel=1e-12)
    assert est.variance == pytest.approx(v, rel=1e-9)
    # n reports the sampled-PSU count (the svyvar psu convention)
    assert est.n == len(np.unique(psu))


def test_svycov_psu_singleton_degenerates_to_element(spark):
    df, psu, h, w, x, y, _ = _fixture(spark, n=150)
    el = svycov(SurveyDesign(df=df, weight_col="w"), "x", "y")[0]
    cl = svycov(
        SurveyDesign(
            df=df.withColumn("psu1", F.col("id")), weight_col="w",
            psu_col="psu1",
        ),
        "x", "y",
    )[0]
    assert cl.estimate == pytest.approx(el.estimate, rel=1e-12)
    assert cl.variance == pytest.approx(el.variance, rel=1e-9)


def test_svycov_calibrated_psu_refuses(spark):
    df, *_ = _fixture(spark, n=100)
    des = SurveyDesign(
        df=df.withColumn("one", F.lit(1.0)), weight_col="w",
        psu_col="psu", calibration_cols=["one"], base_weight_col="w",
    )
    with pytest.raises(NotImplementedError, match="svycov"):
        svycov(des, "x", "y")


def test_design_effect_psu_by_delegation(spark):
    """DEFF numerator collapses to PSU totals (via svymean); the SRS
    denominator stays element-level by construction."""
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    deff = design_effect(des, "y")[0]
    v_design = svymean(des, "y")[0].variance
    n = len(y)
    W = float(np.sum(w))
    m = float(np.sum(w * y) / W)
    S2 = float(np.sum(w * (y - m) ** 2) / W) * (W / (W - 1.0))
    v_srs = (1.0 - n / W) * S2 / n
    assert deff.estimate == pytest.approx(v_design / v_srs, rel=1e-9)
    # clustering should push DEFF above the element design's on this
    # cluster-correlated fixture
    deff_el = design_effect(
        SurveyDesign(df=df, weight_col="w"), "y"
    )[0]
    assert deff.estimate > deff_el.estimate


def test_svychisq_pearson_psu_refuses(spark):
    df, *_ = _fixture(spark, n=100)
    des = SurveyDesign(df=df, weight_col="w", psu_col="psu")
    with pytest.raises(NotImplementedError, match="svychisq_rao_scott"):
        svychisq_pearson(des, "h", "g")


def test_svychisq_rao_scott_psu_degeneracy_and_inflation(spark):
    """psu=id reproduces the element bootstrap bit-for-bit; real
    clusters (correlated cells within PSU) inflate delta_bar."""
    df, psu, h, w, x, y, grp = _fixture(spark, n=400)
    dfc = df.withColumn("r2", (F.col("y") > 10.0).cast("int")).withColumn(
        "c2", (F.col("x") > 0.0).cast("int")
    )
    el = svychisq_rao_scott(
        SurveyDesign(df=dfc, weight_col="w"), "r2", "c2", "id",
        n_replicates=32,
    )
    deg = svychisq_rao_scott(
        SurveyDesign(df=dfc.withColumn("psuid", F.col("id")),
                     weight_col="w", psu_col="psuid"),
        "r2", "c2", "id", n_replicates=32,
    )
    assert deg.x2 == pytest.approx(el.x2, abs=0)
    assert deg.delta_bar == pytest.approx(el.delta_bar, abs=0)
    assert deg.p_rs == pytest.approx(el.p_rs, abs=0)
    # cluster bootstrap on PSU-duplicated data: delta_bar must grow
    # (each PSU's cells move together, inflating V_u).  The element
    # bootstrap needs UNIQUE element ids across the 3 copies; the
    # cluster bootstrap hashes the shared original id (= the PSU).
    dup = (
        dfc.withColumn("eid", F.col("id"))
        .unionByName(dfc.withColumn("eid", F.col("id") + 1_000_000))
        .unionByName(dfc.withColumn("eid", F.col("id") + 2_000_000))
    )
    el_dup = svychisq_rao_scott(
        SurveyDesign(df=dup, weight_col="w"), "r2", "c2", "eid",
        n_replicates=48,
    )
    cl_dup = svychisq_rao_scott(
        SurveyDesign(df=dup, weight_col="w", psu_col="id"),
        "r2", "c2", "eid", n_replicates=48,
    )
    assert cl_dup.delta_bar > el_dup.delta_bar * 1.5


def test_jackknife_psu_calibrated_matches_numpy(spark):
    df, psu, h, w, x, y, _ = _fixture(spark)
    # calibrate to "known" totals of (1, x): perturb the HT totals so
    # calibration actually moves the weights
    N = float(np.sum(w)) * 1.02
    Tx = float(np.sum(w * x)) * 0.98
    df2 = df.withColumn("one", F.lit(1.0))
    out = jackknife_psu_calibrated_mean(
        df2, "y", ["one", "x"], {"one": N, "x": Tx}, "w", "psu",
        n_groups=12,
    ).collect()[0]

    def greg_mean(sel_w, sel_mask):
        X = np.column_stack([np.ones(len(x)), x])[sel_mask]
        d = sel_w[sel_mask]
        gram = (X * d[:, None]).T @ X
        lam = np.linalg.solve(gram, np.array([N, Tx]) - d @ X)
        wcal = d * (1.0 + X @ lam)
        return float(np.sum(wcal * y[sel_mask]) / np.sum(wcal))

    G = 12
    allm = np.ones(len(y), bool)
    theta = greg_mean(w, allm)
    ss = 0.0
    for g in range(G):
        keep = (psu % G) != g
        ss += (greg_mean(w * G / (G - 1.0), keep) - theta) ** 2
    se = np.sqrt((G - 1.0) / G * ss)
    assert out["mean"] == pytest.approx(round(theta, 6), abs=1e-9)
    assert out["se_jk"] == pytest.approx(round(se, 6), abs=1e-9)


def test_jackknife_psu_calibrated_cross_checks_linearization(spark):
    """Intercept-only calibration leaves the mean invariant, so the
    DAGJK SE must approximate the linearized cluster-mean SE on a
    2-PSU-per-stratum fixture (the r14 verdict's cross-check shape)."""
    rng = np.random.default_rng(23)
    n_strata, n = 24, 960
    h = rng.integers(0, n_strata, size=n)
    side = rng.integers(0, 2, size=n)
    psu = h * 2 + side
    w = 1.0 + rng.integers(0, 5, size=n).astype(float)
    eff = rng.normal(0.0, 1.5, size=n_strata * 2)
    y = 5.0 + eff[psu] + rng.normal(0.0, 1.0, size=n)
    df = spark.createDataFrame(
        [
            (int(psu[i]), int(h[i]), float(w[i]), float(y[i]), 1.0)
            for i in range(n)
        ],
        "psu long, h long, w double, y double, one double",
    )
    N = float(np.sum(w))
    jk = jackknife_psu_calibrated_mean(
        df, "y", ["one"], {"one": N}, "w", "psu", n_groups=16
    ).collect()[0]
    lin = svymean(
        SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu"),
        "y",
    )[0]
    assert jk["mean"] == pytest.approx(lin.estimate, abs=1e-5)
    assert 0.5 <= jk["se_jk"] / lin.se <= 1.6


def test_jackknife_psu_calibrated_validates(spark):
    df, *_ = _fixture(spark, n=60)
    df2 = df.withColumn("one", F.lit(1.0))
    with pytest.raises(ValueError, match="at least 2 groups"):
        jackknife_psu_calibrated_mean(
            df2, "y", ["one"], [1.0], "w", "psu", n_groups=1
        )
    with pytest.raises(ValueError, match="expected 1 totals"):
        jackknife_psu_calibrated_mean(
            df2, "y", ["one"], [1.0, 2.0], "w", "psu"
        )


def test_svyciprop_and_svyby_delegate_psu(spark):
    """The dispatcher surface (svyciprop, svyby) inherits PSU handling
    from the moment kernels — pinned so a refactor can't silently
    reintroduce element-level SEs behind these front doors."""
    from data_integration_est_spark.kernels.stats import svyby, svyciprop

    df, psu, h, w, x, y, grp = _fixture(spark)
    dfi = df.withColumn("ind", (F.col("y") > 10.0).cast("double"))
    des = SurveyDesign(df=dfi, weight_col="w", strata_col="h",
                       psu_col="psu")
    el = SurveyDesign(df=dfi, weight_col="w")
    # svyciprop: se must equal svymean-on-indicator under the SAME
    # cluster design (and exceed the element-level se on this
    # cluster-correlated fixture)
    cp = svyciprop(des, "ind").collect()[0]
    sm = svymean(des, "ind")[0]
    assert cp["se"] == pytest.approx(sm.se, rel=1e-12)
    assert cp["se"] > svyciprop(el, "ind").collect()[0]["se"]
    # svyby(mean): per-domain rows equal the grouped psu svymean
    by = {r["g"]: r for r in svyby(des, "g", "y", stat="mean").collect()}
    for r in svymean(des, "y", group_cols=["g"]):
        assert by[r.key[0]]["est"] == pytest.approx(r.estimate, rel=1e-12)
        assert by[r.key[0]]["se"] == pytest.approx(r.se, rel=1e-12)


def test_svyglm_psu_poisson_matches_numpy(spark):
    """Poisson link shares the PSU sandwich machinery — pinned
    separately since a_w = w*mu differs from both other links."""
    df, psu, h, w, x, y, _ = _fixture(spark, n=400, n_psu=32)
    dfc = df.withColumn("yc", F.floor(F.abs(F.col("y")) / 4).cast("double"))
    yc = np.floor(np.abs(y) / 4)
    des = SurveyDesign(df=dfc, weight_col="w", strata_col="h", psu_col="psu")
    out = {r["term"]: r
           for r in svyglm(des, "yc ~ x", model_type="poisson").collect()}
    X = np.column_stack([np.ones(len(x)), x])
    beta = np.zeros(2)
    for _ in range(100):
        mu = np.exp(X @ beta)
        A = (X * (w * mu)[:, None]).T @ X
        g = (w * (yc - mu)) @ X
        step = np.linalg.solve(A, g)
        beta = beta + step
        if np.max(np.abs(step)) < 1e-12:
            break
    mu = np.exp(X @ beta)
    se = _np_cluster_sandwich(psu, h, w, X, yc - mu, w * mu)
    assert out["x"]["coef"] == pytest.approx(beta[1], abs=1e-5)
    assert out["x"]["se"] == pytest.approx(se[1], rel=1e-4, abs=1e-5)


def test_svyquantile_stratified_element_woodruff(spark):
    """r15: strata_col alone (no psu) now drives per-stratum
    df-corrected Woodruff pieces — matching the variance svymean
    reports on the same indicator under the same design (previously
    the SE was silently unstratified)."""
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h")
    q = 0.5
    row = svyquantile(des, "y", qs=(q,), alpha=0.05).collect()[0]
    W = float(np.sum(w))
    qhat = _weighted_quantile(y, w, q * W)
    z = (y <= qhat).astype(float)
    p = float(np.sum(w * z) / W)
    v = 0.0
    for hv in np.unique(h):
        sel = h == hv
        u = w[sel] * (z[sel] - p)
        n_h = int(sel.sum())
        v += n_h / (n_h - 1.0) * (float((u**2).sum())
                                  - float(u.sum()) ** 2 / n_h)
    se = np.sqrt(v) / W
    from statistics import NormalDist

    zc = NormalDist().inv_cdf(0.975)
    lo = _weighted_quantile(y, w, max(q - zc * se, 0.0) * W)
    hi = _weighted_quantile(y, w, min(q + zc * se, 1.0) * W)
    assert row["quantile"] == pytest.approx(qhat, abs=0)
    assert row["ci_l"] == pytest.approx(lo, abs=0)
    assert row["ci_u"] == pytest.approx(hi, abs=0)


def test_svyglm_stratified_element_matches_numpy(spark):
    """r15: strata_col alone now drives per-stratum df-corrected
    centered score moments in the svyglm sandwich (elements as the
    first-stage units; previously silently ignored)."""
    df, psu, h, w, x, y, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h")
    out = {r["term"]: r for r in svyglm(des, "y ~ x").collect()}
    X = np.column_stack([np.ones(len(x)), x])
    beta = _np_ols(w, X, y)
    resid = y - X @ beta
    k = 2
    A = (X * w[:, None]).T @ X
    M = np.zeros((k, k))
    for hv in np.unique(h):
        sel = h == hv
        U = (w[sel] * resid[sel])[:, None] * X[sel]
        n_h = int(sel.sum())
        S = U.sum(0)
        M += n_h / (n_h - 1.0) * (U.T @ U - np.outer(S, S) / n_h)
    V = np.linalg.solve(A, np.linalg.solve(A, M).T).T
    se = np.sqrt(np.clip(np.diag(V), 0.0, None))
    assert out["x"]["coef"] == pytest.approx(beta[1], abs=1e-6)
    assert out["x"]["se"] == pytest.approx(se[1], abs=2e-6)
    assert out["(Intercept)"]["se"] == pytest.approx(se[0], abs=2e-6)


def test_design_effect_total_and_ratio_psu_delegation(spark):
    """DEFF's total/ratio statistics delegate to the psu-honoring
    kernels too — pinned like the mean path."""
    from data_integration_est_spark.kernels.stats import svyratio, svytotal

    df, psu, h, w, x, y, _ = _fixture(spark)
    df2 = df.withColumn("xp", F.abs(F.col("x")) + 1.0)
    des = SurveyDesign(df=df2, weight_col="w", strata_col="h", psu_col="psu")
    dt = design_effect(des, "y", statistic="total")[0]
    vt = svytotal(des, "y")[0].variance
    assert dt.variance == pytest.approx(vt, rel=1e-12)
    dr = design_effect(des, "y", statistic="ratio", den_col="xp")[0]
    vr = svyratio(des, "y", "xp")[0].variance
    assert dr.variance == pytest.approx(vr, rel=1e-12)
    assert np.isfinite(dt.estimate) and np.isfinite(dr.estimate)

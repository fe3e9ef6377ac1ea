"""Numpy oracles for the replicate-weights API (r16 — kernels/repweights).

Every test recomputes the replicate construction from first principles
(group assignment, per-stratum rescaling, per-replicate GREG
re-calibration) in numpy and compares the engine's estimates/SEs, plus
cross-checks against the pre-existing single-purpose replicate kernels
(jackknife_psu_calibrated_mean, brr_mean) in the regimes where they
coincide.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.repweights import (
    ReplicateDesign,
    replicate_design,
    svycov_rep,
    svyglm_rep,
    svymean_rep,
    svyquantile_rep,
    svyratio_rep,
    svytotal_rep,
)


def _fixture(spark, n=200, n_psu_div=5, strata_div=10):
    """Deterministic element table: psu = id//5 (40 PSUs), stratum =
    psu//10 (4 strata, PSUs nest), w = 1 + id%7, x = id%5, y mixes a
    stratum effect with id noise."""
    rows = []
    for i in range(n):
        psu = i // n_psu_div
        h = psu // strata_div
        w = 1.0 + (i % 7)
        x = float(i % 5)
        y = 10.0 * h + x + ((i * 37) % 11) / 3.0
        rows.append((i, psu, h, w, x, y))
    return spark.createDataFrame(
        rows, "id long, psu long, h long, w double, x double, y double"
    ), np.array(rows, dtype=float)


def _np_dagjk(arr, G, strata=True, x_cols=(), stat=None):
    """Numpy replica of the stratified DAGJK replicate weights + the
    mean (or ``stat(w, arr)``) spread.  arr columns: id, psu, h, w, x, y."""
    psu, h, w, x, y = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4], arr[:, 5]
    g = psu.astype(np.int64) % G
    hh = h.astype(np.int64) if strata else np.zeros_like(g)
    stat = stat or (lambda wt: np.sum(wt * y) / np.sum(wt))
    # per-(h, g) distinct psu counts
    strata_vals = sorted(set(hh.tolist()))
    scale = {}
    for hv in strata_vals:
        psus = set(psu[hh == hv].astype(np.int64).tolist())
        n_h = len(psus)
        for gv in range(G):
            m = len({p for p in psus if p % G == gv})
            scale[(hv, gv)] = n_h / (n_h - m) if n_h > m else np.inf

    if x_cols:
        X = np.stack([np.ones_like(x), x], axis=1) if "one" in x_cols else x[:, None]
        T = (w[:, None] * X).sum(axis=0)  # uncalibrated w IS the full weight

    theta = stat(w)
    thetas = []
    for gv in range(G):
        keep = g != gv
        sc = np.array([scale[(hv, gv)] for hv in hh])
        wg = np.where(keep, w * sc, 0.0)
        if x_cols:
            A = (wg[:, None, None] * X[:, :, None] * X[:, None, :]).sum(axis=0)
            lam = np.linalg.solve(A, T - (wg[:, None] * X).sum(axis=0))
            wg = wg * (1.0 + X @ lam)
        thetas.append(stat(wg))
    V = (G - 1.0) / G * sum((t - theta) ** 2 for t in thetas)
    return theta, float(np.sqrt(V)), thetas


def test_dagjk_mean_unstratified_matches_numpy(spark):
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    got = svymean_rep(rd, "y").first()
    theta, se, _ = _np_dagjk(arr, 8, strata=False)
    assert got["mean"] == pytest.approx(theta, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)
    assert got["n_reps"] == 8


def test_dagjk_stratified_mean_matches_numpy(spark):
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    got = svymean_rep(rd, "y").first()
    theta, se, _ = _np_dagjk(arr, 8, strata=True)
    assert got["mean"] == pytest.approx(theta, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)


def test_stratified_dagjk_beats_unstratified_on_between_strata_signal(spark):
    """The planted between-strata fixture (verdict r15 #3): y carries a
    10·h stratum effect; stratified deletion preserves each stratum's
    weight share, so its variance drops the between-stratum component
    the unstratified DAGJK keeps."""
    df, arr = _fixture(spark)
    strat = replicate_design(
        SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu"),
        n_groups=8,
    )
    unstrat = replicate_design(
        SurveyDesign(df=df, weight_col="w", psu_col="psu"), n_groups=8
    )
    se_s = svymean_rep(strat, "y").first()["se"]
    se_u = svymean_rep(unstrat, "y").first()["se"]
    assert se_s < se_u


def test_dagjk_calibrated_replicates_hit_totals(spark):
    """Every replicate weight column reproduces the calibration totals
    exactly — the property that makes replicate variance valid for
    GREG estimators."""
    from data_integration_est_spark.kernels.linalg import calibrate

    df, _ = _fixture(spark)
    df = df.withColumn("one", df.w * 0 + 1.0)
    import pyspark.sql.functions as F

    tot = df.agg(F.sum("w").alias("t0"),
                 F.sum(F.col("w") * F.col("x")).alias("t1")).first()
    T0, T1 = float(tot["t0"]) * 1.05, float(tot["t1"]) * 0.95
    res = calibrate(df, ["one", "x"], {"one": T0, "x": T1},
                    d_col="w", out_col="wc")
    des = SurveyDesign(df=res.df, weight_col="wc", strata_col="h",
                       psu_col="psu", calibration_cols=["one", "x"],
                       base_weight_col="w")
    rd = replicate_design(des, n_groups=6)
    sums = rd.df.agg(*[
        F.sum(F.col(c) * F.col(xc)).alias(f"{i}_{j}")
        for i, c in enumerate(rd.rep_cols)
        for j, xc in enumerate(["one", "x"])
    ]).first()
    for i in range(len(rd.rep_cols)):
        assert float(sums[f"{i}_0"]) == pytest.approx(T0, rel=1e-9)
        assert float(sums[f"{i}_1"]) == pytest.approx(T1, rel=1e-9)


def test_dagjk_balanced_calibrated_matches_jackknife_kernel(spark):
    """On perfectly balanced groups (every group the same PSU count,
    no strata) the per-group scale n/(n-m_g) equals G/(G-1), so the
    general replicate path must reproduce
    ``jackknife_psu_calibrated_mean`` exactly."""
    from data_integration_est_spark.kernels.linalg import calibrate
    from data_integration_est_spark.kernels.replicate import (
        jackknife_psu_calibrated_mean,
    )
    import pyspark.sql.functions as F

    # psus 0..23, G=6 -> every group holds exactly 4 PSUs
    rows = [
        (i, i // 5, 1.0 + (i % 7), float(i % 5),
         float(i % 5) + ((i * 37) % 11) / 3.0, 1.0)
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "id long, psu long, w double, x double, y double, one double"
    )
    tot = df.agg(F.sum("w").alias("t0"),
                 F.sum(F.col("w") * F.col("x")).alias("t1")).first()
    totals = {"one": float(tot["t0"]) * 1.02, "x": float(tot["t1"]) * 0.98}
    jk = jackknife_psu_calibrated_mean(
        df, "y", ["one", "x"], totals, "w", "psu", n_groups=6
    ).first()
    res = calibrate(df, ["one", "x"], totals, d_col="w", out_col="wc")
    des = SurveyDesign(df=res.df, weight_col="wc", psu_col="psu",
                       calibration_cols=["one", "x"], base_weight_col="w")
    rd = replicate_design(des, n_groups=6)
    got = svymean_rep(rd, "y").first()
    assert got["mean"] == pytest.approx(jk["mean"], abs=2e-6)
    assert got["se"] == pytest.approx(jk["se_jk"], abs=2e-6)


def test_brr_rep_matches_brr_mean(spark):
    """method='brr' replicate columns reproduce the dedicated
    ``brr_mean`` kernel on a 2-PSU-per-stratum design."""
    from data_integration_est_spark.kernels.replicate import brr_mean

    rows = [
        (i, i % 6, (i // 6) % 2, 1.0 + (i % 4),
         float((i * 13) % 17) + 2.0 * (i % 6))
        for i in range(96)
    ]
    df = spark.createDataFrame(rows, "id long, h long, p long, w double, y double")
    ref = brr_mean(df, "y", "h", "p", weight_col="w").first()
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="p")
    rd = replicate_design(des, method="brr")
    got = svymean_rep(rd, "y").first()
    assert got["mean"] == pytest.approx(ref["mean"], abs=1e-6)
    assert got["se"] == pytest.approx(ref["se_brr"], abs=1e-6)
    assert got["n_reps"] == ref["n_replicates"]


def test_fay_rep_matches_brr_mean_fay(spark):
    from data_integration_est_spark.kernels.replicate import brr_mean

    rows = [
        (i, i % 6, (i // 6) % 2, 1.0 + (i % 4),
         float((i * 13) % 17) + 2.0 * (i % 6))
        for i in range(96)
    ]
    df = spark.createDataFrame(rows, "id long, h long, p long, w double, y double")
    ref = brr_mean(df, "y", "h", "p", weight_col="w", fay_rho=0.5).first()
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="p")
    rd = replicate_design(des, method="fay", fay_rho=0.5)
    got = svymean_rep(rd, "y").first()
    assert got["mean"] == pytest.approx(ref["mean"], abs=1e-6)
    assert got["se"] == pytest.approx(ref["se_brr"], abs=1e-6)


def test_svytotal_ratio_cov_rep_match_numpy(spark):
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    w, x, y = arr[:, 3], arr[:, 4], arr[:, 5]

    tot = svytotal_rep(rd, "y").first()
    th, se, _ = _np_dagjk(arr, 8, stat=lambda wt: np.sum(wt * y))
    assert tot["total"] == pytest.approx(th, rel=1e-7)
    assert tot["se"] == pytest.approx(se, rel=1e-6, abs=1e-6)

    rat = svyratio_rep(rd, "y", "x").first()
    th, se, _ = _np_dagjk(arr, 8, stat=lambda wt: np.sum(wt * y) / np.sum(wt * x))
    assert rat["ratio"] == pytest.approx(th, abs=1e-6)
    assert rat["se"] == pytest.approx(se, rel=1e-6, abs=1e-6)

    cov = svycov_rep(rd, "y", "x").first()

    def _cov(wt):
        sw = wt.sum()
        return (np.sum(wt * x * y) - np.sum(wt * x) * np.sum(wt * y) / sw) / sw

    th, se, _ = _np_dagjk(arr, 8, stat=_cov)
    assert cov["cov"] == pytest.approx(th, abs=1e-6)
    assert cov["se"] == pytest.approx(se, rel=1e-6, abs=1e-6)


def test_svyquantile_rep_matches_numpy(spark):
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    got = {r["q"]: r for r in svyquantile_rep(rd, "y", qs=(0.25, 0.5, 0.9)).collect()}

    # numpy replica: lower weighted quantile per weight vector
    w, y = arr[:, 3], arr[:, 5]

    def wq(wt, q):
        order = np.argsort(y, kind="stable")
        cum = np.cumsum(wt[order])
        target = q * wt.sum()
        idx = int(np.searchsorted(cum, target - 1e-12))
        return float(y[order][min(idx, len(y) - 1)])

    for q in (0.25, 0.5, 0.9):
        theta, se, _ = _np_dagjk(arr, 8, stat=lambda wt, q=q: wq(wt, q))
        assert got[q]["quantile"] == pytest.approx(theta, abs=1e-6)
        assert got[q]["se"] == pytest.approx(se, abs=1e-6)


def test_svyglm_rep_linear_matches_numpy(spark):
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    got = {r["term"]: r for r in svyglm_rep(rd, "y ~ x").collect()}
    x, y = arr[:, 4], arr[:, 5]
    X = np.stack([np.ones_like(x), x], axis=1)

    def wls(wt):
        A = (wt[:, None, None] * X[:, :, None] * X[:, None, :]).sum(axis=0)
        b = (wt[:, None] * X * y[:, None]).sum(axis=0)
        return np.linalg.solve(A, b)

    b0, se0, _ = _np_dagjk(arr, 8, stat=lambda wt: wls(wt)[0])
    b1, se1, _ = _np_dagjk(arr, 8, stat=lambda wt: wls(wt)[1])
    assert got["(Intercept)"]["coef"] == pytest.approx(b0, abs=1e-6)
    assert got["(Intercept)"]["se"] == pytest.approx(se0, abs=1e-6)
    assert got["x"]["coef"] == pytest.approx(b1, abs=1e-6)
    assert got["x"]["se"] == pytest.approx(se1, abs=1e-6)


def test_svyglm_rep_logistic_coef_matches_full_fit(spark):
    import pyspark.sql.functions as F

    from data_integration_est_spark.kernels.linalg import fit_logistic

    df, _ = _fixture(spark)
    df = df.withColumn("yb", (F.col("y") > 20.0).cast("double"))
    des = SurveyDesign(df=df, weight_col="w", psu_col="psu")
    rd = replicate_design(des, n_groups=6)
    got = {r["term"]: r for r in svyglm_rep(rd, "yb ~ x", "logistic").collect()}
    full = fit_logistic(df, y_col="yb", x_cols=["x"], weight_col="w")
    beta = full.coef_for(())
    assert got["(Intercept)"]["coef"] == pytest.approx(float(beta[0]), abs=1e-5)
    assert got["x"]["coef"] == pytest.approx(float(beta[1]), abs=1e-5)
    assert got["x"]["se"] is not None and got["x"]["se"] > 0


def test_calibrated_cluster_quantile_now_has_a_variance_path(spark):
    """The r15 refusal class end-to-end: calibrated + psu svyquantile
    refuses under linearization but solves under replicate weights."""
    import pyspark.sql.functions as F

    from data_integration_est_spark.kernels.linalg import calibrate
    from data_integration_est_spark.kernels.quantile import svyquantile

    df, _ = _fixture(spark)
    df = df.withColumn("one", F.lit(1.0))
    tot = df.agg(F.sum("w").alias("t0"),
                 F.sum(F.col("w") * F.col("x")).alias("t1")).first()
    res = calibrate(
        df, ["one", "x"],
        {"one": float(tot["t0"]) * 1.02, "x": float(tot["t1"]) * 0.98},
        d_col="w", out_col="wc",
    )
    des = SurveyDesign(df=res.df, weight_col="wc", strata_col="h",
                       psu_col="psu", calibration_cols=["one", "x"],
                       base_weight_col="w")
    with pytest.raises(NotImplementedError, match="replicate_design"):
        svyquantile(des, "y", qs=(0.5,), alpha=0.05)
    rd = replicate_design(des, n_groups=6)
    row = svyquantile_rep(rd, "y", qs=(0.5,)).first()
    assert row["quantile"] is not None
    assert row["se"] is not None and row["se"] > 0


def test_guards(spark):
    df, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    with pytest.raises(ValueError, match="empty groups"):
        replicate_design(des, n_groups=64)  # only 40 PSUs
    with pytest.raises(ValueError, match="at least 2 groups"):
        replicate_design(des, n_groups=1)
    with pytest.raises(ValueError, match="fay_rho"):
        replicate_design(des, method="fay", fay_rho=1.5)
    with pytest.raises(ValueError, match="first-stage unit"):
        replicate_design(SurveyDesign(df=df, weight_col="w"))
    # a stratum whose PSUs all share one group: psus 0..3 in stratum 0,
    # G=4 -> every group holds exactly one PSU of the 4; shrink to a
    # 1-PSU stratum instead
    rows = [(i, i // 10, 0 if i < 10 else 1, 1.0, float(i)) for i in range(30)]
    small = spark.createDataFrame(rows, "id long, psu long, h long, w double, y double")
    sdes = SurveyDesign(df=small, weight_col="w", strata_col="h", psu_col="psu")
    with pytest.raises(ValueError, match="delete the"):
        replicate_design(sdes, n_groups=2)
    with pytest.raises(ValueError, match="two PSUs"):
        replicate_design(sdes, method="brr")


def test_element_design_dagjk_via_unit_col(spark):
    """DAGJK on an element design: unit_col = the element id."""
    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w")
    rd = replicate_design(des, n_groups=10, unit_col="id")
    got = svymean_rep(rd, "y").first()
    arr2 = arr.copy()
    arr2[:, 1] = arr[:, 0]  # psu := id
    theta, se, _ = _np_dagjk(arr2, 10, strata=False)
    assert got["mean"] == pytest.approx(theta, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)


# --- svyby_rep: distributed domain estimation (late-r16) ---


def test_svyby_rep_single_domain_matches_scalar_kernels(spark):
    """A constant domain column must reproduce the scalar kernels
    exactly (same rounding, same SE)."""
    from pyspark.sql import functions as F

    from data_integration_est_spark.kernels.repweights import svyby_rep

    df, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    rd_one = ReplicateDesign(
        df=rd.df.withColumn("dom", F.lit("all")),
        weight_col=rd.weight_col, rep_cols=rd.rep_cols, mult=rd.mult,
        method=rd.method, strata_col=rd.strata_col, psu_col=rd.psu_col,
    )
    by_mean = svyby_rep(rd_one, "dom", "y").first()
    sc_mean = svymean_rep(rd, "y").first()
    assert by_mean["mean"] == sc_mean["mean"]
    assert by_mean["se"] == sc_mean["se"]
    by_tot = svyby_rep(rd_one, "dom", "y", stat="total").first()
    sc_tot = svytotal_rep(rd, "y").first()
    assert by_tot["total"] == sc_tot["total"]
    assert by_tot["se"] == sc_tot["se"]
    by_rat = svyby_rep(rd_one, "dom", "y", stat="ratio", den_col="w").first()
    sc_rat = svyratio_rep(rd, "y", "w").first()
    assert by_rat["ratio"] == sc_rat["ratio"]
    assert by_rat["se"] == sc_rat["se"]


def test_svyby_rep_domain_means_match_numpy(spark):
    """Per-domain (id % 3) means + SEs against the numpy DAGJK replica
    restricted to each domain."""
    from pyspark.sql import functions as F

    from data_integration_est_spark.kernels.repweights import svyby_rep

    df, arr = _fixture(spark)
    des = SurveyDesign(
        df=df.withColumn("dom", F.col("id") % 3),
        weight_col="w", strata_col="h", psu_col="psu",
    )
    rd = replicate_design(des, n_groups=8)
    got = {r["dom"]: r for r in svyby_rep(rd, "dom", "y").collect()}
    assert set(got) == {0, 1, 2}
    ids, y = arr[:, 0].astype(int), arr[:, 5]
    for dom in (0, 1, 2):
        mask = (ids % 3) == dom
        theta, se, _ = _np_dagjk(
            arr, 8, strata=True,
            stat=lambda wt: np.sum(wt[mask] * y[mask]) / np.sum(wt[mask]),
        )
        assert got[dom]["mean"] == pytest.approx(theta, abs=1e-6), dom
        assert got[dom]["se"] == pytest.approx(se, abs=1e-6), dom
        assert got[dom]["n"] == int(mask.sum())


def test_svyby_rep_domain_totals_and_ratios_match_numpy(spark):
    from pyspark.sql import functions as F

    from data_integration_est_spark.kernels.repweights import svyby_rep

    df, arr = _fixture(spark)
    des = SurveyDesign(
        df=df.withColumn("dom", F.col("id") % 2),
        weight_col="w", strata_col="h", psu_col="psu",
    )
    rd = replicate_design(des, n_groups=8)
    tot = {r["dom"]: r for r in
           svyby_rep(rd, "dom", "y", stat="total").collect()}
    rat = {r["dom"]: r for r in
           svyby_rep(rd, "dom", "y", stat="ratio", den_col="x").collect()}
    ids, x, y = arr[:, 0].astype(int), arr[:, 4], arr[:, 5]
    for dom in (0, 1):
        mask = (ids % 2) == dom
        t_theta, t_se, _ = _np_dagjk(
            arr, 8, strata=True,
            stat=lambda wt: np.sum(wt[mask] * y[mask]),
        )
        assert tot[dom]["total"] == pytest.approx(t_theta, abs=1e-5), dom
        assert tot[dom]["se"] == pytest.approx(t_se, abs=1e-5), dom
        r_theta, r_se, _ = _np_dagjk(
            arr, 8, strata=True,
            stat=lambda wt: np.sum(wt[mask] * y[mask]) / np.sum(wt[mask] * x[mask]),
        )
        assert rat[dom]["ratio"] == pytest.approx(r_theta, abs=1e-6), dom
        assert rat[dom]["se"] == pytest.approx(r_se, abs=1e-6), dom


def test_svyby_rep_emptied_domain_nulls_se(spark):
    """A domain living entirely inside one replicate group: deleting
    that group empties the domain -> mean SE is NULL (the _rep_se
    contract), while the total's SE stays finite (theta_g = 0 is a
    legitimate replicate total)."""
    from pyspark.sql import functions as F

    from data_integration_est_spark.kernels.repweights import svyby_rep

    df, _ = _fixture(spark)
    des = SurveyDesign(
        df=df.withColumn(
            "dom",
            F.when(F.col("psu") % 4 == 0, F.lit("rare")).otherwise("common"),
        ),
        weight_col="w", strata_col="h", psu_col="psu",
    )
    rd = replicate_design(des, n_groups=4)  # group 0 holds ALL of "rare"
    rows = {r["dom"]: r for r in svyby_rep(rd, "dom", "y").collect()}
    assert rows["rare"]["se"] is None
    assert rows["rare"]["mean"] is not None
    assert rows["common"]["se"] is not None
    tots = {r["dom"]: r for r in
            svyby_rep(rd, "dom", "y", stat="total").collect()}
    assert tots["rare"]["se"] is not None


def test_svyby_rep_validation(spark):
    from data_integration_est_spark.kernels.repweights import svyby_rep

    df, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    with pytest.raises(ValueError, match="stat must be"):
        svyby_rep(rd, "h", "y", stat="median")
    with pytest.raises(ValueError, match="needs den_col"):
        svyby_rep(rd, "h", "y", stat="ratio")


def test_with_replicates_reproduces_svymean_rep(spark):
    from pyspark.sql import functions as F
    from data_integration_est_spark.kernels.repweights import (
        with_replicates,
    )

    df, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    ref = svymean_rep(rd, "y").first()
    got = with_replicates(
        rd, {"wy": F.col("y"), "w1": F.lit(1.0)},
        lambda s: s["wy"] / s["w1"], name="mean", dropna=["y"],
    ).first()
    assert got["mean"] == pytest.approx(ref["mean"], abs=1e-6)
    assert got["se"] == pytest.approx(ref["se"], abs=1e-6)
    assert got["n_reps"] == 8


def test_svycorr_rep_matches_numpy(spark):
    from data_integration_est_spark.kernels.repweights import svycorr_rep

    df, arr = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    got = svycorr_rep(rd, "y", "x").first()

    def _corr(wt):
        x, y = arr[:, 4], arr[:, 5]
        W = wt.sum()
        mx, my = (wt * x).sum() / W, (wt * y).sum() / W
        cxy = (wt * x * y).sum() / W - mx * my
        cxx = (wt * x * x).sum() / W - mx * mx
        cyy = (wt * y * y).sum() / W - my * my
        return cxy / np.sqrt(cxx * cyy)

    theta, se, _ = _np_dagjk(arr, 8, strata=True, stat=_corr)
    assert got["corr"] == pytest.approx(theta, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)
    # correlation is scale/location invariant; bounded
    assert -1.0 <= got["corr"] <= 1.0


def test_svycorr_rep_calibrated_design(spark):
    """with_replicates consumes calibrated replicate weights unchanged:
    the per-replicate GREG re-solve lives in replicate_design, so the
    generic kernel needs no calibration awareness.  Totals equal the
    base-weight sums, so the full calibrated weights coincide with the
    base weights (lambda = 0) while every REPLICATE still re-solves a
    nontrivial lambda -- the numpy oracle replays exactly that."""
    from data_integration_est_spark.kernels.linalg import calibrate
    from data_integration_est_spark.kernels.repweights import svycorr_rep
    import pyspark.sql.functions as F

    df, arr = _fixture(spark)
    df = df.withColumn("one", df.w * 0 + 1.0)
    w, x = arr[:, 3], arr[:, 4]
    T0, T1 = float(w.sum()), float((w * x).sum())
    res = calibrate(df, ["one", "x"], {"one": T0, "x": T1},
                    d_col="w", out_col="wc")
    des = SurveyDesign(df=res.df, weight_col="wc", strata_col="h",
                       psu_col="psu", calibration_cols=["one", "x"],
                       base_weight_col="w")
    rd = replicate_design(des, n_groups=8)
    got = svycorr_rep(rd, "y", "x").first()

    def _corr(wt):
        xx, y = arr[:, 4], arr[:, 5]
        W = wt.sum()
        mx, my = (wt * xx).sum() / W, (wt * y).sum() / W
        cxy = (wt * xx * y).sum() / W - mx * my
        cxx = (wt * xx * xx).sum() / W - mx * mx
        cyy = (wt * y * y).sum() / W - my * my
        return cxy / np.sqrt(cxx * cyy)

    theta, se, _ = _np_dagjk(
        arr, 8, strata=True, x_cols=("one", "x"), stat=_corr)
    assert got["corr"] == pytest.approx(theta, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)


def test_with_replicates_degenerate_replicate_nulls_se(spark):
    from pyspark.sql import functions as F
    from data_integration_est_spark.kernels.repweights import (
        with_replicates,
    )

    df, _ = _fixture(spark)
    des = SurveyDesign(df=df, weight_col="w", strata_col="h", psu_col="psu")
    rd = replicate_design(des, n_groups=8)
    calls = []

    def _flaky(s):
        calls.append(1)
        return None if len(calls) == 3 else s["wy"]

    got = with_replicates(
        rd, {"wy": F.col("y")}, _flaky, name="est",
    ).first()
    assert got["est"] is not None and got["se"] is None
    # and a degenerate FULL sample refuses loudly
    with pytest.raises(ValueError, match="FULL-sample"):
        with_replicates(rd, {"wy": F.col("y")}, lambda s: None)

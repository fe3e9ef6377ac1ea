"""Exact weighted quantiles (``kernels/quantile.svyquantile``) vs the
numpy sort-and-cumsum oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.quantile import svyquantile


def _np_wquantile(y, w, q):
    o = np.argsort(y, kind="mergesort")
    cw = np.cumsum(w[o])
    tgt = q * w.sum()
    return float(y[o][np.searchsorted(cw, tgt, side="left")])


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(11)
    n = 30_000
    import pandas as pd

    pdf = pd.DataFrame({
        "g": rng.integers(0, 3, n).astype(str),
        "y": np.round(rng.normal(50, 12, n), 3),
        "w": rng.integers(1, 9, n).astype(float),  # integer weights: exact fp
    })
    return spark.createDataFrame(pdf), pdf


def test_svyquantile_matches_numpy(data):
    df, pdf = data
    des = SurveyDesign(df=df, weight_col="w")
    out = svyquantile(des, "y", qs=(0.1, 0.5, 0.9), group_cols=["g"])
    got = {(r["g"], r["q"]): r["quantile"] for r in out.collect()}
    for g in sorted(pdf.g.unique()):
        m = pdf.g == g
        for q in (0.1, 0.5, 0.9):
            want = _np_wquantile(pdf.y[m].to_numpy(), pdf.w[m].to_numpy(), q)
            assert got[(g, q)] == want, (g, q)


def test_svyquantile_ungrouped_and_unweighted_median(data):
    df, pdf = data
    uw = df.withColumn("one", F.lit(1.0))
    des = SurveyDesign(df=uw, weight_col="one")
    got = svyquantile(des, "y", qs=(0.5,)).collect()[0]["quantile"]
    want = _np_wquantile(pdf.y.to_numpy(), np.ones(len(pdf)), 0.5)
    assert got == want


def test_svyquantile_heavy_ties(spark):
    # mass concentrated on few values: brackets collapse onto ties
    df = spark.createDataFrame(
        [(7.0, 5.0)] * 100 + [(9.0, 1.0)] * 100 + [(1.0, 2.0)] * 50,
        "y double, w double",
    )
    des = SurveyDesign(df=df, weight_col="w")
    got = {r["q"]: r["quantile"]
           for r in svyquantile(des, "y", qs=(0.05, 0.5, 0.99)).collect()}
    # W = 500+100+100 = 700; cum: 1.0->100, 7.0->600, 9.0->700
    assert got[0.05] == 1.0 and got[0.5] == 7.0 and got[0.99] == 9.0


def test_svyquantile_constant_column(spark):
    df = spark.createDataFrame([(3.5, 2.0)] * 10, "y double, w double")
    des = SurveyDesign(df=df, weight_col="w")
    assert svyquantile(des, "y", qs=(0.5,)).collect()[0]["quantile"] == 3.5


def test_svyquantile_bad_q(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, w double")
    with pytest.raises(ValueError, match="q must be"):
        svyquantile(SurveyDesign(df=df, weight_col="w"), "y", qs=(1.5,))


def test_trim_weights_caps_and_preserves_total(spark):
    from data_integration_est_spark.kernels.quantile import trim_weights

    rows = [(i, 1.0 + (i % 5)) for i in range(1000)]
    rows += [(1000 + i, 500.0) for i in range(5)]  # extreme weights
    df = spark.createDataFrame(rows, "id long, w double")
    des = SurveyDesign(df=df, weight_col="w")
    out = trim_weights(des, upper_quantile=0.95)
    agg = out.agg(
        F.sum("w").alias("tw"), F.sum("w_trim").alias("tt"),
        F.max("w").alias("mw"), F.max("w_trim").alias("mt"),
    ).collect()[0]
    assert agg["tt"] == pytest.approx(agg["tw"], rel=1e-12)  # total preserved
    assert agg["mt"] < agg["mw"] / 10  # extremes actually clipped
    assert out.filter(F.col("w_trim") <= 0).count() == 0


def test_trim_weights_noop_when_uniform(spark):
    from data_integration_est_spark.kernels.quantile import trim_weights

    df = spark.createDataFrame([(i, 2.0) for i in range(100)], "id long, w double")
    out = trim_weights(SurveyDesign(df=df, weight_col="w"), 0.9)
    assert out.filter(F.col("w_trim") != 2.0).count() == 0


def test_trim_weights_bad_quantile(spark):
    from data_integration_est_spark.kernels.quantile import trim_weights

    df = spark.createDataFrame([(1, 1.0)], "id long, w double")
    with pytest.raises(ValueError, match="upper_quantile"):
        trim_weights(SurveyDesign(df=df, weight_col="w"), 1.0)


def _np_woodruff_ci(y, w, q, alpha=0.05):
    """Independent numpy Woodruff CI: linearization SE of the indicator
    mean at the point quantile, inverted through the weighted quantile
    function (the module docstring's formula, recomputed from scratch)."""
    from statistics import NormalDist

    qhat = _np_wquantile(y, w, q)
    W, n = w.sum(), len(y)
    z = (y <= qhat).astype(float)
    p = float((w * z).sum() / W)
    sum_w2e2 = float((w * w * (z - p) ** 2).sum())
    se = np.sqrt(n / (n - 1.0) * sum_w2e2 / (W * W))
    zc = NormalDist().inv_cdf(1.0 - alpha / 2.0)
    lo = _np_wquantile(y, w, max(q - zc * se, 0.0)) if q - zc * se > 0 else y.min()
    hi = _np_wquantile(y, w, min(q + zc * se, 1.0))
    return qhat, lo, hi


def test_svyquantile_woodruff_ci_matches_numpy(data):
    df, pdf = data
    des = SurveyDesign(df=df, weight_col="w")
    out = svyquantile(des, "y", qs=(0.25, 0.5), group_cols=["g"], alpha=0.05)
    got = {(r["g"], r["q"]): (r["quantile"], r["ci_l"], r["ci_u"])
           for r in out.collect()}
    for g in sorted(pdf.g.unique()):
        m = pdf.g == g
        yv, wv = pdf.y[m].to_numpy(), pdf.w[m].to_numpy()
        for q in (0.25, 0.5):
            want = _np_woodruff_ci(yv, wv, q)
            gq, gl, gu = got[(g, q)]
            assert (gq, gl, gu) == want, (g, q)
            assert gl <= gq <= gu


def test_svyquantile_ci_null_for_singleton_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0), ("b", 4.0, 1.0)],
        "g string, y double, w double",
    )
    out = svyquantile(SurveyDesign(df=df, weight_col="w"), "y",
                      qs=(0.5,), group_cols=["g"], alpha=0.05)
    rows = {r["g"]: r for r in out.collect()}
    assert rows["a"]["ci_l"] is None and rows["a"]["ci_u"] is None
    assert rows["b"]["ci_l"] is not None


def test_svyquantile_persists_and_releases_base(data, monkeypatch):
    """The n_narrow+2 passes must ride a persisted projection (scan the
    source once at scale) and release it on exit."""
    df, _ = data
    cls = type(df)  # the concrete DataFrame class (classic vs connect)
    calls = {"persist": 0, "unpersist": 0}
    orig_p, orig_u = cls.persist, cls.unpersist

    def spy_p(self, *a, **k):
        calls["persist"] += 1
        return orig_p(self, *a, **k)

    def spy_u(self, *a, **k):
        calls["unpersist"] += 1
        return orig_u(self, *a, **k)

    monkeypatch.setattr(cls, "persist", spy_p)
    monkeypatch.setattr(cls, "unpersist", spy_u)
    svyquantile(SurveyDesign(df=df, weight_col="w"), "y", qs=(0.5,)).collect()
    assert calls["persist"] >= 1
    assert calls["unpersist"] == calls["persist"]


def test_svyquantile_pass_count(data, monkeypatch):
    """Pass-count guard: the point solve is exactly 1 (stats) + n_narrow
    (histograms) + 1 (final) aggregation passes on continuous data; the
    CI variant adds 1 moment pass + one more bisection solve (its
    brackets may collapse early).  Counted as collect() calls — Spark
    job counts are inflated by AQE/broadcast sub-jobs."""
    df, _ = data
    cls = type(df)
    calls = {"collect": 0}
    orig = cls.collect

    def spy(self, *a, **k):
        calls["collect"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "collect", spy)
    des = SurveyDesign(df=df, weight_col="w")
    svyquantile(des, "y", qs=(0.5,), n_narrow=3)
    assert calls["collect"] == 5    # stats + 3 hists + final
    calls["collect"] = 0
    svyquantile(des, "y", qs=(0.5,), n_narrow=3, alpha=0.05)
    assert 7 <= calls["collect"] <= 10  # + moments + (<=3 hists + final)


def test_trimmed_and_winsorized_mean_match_numpy(data):
    from data_integration_est_spark.kernels.quantile import trimmed_mean

    df, pdf = data
    des = SurveyDesign(df=df, weight_col="w")
    got_t = {r["g"]: r for r in
             trimmed_mean(des, "y", 0.1, 0.9, group_cols=["g"]).collect()}
    got_w = {r["g"]: r for r in
             trimmed_mean(des, "y", 0.1, 0.9, winsorize=True,
                          group_cols=["g"]).collect()}
    for g in sorted(pdf.g.unique()):
        sub = pdf[pdf.g == g]
        yv, wv = sub.y.to_numpy(), sub.w.to_numpy()
        lo = _np_wquantile(yv, wv, 0.1)
        hi = _np_wquantile(yv, wv, 0.9)
        m = (yv >= lo) & (yv <= hi)
        want_t = float((wv[m] * yv[m]).sum() / wv[m].sum())
        yc = np.clip(yv, lo, hi)
        want_w = float((wv * yc).sum() / wv.sum())
        assert got_t[g]["q_lo"] == lo and got_t[g]["q_hi"] == hi
        assert got_t[g]["mean"] == pytest.approx(want_t, rel=1e-12)
        assert got_t[g]["n_used"] == int(m.sum())
        assert got_w[g]["mean"] == pytest.approx(want_w, rel=1e-12)
        assert got_w[g]["n_used"] == len(sub)
        # winsorized pulls toward the trimmed value vs the raw mean
    with pytest.raises(ValueError, match="lower"):
        trimmed_mean(des, "y", 0.9, 0.1)

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

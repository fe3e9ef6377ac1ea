"""Poisson-bootstrap replicate variance (``kernels/replicate``): exact
numpy replay of the hash arithmetic, SE sanity vs sd/sqrt(n), and the
one-pass plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.replicate import (
    _POIS1_CDF, _POIS1_P, _QH_A1, _QH_A2, _QH_B1, _QH_B2, _QH_C2,
    poisson_bootstrap_mean,
)


def _np_replay(ids, ws, ys, n_reps):
    """Independent numpy implementation of the same deterministic
    bootstrap (quadratic hash -> Poisson count -> replicate means -> sd)."""
    thetas = []
    for r in range(n_reps):
        h1 = (ids * _QH_A1 + r * _QH_B1) % _POIS1_P
        h = (((h1 * h1) % _POIS1_P) * _QH_A2 + h1 * _QH_B2 + r * _QH_C2) % _POIS1_P
        m = np.searchsorted(np.array(_POIS1_CDF), h, side="right").astype(float)
        thetas.append(np.sum(m * ws * ys) / np.sum(m * ws))
    mean = np.sum(ws * ys) / np.sum(ws)
    return round(float(mean), 6), round(float(np.std(thetas, ddof=1)), 6)


def test_bootstrap_matches_numpy_replay(spark):
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    ws = 1.0 + (ids % 4)
    ys = np.sin(ids * 0.37) * 3.0 + 10.0
    df = spark.createDataFrame(
        [(int(i), float(w), float(y)) for i, w, y in zip(ids, ws, ys)],
        "id long, w double, y double",
    )
    got = poisson_bootstrap_mean(df, "y", "id", weight_col="w",
                                 n_replicates=40).collect()[0]
    want_mean, want_se = _np_replay(ids, ws, ys, 40)
    assert got["mean"] == pytest.approx(want_mean, abs=1e-6)
    assert got["se_boot"] == pytest.approx(want_se, abs=1e-6)
    assert got["n_replicates"] == 40


@pytest.mark.parametrize(
    "y_sql",
    [
        "sin(cast(id AS double) * 0.7919) * 5.0",            # smooth
        "cast(id % 13 AS double)",                            # periodic
        "CASE WHEN id % 17 = 0 THEN 50.0 ELSE 1.0 END",      # spiky
    ],
    ids=["smooth", "periodic", "spiky"],
)
def test_bootstrap_se_tracks_srs_formula(spark, y_sql):
    y_expr = F.expr(y_sql)
    """Unweighted IID-ish data: bootstrap SE must sit near sd/sqrt(n).
    This is the guard against lattice-structured hash uniforms — an
    affine (id*a+r*b)%m design deflated the SE ~3x before the quadratic
    mix (would fail this band at ratio 0.35)."""
    n = 20_000
    df = spark.range(n).select(F.col("id"), y_expr.alias("y"))
    stats = df.agg(
        F.stddev_samp("y").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    expect = float(stats["s"]) / float(stats["n"]) ** 0.5
    got = poisson_bootstrap_mean(df, "y", "id", n_replicates=64).collect()[0]
    assert got["se_boot"] == pytest.approx(expect, rel=0.35)


def test_bootstrap_null_y_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0)], "id long, y double"
    )
    got = poisson_bootstrap_mean(df, "y", "id", n_replicates=8).collect()[0]
    assert got["mean"] == pytest.approx(15.0)


def test_bootstrap_single_pass_plan(spark):
    """The replicate sums must ride ONE aggregation over the input: the
    only Generate (the R-row stack unpivot) sits ABOVE the input-facing
    Aggregate — i.e. it unpivots the 1-row agg result, it does not
    explode the data R-fold before aggregating.  No join anywhere."""
    df = spark.range(1000).select(F.col("id"), F.col("id").cast("double").alias("y"))
    out = poisson_bootstrap_mean(df, "y", "id", n_replicates=16)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # tree prints parents first: an input-side Aggregate must appear
    # AFTER (below) the Generate, with the scan at the bottom
    gen = plan.index("Generate")
    assert "Aggregate" in plan[gen:], "no aggregation below the unpivot"
    assert plan.index("Range") > gen


def test_bootstrap_rejects_tiny_r(spark):
    df = spark.range(10).select(F.col("id"), F.lit(1.0).alias("y"))
    with pytest.raises(ValueError, match="at least 2"):
        poisson_bootstrap_mean(df, "y", "id", n_replicates=1)


def test_jackknife_ratio_matches_numpy_replay(spark):
    from data_integration_est_spark.kernels.replicate import jackknife_ratio

    n, G = 4000, 20
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(77)
    # iid draws everywhere: deterministic-in-id data (periodic y, or
    # w = id%4 whose classes align with the id%G groups) makes the
    # systematic delete-a-group partition non-exchangeable and biases
    # the jackknife away from the linearized SE
    ws = rng.integers(1, 5, n).astype(float)
    ys = rng.normal(10.0, 2.0, n)
    xs = rng.normal(3.0, 0.5, n).clip(1.0)
    df = spark.createDataFrame(
        [(int(i), float(w), float(y), float(x))
         for i, w, y, x in zip(ids, ws, ys, xs)],
        "id long, w double, y double, x double",
    )
    got = jackknife_ratio(df, "y", "x", "id", weight_col="w",
                          n_groups=G).collect()[0]
    g = ids % G
    swy = np.array([(ws * ys)[g == h].sum() for h in range(G)])
    swx = np.array([(ws * xs)[g == h].sum() for h in range(G)])
    R = swy.sum() / swx.sum()
    th = (swy.sum() - swy) / (swx.sum() - swx)
    se = np.sqrt((G - 1) / G * ((th - R) ** 2).sum())
    assert got["ratio"] == pytest.approx(round(R, 6), abs=1e-6)
    assert got["se_jk"] == pytest.approx(round(se, 6), abs=1e-6)
    # replicate SE of a smooth ratio should sit near the linearized SE
    from data_integration_est_spark.design import SurveyDesign
    from data_integration_est_spark.kernels.stats import svyratio

    lin = svyratio(SurveyDesign(df=df, weight_col="w"), "y", "x")[0]
    assert got["se_jk"] == pytest.approx(lin.se, rel=0.25)

"""Two-phase regression estimator (``estimators/twophase``) vs a numpy
replay of the Cochran double-sampling formulas, plus behavioral checks
(regression gain over the naive phase-2 mean; validation)."""

import numpy as np
import pytest

from data_integration_est_spark.estimators.twophase import (
    twophase_regression_mean,
)


def _np_twophase(x, y, p2, N=None):
    n1 = len(x)
    m2 = p2.astype(bool)
    x2, y2 = x[m2], y[m2]
    n2 = len(x2)
    b = np.sum((x2 - x2.mean()) * (y2 - y2.mean())) / np.sum(
        (x2 - x2.mean()) ** 2
    )
    est = y2.mean() + b * (x.mean() - x2.mean())
    ssy = np.sum((y2 - y2.mean()) ** 2)
    ssxy = np.sum((x2 - x2.mean()) * (y2 - y2.mean()))
    s2_y = ssy / (n2 - 1)
    s2_e = max(0.0, ssy - b * ssxy) / (n2 - 2)
    inv_N = 0.0 if N is None else 1.0 / N
    v = s2_e * (1 / n2 - 1 / n1) + s2_y * (1 / n1 - inv_N)
    return est, np.sqrt(max(0.0, v)), b


@pytest.fixture(scope="module")
def phase_data(spark):
    rng = np.random.RandomState(9)
    n1 = 5000
    x = rng.normal(50, 10, n1)
    y = 3.0 + 0.8 * x + rng.normal(0, 2, n1)  # strong x-y relation
    p2 = (rng.uniform(size=n1) < 0.1).astype(int)
    df = spark.createDataFrame(
        [
            (float(a), float(bb) if m else None, int(m))
            for a, bb, m in zip(x, y, p2)
        ],
        "x double, y double, in2 int",
    )
    return df, (x, y, p2)


def test_twophase_matches_numpy(phase_data):
    df, (x, y, p2) = phase_data
    for N in (None, 1_000_000.0):
        got = twophase_regression_mean(df, "y", "x", "in2", N=N)
        est, se, b = _np_twophase(x, y, p2, N)
        assert got.estimate == pytest.approx(est, rel=1e-10)
        assert got.se == pytest.approx(se, rel=1e-10)
        assert got.b == pytest.approx(b, rel=1e-10)
        assert got.n1 == len(x) and got.n2 == int(p2.sum())


def test_twophase_beats_naive_phase2_mean(phase_data):
    """With a strong x-y relation the regression estimator's SE must be
    well under the naive phase-2-only SE (the reason the design exists)."""
    df, (x, y, p2) = phase_data
    got = twophase_regression_mean(df, "y", "x", "in2")
    y2 = y[p2.astype(bool)]
    naive_se = np.std(y2, ddof=1) / np.sqrt(len(y2))
    assert got.se < 0.5 * naive_se


def test_twophase_validates(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 1), (2.0, 2.0, 1), (3.0, None, 0)],
        "x double, y double, in2 int",
    )
    with pytest.raises(ValueError, match="too small"):
        twophase_regression_mean(df, "y", "x", "in2")
    allsame = spark.createDataFrame(
        [(1.0, float(i), 1) for i in range(5)], "x double, y double, in2 int"
    )
    with pytest.raises(ValueError, match="x-variance"):
        twophase_regression_mean(allsame, "y", "x", "in2")

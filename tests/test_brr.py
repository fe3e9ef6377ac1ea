"""Balanced repeated replication (``kernels/replicate.brr_mean``):
independent numpy replay of the Hadamard half-sample algebra, Fay
variant, balance properties, and design validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.replicate import brr_mean


def _np_brr(h, p, w, y, rho):
    """From-scratch BRR/Fay replay: signs from the Sylvester Hadamard
    row formula s(r, c) = (-1)^popcount(r & c), stratum column c = rank
    of the stratum among sorted strata + 1."""
    ok = ~np.isnan(y)
    strata = sorted(set(h.tolist()))
    col = {hh: i + 1 for i, hh in enumerate(strata)}
    R = 4
    while R <= len(strata):
        R *= 2
    k = 1.0 - rho
    theta = np.sum(w[ok] * y[ok]) / np.sum(w[ok])
    v = 0.0
    for r in range(R):
        s = np.array([
            -1.0 if bin(r & col[hh]).count("1") % 2 else 1.0 for hh in h
        ])
        f = 1.0 + k * s * (1.0 - 2.0 * p)
        v += (np.sum((f * w)[ok] * y[ok]) / np.sum((f * w)[ok]) - theta) ** 2
    return (
        round(float(theta), 6),
        round(float(np.sqrt(v / (R * k * k))), 6),
        R,
        len(strata),
    )


@pytest.fixture(scope="module")
def brr_data(spark):
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    h = ids % 7
    p = (ids // 7) % 2
    w = 1.0 + (ids % 5)
    y = np.cos(ids * 0.13) * 4.0 + 20.0 + 0.5 * h
    y[ids % 97 == 0] = np.nan  # nulls must drop from estimate + replicates
    df = spark.createDataFrame(
        [
            (int(a), int(b), float(c), None if np.isnan(d) else float(d))
            for a, b, c, d in zip(h, p, w, y)
        ],
        "h long, p long, w double, y double",
    )
    return df, (h, p, w, y)


def test_brr_matches_numpy_replay(brr_data):
    df, (h, p, w, y) = brr_data
    got = brr_mean(df, "y", "h", "p", weight_col="w").collect()[0]
    want = _np_brr(h, p, w, y, 0.0)
    assert got["mean"] == pytest.approx(want[0], abs=1e-6)
    assert got["se_brr"] == pytest.approx(want[1], abs=1e-6)
    assert (got["n_replicates"], got["n_strata"]) == (want[2], want[3]) == (8, 7)


def test_brr_fay_matches_numpy_replay(brr_data):
    df, (h, p, w, y) = brr_data
    got = brr_mean(df, "y", "h", "p", weight_col="w", fay_rho=0.5).collect()[0]
    want = _np_brr(h, p, w, y, 0.5)
    assert got["mean"] == pytest.approx(want[0], abs=1e-6)
    assert got["se_brr"] == pytest.approx(want[1], abs=1e-6)
    # Fay perturbs half as hard but divides by k^2 — same target: the two
    # SEs estimate the same variance (loose agreement on smooth data)
    classic = brr_mean(df, "y", "h", "p", weight_col="w").collect()[0]
    assert got["se_brr"] == pytest.approx(classic["se_brr"], rel=0.5)


def test_brr_se_tracks_iid_reference(spark):
    """On IID-shaped data with equal weights the BRR SE must land near
    sd/sqrt(n) — the test that catches sign-imbalance bugs (an
    unbalanced sign matrix bias-inflates or deflates V)."""
    rng = np.random.RandomState(11)
    n = 20000
    y = rng.normal(50.0, 8.0, n)
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i % 15), int((i // 15) % 2), float(v)) for i, v in zip(ids, y)],
        "h long, p long, y double",
    )
    got = brr_mean(df, "y", "h", "p").collect()[0]
    ref = float(np.std(y, ddof=1) / np.sqrt(n))
    assert 0.8 * ref < got["se_brr"] < 1.2 * ref
    assert got["n_replicates"] == 16  # 15 strata -> R = 16


def test_brr_validates(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)], "h long, p long, y double"
    )
    with pytest.raises(ValueError, match="exactly two PSUs"):
        brr_mean(df, "y", "h", "p")
    ok = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0)], "h long, p long, y double"
    )
    with pytest.raises(ValueError, match="fay_rho"):
        brr_mean(ok, "y", "h", "p", fay_rho=1.0)
    with pytest.raises(ValueError, match="max_strata"):
        brr_mean(ok, "y", "h", "p", max_strata=0)

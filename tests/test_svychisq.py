"""Full Rao-Scott svychisq (``kernels/stats.svychisq_rao_scott``) vs an
independent numpy replay of the deterministic-bootstrap eigen correction."""

import numpy as np
import pytest

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.replicate import (
    _POIS1_CDF, _POIS1_P, _QH_A1, _QH_A2, _QH_B1, _QH_B2, _QH_C2)
from data_integration_est_spark.kernels.stats import svychisq_rao_scott


def _np_multiplicity(ids, b):
    h1 = (ids * _QH_A1 + b * _QH_B1) % _POIS1_P
    h = (((h1 * h1) % _POIS1_P) * _QH_A2 + h1 * _QH_B2 + b * _QH_C2) % _POIS1_P
    return np.searchsorted(np.array(_POIS1_CDF), h, side="right").astype(float)


def _np_rao_scott(ids, ws, rs, cs, B):
    rl, cl = sorted(set(rs)), sorted(set(cs))
    R, C = len(rl), len(cl)
    ridx = np.array([rl.index(r) for r in rs])
    cidx = np.array([cl.index(c) for c in cs])
    sw = np.zeros((R, C))
    np.add.at(sw, (ridx, cidx), ws)
    n = len(ids)
    p = sw / sw.sum()
    e = np.outer(p.sum(1), p.sum(0))
    x2 = n * ((p - e) ** 2 / e).sum()
    d = (R - 1) * (C - 1)
    us = []
    for b in range(B):
        m = _np_multiplicity(ids, b)
        bw = np.zeros((R, C))
        np.add.at(bw, (ridx, cidx), m * ws)
        pb = bw / bw.sum()
        us.append((pb - np.outer(pb.sum(1), pb.sum(0))).ravel())
    Vu = np.cov(np.asarray(us), rowvar=False, ddof=1)
    Dm = e.ravel()
    M = n * (Vu / np.sqrt(np.outer(Dm, Dm)))
    eig = np.clip(np.linalg.eigvalsh((M + M.T) / 2), 0, None)
    deltas = np.sort(eig)[::-1][:d]
    db = deltas.mean()
    a2 = ((deltas - db) ** 2).sum() / (d * db**2)
    return x2, deltas, x2 / (db * (1 + a2)), d / (1 + a2)


@pytest.fixture(scope="module")
def table_df(spark):
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(3)
    rs = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    # mild dependence so X2 is non-trivial
    cs = np.where(
        (rs == "a") & (rng.random(n) < 0.3), "x",
        rng.choice(["x", "y", "z"], n),
    )
    ws = 1.0 + (ids % 5).astype(float)
    df = spark.createDataFrame(
        [(int(i), str(r), str(c), float(w)) for i, r, c, w in zip(ids, rs, cs, ws)],
        "id long, r string, c string, w double",
    )
    return df, ids, ws, list(rs), list(cs)


def test_rao_scott_matches_numpy_replay_3x3(table_df):
    df, ids, ws, rs, cs = table_df
    res = svychisq_rao_scott(
        SurveyDesign(df=df, weight_col="w"), "r", "c", "id", n_replicates=24
    )
    x2, deltas, x2_rs, df_rs = _np_rao_scott(ids, ws, rs, cs, 24)
    assert res.x2 == pytest.approx(x2, rel=1e-9)
    assert res.df == 4
    np.testing.assert_allclose(res.deltas, deltas, rtol=1e-7)
    assert res.x2_rs == pytest.approx(x2_rs, rel=1e-7)
    assert res.df_rs == pytest.approx(df_rs, rel=1e-7)
    assert res.n == len(ids)


def test_rao_scott_2x2_collapses_to_wald(spark):
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(9)
    rs = np.where(rng.random(n) < 0.4, "r1", "r0")
    cs = np.where(rng.random(n) < 0.5, "c1", "c0")
    ws = 1.0 + (ids % 3).astype(float)
    df = spark.createDataFrame(
        [(int(i), str(r), str(c), float(w)) for i, r, c, w in zip(ids, rs, cs, ws)],
        "id long, r string, c string, w double",
    )
    res = svychisq_rao_scott(
        SurveyDesign(df=df, weight_col="w"), "r", "c", "id", n_replicates=32
    )
    assert res.df == 1 and len(res.deltas) == 1
    assert res.a2 == pytest.approx(0.0, abs=1e-12)
    assert res.df_rs == pytest.approx(1.0)
    # Wald identity: X2/delta == u^2 / V(u) from the same replicates
    sw = np.zeros((2, 2))
    rl, cl = sorted(set(rs)), sorted(set(cs))
    np.add.at(sw, ([rl.index(r) for r in rs], [cl.index(c) for c in cs]), ws)
    p = sw / sw.sum()
    u = p[1, 1] - p.sum(1)[1] * p.sum(0)[1]
    ub = []
    for b in range(32):
        m = _np_multiplicity(ids, b)
        bw = np.zeros((2, 2))
        np.add.at(bw, ([rl.index(r) for r in rs], [cl.index(c) for c in cs]), m * ws)
        pb = bw / bw.sum()
        ub.append(pb[1, 1] - pb.sum(1)[1] * pb.sum(0)[1])
    wald = u * u / np.var(ub, ddof=1)
    assert res.x2_rs == pytest.approx(wald, rel=1e-7)


def test_rao_scott_validates(spark):
    df = spark.createDataFrame([(1, "a", "x", 1.0)], "id long, r string, c string, w double")
    des = SurveyDesign(df=df, weight_col="w")
    with pytest.raises(ValueError, match="replicates"):
        svychisq_rao_scott(des, "r", "c", "id", n_replicates=1)
    with pytest.raises(ValueError, match="2x2"):
        svychisq_rao_scott(des, "r", "c", "id", n_replicates=8)


def test_chi2_sf_matches_closed_forms():
    import math

    from data_integration_est_spark.kernels.special import chi2_sf

    for x in (0.5, 1.0, 3.84, 7.5, 20.0):
        # df=2: sf = exp(-x/2) exactly
        assert chi2_sf(x, 2.0) == pytest.approx(math.exp(-x / 2), rel=1e-11)
        # df=1: sf = erfc(sqrt(x/2))
        assert chi2_sf(x, 1.0) == pytest.approx(
            math.erfc(math.sqrt(x / 2.0)), rel=1e-10)
        # df=4: sf = exp(-x/2) (1 + x/2)
        assert chi2_sf(x, 4.0) == pytest.approx(
            math.exp(-x / 2) * (1 + x / 2), rel=1e-11)
    # non-integer df: continuity between the series and contfrac branches
    for df in (1.7, 3.3):
        s = df / 2.0
        xb = 2.0 * (s + 1.0)
        lo = chi2_sf(xb - 1e-9, df)
        hi = chi2_sf(xb + 1e-9, df)
        assert lo == pytest.approx(hi, rel=1e-8)
    # monotone decreasing in x
    vals = [chi2_sf(x, 2.5) for x in (0.1, 1.0, 5.0, 10.0, 30.0)]
    assert vals == sorted(vals, reverse=True)


def test_rao_scott_reports_p_values(table_df):
    df, ids, ws, rs, cs = table_df
    res = svychisq_rao_scott(
        SurveyDesign(df=df, weight_col="w"), "r", "c", "id", n_replicates=24
    )
    from data_integration_est_spark.kernels.special import chi2_sf

    assert res.p_rs == pytest.approx(chi2_sf(res.x2_rs, res.df_rs))
    assert res.p_first == pytest.approx(chi2_sf(res.x2 / res.delta_bar, res.df))
    assert 0.0 <= res.p_rs <= 1.0
    # the table was built with real dependence: both tests should reject
    assert res.p_rs < 0.01 and res.p_first < 0.01

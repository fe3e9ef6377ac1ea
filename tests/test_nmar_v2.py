"""NMAR-v2 end-to-end study (nb[37]→nb[42]).

The reference's final workload: the multi-σ NMAR grid, the 5-estimator
battery, the pivot_longer/separate bias reshape, and the two-factor-with-
interaction Type-I ANOVA whose golden output (``nb[42]``, 11γ x 5σ x 100
sims) is

    F(Sd)=0.62 (p=.645)  F(Gamma)=877.4  F(Estimator)=10776.3
    F(Sd:Gamma)=0.065 (p=1.000)

i.e. estimator choice ≫ NMAR strength ≫ outcome noise, no interaction.
At test scale the F magnitudes shrink but the ORDERING and the null
interaction are stable — that's what we assert.
"""

import pytest

from data_integration_est_spark import montecarlo as mc


@pytest.fixture(scope="module")
def v2_result(spark):
    return mc.run_nmar_v2_study(
        spark, N=3_000, n_sim=4, gammas=(0.0, 0.5, 1.0),
        sd_vector=(0.0, 0.25, 0.5), size_a=250, size_b=800, seed=77,
    )


def test_wide_frame_shape(v2_result):
    wide = v2_result.results_wide
    # one row per (sim, gamma); one mean_ + one bias_ column per est x sd,
    # plus R2_ columns for the two model-assisted PC estimators
    assert wide.count() == 4 * 3
    mean_cols = [c for c in wide.columns if c.startswith("mean_")]
    bias_cols = [c for c in wide.columns if c.startswith("bias_")]
    r2_cols = [c for c in wide.columns if c.startswith("R2_")]
    assert len(mean_cols) == 5 * 3
    assert len(bias_cols) == 5 * 3
    assert len(r2_cols) == 2 * 3


def test_r2_summary(v2_result):
    """nb[41]'s r2_summary: R2 lives in (0,1) and degrades as the
    outcome noise sigma grows (the model explains a shrinking share)."""
    rows = {
        (r["gamma"], r["sd"], r["estimator"]): r["r2_mean"]
        for r in v2_result.r2_summary.collect()
    }
    assert all(0.0 < v < 1.0 for v in rows.values()), rows
    for est in ("PC_xi_DR", "PC_ei_DR"):
        assert rows[(0.0, 0.0, est)] > rows[(0.0, 0.5, est)], est


def test_bias_long_reshape(v2_result):
    long = v2_result.bias_long
    rows = long.collect()
    # 12 wide rows x 15 value columns
    assert len(rows) == 12 * 15
    ests = {r["estimator"] for r in rows}
    assert ests == {"PC_xi_DR", "PC_ei_DR", "RegDI_no_aux", "RegDI_xi", "RegDI_ei"}
    sds = {r["sd"] for r in rows}
    assert sds == {0.0, 0.25, 0.5}


def test_anova_golden_ordering(v2_result):
    """The nb[42] golden pattern: F(Estimator) > F(Gamma) > F(Sd),
    interaction p ≈ 1 (the σ and γ effects do not interact)."""
    rows = {r["term"]: r for r in v2_result.anova.collect()}
    assert set(rows) == {"sd", "gamma", "estimator", "sd:gamma", "Residuals"}
    f_est = rows["estimator"]["f_value"]
    f_gamma = rows["gamma"]["f_value"]
    f_sd = rows["sd"]["f_value"]
    assert f_est > f_gamma > f_sd, (f_est, f_gamma, f_sd)
    assert f_gamma > 5.0  # the NMAR effect is real
    assert rows["sd:gamma"]["p_value"] > 0.9  # golden: interaction p = 1.0
    # degrees of freedom mirror R's table: (|sd|-1), (|gamma|-1),
    # (|est|-1), (|sd|-1)(|gamma|-1)
    assert rows["sd"]["df"] == 2
    assert rows["gamma"]["df"] == 2
    assert rows["estimator"]["df"] == 4
    assert rows["sd:gamma"]["df"] == 4


def test_summary_bias_sanity(v2_result):
    """Calibrated estimators are ~unbiased at γ=0 (no NMAR selection)."""
    summ = {
        (r["gamma"], r["sd"], r["estimator"]): r
        for r in v2_result.summary.collect()
    }
    for est in ("RegDI_no_aux", "RegDI_xi", "RegDI_ei", "PC_xi_DR"):
        assert abs(summ[(0.0, 0.25, est)]["bias_mean"]) < 0.06, est

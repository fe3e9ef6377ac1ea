"""Monte Carlo vectorization tests (SURVEY.md §2.8 O1-O3).

The load-bearing check is *vectorized == scalar*: running the grouped
estimator over the grid and slicing out one (gamma, sim) cell must agree
(to float tolerance) with running the scalar estimator on that cell's
rows alone.  Statistical sanity (bias patterns) then checks the study
harness end-to-end.
"""

import math

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import montecarlo as mc
from data_integration_est_spark.estimators import vectorized as V
from data_integration_est_spark.estimators.pc import pc_estimator
from data_integration_est_spark.estimators.regdi import regdi

GAMMAS = (0.0, 1.0)


@pytest.fixture(scope="module")
def grid_pop(spark):
    pop = mc.nmar_grid_population(
        spark, N=2_000, n_sim=3, gammas=GAMMAS, size_a=300, size_b=600, seed=77
    )
    pop.persist()
    yield pop
    pop.unpersist()


def test_grid_population_shape(grid_pop):
    agg = grid_pop.groupBy("gamma", "sim_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("muestra_A").alias("nA"),
        F.sum("muestra_B").alias("nB"),
    ).collect()
    assert len(agg) == len(GAMMAS) * 3
    for r in agg:
        assert r["n"] == 2_000
        assert r["nA"] == 300  # exact-size draws per cell
        assert r["nB"] == 600


def test_population_identical_across_gamma(grid_pop):
    """Population columns and S_A must depend on sim only (reference
    seeding discipline nb[23]:14)."""
    a = grid_pop.filter(F.col("gamma") == GAMMAS[0]).select("sim_id", "uid", "y_i", "muestra_A")
    b = grid_pop.filter(F.col("gamma") == GAMMAS[1]).select(
        "sim_id", "uid",
        F.col("y_i").alias("y2"), F.col("muestra_A").alias("mA2"),
    )
    j = a.join(b, on=["sim_id", "uid"]).agg(
        F.max(F.abs(F.col("y_i") - F.col("y2"))).alias("dy"),
        F.max(F.abs(F.col("muestra_A") - F.col("mA2"))).alias("dA"),
    ).collect()[0]
    assert j["dy"] == 0.0
    assert j["dA"] == 0


@pytest.mark.parametrize("gamma,sim", [(0.0, 1), (1.0, 3)])
def test_vectorized_equals_scalar(spark, grid_pop, gamma, sim):
    cell = grid_pop.filter((F.col("gamma") == gamma) & (F.col("sim_id") == sim))
    g = ["gamma", "sim_id"]
    key = (gamma, sim)

    vec = V.regdi_c0_grouped(
        grid_pop, "y_i", "y_i", "muestra_A", "muestra_B", g, aux_vars=["x1_i"]
    )[key]
    scal = regdi(data=cell, y_A_col="y_i", y_B_col="y_i",
                 ind_var_A="muestra_A", ind_var_B="muestra_B", aux_vars=["x1_i"])
    assert vec[0] == pytest.approx(scal.mean, rel=1e-9)
    assert vec[1] == pytest.approx(scal.se, rel=1e-9)

    vec_pc = V.pc_s1_grouped(grid_pop, "y_i", "muestra_B", ["x1_i", "x2_i"], g)[key]
    scal_pc = pc_estimator(data=cell, y_A_col="y_i", y_B_col="y_i",
                           ind_var_A="muestra_A", ind_var_B="muestra_B",
                           aux_vars=["x1_i", "x2_i"], scenario=1)
    assert vec_pc[0] == pytest.approx(scal_pc.estimate, rel=1e-9)
    assert vec_pc[1] == pytest.approx(scal_pc.se, rel=1e-9)

    vec_dr = V.pc_dr1_grouped(
        grid_pop, "y_i", "y_i", "muestra_A", "muestra_B", ["x1_i", "x2_i"],
        "y_i ~ x_i", g,
    )[key]
    scal_dr = pc_estimator(data=cell, y_A_col="y_i", y_B_col="y_i",
                           ind_var_A="muestra_A", ind_var_B="muestra_B",
                           aux_vars=["x1_i", "x2_i"], scenario=3,
                           outcome_model="y_i ~ x_i")
    assert vec_dr[0] == pytest.approx(scal_dr.estimate, rel=1e-9)

    vec_rdr = V.regdi_dr_grouped(
        grid_pop, "y_i", "y_i", "muestra_A", "muestra_B", "y_i ~ x_i", g,
        aux_vars=["x1_i"],
    )[key]
    scal_rdr = regdi(data=cell, y_A_col="y_i", y_B_col="y_i",
                     ind_var_A="muestra_A", ind_var_B="muestra_B",
                     aux_vars=["x1_i"], outcome_model="y_i ~ x_i", correction=3)
    assert vec_rdr[0] == pytest.approx(scal_rdr.mean, rel=1e-9)
    assert vec_rdr[1] == pytest.approx(scal_rdr.se, rel=1e-9)


@pytest.mark.parametrize("gamma,sim", [(0.0, 2)])
def test_vectorized_c2_s2_equal_scalar(spark, grid_pop, gamma, sim):
    cell = grid_pop.filter((F.col("gamma") == gamma) & (F.col("sim_id") == sim))
    g = ["gamma", "sim_id"]
    key = (gamma, sim)

    vec_c2 = V.regdi_c2_grouped(
        grid_pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B", g
    )[key]
    scal_c2 = regdi(data=cell, y_A_col="y_i", y_B_col="tilde_y_i",
                    ind_var_A="muestra_A", ind_var_B="muestra_B", correction=2)
    assert vec_c2[0] == pytest.approx(scal_c2.mean, rel=1e-9)
    assert vec_c2[1] == pytest.approx(scal_c2.se, rel=1e-9)

    vec_s2 = V.pc_s2_grouped(
        grid_pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B",
        ["x1_i", "x2_i"], "y_i ~ tilde_y_i", g,
    )[key]
    scal_s2 = pc_estimator(data=cell, y_A_col="y_i", y_B_col="tilde_y_i",
                           ind_var_A="muestra_A", ind_var_B="muestra_B",
                           aux_vars=["x1_i", "x2_i"], scenario=2,
                           outcome_model="y_i ~ tilde_y_i")
    assert vec_s2[0] == pytest.approx(scal_s2.estimate, rel=1e-9)


def test_vectorized_logistic_equals_scalar(spark, grid_pop):
    """Grouped IRLS (model_type='logistic') must reproduce the scalar
    logistic PC scenario-2 per cell."""
    gamma, sim = GAMMAS[0], 1
    pop = grid_pop.withColumn("y01", F.col("x2_i"))
    cell = pop.filter((F.col("gamma") == gamma) & (F.col("sim_id") == sim))
    g = ["gamma", "sim_id"]

    vec = V.pc_s2_grouped(
        pop, "y01", "y_i", "muestra_A", "muestra_B", ["x1_i", "x2_i"],
        "y01 ~ y_i", g, model_type="logistic",
    )[(gamma, sim)]
    scal = pc_estimator(data=cell, y_A_col="y01", y_B_col="y_i",
                        ind_var_A="muestra_A", ind_var_B="muestra_B",
                        aux_vars=["x1_i", "x2_i"], scenario=2,
                        outcome_model="y01 ~ y_i", model_type="logistic")
    assert vec[0] == pytest.approx(scal.estimate, rel=1e-8)


def test_contaminated_study_bias_pattern(spark):
    """Scenario II (cell-4 golden pattern): naive tilde-B mean is biased
    ~-1; RegDI on the proxy total stays unbiased for E[y] (the 0.000
    golden row — calibration totals don't bias the clean y_A mean);
    correction-2 is unbiased for its own PROXY-scale estimand; PC
    scenario-2's prediction model recovers E[y]."""
    res = mc.run_contaminated_study(
        spark, N=4_000, n_sim=4, gammas=(0.0,), size_a=600, size_b=1_200,
        seed=404,
    )
    s = {(r["gamma"], r["estimator"]): r for r in res.summary.collect()}
    assert s[(0.0, "Mean_S_B_tilde")]["bias_mean"] < -0.7   # ~ -1 shift
    assert abs(s[(0.0, "RegDI_tilde")]["bias_mean"]) < 0.12
    assert abs(s[(0.0, "RegDI_C2")]["bias_mean"]) < 0.12    # vs E[tilde]=2
    assert abs(s[(0.0, "PC_S2")]["bias_mean"]) < 0.12


def test_nmar_study_bias_pattern(spark):
    """t3 statistical properties: at gamma=0 the naive B mean is unbiased;
    at gamma=1 it is clearly biased upward (NMAR over-selects large y);
    RegDI stays near zero everywhere (robustness, cell 25 output)."""
    res = mc.run_nmar_study(
        spark, N=4_000, n_sim=4, gammas=(0.0, 1.0), size_a=500, size_b=1_200,
        seed=2024,
    )
    s = {(r["gamma"], r["estimator"]): r for r in res.summary.collect()}

    se_a = abs(s[(0.0, "Mean_S_A")]["bias_sd"] or 0.02)
    assert abs(s[(0.0, "Mean_S_B")]["bias_mean"]) < 0.1
    assert s[(1.0, "Mean_S_B")]["bias_mean"] > 0.1  # NMAR selection bias
    for gamma in (0.0, 1.0):
        assert abs(s[(gamma, "RegDI_X1")]["bias_mean"]) < max(4 * se_a, 0.12)
    # RMSE = sqrt(bias^2 + sd^2) consistency
    r = s[(1.0, "Mean_S_B")]
    assert r["rmse"] == pytest.approx(
        math.sqrt(r["bias_mean"] ** 2 + (r["bias_sd"] or 0.0) ** 2), abs=2e-6
    )

    # fit-health diagnostics (VERDICT r02 item 10): every model-fitting
    # battery member reports; this healthy grid has no degenerate cells
    assert res.diagnostics is not None
    for name in ("PC_DR", "RegDI_DR"):
        d = res.diagnostics[name]
        assert d["n_fits"] >= 1
        assert d.get("unconverged", 0) == 0
        assert d["degenerate_groups"] == 0

import numpy as np
import pandas as pd
import pytest

from data_integration_est_spark import pc_estimator, regdi
from data_integration_est_spark.integrate import IntegrationError

import oracle_np


def make_population(n=2000, seed=3):
    """Deterministic numpy fixture population (FIXTURES.md F1 shape)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(2, 1, n)
    y = 3 + 0.7 * (x - 2) + rng.normal(0, np.sqrt(0.51), n)
    tilde_y = 2 + 0.9 * (y - 3) + rng.normal(0, 0.5, n)
    e = 0.5 * x + np.sqrt(0.75) * rng.normal(0, 1, n)
    pop = {
        "id": np.arange(1, n + 1),
        "x_i": x,
        "y_i": y,
        "tilde_y_i": tilde_y,
        "e_i": e,
        "e1_i": (e <= 1).astype(int),
        "e2_i": (e > 1).astype(int),
        "x1_i": (x <= 2).astype(int),
        "x2_i": (x > 2).astype(int),
        "muestra_A": np.zeros(n, dtype=int),
        "muestra_B": np.zeros(n, dtype=int),
    }
    idx_a = rng.choice(n, 150, replace=False)
    pop["muestra_A"][idx_a] = 1
    # biased B: more likely when y large
    pb = 1 / (1 + np.exp(-(y - 3)))
    pop["muestra_B"][rng.uniform(size=n) < pb * 0.6] = 1
    return pop


@pytest.fixture(scope="module")
def pop_df(spark):
    pop = make_population()
    return spark.createDataFrame(pd.DataFrame(pop)), pop


COMMON = dict(y_A_col="y_i", y_B_col="y_i", ind_var_A="muestra_A", ind_var_B="muestra_B")


def test_regdi_correction0(pop_df):
    df, pop = pop_df
    res = regdi(data=df, **COMMON)
    exp = oracle_np.regdi_np(pop, "y_i", "y_i", "muestra_A", "muestra_B")
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(res.variance, exp["var"], rtol=1e-8)


def test_regdi_correction0_with_aux(pop_df):
    df, pop = pop_df
    res = regdi(data=df, aux_vars=["x1_i"], **COMMON)
    exp = oracle_np.regdi_np(pop, "y_i", "y_i", "muestra_A", "muestra_B", aux_vars=["x1_i"])
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(res.variance, exp["var"], rtol=1e-8)


def test_regdi_correction2(pop_df):
    df, pop = pop_df
    res = regdi(data=df, y_A_col="y_i", y_B_col="tilde_y_i",
                ind_var_A="muestra_A", ind_var_B="muestra_B", correction=2)
    exp = oracle_np.regdi_np(pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B", correction=2)
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(res.variance, exp["var"], rtol=1e-8)


def test_regdi_correction3(pop_df):
    df, pop = pop_df
    res = regdi(data=df, aux_vars=["x1_i"], outcome_model="y_i ~ x1_i",
                correction=3, eval_model_performance=True, **COMMON)
    exp = oracle_np.regdi_np(pop, "y_i", "y_i", "muestra_A", "muestra_B",
                             aux_vars=["x1_i"], correction=3, outcome_model_cols=["x1_i"])
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(res.variance, exp["var"], rtol=1e-8)
    assert res.rmse is not None and res.r2 is not None and 0 < res.r2 < 1


def test_pc_scenario1(pop_df):
    df, pop = pop_df
    res = pc_estimator(data=df, aux_vars=["x1_i", "x2_i"], scenario=1, **COMMON)
    exp = oracle_np.pc_np(pop, "y_i", "y_i", "muestra_A", "muestra_B",
                          aux_vars=["x1_i", "x2_i"], scenario=1)
    np.testing.assert_allclose(res.estimate, exp["estimate"], rtol=1e-9)
    np.testing.assert_allclose(res.se, exp["se"], rtol=1e-8)


def test_pc_scenario2(pop_df):
    df, pop = pop_df
    res = pc_estimator(data=df, aux_vars=["x1_i", "x2_i"], scenario=2,
                       outcome_model="y_i ~ tilde_y_i", **COMMON)
    exp = oracle_np.pc_np(pop, "y_i", "y_i", "muestra_A", "muestra_B",
                          aux_vars=["x1_i", "x2_i"], scenario=2,
                          outcome_model_cols=["tilde_y_i"])
    np.testing.assert_allclose(res.estimate, exp["estimate"], rtol=1e-9)


def test_pc_scenario3_dr1(pop_df):
    df, pop = pop_df
    res = pc_estimator(data=df, aux_vars=["x1_i", "x2_i"], scenario=3,
                       outcome_model="y_i ~ x_i", eval_model_performance=True, **COMMON)
    exp = oracle_np.pc_np(pop, "y_i", "y_i", "muestra_A", "muestra_B",
                          aux_vars=["x1_i", "x2_i"], scenario=3,
                          outcome_model_cols=["x_i"])
    np.testing.assert_allclose(res.estimate, exp["estimate"], rtol=1e-9)
    assert res.rmse is not None and res.r2 is not None


def test_pc_scenario3_logistic(spark):
    # binary outcome => logistic prediction model
    rng = np.random.default_rng(5)
    n = 1500
    x = rng.normal(0, 1, n)
    p = 1 / (1 + np.exp(-(0.3 + 0.9 * x)))
    y = (rng.uniform(size=n) < p).astype(float)
    pop = {
        "id": np.arange(n), "x_i": x, "y_i": y,
        "muestra_A": (rng.uniform(size=n) < 0.15).astype(int),
        "muestra_B": (rng.uniform(size=n) < 0.4).astype(int),
    }
    df = spark.createDataFrame(pd.DataFrame(pop))
    res = pc_estimator(data=df, scenario=3, outcome_model="y_i ~ x_i",
                       model_type="logistic", **COMMON)
    exp = oracle_np.pc_np(pop, "y_i", "y_i", "muestra_A", "muestra_B", scenario=3,
                          outcome_model_cols=["x_i"], model_type="logistic")
    np.testing.assert_allclose(res.estimate, exp["estimate"], rtol=1e-7)


def test_two_table_mode_same_name(spark):
    """J1 path: full-outer join + indicator derivation, same outcome name."""
    pop = make_population(n=1200, seed=9)
    pdf = pd.DataFrame(pop)
    nA = int(pop["muestra_A"].sum())
    N = len(pdf)
    data_A = pdf[pdf.muestra_A == 1][["id", "x_i", "x1_i", "x2_i", "y_i"]].copy()
    data_A["d_i_A"] = N / nA
    data_B = pdf[pdf.muestra_B == 1][["id", "x_i", "x1_i", "x2_i", "y_i"]]
    res = regdi(
        data_A=spark.createDataFrame(data_A), data_B=spark.createDataFrame(data_B),
        id_var_A="id", id_var_B="id", y_A_col="y_i", y_B_col="y_i",
        weights_A="d_i_A", correction=1,
    )
    # oracle: direct-mode with the same N (sum of weights = N) — identical math
    exp = oracle_np.regdi_np(pop, "y_i", "y_i", "muestra_A", "muestra_B", N_total=N)
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(res.variance, exp["var"], rtol=1e-8)


def test_two_table_mode_different_names_fixed_bug(spark):
    """nb[10]:55 documented reference bug: y_A_col != y_B_col but y_A_col
    also exists in data_B.  The engine resolves side-specific columns."""
    pop = make_population(n=1200, seed=13)
    pdf = pd.DataFrame(pop)
    nA = int(pop["muestra_A"].sum())
    N = len(pdf)
    data_A = pdf[pdf.muestra_A == 1][["id", "y_i"]].copy()
    data_A["d_i_A"] = N / nA
    # B carries BOTH y_i and tilde_y_i; outcome in B is tilde_y_i
    data_B = pdf[pdf.muestra_B == 1][["id", "y_i", "tilde_y_i"]]
    res = regdi(
        data_A=spark.createDataFrame(data_A), data_B=spark.createDataFrame(data_B),
        id_var_A="id", id_var_B="id", y_A_col="y_i", y_B_col="tilde_y_i",
        weights_A="d_i_A", correction=1,
    )
    exp = oracle_np.regdi_np(pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B", N_total=N)
    np.testing.assert_allclose(res.mean, exp["mean"], rtol=1e-9)


def test_validation_errors(spark, pop_df):
    df, _ = pop_df
    with pytest.raises(IntegrationError):
        regdi(data=None, data_A=df, data_B=None, y_A_col="y_i", y_B_col="y_i")
    with pytest.raises(IntegrationError):
        regdi(data=df, y_A_col="nope", y_B_col="y_i",
              ind_var_A="muestra_A", ind_var_B="muestra_B")

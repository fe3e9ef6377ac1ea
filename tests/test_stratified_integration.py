"""End-to-end reference workload (the stratified study, ``nb[12]``):
generate the stratified population, use its per-stratum design weights
(``weights_A``) in both estimators, and check design-unbiasedness."""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import generators, pc_estimator, regdi


@pytest.fixture(scope="module")
def strat_pop(spark):
    pop = generators.generate_population_stratified(
        spark, N=30_000, n_A_total=1_500, n_B_total=9_000, seed=11
    )
    pop.persist()
    yield pop
    pop.unpersist()


def test_regdi_with_stratified_weights(strat_pop):
    true_mean = strat_pop.agg(F.avg("y_i")).collect()[0][0]
    r = regdi(
        data=strat_pop, y_A_col="y_i", y_B_col="y_i",
        ind_var_A="ind_A", ind_var_B="ind_B", weights_A="d_i_A",
    )
    # stratified-design RegDI should land within a few SE of truth
    assert abs(r.mean - true_mean) < 5 * r.se
    assert r.se > 0


def test_pc_with_stratum_calibration(strat_pop):
    """B's selection probability is CONSTANT within stratum (0.8/0.2), so
    calibrating B to the four stratum-indicator totals post-stratifies the
    bias away — the estimate must land near truth, unlike the naive B
    mean.  (Calibrating on insufficient aux — e.g. (z, x) without an
    intercept — does NOT fix it; the reference's own stratified study
    documents that PC weakness, cells 12-13.)"""
    pop = strat_pop
    for s in (1, 2, 3, 4):
        pop = pop.withColumn(f"s{s}", F.when(F.col("stratum") == s, 1.0).otherwise(0.0))
    true_mean = pop.agg(F.avg("y_i")).collect()[0][0]
    p = pc_estimator(
        data=pop, y_A_col="y_i", y_B_col="y_i",
        ind_var_A="ind_A", ind_var_B="ind_B", weights_A="d_i_A",
        aux_vars=["s1", "s2", "s3", "s4"], scenario=1,
    )
    naive_b = pop.filter(F.col("ind_B") == 1).agg(F.avg("y_i")).collect()[0][0]
    assert abs(p.estimate - true_mean) < 0.05
    assert abs(p.estimate - true_mean) < abs(naive_b - true_mean)


def test_stratified_weights_sum_to_population(strat_pop):
    """The per-stratum weights N_h/n_Ah must HT-estimate N exactly."""
    n = strat_pop.count()
    s = strat_pop.filter(F.col("ind_A") == 1).agg(F.sum("d_i_A")).collect()[0][0]
    assert s == pytest.approx(n, rel=0.01)

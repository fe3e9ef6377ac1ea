"""Chen–Li–Wu propensity-weighted integration (``estimators/ipw``).

Oracle strategy: selection planted from a TRUE logistic propensity
(hash-uniform thresholding, no RNG) must be recovered by the
pseudo-likelihood fit and de-biased by IPW; the doubly robust
estimator must survive a deliberately wrong propensity model when the
outcome model is exact — the defining DR property.
"""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.estimators.ipw import (
    IPWError, propensity_weighted_mean,
)

T0, T1 = -2.0, 0.8


def _pop(spark, n=20000):
    """x in [0, 4); y = 2 + 3x + bounded dev; B-inclusion thresholds a
    hash-uniform against the TRUE logistic expit(T0 + T1 x)."""
    return (
        spark.range(n)
        .select(
            "id",
            ((F.col("id") % 100) / 25.0).alias("x"),
            (2.0 + 3.0 * ((F.col("id") % 100) / 25.0)
             + 0.1 * (F.col("id") % 7)).alias("y"),
        )
        # midpoint systematic sample (id%10 == 5): the x grid {0.2,
        # 0.6, ..., 3.8} integrates smooth propensity moments with
        # midpoint-rule accuracy; the left-endpoint grid (== 0) biases
        # the pseudo-score by half a grid cell
        .withColumn("in_a", (F.col("id") % 10 == 5).cast("int"))
        .withColumn("d", F.lit(10.0))
        .withColumn(
            "u",
            (F.pmod(F.xxhash64("id"), F.lit(100000)) / 100000.0),
        )
        .withColumn(
            "in_b",
            (
                F.col("u")
                < 1.0 / (1.0 + F.exp(-(F.lit(T0) + F.lit(T1) * F.col("x"))))
            ).cast("int"),
        )
    )


class TestRecovery:
    def test_theta_recovers_planted_propensity(self, spark):
        r = propensity_weighted_mean(
            _pop(spark), "y", ["x"], "in_a", "in_b", weight_A_col="d",
        )
        assert r.theta[0] == pytest.approx(T0, abs=0.25)
        assert r.theta[1] == pytest.approx(T1, abs=0.15)

    def test_ipw_debiases_informative_selection(self, spark):
        pop = _pop(spark)
        truth = pop.agg(F.avg("y")).collect()[0][0]
        naive = pop.filter("in_b = 1").agg(F.avg("y")).collect()[0][0]
        r = propensity_weighted_mean(
            pop, "y", ["x"], "in_a", "in_b", weight_A_col="d",
        )
        # selection favors high x, so the naive B mean is badly high;
        # IPW must remove most of that bias
        assert abs(naive - truth) > 1.0
        assert abs(r.mean_ipw - truth) < 0.25 * abs(naive - truth)
        assert abs(r.mean_dr - truth) < 0.25 * abs(naive - truth)

    def test_dr_survives_wrong_propensity_model(self, spark):
        # selection depends on x (informative) but the propensity model
        # gets only a USELESS covariate while outcome_x_cols carries the
        # EXACT outcome model (y = 2 + 3x, no deviation) — DR must still
        # hit the A-side design-weighted truth while raw IPW stays biased
        pop = _pop(spark).withColumn(
            "y", 2.0 + 3.0 * F.col("x")
        ).withColumn("junk", (F.floor(F.col("id") / 10) % 2).cast("double"))
        truth_a = (
            pop.filter("in_a = 1").agg(F.avg("y")).collect()[0][0]
        )
        r = propensity_weighted_mean(
            pop, "y", ["x", "junk"], "in_a", "in_b", weight_A_col="d",
        )
        r_wrong = propensity_weighted_mean(
            pop, "y", ["junk"], "in_a", "in_b", weight_A_col="d",
            outcome_x_cols=["x"],
        )
        assert r_wrong.mean_dr == pytest.approx(truth_a, abs=1e-6)
        assert abs(r_wrong.mean_ipw - truth_a) > 0.3  # IPW alone: biased
        assert r.mean_dr == pytest.approx(truth_a, abs=1e-6)

    def test_counts_and_fields(self, spark):
        pop = _pop(spark)
        r = propensity_weighted_mean(
            pop, "y", ["x"], "in_a", "in_b", weight_A_col="d",
        )
        assert r.n_a == pop.filter("in_a = 1").count()
        assert r.n_b == pop.filter("in_b = 1").count()
        assert r.n_hat == pytest.approx(10.0 * r.n_a)
        assert len(r.theta) == 2 and len(r.beta) == 2

    def test_augment_false_skips_outcome_model(self, spark):
        r = propensity_weighted_mean(
            _pop(spark), "y", ["x"], "in_a", "in_b",
            weight_A_col="d", augment=False,
        )
        assert r.mean_dr is None and r.beta is None
        assert r.mean_ipw is not None


class TestGuards:
    def test_missing_column(self, spark):
        with pytest.raises(IPWError, match="not found"):
            propensity_weighted_mean(
                _pop(spark), "nope", ["x"], "in_a", "in_b",
            )

    def test_null_y_on_b_row(self, spark):
        pop = _pop(spark).withColumn(
            "y", F.when(F.col("in_b") == 1, None).otherwise(F.col("y"))
        )
        with pytest.raises(IPWError, match="null on an ind_B=1"):
            propensity_weighted_mean(pop, "y", ["x"], "in_a", "in_b")

    def test_no_b_units(self, spark):
        pop = _pop(spark).withColumn("in_b", F.lit(0))
        with pytest.raises(IPWError):
            propensity_weighted_mean(pop, "y", ["x"], "in_a", "in_b")

    def test_collinear_x_singular_hessian(self, spark):
        pop = _pop(spark).withColumn("x2", F.col("x"))
        with pytest.raises(IPWError, match="singular"):
            propensity_weighted_mean(
                pop, "y", ["x", "x2"], "in_a", "in_b", weight_A_col="d",
            )

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


def _np_frame(rng, n=4000, null_layout=True):
    """Build matched (spark-rows, numpy-arrays) for the NATURAL stacked
    layout: d only on A rows, y only on B rows (round-9 HIGH repro)."""
    import numpy as np

    x = np.round(rng.uniform(0.0, 4.0, n), 6)
    y = np.round(2.0 + 3.0 * x + rng.normal(0, 0.5, n), 6)
    p_true = 1.0 / (1.0 + np.exp(-(-2.0 + 0.8 * x)))
    in_b = (rng.uniform(size=n) < p_true).astype(int)
    in_a = (rng.uniform(size=n) < 0.1).astype(int)
    d = np.full(n, 10.0)
    rows = [
        (
            float(x[i]),
            float(y[i]) if (in_b[i] or not null_layout) else None,
            int(in_a[i]),
            int(in_b[i]),
            float(d[i]) if (in_a[i] or not null_layout) else None,
        )
        for i in range(n)
    ]
    return rows, (x, y, in_a, in_b, d)


class TestNullWeightLayout:
    """Round-9 HIGH: ``0 * NULL = NULL`` in the fused score dropped
    every B-row term whenever ``weight_A_col`` was null on non-A rows
    (the NATURAL stacked layout) — theta came out wildly wrong with no
    error.  These pin the coalesced engine against the numpy twin."""

    def _run_both(self, spark, null_layout):
        import numpy as np

        from oracle_np import clw_np

        rng = np.random.default_rng(77)
        rows, (x, y, in_a, in_b, d) = _np_frame(
            rng, null_layout=null_layout
        )
        df = spark.createDataFrame(
            rows, "x double, y double, in_a int, in_b int, d double"
        )
        r = propensity_weighted_mean(
            df, "y", ["x"], "in_a", "in_b", weight_A_col="d", n_iter=15,
        )
        X = np.column_stack([np.ones(len(x)), x])
        o = clw_np(X, y, in_a, in_b, d, n_iter=15)
        return r, o

    def test_null_layout_matches_numpy_twin(self, spark):
        r, o = self._run_both(spark, null_layout=True)
        assert r.theta[0] == pytest.approx(o["theta"][0], rel=1e-9)
        assert r.theta[1] == pytest.approx(o["theta"][1], rel=1e-9)
        assert r.mean_ipw == pytest.approx(o["mean_ipw"], rel=1e-9)
        assert r.mean_dr == pytest.approx(o["mean_dr"], rel=1e-9)
        assert r.var_ipw == pytest.approx(o["var_ipw"], rel=1e-7)
        assert r.var_dr == pytest.approx(o["var_dr"], rel=1e-7)

    def test_null_layout_equals_dense_layout(self, spark):
        rn, _ = self._run_both(spark, null_layout=True)
        rd, _ = self._run_both(spark, null_layout=False)
        assert rn.theta == pytest.approx(rd.theta, rel=1e-12)
        assert rn.mean_ipw == pytest.approx(rd.mean_ipw, rel=1e-12)
        assert rn.mean_dr == pytest.approx(rd.mean_dr, rel=1e-12)
        assert rn.se_ipw == pytest.approx(rd.se_ipw, rel=1e-12)

    def test_null_weight_on_a_row_raises(self, spark):
        pop = _pop(spark).withColumn(
            "d", F.when(F.col("in_a") == 0, F.col("d"))  # null ON A rows
        )
        with pytest.raises(IPWError, match="null on an ind_A=1"):
            propensity_weighted_mean(
                pop, "y", ["x"], "in_a", "in_b", weight_A_col="d",
            )

    def test_null_x_on_sample_row_raises(self, spark):
        pop = _pop(spark).withColumn(
            "x", F.when(F.col("in_b") == 0, F.col("x"))
        )
        with pytest.raises(IPWError, match="regressor 'x' is null"):
            propensity_weighted_mean(
                pop, "y", ["x"], "in_a", "in_b", weight_A_col="d",
            )


class TestSandwichVariance:
    def test_se_fields_and_twin(self, spark):
        import numpy as np

        from oracle_np import clw_np

        pop = _pop(spark, n=8000)
        r = propensity_weighted_mean(
            pop, "y", ["x"], "in_a", "in_b", weight_A_col="d",
        )
        rows = pop.select("x", "y", "in_a", "in_b", "d").collect()
        x = np.array([w["x"] for w in rows])
        X = np.column_stack([np.ones(len(x)), x])
        o = clw_np(
            X,
            np.array([w["y"] for w in rows]),
            np.array([w["in_a"] for w in rows]),
            np.array([w["in_b"] for w in rows]),
            np.array([w["d"] for w in rows]),
        )
        assert r.se_ipw == pytest.approx(np.sqrt(o["var_ipw"]), rel=1e-7)
        assert r.se_dr == pytest.approx(np.sqrt(o["var_dr"]), rel=1e-7)
        assert 0 < r.se_ipw < 1.0 and 0 < r.se_dr < 1.0

    def test_variance_false_skips(self, spark):
        r = propensity_weighted_mean(
            _pop(spark), "y", ["x"], "in_a", "in_b",
            weight_A_col="d", variance=False,
        )
        assert r.se_ipw is None and r.se_dr is None

    def test_se_mc_calibration(self):
        """Design-based MC on the numpy twin: over repeated (B Poisson
        selection, A SRS) draws from a FIXED population the empirical
        SD of each estimator must match the mean plug-in SE — the
        sandwich formula itself is on trial here, not the Spark
        implementation (pinned to the twin above)."""
        import numpy as np

        from oracle_np import clw_np

        rng = np.random.default_rng(2026)
        N, n_a, reps = 3000, 150, 300
        x = rng.uniform(0.0, 4.0, N)
        yy = 2.0 + 3.0 * x + rng.normal(0, 1.0, N)
        X = np.column_stack([np.ones(N), x])
        p_true = 1.0 / (1.0 + np.exp(-(-2.0 + 0.8 * x)))
        est = {"ipw": [], "dr": []}
        ses = {"ipw": [], "dr": []}
        for _ in range(reps):
            in_b = (rng.uniform(size=N) < p_true).astype(int)
            idx_a = rng.choice(N, size=n_a, replace=False)
            in_a = np.zeros(N, int)
            in_a[idx_a] = 1
            d = np.full(N, N / n_a)
            o = clw_np(X, yy, in_a, in_b, d, n_iter=20)
            est["ipw"].append(o["mean_ipw"])
            est["dr"].append(o["mean_dr"])
            ses["ipw"].append(np.sqrt(o["var_ipw"]))
            ses["dr"].append(np.sqrt(o["var_dr"]))
        for kind in ("ipw", "dr"):
            sd = float(np.std(est[kind], ddof=1))
            se = float(np.mean(ses[kind]))
            assert 0.7 < se / sd < 1.4, (kind, se, sd)
            # and the estimators are unbiased for the pop mean
            assert abs(np.mean(est[kind]) - yy.mean()) < 3 * sd / np.sqrt(
                reps
            ) + 0.02


class TestGroupedBattery:
    """clw_grouped (the MC-battery twin) must reproduce the scalar
    estimator cell by cell — point estimates AND sandwich SEs."""

    def test_grouped_matches_scalar_per_cell(self, spark):
        from data_integration_est_spark.estimators.vectorized import (
            clw_grouped,
        )

        n = 6000
        pop = (
            spark.range(n)
            .select(
                "id",
                (F.col("id") % 3).cast("int").alias("cell"),
                ((F.col("id") % 100) / 25.0).alias("x"),
                (2.0 + 3.0 * ((F.col("id") % 100) / 25.0)
                 + 0.1 * (F.col("id") % 7)).alias("y"),
            )
            .withColumn("in_a", (F.col("id") % 10 == 5).cast("int"))
            .withColumn(
                "u", F.pmod(F.xxhash64("id"), F.lit(100000)) / 100000.0
            )
            .withColumn(
                "in_b",
                (F.col("u") < 1.0 / (1.0 + F.exp(
                    -(F.lit(T0) + F.lit(T1) * F.col("x"))
                ))).cast("int"),
            )
            .withColumn("d", F.lit(10.0))
        )
        grouped = clw_grouped(
            pop, "y", ["x"], "in_a", "in_b", ["cell"],
            weights_A="d", n_iter=12,
        )
        assert set(grouped) == {(0,), (1,), (2,)}
        for cell in (0, 1, 2):
            scalar = propensity_weighted_mean(
                pop.filter(F.col("cell") == cell), "y", ["x"],
                "in_a", "in_b", weight_A_col="d", n_iter=12,
            )
            mu_i, se_i, mu_d, se_d = grouped[(cell,)]
            assert mu_i == pytest.approx(scalar.mean_ipw, rel=1e-9), cell
            assert mu_d == pytest.approx(scalar.mean_dr, rel=1e-9), cell
            assert se_i == pytest.approx(scalar.se_ipw, rel=1e-7), cell
            assert se_d == pytest.approx(scalar.se_dr, rel=1e-7), cell

    def test_default_weights_derive_n_over_na(self, spark):
        from data_integration_est_spark.estimators.vectorized import (
            clw_grouped,
        )

        pop = (
            spark.range(4000)
            .select(
                "id",
                F.lit(0).alias("cell"),
                ((F.col("id") % 80) / 20.0).alias("x"),
                (1.0 + 2.0 * ((F.col("id") % 80) / 20.0)).alias("y"),
            )
            .withColumn("in_a", (F.col("id") % 8 == 3).cast("int"))
            .withColumn("in_b", (F.col("id") % 3 == 0).cast("int"))
        )
        grouped = clw_grouped(
            pop, "y", ["x"], "in_a", "in_b", ["cell"], n_iter=12,
        )
        # explicit d = N/n_A must agree with the derived default
        scalar = propensity_weighted_mean(
            pop.withColumn("d", F.lit(4000.0 / 500.0)), "y", ["x"],
            "in_a", "in_b", weight_A_col="d", n_iter=12,
        )
        mu_i, se_i, mu_d, se_d = grouped[(0,)]
        assert mu_i == pytest.approx(scalar.mean_ipw, rel=1e-9)
        assert se_d == pytest.approx(scalar.se_dr, rel=1e-7)


    def test_group_with_no_sample_rows_yields_nan(self, spark):
        """A group key present in df but with zero A and zero B rows
        must still appear in the result (documented NaN tuple) and be
        counted degenerate -- not silently vanish (r10 review fix)."""
        import math

        from data_integration_est_spark.estimators.vectorized import (
            clw_grouped,
        )

        pop = (
            spark.range(3000)
            .select(
                "id",
                (F.col("id") % 2).cast("int").alias("cell"),
                ((F.col("id") % 60) / 15.0).alias("x"),
                (1.0 + 2.0 * ((F.col("id") % 60) / 15.0)).alias("y"),
            )
            # cell 1 carries NO sampled rows at all
            .withColumn(
                "in_a",
                ((F.col("cell") == 0) & (F.col("id") % 9 == 4)).cast("int"),
            )
            .withColumn(
                "in_b",
                ((F.col("cell") == 0) & (F.col("id") % 4 == 0)).cast("int"),
            )
            .withColumn("d", F.lit(9.0))
        )
        diag = {}
        grouped = clw_grouped(
            pop, "y", ["x"], "in_a", "in_b", ["cell"],
            weights_A="d", n_iter=10, diag=diag,
        )
        assert set(grouped) == {(0,), (1,)}
        mu_i, se_i, mu_d, se_d = grouped[(1,)]
        assert math.isnan(mu_i) and math.isnan(mu_d)
        assert se_i is None and se_d is None
        assert diag.get("degenerate_groups", 0) >= 1
        # the populated cell is untouched by the empty one
        assert math.isfinite(grouped[(0,)][0])


class TestEarlyExit:
    def test_early_exit_matches_fixed_iterations(self, spark):
        """r11 (r10 verdict #4): the tol-based Newton early exit must be
        invisible — estimates, SEs, and theta agree with the exact
        fixed-iteration run (tol=0) to far beyond the gate's 6-dp
        rounding."""
        pop = _pop(spark)
        r_fixed = propensity_weighted_mean(
            pop, "y", ["x"], "in_a", "in_b", weight_A_col="d", tol=0.0
        )
        r_early = propensity_weighted_mean(
            pop, "y", ["x"], "in_a", "in_b", weight_A_col="d"
        )
        assert r_early.mean_ipw == pytest.approx(r_fixed.mean_ipw, rel=1e-9)
        assert r_early.mean_dr == pytest.approx(r_fixed.mean_dr, rel=1e-9)
        assert r_early.se_ipw == pytest.approx(r_fixed.se_ipw, rel=1e-9)
        assert r_early.se_dr == pytest.approx(r_fixed.se_dr, rel=1e-9)
        for a, b in zip(r_early.theta, r_fixed.theta):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)

"""Nearest-neighbor mass imputation (``ops/nn_impute``).

Oracle strategy: hand-enumerable donor/recipient layouts pin the
deterministic tie rules (below-donor on distance ties, smallest donor
id at equal x), empty-class behavior, and the weighted estimator math;
a plan check certifies the kernel is window-based (no join at all, let
alone a cartesian one).
"""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.nn_impute import (
    ImputeError, nn_impute, nn_mass_mean,
)


def _donors(spark, rows):
    return spark.createDataFrame(rows, ["did", "cls", "x", "y"])


def _recips(spark, rows):
    return spark.createDataFrame(rows, ["rid", "cls", "x", "w"])


class TestNearest:
    def test_picks_nearest_either_side(self, spark):
        don = _donors(spark, [(1, "a", 0.0, 100.0), (2, "a", 10.0, 200.0)])
        rec = _recips(spark, [(1, "a", 3.0, 1.0), (2, "a", 8.0, 1.0)])
        out = {r["rid"]: r for r in
               nn_impute(rec, don, "x", "y", ["cls"], "did").collect()}
        assert out[1]["y_nn"] == 100.0 and out[1]["did_nn"] == 1
        assert out[2]["y_nn"] == 200.0 and out[2]["did_nn"] == 2
        assert out[1]["dist_nn"] == 3.0 and out[2]["dist_nn"] == 2.0

    def test_distance_tie_prefers_below_donor(self, spark):
        don = _donors(spark, [(1, "a", 0.0, 100.0), (2, "a", 10.0, 200.0)])
        rec = _recips(spark, [(1, "a", 5.0, 1.0)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["did_nn"] == 1  # equidistant -> smaller donor x wins

    def test_equal_x_tie_prefers_smallest_donor_id(self, spark):
        don = _donors(
            spark,
            [(7, "a", 5.0, 700.0), (3, "a", 5.0, 300.0), (9, "a", 5.0, 900.0)],
        )
        rec = _recips(spark, [(1, "a", 5.0, 1.0), (2, "a", 6.0, 1.0)])
        out = {r["rid"]: r for r in
               nn_impute(rec, don, "x", "y", ["cls"], "did").collect()}
        assert out[1]["did_nn"] == 3  # exact-x tie -> min id
        assert out[2]["did_nn"] == 3  # below-side carry also min id

    def test_classes_are_hard_boundaries(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0), (2, "b", 5.01, 200.0)])
        rec = _recips(spark, [(1, "a", 5.02, 1.0)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["did_nn"] == 1  # never crosses into class b

    def test_empty_donor_class_yields_nulls(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = _recips(spark, [(1, "a", 4.0, 1.0), (2, "b", 4.0, 1.0)])
        out = {r["rid"]: r for r in
               nn_impute(rec, don, "x", "y", ["cls"], "did").collect()}
        assert out[1]["y_nn"] == 100.0
        assert out[2]["y_nn"] is None and out[2]["did_nn"] is None

    def test_recipient_columns_survive(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = _recips(spark, [(1, "a", 4.0, 2.5)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["w"] == 2.5 and out["rid"] == 1 and out["x"] == 4.0

    def test_plan_has_no_join(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = _recips(spark, [(1, "a", 4.0, 1.0)])
        plan = (
            nn_impute(rec, don, "x", "y", ["cls"], "did")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Join" not in plan  # union + window, never a pair join


class TestMassMean:
    def test_weighted_mean_by_group(self, spark):
        don = _donors(spark, [(1, "a", 0.0, 10.0), (2, "a", 100.0, 30.0)])
        rec = _recips(
            spark,
            [(1, "a", 1.0, 1.0), (2, "a", 99.0, 3.0), (3, "b", 1.0, 1.0)],
        )
        out = {r["cls"]: r for r in nn_mass_mean(
            rec, don, "x", "y", ["cls"], "did",
            weight_col="w", group_cols=["cls"],
        ).collect()}
        # class a: (1*10 + 3*30) / 4 = 25; class b: no donors
        assert out["a"]["mean_imputed"] == pytest.approx(25.0)
        assert out["a"]["n_recipients"] == 2 and out["a"]["n_matched"] == 2
        assert out["b"]["n_matched"] == 0
        assert out["b"]["mean_imputed"] is None

    def test_unweighted_default(self, spark):
        don = _donors(spark, [(1, "a", 0.0, 10.0), (2, "a", 100.0, 30.0)])
        rec = _recips(spark, [(1, "a", 1.0, 9.9), (2, "a", 99.0, 9.9)])
        out = nn_mass_mean(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["mean_imputed"] == pytest.approx(20.0)


class TestGuards:
    def test_global_window_refused(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = _recips(spark, [(1, "a", 4.0, 1.0)])
        with pytest.raises(ImputeError, match="single partition"):
            nn_impute(rec, don, "x", "y", [], "did")
        # explicit small-data escape hatch works
        out = nn_impute(rec, don, "x", "y", [], "did", allow_global=True)
        assert out.collect()[0]["y_nn"] == 100.0

    def test_missing_columns(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = _recips(spark, [(1, "a", 4.0, 1.0)])
        with pytest.raises(ImputeError, match="donor column 'nope'"):
            nn_impute(rec, don, "x", "nope", ["cls"], "did")
        with pytest.raises(ImputeError, match="recipient column"):
            nn_impute(rec.drop("x"), don, "x", "y", ["cls"], "did")


class TestNullDonors:
    """Round-9 MEDIUM repro: a donor with null x survived into the
    carry union; when it was the only at-or-below candidate its null
    distance fell through ``.otherwise(lo)`` and the recipient got
    that donor's y with dist=null instead of the true nearest."""

    def test_null_x_donor_does_not_shadow_true_nearest(self, spark):
        don = spark.createDataFrame(
            [(1, "a", None, 999.0), (2, "a", 10.0, 200.0)],
            "did long, cls string, x double, y double",
        )
        rec = _recips(spark, [(1, "a", 1.0, 1.0)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["y_nn"] == pytest.approx(200.0)
        assert out["did_nn"] == 2
        assert out["dist_nn"] == pytest.approx(9.0)

    def test_null_y_and_null_id_donors_dropped(self, spark):
        don = spark.createDataFrame(
            [(1, "a", 1.0, None), (None, "a", 1.5, 150.0),
             (3, "a", 10.0, 300.0)],
            "did long, cls string, x double, y double",
        )
        rec = _recips(spark, [(1, "a", 0.0, 1.0)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["did_nn"] == 3 and out["y_nn"] == pytest.approx(300.0)

    def test_all_donors_null_x_yields_null_match(self, spark):
        don = spark.createDataFrame(
            [(1, "a", None, 100.0)],
            "did long, cls string, x double, y double",
        )
        rec = _recips(spark, [(1, "a", 1.0, 1.0)])
        out = nn_impute(rec, don, "x", "y", ["cls"], "did").collect()[0]
        assert out["y_nn"] is None and out["dist_nn"] is None

    def test_null_x_recipient_gets_null_match(self, spark):
        don = _donors(spark, [(1, "a", 5.0, 100.0)])
        rec = spark.createDataFrame(
            [(1, "a", None, 1.0), (2, "a", 4.0, 1.0)],
            "rid long, cls string, x double, w double",
        )
        out = {r["rid"]: r for r in
               nn_impute(rec, don, "x", "y", ["cls"], "did").collect()}
        assert out[1]["y_nn"] is None and out[1]["dist_nn"] is None
        assert out[2]["y_nn"] == pytest.approx(100.0)


class TestMassSE:
    def test_se_matches_numpy_wr_formula(self, spark):
        import numpy as np

        rng = np.random.default_rng(5)
        don = _donors(
            spark,
            [(i, "a", float(i), float(100 + (i * 7) % 31))
             for i in range(50)],
        )
        rx = np.round(rng.uniform(0, 49, 40), 3)
        rw = np.round(rng.uniform(1, 5, 40), 3)
        rec = _recips(
            spark,
            [(i, "a", float(rx[i]), float(rw[i])) for i in range(40)],
        )
        out = nn_mass_mean(
            rec, don, "x", "y", ["cls"], "did",
            weight_col="w", group_cols=["cls"],
        ).collect()[0]
        # numpy replay: nearest donor (tie -> below, then smallest id)
        dx = np.arange(50.0)
        dy = np.array([100 + (i * 7) % 31 for i in range(50)], float)
        ynn = np.empty(40)
        for i in range(40):
            dist = np.abs(dx - rx[i])
            cand = np.flatnonzero(dist == dist.min())
            j = cand[np.lexsort((cand, dx[cand]))[0]]
            ynn[i] = dy[j]
        mu = (rw * ynn).sum() / rw.sum()
        n = 40
        v = n / (n - 1) * (rw**2 * (ynn - mu) ** 2).sum() / rw.sum() ** 2
        assert out["mean_imputed"] == pytest.approx(mu, rel=1e-9)
        assert out["se_imputed"] == pytest.approx(np.sqrt(v), rel=1e-9)

    def test_se_null_when_under_two_matched(self, spark):
        don = _donors(spark, [(1, "a", 0.0, 10.0)])
        rec = _recips(spark, [(1, "a", 1.0, 1.0), (2, "b", 1.0, 1.0)])
        out = {r["cls"]: r for r in nn_mass_mean(
            rec, don, "x", "y", ["cls"], "did",
            weight_col="w", group_cols=["cls"],
        ).collect()}
        assert out["a"]["se_imputed"] is None      # n_matched = 1
        assert out["b"]["mean_imputed"] is None    # no donors at all

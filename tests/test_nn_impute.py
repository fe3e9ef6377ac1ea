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

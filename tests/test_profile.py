"""Data profiling (``ops/profile``).

Oracle strategy: hand-countable toy frames pin every statistic (nulls,
exact distincts, moments, deterministic top value); the approx path
must stay within HLL++ error on a known cardinality; plan checks pin
the two-pass shape (string melt only when string columns exist).
"""

import math

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.profile import profile


def _toy(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (3, "a", None),
        (4, None, 40.0),
        (5, "a", 30.0),
    ]
    return spark.createDataFrame(rows, ["id", "cat", "val"])


class TestExact:
    def test_all_statistics(self, spark):
        out = {r["column"]: r for r in profile(_toy(spark)).collect()}
        assert set(out) == {"id", "cat", "val"}

        cat = out["cat"]
        assert cat["kind"] == "string"
        assert cat["n_rows"] == 5 and cat["n_null"] == 1
        assert cat["n_distinct"] == 2
        assert cat["top_value"] == "a" and cat["top_count"] == 3
        assert cat["mean"] is None and cat["min_num"] is None

        val = out["val"]
        assert val["kind"] == "numeric"
        assert val["n_null"] == 1 and val["n_distinct"] == 4
        assert val["min_num"] == 10.0 and val["max_num"] == 40.0
        assert val["mean"] == pytest.approx(25.0)
        assert val["sd"] == pytest.approx(
            math.sqrt(sum((v - 25) ** 2 for v in (10, 20, 30, 40)) / 3)
        )
        assert val["top_value"] is None  # numeric: no mode

    def test_top_value_tie_breaks_lexicographically(self, spark):
        df = spark.createDataFrame(
            [("b",), ("a",), ("b",), ("a",)], ["cat"]
        )
        out = profile(df).collect()[0]
        assert out["top_value"] == "a" and out["top_count"] == 2

    def test_all_null_column(self, spark):
        df = spark.createDataFrame([(1,), (2,)], ["id"]).withColumn(
            "empty", F.lit(None).cast("double")
        )
        out = {r["column"]: r for r in profile(df).collect()}
        e = out["empty"]
        assert e["n_null"] == 2 and e["n_distinct"] == 0
        assert e["mean"] is None and e["min_num"] is None

    def test_column_subset_and_order(self, spark):
        out = profile(_toy(spark), ["val", "id"]).collect()
        assert [r["column"] for r in out] == ["val", "id"]

    def test_temporal_kind(self, spark):
        df = spark.createDataFrame([(1,)], ["id"]).withColumn(
            "d", F.to_date(F.lit("2024-01-01"))
        )
        out = {r["column"]: r for r in profile(df).collect()}
        assert out["d"]["kind"] == "temporal"
        assert out["d"]["n_distinct"] == 1


class TestApprox:
    def test_hll_within_tolerance(self, spark):
        df = spark.range(20000).select(
            (F.col("id") % 5000).alias("k")
        )
        out = profile(df, approx=True).collect()[0]
        assert out["n_distinct"] == pytest.approx(5000, rel=0.1)

    def test_approx_skips_expand(self, spark):
        # the observable contract: multiple exact distincts Expand the
        # input; the approx aggregates must not (profile() executes
        # eagerly, so check the plan of the agg shapes it builds)
        df = _toy(spark)
        aggs_exact = [F.count_distinct(F.col("id")), F.count_distinct(F.col("val"))]
        aggs_approx = [F.approx_count_distinct("id"), F.approx_count_distinct("val")]
        p_exact = df.agg(*aggs_exact)._jdf.queryExecution().executedPlan().toString()
        p_approx = df.agg(*aggs_approx)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in p_exact and "Expand" not in p_approx


class TestGuards:
    def test_missing_column(self, spark):
        with pytest.raises(ValueError, match="not found"):
            profile(_toy(spark), ["nope"])

    def test_empty_column_list(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            profile(_toy(spark), [])

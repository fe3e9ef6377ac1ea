"""Approximate aggregates (sketch surface): HLL++ distinct counts and
quantile sketches stay within their documented error bounds of the exact
answers — the cheap first-pass statistics for 100 TB profiling."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.agg(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.agg(F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.08  # 4x the 2% target rsd


def test_percentile_approx_close_to_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10_000)).alias("approx_p50"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("exact_p99"),
        F.percentile_approx("o_totalprice", F.lit(0.99), F.lit(10_000)).alias("approx_p99"),
    ).collect()[0]
    assert abs(row["approx_p50"] - row["exact_p50"]) / row["exact_p50"] < 0.01
    assert abs(row["approx_p99"] - row["exact_p99"]) / row["exact_p99"] < 0.01


def test_approx_quantile_api(spark, sf_dir):
    """DataFrame.approxQuantile (S11 summary-stats path)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q25, q50, q75 = orders.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], 0.01)
    assert q25 < q50 < q75


def test_hll_merge_mismatched_p_raises(spark):
    """r11: p rides the register table as schema metadata — merging
    sketches with different precisions raises at plan time."""
    import pytest as _pytest

    from data_integration_est_spark.ops.sketches import (
        hll_merge, hll_registers,
    )

    df = spark.range(100).selectExpr("id AS v")
    a = hll_registers(df, "v", p=10)
    b = hll_registers(df, "v", p=12)
    with _pytest.raises(ValueError, match="mismatched"):
        hll_merge(a, b)
    assert hll_merge(a, hll_registers(df, "v", p=10)).count() > 0

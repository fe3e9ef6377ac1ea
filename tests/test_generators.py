import numpy as np
from pyspark.sql import functions as F

from data_integration_est_spark import generators, sampling


def test_generar_poblacion_shape_and_moments(spark):
    n = 20_000
    df = generators.generar_poblacion(spark, N=n, size_a=200, n_B1=3000, n_B2=2000, seed=42)
    assert df.columns == [
        "id", "x_i", "y_i", "tilde_y_i", "e_i", "e1_i", "e2_i", "x1_i", "x2_i",
        "muestra_A", "muestra_B",
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x_i").alias("mx"), F.stddev_samp("x_i").alias("sx"),
        F.avg("y_i").alias("my"),
        F.sum("muestra_A").alias("nA"), F.sum("muestra_B").alias("nB"),
        F.sum(F.col("x1_i") + F.col("x2_i")).alias("part"),
        F.corr("x_i", "e_i").alias("rho"),
    ).collect()[0]
    assert row["n"] == n
    assert abs(row["mx"] - 2.0) < 0.05 and abs(row["sx"] - 1.0) < 0.05
    assert abs(row["my"] - 3.0) < 0.05
    assert row["nA"] == 200 and row["nB"] == 5000
    assert row["part"] == n  # x1/x2 partition
    assert abs(row["rho"] - 0.5) < 0.05


def test_generar_poblacion_deterministic(spark):
    a = generators.generar_poblacion(spark, N=5000, size_a=50, n_B1=500, n_B2=300, seed=7)
    b = generators.generar_poblacion(spark, N=5000, size_a=50, n_B1=500, n_B2=300, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = generators.generar_poblacion(spark, N=5000, size_a=50, n_B1=500, n_B2=300, seed=8)
    assert c.exceptAll(a).count() > 0


def test_determinism_across_partitionings(spark):
    a = generators.generar_poblacion(spark, N=3000, size_a=30, n_B1=200, n_B2=100, seed=3)
    b = generators.generar_poblacion(
        spark.range(0).sparkSession, N=3000, size_a=30, n_B1=200, n_B2=100, seed=3
    ).repartition(17)
    assert a.exceptAll(b).count() == 0


def test_stratified_population(spark):
    n = 20_000
    df = generators.generate_population_stratified(spark, N=n, n_A_total=400, n_B_total=6000, seed=1)
    row = df.agg(
        F.avg("x_i").alias("mx"), F.avg("y_i").alias("my"),
        F.sum("ind_A").alias("nA"), F.sum("ind_B").alias("nB"),
        F.sum(F.when(F.col("ind_A") == 1, F.col("d_i_A")).otherwise(0.0)).alias("sumw"),
        F.countDistinct("stratum").alias("nstrata"),
    ).collect()[0]
    assert abs(row["mx"] - 10.0) < 0.05
    assert abs(row["my"] - 7.5) < 0.1
    assert abs(row["nA"] - 400) <= 4          # rounding of proportional allocation
    assert abs(row["nB"] - 6000) < 300        # Poisson with rescale-retry
    assert abs(row["sumw"] - n) < n * 0.02    # HT weights sum ≈ N
    assert row["nstrata"] == 4
    # selection bias: strata 1-2 oversampled in B
    rates = {r["s"]: r["rate"] for r in df.groupBy(F.col("stratum").alias("s"))
             .agg(F.avg("ind_B").alias("rate")).collect()}
    assert rates[1] > 0.6 and rates[2] > 0.6 and rates[3] < 0.35 and rates[4] < 0.35


def test_nmar_population_bias(spark):
    n = 20_000
    df = generators.generate_population_NMAR(
        spark, N=n, size_a=200, size_muestra_B=5000, gamma=1.0, c=3.0, seed_base=5
    )
    row = df.agg(
        F.sum("muestra_A").alias("nA"), F.sum("muestra_B").alias("nB"),
        F.avg("y_i").alias("my"),
        F.avg(F.when(F.col("muestra_B") == 1, F.col("y_i"))).alias("myB"),
    ).collect()[0]
    assert row["nA"] == 200 and row["nB"] == 5000
    assert row["myB"] > row["my"] + 0.1  # NMAR selection biased toward high y


def test_nmar_v2_multi_outcome(spark):
    df = generators.generate_population_NMAR_v2(
        spark, N=5000, size_a=100, size_muestra_B=1000,
        sd_vector=(0.0, 0.125, 0.25), seed_base=2,
    )
    assert "y_i_sd_0" in df.columns and "y_i_sd_0.125" in df.columns
    row = df.agg(
        F.stddev_samp(F.col("`y_i_sd_0`")).alias("s0"),
        F.stddev_samp(F.col("`y_i_sd_0.25`")).alias("s25"),
    ).collect()[0]
    # sd_0: only the 0.7*x term varies => sd = 0.7; sd_0.25 adds noise
    assert abs(row["s0"] - 0.7) < 0.05
    assert row["s25"] > row["s0"]


def test_weighted_srs_respects_probabilities(spark):
    n = 30_000
    df = spark.range(1, n + 1).withColumn(
        "p", F.when(F.col("id") % 2 == 0, 0.9).otherwise(0.1)
    )
    out = sampling.weighted_srs_exact(df, "id", 5000, "p", seed=1)
    row = out.agg(
        F.sum("ind").alias("n"),
        F.avg(F.when(F.col("id") % 2 == 0, F.col("ind").cast("double"))).alias("r_even"),
        F.avg(F.when(F.col("id") % 2 == 1, F.col("ind").cast("double"))).alias("r_odd"),
    ).collect()[0]
    assert row["n"] == 5000
    assert row["r_even"] > 4 * row["r_odd"]
